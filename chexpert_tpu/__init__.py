"""chexpert_tpu — a TPU-native (JAX/Flax/Optax/pjit/Pallas) framework for
multi-label chest-X-ray pathology classification.

Re-designed from scratch for TPU hardware with the full capability surface of
the reference PyTorch codebase (kamenbliznashki/chexpert):

- data:       CheXpert-small index + preprocessing + high-throughput host
              input pipeline (decode/crop/normalize) with device prefetch
- models:     DenseNet / ResNet / WideResNet / EfficientNet-B0..B7 and the
              attention-augmented variants (AAConv2d), in Flax linen, NHWC,
              bfloat16 compute
- ops:        2-D relative-position multi-head attention — reference einsum
              path (with attention-weight capture for visualization) and a
              fused blockwise Pallas TPU kernel
- parallel:   jax.sharding Mesh helpers; data-parallel training via GSPMD
- train:      jit-compiled train/eval steps, TrainState, optax optimizers
- eval:       pure-numpy ROC/AUC/PR metrics, on-device vmapped ensembles
- interpret:  Grad-CAM (functional, via probe-gradients), attention maps,
              ROC/PR plots
- checkpoint: latest + top-K-by-AUC tracked checkpoints (msgpack)
- cli:        chexpert train/eval/visualize driver, competition predict,
              CIFAR model test-bench
"""

__version__ = "0.1.0"
