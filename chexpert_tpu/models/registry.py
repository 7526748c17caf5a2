"""Model factory — the TPU equivalent of the reference's arch dispatch
(/root/reference/chexpert.py:460-502).

build_model(name, ...) returns (module, optimizer_spec) where optimizer_spec
captures the per-arch optimizer/scheduler choices:
  densenet121 / resnet152 / aaresnet152: Adam(lr)            (chexpert.py:470,485,494)
  aadensenet121: SGD(momentum .9, nesterov) + MultiStep[40k, 60k]
                                                             (chexpert.py:479-480)
  efficientnet-b*: RMSprop(momentum .9, eps 1e-3) + staircase exponential
                   decay gamma=lr_decay_factor               (chexpert.py:499-500)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from chexpert_tpu.models.densenet import AttnParams, DenseNet
from chexpert_tpu.models.efficientnet import SCALING_PARAMS, EfficientNet
from chexpert_tpu.models.resnet import ResNet

N_CLASSES = 5  # competition pathologies (reference dataset.py:25)


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    kind: str  # 'adam' | 'sgd_nesterov' | 'rmsprop'
    schedule: str = "constant"  # 'constant' | 'multistep' | 'exponential'
    milestones: Tuple[int, ...] = ()
    decay_factor: float = 0.97
    decay_steps: int = 1  # staircase period for 'exponential'
    momentum: float = 0.9
    eps: float = 1e-3
    weight_decay: float = 0.0


def build_model(
    name: str,
    n_classes: int = N_CLASSES,
    image_size: int = 320,
    dtype=jnp.bfloat16,
    attn_impl: str = "pallas",
    prefix_stats: Optional[bool] = None,
    remat: bool = False,
    chunk_size: Optional[int] = None,
    slim_bwd: Optional[bool] = None,
    slim_block: Optional[bool] = None,
    concat_free: bool = False,
) -> Tuple[nn.Module, OptimizerSpec]:
    # prefix_stats: carried-stats dense blocks (models/densenet.py _PrefixBN)
    # — numerically identical (tests/test_prefix_stats.py), same param tree.
    # Defaults are per-arch from on-chip A/Bs (bench.py --[no-]prefix-stats,
    # v5e batch 128 @ 320²): OFF for densenet121 (943 vs 775 img/s — XLA
    # fuses the standard path's BN into the convs better, 110 vs 148 GB
    # bytes-accessed per step) and ON for aadensenet121 (805 vs 753 img/s).
    # None = use the arch's measured default; pass a bool to override (A/B).
    # remat: rematerialized dense blocks (perf experiment; see DenseNet.remat).
    if ((remat or slim_block or chunk_size or slim_bwd or concat_free
         or prefix_stats is not None)
            and "densenet" not in name):
        raise ValueError(
            f"prefix_stats/remat/slim_block/chunk_size/slim_bwd/concat_free "
            f"are only consumed by the DenseNet family; {name!r} would "
            "silently run the standard model while reporting the variant"
        )
    if chunk_size and (slim_bwd or slim_block):
        raise ValueError(
            "chunk_size cannot combine with slim_bwd/slim_block: "
            "ChunkedDenseLayer has no 'dense_norm1_relu' checkpoint name, so "
            "the slim policies would be silent no-ops on the chunked path"
        )
    if concat_free and "densenet" in name:
        # the carried-stats paths take priority inside DenseBlock, so
        # concat_free under them would silently bench the carried-stats
        # model; DenseBlock also asserts, but asserts vanish under -O and
        # surface late (mid-jit-trace) — refuse here where the EFFECTIVE
        # per-arch prefix_stats default is known
        effective_prefix = (prefix_stats if prefix_stats is not None
                            else name in ("aadensenet121", "densenet-tiny",
                                          "aadensenet-tiny"))
        if effective_prefix or chunk_size:
            raise ValueError(
                f"concat_free cannot combine with prefix_stats/chunk_size "
                f"(for {name!r} prefix_stats defaults to True; pass "
                "--no-prefix-stats to A/B concat-free blocks)"
            )
    if name == "densenet121":
        return (
            DenseNet(32, (6, 12, 24, 16), 64, num_classes=n_classes, dtype=dtype,
                     prefix_stats=prefix_stats if prefix_stats is not None else False,
                     remat=remat,
                     chunk_size=chunk_size if chunk_size is not None else 0,
                     slim_bwd=bool(slim_bwd), slim_block=bool(slim_block),
                     concat_free=concat_free),
            OptimizerSpec("adam"),
        )
    if name == "aadensenet121":
        attn = AttnParams(k=0.2, v=0.1, nh=8, relative=True, input_dims=(image_size, image_size))
        return (
            DenseNet(32, (6, 12, 24, 16), 64, num_classes=n_classes, attn=attn,
                     dtype=dtype, attn_impl=attn_impl,
                     prefix_stats=prefix_stats if prefix_stats is not None else True,
                     remat=remat,
                     chunk_size=chunk_size if chunk_size is not None else 0,
                     slim_bwd=bool(slim_bwd), slim_block=bool(slim_block),
                     concat_free=concat_free),
            OptimizerSpec("sgd_nesterov", "multistep", milestones=(40000, 60000)),
        )
    if name == "resnet152":
        return (
            ResNet("bottleneck", (3, 8, 36, 3), num_classes=n_classes, dtype=dtype),
            OptimizerSpec("adam"),
        )
    if name == "aaresnet152":
        attn = AttnParams(k=0.2, v=0.1, nh=8, relative=True, input_dims=(image_size, image_size))
        # 'pallas' -> 'pallas-bd': the separate-RW/RH pack wins on this
        # COMPUTE-bound arch (149.3 vs fusedpack's 144.8 img/s @16, r5 A/B —
        # the fusedpack identity block adds ~9% train FLOPs that serialize
        # behind a busy MXU; bandwidth-bound aadensenet121 prefers fusedpack)
        if attn_impl == "pallas":
            attn_impl = "pallas-bd"
        return (
            ResNet("bottleneck", (3, 8, 36, 3), num_classes=n_classes, attn=attn,
                   dtype=dtype, attn_impl=attn_impl),
            OptimizerSpec("adam"),
        )
    if name in SCALING_PARAMS:
        return (
            EfficientNet(name, num_classes=n_classes, dtype=dtype),
            OptimizerSpec("rmsprop", "exponential"),
        )
    if name == "densenet-tiny":
        # small debug arch (CPU-testable CLI runs; no reference equivalent)
        return (
            DenseNet(8, (2, 2), 16, num_classes=n_classes, dtype=dtype,
                     prefix_stats=prefix_stats if prefix_stats is not None else True,
                     remat=remat,
                     chunk_size=chunk_size if chunk_size is not None else 0,
                     slim_bwd=bool(slim_bwd), slim_block=bool(slim_block),
                     concat_free=concat_free),
            OptimizerSpec("adam"),
        )
    if name == "aadensenet-tiny":
        attn = AttnParams(k=0.25, v=0.25, nh=2, relative=True, input_dims=(image_size, image_size))
        return (
            DenseNet(8, (2, 2), 16, num_classes=n_classes, attn=attn,
                     dtype=dtype, attn_impl=attn_impl,
                     prefix_stats=prefix_stats if prefix_stats is not None else True,
                     remat=remat,
                     chunk_size=chunk_size if chunk_size is not None else 0,
                     slim_bwd=bool(slim_bwd), slim_block=bool(slim_block),
                     concat_free=concat_free),
            OptimizerSpec("adam"),
        )
    raise RuntimeError(f"Model architecture not supported: {name}")
