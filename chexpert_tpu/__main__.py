"""`python -m chexpert_tpu` — entry-point directory."""

USAGE = """chexpert_tpu — TPU-native CheXpert framework

Entry points:
  python -m chexpert_tpu.cli.chexpert    train / evaluate / ensemble /
                                         visualize / plot_roc
  python -m chexpert_tpu.cli.predict     competition inference to CSV
  python -m chexpert_tpu.cli.bench       CIFAR model test-bench
  python -m chexpert_tpu.cli.serve       HTTP inference server
  python -m chexpert_tpu.cli.data_tools  dataset inspect / stats / explore
  python bench.py                        single-chip training benchmark

See README.md and COMPONENTS.md.
"""

if __name__ == "__main__":
    print(USAGE)
