from chexpert_tpu.utils.io import load_json, save_json
from chexpert_tpu.utils.logging import MetricsWriter

__all__ = ["load_json", "save_json", "MetricsWriter"]
