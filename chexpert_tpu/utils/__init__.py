from chexpert_tpu.utils.io import enable_compilation_cache, load_json, save_json
from chexpert_tpu.utils.logging import MetricsWriter

__all__ = ["enable_compilation_cache", "load_json", "save_json", "MetricsWriter"]
