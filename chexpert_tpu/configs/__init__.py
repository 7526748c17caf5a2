from chexpert_tpu.configs.config import Config, resolve_output_dir, setup_output_dir

__all__ = ["Config", "resolve_output_dir", "setup_output_dir"]
