from chexpert_tpu.interpret.gradcam import grad_cam
from chexpert_tpu.interpret.plots import plot_roc, save_attn_maps, save_vis_grids

__all__ = ["grad_cam", "plot_roc", "save_attn_maps", "save_vis_grids"]
