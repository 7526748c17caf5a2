from chexpert_tpu.models.attn import AAConv2d, attn_dims
from chexpert_tpu.models.densenet import AttnParams, DenseNet
from chexpert_tpu.models.efficientnet import EfficientNet, round_filters, scaled_blocks
from chexpert_tpu.models.registry import N_CLASSES, OptimizerSpec, build_model
from chexpert_tpu.models.resnet import BasicBlock, Bottleneck, ResNet, WideResNet

__all__ = [
    "AAConv2d",
    "attn_dims",
    "AttnParams",
    "DenseNet",
    "EfficientNet",
    "round_filters",
    "scaled_blocks",
    "N_CLASSES",
    "OptimizerSpec",
    "build_model",
    "BasicBlock",
    "Bottleneck",
    "ResNet",
    "WideResNet",
]
