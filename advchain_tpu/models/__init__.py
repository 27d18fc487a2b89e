"""Flax model zoo (UNet family) + torch checkpoint conversion."""

from advchain_tpu.models.unet import (
    UNet, UNetv2, DeeplySupervisedUNet, PseudoConv3dModel,
    DoubleConv, Down, Up, OutConv, SelfAttn2d,
)
from advchain_tpu.models.wrapper import SegmentationModel
from advchain_tpu.models.norm import TorchBatchNorm
from advchain_tpu.models.blocks import (
    ConvDown, ResConvDown, ResConv, ResBilinearUp, ResConvUp, DilationConv,
    OutConvRelu, SELayer, CSELayer, ChannelSELayer, SpatialSELayer,
    ChannelSpatialSELayer, SqeUp, BatchInstanceNorm, AdaptiveInstanceNorm,
    AdaptiveBatchNorm, bilinear_additive_upsampling, spatial_pyramid_pool,
    UnetConv3, UnetUp3, normal_init, xavier_init, kaiming_init,
    DomainDoubleConv, DomainInConv, DomainPoolDown, DomainUp,
    UnetConv2, Conv2DBatchNorm, Conv2DBatchNormRelu)
from advchain_tpu.models.convert import get_unet_model, torch_unet_state_to_flax

__all__ = [
    "UNet", "UNetv2", "DeeplySupervisedUNet", "PseudoConv3dModel",
    "DoubleConv", "Down", "Up", "OutConv", "SelfAttn2d",
    "SegmentationModel", "get_unet_model", "torch_unet_state_to_flax",
    "TorchBatchNorm",
    "ConvDown", "ResConvDown", "ResConv", "ResBilinearUp", "ResConvUp",
    "DilationConv", "OutConvRelu", "SELayer", "CSELayer", "ChannelSELayer",
    "SpatialSELayer", "ChannelSpatialSELayer", "SqeUp", "BatchInstanceNorm",
    "AdaptiveInstanceNorm", "AdaptiveBatchNorm",
    "bilinear_additive_upsampling", "spatial_pyramid_pool",
    "UnetConv3", "UnetUp3", "normal_init", "xavier_init", "kaiming_init",
    "DomainDoubleConv", "DomainInConv", "DomainPoolDown", "DomainUp",
    "UnetConv2", "Conv2DBatchNorm", "Conv2DBatchNormRelu",
]
