"""Consistency divergences and segmentation losses (TPU-native)."""

from advchain_tpu.losses.consistency import (
    calc_segmentation_consistency,
    calc_segmentation_mse_consistency,
    calc_segmentation_kl_consistency,
    contour_loss,
    kl_divergence,
    one_hot,
    cross_entropy_2d,
    cross_entropy,
)

__all__ = [
    "calc_segmentation_consistency",
    "calc_segmentation_mse_consistency",
    "calc_segmentation_kl_consistency",
    "contour_loss",
    "kl_divergence",
    "one_hot",
    "cross_entropy_2d",
    "cross_entropy",
]
