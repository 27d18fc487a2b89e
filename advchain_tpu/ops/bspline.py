"""B-spline kernels and airlab-style control-point grid geometry.

Replicates the reference bias-field machinery
(advchain/augmentor/adv_bias.py:12-49 kernels; :202-277 grid math;
:279-335 smoothing) with the fiddly integer geometry done once on the host
(static shapes — XLA requirement) and the heavy work (transposed conv +
crop + resize + exp) left to XLA ops.

Kernel construction note: the reference builds the B-spline kernel by
iterated box-filter convolution of all-ones kernels.  Rectangular ones
kernels are separable, and zero-pad + 'valid' correlation is separable too,
so the N-D kernel is the outer product of per-axis iterated 1-D box filters —
computed here exactly, in numpy, at trace time.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .conv import conv_transpose
from .resize import interpolate

__all__ = ["bspline_kernel", "BSplineFieldSpec", "make_bspline_field_spec",
           "evaluate_bspline_field"]


@functools.lru_cache(maxsize=64)
def _bspline_kernel_1d(spacing: int, order: int, per_iter_padding: Tuple[int, ...]) -> np.ndarray:
    """Iterated 1-D box filter: start from ones(spacing), then `order` times
    zero-pad by per_iter_padding[i] and correlate with ones(spacing)/spacing."""
    k = np.ones(spacing, dtype=np.float64)
    box = np.ones(spacing, dtype=np.float64)
    for i in range(order):
        pad = per_iter_padding[i]
        padded = np.pad(k, pad)
        k = np.convolve(padded, box, mode="valid") / spacing
    return k


def bspline_kernel(spacing, order: int = 3, spatial_dims: int = 2) -> np.ndarray:
    """N-D B-spline interpolation kernel, exact parity with the reference.

    2D (adv_bias.py:12-35): iteration i pads by ``i * spacing`` per axis.
    3D (adv_bias.py:37-49): every iteration pads by ``spacing - 1`` per axis.
    """
    spacing = tuple(int(s) for s in spacing)
    assert len(spacing) == spatial_dims
    axes = []
    for s in spacing:
        if spatial_dims == 2:
            pads = tuple(i * s for i in range(1, order + 1))
        else:
            pads = tuple(s - 1 for _ in range(1, order + 1))
        axes.append(_bspline_kernel_1d(s, order, pads))
    k = axes[0]
    for a in axes[1:]:
        k = np.multiply.outer(k, a)
    return k.astype(np.float32)


@dataclass(frozen=True)
class BSplineFieldSpec:
    """Static geometry for a control-point bias field (airlab-style,
    reference adv_bias.py:216-235)."""
    spatial_dims: int
    image_size: Tuple[int, ...]          # full-res spatial size (H, W[, D])
    cp_grid: Tuple[int, ...]             # control-point grid (incl. +2 border)
    stride: Tuple[int, ...]              # = control_point_spacing // downscale
    padding: Tuple[int, ...]             # conv-transpose padding = (k-1)//2
    crop_start: Tuple[int, ...]
    crop_end: Tuple[int, ...]
    kernel_size: Tuple[int, ...]
    order: int
    downscale: int


def make_bspline_field_spec(image_size, control_point_spacing, downscale: int,
                            order: int = 3) -> BSplineFieldSpec:
    """Host-side integer geometry (static).  Mirrors
    adv_bias.py init_control_points_config + get_bspline_kernel."""
    image_size = tuple(int(s) for s in image_size)
    dims = len(image_size)
    stride = np.array([int(s) // int(downscale) for s in control_point_spacing])
    img = np.array(image_size, dtype=np.float64)
    cp_grid = np.ceil(img / float(downscale) / stride).astype(int)
    inner = stride * cp_grid - (stride - 1)
    cp_grid = cp_grid + 2
    diff = inner - img / float(downscale)
    diff_floor = np.floor(np.abs(diff) / 2) * np.sign(diff)
    crop_start = diff_floor + np.remainder(diff, 2) * np.sign(diff)
    crop_end = diff_floor
    kernel = bspline_kernel(stride.tolist(), order=order, spatial_dims=dims)
    padding = tuple((np.array(kernel.shape) - 1) // 2)
    # early geometry validation: the reference's crop/resize arithmetic only
    # resizes UP (adv_bias.py:316-327); if the cropped field comes out larger
    # than image/downscale the multiply crashes at runtime (a latent
    # reference quirk for some spacing/order combos, e.g. order<=2 with
    # small grids).  Fail fast with an actionable message instead.
    conv_out = (cp_grid - 1) * stride + np.array(kernel.shape) - 2 * np.array(padding)
    field = conv_out - (stride + crop_start.astype(int)) - (stride + crop_end.astype(int))
    target = np.ceil(img / float(downscale)).astype(int)
    if np.any(field > target):
        raise ValueError(
            f"inconsistent B-spline geometry: cropped field {tuple(field)} "
            f"exceeds image/downscale {tuple(target)} for "
            f"control_point_spacing={tuple(int(s) for s in control_point_spacing)}, "
            f"downscale={downscale}, order={order}, image={image_size}; "
            f"use interpolation_order=3 or a larger spacing (the reference "
            f"crashes at runtime on these configs)")
    return BSplineFieldSpec(
        spatial_dims=dims,
        image_size=image_size,
        cp_grid=tuple(int(v) for v in cp_grid),
        stride=tuple(int(v) for v in stride),
        padding=tuple(int(v) for v in padding),
        crop_start=tuple(int(v) for v in crop_start.astype(int)),
        crop_end=tuple(int(v) for v in crop_end.astype(int)),
        kernel_size=tuple(kernel.shape),
        order=int(order),
        downscale=int(downscale),
    )


def evaluate_bspline_field(cpoints, spec: BSplineFieldSpec, log_space: bool = True):
    """Control points (N, 1, *cp_grid) -> bias field (N, 1, *image_size).

    conv-transpose upsampling by the B-spline kernel, border crop, linear
    resize back to full resolution (align_corners=False, torch Upsample
    parity including the 3D floor(size*scale) rule), then exp() (log space)
    or 1+field (reference adv_bias.py:279-335).
    """
    kernel = jnp.asarray(bspline_kernel(spec.stride, spec.order, spec.spatial_dims),
                         dtype=cpoints.dtype)
    w = kernel[None, None]  # (C_in=1, C_out=1, *K)
    field = conv_transpose(cpoints, w, stride=spec.stride, padding=spec.padding)
    # crop: [stride + crop_start : -(stride + crop_end)] per spatial axis
    slicer = [slice(None), slice(None)]
    for s, cs, ce in zip(spec.stride, spec.crop_start, spec.crop_end):
        slicer.append(slice(s + cs, field.shape[len(slicer)] - (s + ce)))
    field = field[tuple(slicer)]

    cur = field.shape[2:]
    if spec.spatial_dims == 2:
        h, w_ = spec.image_size
        if spec.image_size[0] / cur[0] > 1 or spec.image_size[1] / cur[1] > 1:
            field = interpolate(field, size=(h, w_), mode="bilinear",
                                align_corners=False)
    else:
        factors = tuple(t / c for t, c in zip(spec.image_size, cur))
        if any(f > 1 for f in factors):
            # torch Upsample(scale_factor=...) -> out = floor(in * factor)
            out_size = tuple(int(math.floor(c * f)) for c, f in zip(cur, factors))
            field = interpolate(field, size=out_size, mode="trilinear",
                                align_corners=False)
    if log_space:
        return jnp.exp(field)
    return 1.0 + field


def clip_bias(bias_field, magnitude: float):
    """Clamp the bias field into [1 - magnitude, 1 + magnitude]
    (reference adv_bias.py:337-356)."""
    assert magnitude >= 0
    return 1.0 + jnp.clip(bias_field - 1.0, -magnitude, magnitude)
