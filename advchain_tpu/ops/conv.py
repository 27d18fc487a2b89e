"""Convolution primitives with torch-parity semantics on NC(D)HW tensors.

Covers the three conv patterns the reference's hot path needs
(SURVEY.md section 2.2):
  * ``conv_transpose`` — B-spline control-point upsampling
    (reference advchain/augmentor/adv_bias.py:292-307),
  * ``depthwise_conv`` / ``gaussian_smooth`` — velocity-field smoothing
    (adv_morph.py:377-452),
  * ``conv_same`` — Sobel filters for the contour loss (common/loss.py:142-203).

All are thin wrappers over ``lax.conv_general_dilated`` so XLA maps them to
the TPU convolution path (MXU) and fuses surrounding elementwise work.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv_same", "conv_transpose", "depthwise_conv",
           "gaussian_kernel_1d", "gaussian_smooth"]


def _dim_numbers(ndim: int):
    if ndim == 2:
        return ("NCHW", "OIHW", "NCHW")
    if ndim == 3:
        return ("NCDHW", "OIDHW", "NCDHW")
    raise ValueError(f"only 2/3 spatial dims supported, got {ndim}")


def conv_same(x, weight, groups: int = 1):
    """Cross-correlation with SAME ('padding=k//2') torch semantics.

    x: (N, C_in, *S); weight: (C_out, C_in/groups, *K) with odd K.
    """
    ndim = x.ndim - 2
    pads = [((k - 1) // 2, (k - 1) // 2) for k in weight.shape[2:]]
    return lax.conv_general_dilated(
        x, weight, window_strides=(1,) * ndim, padding=pads,
        dimension_numbers=_dim_numbers(ndim), feature_group_count=groups,
        precision=lax.Precision.HIGHEST)


def conv_transpose(x, weight, stride, padding):
    """``torch.nn.functional.conv_transpose{2,3}d`` (groups=1) equivalent.

    x: (N, C_in, *S); weight: (C_in, C_out, *K) — torch transposed-conv layout.
    stride/padding: int or per-axis tuple.  Output spatial size is
    ``(S-1)*stride + K - 2*padding``.

    Implemented as an input-dilated correlation with the *flipped* kernel —
    exactly the gradient-of-conv definition torch uses.
    """
    ndim = x.ndim - 2
    if np.isscalar(stride):
        stride = (int(stride),) * ndim
    if np.isscalar(padding):
        padding = (int(padding),) * ndim
    ks = weight.shape[2:]
    # flip spatial axes and swap I/O: (C_in, C_out, *K) -> (C_out, C_in, *K)
    w = jnp.flip(weight, axis=tuple(range(2, 2 + ndim)))
    w = jnp.swapaxes(w, 0, 1)
    pads = [(k - 1 - p, k - 1 - p) for k, p in zip(ks, padding)]
    return lax.conv_general_dilated(
        x, w, window_strides=(1,) * ndim, padding=pads,
        lhs_dilation=tuple(stride), dimension_numbers=_dim_numbers(ndim),
        precision=lax.Precision.HIGHEST)


def depthwise_conv(x, kernel):
    """Depthwise SAME conv: same `kernel` (*K) applied to every channel."""
    ndim = x.ndim - 2
    c = x.shape[1]
    w = jnp.broadcast_to(kernel, (c, 1) + kernel.shape[-ndim:])
    return conv_same(x, w, groups=c)


@functools.lru_cache(maxsize=32)
def _gaussian_kernel_1d_np(kernel_size: int, sigma: float) -> np.ndarray:
    mean = (kernel_size - 1) / 2.0
    xs = np.arange(kernel_size, dtype=np.float64)
    k = np.exp(-((xs - mean) ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_kernel_1d(kernel_size: int, sigma: float):
    return jnp.asarray(_gaussian_kernel_1d_np(kernel_size, sigma))


def effective_gaussian_ks(kernel_size: int, sigma: float, spatial_dims: int) -> int:
    """Reference auto-grows the kernel for scipy parity
    (adv_morph.py:395-400): 2D grows when ks <  2*int(4*sigma+0.5)+1,
    3D grows when ks <= the same bound."""
    bound = 2 * int(4 * sigma + 0.5) + 1
    if spatial_dims == 2:
        return bound if kernel_size < bound else kernel_size
    return bound if kernel_size <= bound else kernel_size


def _axis_smooth(x, k1, axis: int):
    """1-D zero-padded tap accumulation along one spatial axis: identical
    to a depthwise SAME conv with kernel ``k1`` but lowered as fused VPU
    shift-multiply-adds instead of a TPU convolution (XLA's NCDHW conv
    lowering measured ~40x off bandwidth for these 1-wide kernels on 3D
    volumes — round-4 device trace)."""
    ks = k1.shape[0]
    r = (ks - 1) // 2
    pads = [(0, 0)] * x.ndim
    # asymmetric (r, ks-1-r) keeps even kernel sizes working (SAME
    # padding semantics, matching the depthwise-conv path this replaced);
    # for odd ks this is the usual symmetric (r, r)
    pads[axis] = (r, ks - 1 - r)
    xp = jnp.pad(x, pads)
    size = x.shape[axis]
    out = None
    for i in range(ks):
        tap = lax.slice_in_dim(xp, i, i + size, axis=axis)
        term = k1[i] * tap
        out = term if out is None else out + term
    return out


def gaussian_smooth(x, sigma: float = 1.0, kernel_size: int = 5, iters: int = 1):
    """Depthwise Gaussian smoothing of (N, C, *S), torch-reference parity.

    The reference builds a dense k^d kernel as a product of per-axis
    Gaussians each normalised jointly (adv_morph.py:422-428); a separable
    per-axis pass with per-axis normalisation is mathematically identical
    and each axis pass runs as fused elementwise shifts (O(k) VPU work,
    no conv op)."""
    ndim = x.ndim - 2
    ks = effective_gaussian_ks(kernel_size, sigma, ndim)
    k1 = gaussian_kernel_1d(ks, sigma).astype(x.dtype)
    out = x
    for _ in range(iters):
        for axis in range(ndim):
            out = _axis_smooth(out, k1, 2 + axis)
    return out
