"""Resize / interpolate matching ``torch.nn.functional.interpolate``.

Used for: bias-field upsampling (align_corners=False, reference
advchain/augmentor/adv_bias.py:316-327), velocity-field upsampling
(adv_morph.py:464), and the UNet decoder (align_corners=True, scale 2,
models/unet_parts.py:504-505).

TPU-first design: each spatial axis is resampled with a dense (out, in)
interpolation matrix applied as a matmul — linear interpolation as two
nonzeros per row.  On TPU these land on the MXU and XLA fuses the chain of
per-axis contractions; for the sizes in this domain (<=512 per axis) this is
faster than gather-based resize and is exactly equal to torch's separable
linear resampling.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["interpolate", "interp_matrix"]


@functools.lru_cache(maxsize=128)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D linear interpolation matrix W (out, in): y = W @ x.

    Matches torch's `area_pixel_compute_source_index`:
      align_corners=True : src = i * (in-1) / (out-1)
      align_corners=False: src = max(0, (i + 0.5) * in / out - 0.5)
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        if align_corners:
            w[0, 0] = 1.0
        else:
            src = max(0.0, 0.5 * in_size / out_size - 0.5)
            lo = int(np.floor(src))
            hi = min(lo + 1, in_size - 1)
            frac = src - lo
            w[0, lo] += 1.0 - frac
            w[0, hi] += frac
        return w.astype(np.float32)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            if src < 0.0:
                src = 0.0
        lo = int(np.floor(src))
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w.astype(np.float32)


def interp_matrix(in_size: int, out_size: int, align_corners: bool):
    return jnp.asarray(_interp_matrix_np(in_size, out_size, align_corners))


@functools.lru_cache(maxsize=128)
def _nearest_idx_np(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest' (legacy): src = floor(i * in / out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


def interpolate(x, size=None, scale_factor=None, mode: str = "bilinear",
                align_corners: bool = False):
    """Resize a batched tensor (N, C, *spatial) along all spatial axes.

    ``mode``: 'bilinear' / 'trilinear' / 'linear' (all treated as per-axis
    linear) or 'nearest'.  ``size`` is the target spatial shape; alternatively
    ``scale_factor`` (scalar or per-axis), with torch's
    ``out = floor(in * factor)`` rule.
    """
    spatial = x.shape[2:]
    ndim = len(spatial)
    if size is None:
        assert scale_factor is not None, "need size or scale_factor"
        if np.isscalar(scale_factor):
            scale_factor = (scale_factor,) * ndim
        size = tuple(int(np.floor(s * f)) for s, f in zip(spatial, scale_factor))
    else:
        size = tuple(int(s) for s in size)
    assert len(size) == ndim, f"size {size} rank mismatch with input {x.shape}"

    if mode == "nearest":
        out = x
        for axis, (ins, outs) in enumerate(zip(spatial, size)):
            if ins == outs:
                continue
            idx = jnp.asarray(_nearest_idx_np(ins, outs))
            out = jnp.take(out, idx, axis=2 + axis)
        return out

    if mode not in ("linear", "bilinear", "trilinear"):
        raise NotImplementedError(f"mode={mode!r}")

    out = x
    orig_dtype = x.dtype
    for axis, (ins, outs) in enumerate(zip(spatial, size)):
        if ins == outs:
            continue
        w = interp_matrix(ins, outs, align_corners).astype(orig_dtype)
        # contract the (2+axis)-th dim of `out` with the in-dim of w; full
        # fp32 accumulation — these are coordinates/fields, not activations
        out = jnp.moveaxis(
            jnp.tensordot(out, w, axes=[[2 + axis], [1]],
                          precision=jax.lax.Precision.HIGHEST),
            -1, 2 + axis)
    return out
