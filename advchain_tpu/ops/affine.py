"""Affine grid generation and homogeneous matrix utilities.

TPU-native equivalent of ``torch.nn.functional.affine_grid`` plus the batched
affine-matrix construction/inversion used by AdvAffine (reference:
advchain/augmentor/adv_affine.py:210-273,275-287,316-324).  All math is pure
``jnp`` so XLA fuses matrix build + grid generation + downstream sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["affine_grid_2d", "affine_grid_3d", "affine_grid",
           "make_batch_eye", "invert_affine_matrix"]


def _base_coords(size: int, align_corners: bool, dtype):
    if align_corners or size == 1:
        return jnp.linspace(-1.0, 1.0, size, dtype=dtype)
    # align_corners=False: shrink by (size-1)/size
    return jnp.linspace(-1.0, 1.0, size, dtype=dtype) * (size - 1) / size


def affine_grid_2d(theta, size, align_corners: bool = True):
    """theta: (N, 2, 3); size: (N, C, H, W) -> grid (N, H, W, 2).

    grid[..., 0] = theta[0,0]*x + theta[0,1]*y + theta[0,2] with x over W,
    y over H — torch convention.
    """
    n, _, h, w = size
    dtype = theta.dtype
    xs = _base_coords(w, align_corners, dtype)
    ys = _base_coords(h, align_corners, dtype)
    # base points (H, W, 3): [x, y, 1]
    bx, by = jnp.meshgrid(xs, ys, indexing="xy")  # both (H, W)
    base = jnp.stack([bx, by, jnp.ones_like(bx)], axis=-1)  # (H, W, 3)
    # (N, H, W, 2) = base (H, W, 3) @ theta^T (N, 3, 2).  K is tiny (3), so
    # force full fp32 accumulation — coordinates feed the sampler and must be
    # exact to <1e-6 (default TPU matmul precision is bf16).
    return jnp.einsum("hwk,njk->nhwj", base, theta,
                      precision=jax.lax.Precision.HIGHEST)


def affine_grid_3d(theta, size, align_corners: bool = True):
    """theta: (N, 3, 4); size: (N, C, D, H, W) -> grid (N, D, H, W, 3)."""
    n, _, d, h, w = size
    dtype = theta.dtype
    xs = _base_coords(w, align_corners, dtype)
    ys = _base_coords(h, align_corners, dtype)
    zs = _base_coords(d, align_corners, dtype)
    bz, by, bx = jnp.meshgrid(zs, ys, xs, indexing="ij")  # (D, H, W)
    base = jnp.stack([bx, by, bz, jnp.ones_like(bx)], axis=-1)  # (D, H, W, 4)
    return jnp.einsum("dhwk,njk->ndhwj", base, theta,
                      precision=jax.lax.Precision.HIGHEST)


def affine_grid(theta, size, align_corners: bool = True):
    if len(size) == 4:
        return affine_grid_2d(theta, size, align_corners)
    if len(size) == 5:
        return affine_grid_3d(theta, size, align_corners)
    raise ValueError(f"size must have 4 or 5 entries, got {len(size)}")


def make_batch_eye(batch_size: int, ndim: int, dtype=jnp.float32):
    """Batched (ndim+1)x(ndim+1) identity matrices (homogeneous coordinates)."""
    return jnp.broadcast_to(jnp.eye(ndim + 1, dtype=dtype),
                            (batch_size, ndim + 1, ndim + 1))


def invert_affine_matrix(affine_matrix):
    """Exact inverse of a batch of (N, d, d+1) affine matrices via homogeneous
    augmentation (reference adv_affine.py:316-324). Returns (N, d, d+1)."""
    n, d, _ = affine_matrix.shape
    homo = make_batch_eye(n, d, affine_matrix.dtype)
    homo = homo.at[:, :d, :].set(affine_matrix)
    inv = jnp.linalg.inv(homo)
    return inv[:, :d, :]
