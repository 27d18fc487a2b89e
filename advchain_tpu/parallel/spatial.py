"""Spatial (depth/height) sharding of large volumes across the mesh.

SURVEY.md section 5.7: the reference's only lever for 3D volumes that
exceed device memory is coarsening (bias ``downscale``, small
``vector_size``) plus ``torch.cuda.empty_cache()``.  The TPU-native
equivalent is sharding the volume's leading spatial axis (D for NCDHW, H
for NCHW) across a second mesh axis, with halo exchange over ICI for the
small stencils and an all-gather only where the math is truly global:

* **stencil ops** (Gaussian velocity smoothing, reference
  advchain/augmentor/adv_morph.py:377-452; Sobel contour kernels,
  common/loss.py:142-203) touch at most ``(k-1)//2`` neighbouring planes —
  each shard computes locally after a ``lax.ppermute`` halo exchange with
  its neighbours.  Global zero-padding falls out for free: edge shards
  receive zeros from the non-cyclic permute, exactly matching the dense
  op's SAME/zeros boundary.
* **grid sampling** (adv_affine.py:303-313, adv_morph.py:546-557) is
  global — an affine rotation may move any output plane anywhere in the
  source.  The source volume (1-4 channels) is all-gathered along the
  space axis while the *grid* and *output* (and therefore the autodiff
  residuals of everything downstream) stay sharded.  For a 1-channel
  f32 256^3 volume the gather is 64 MiB over ICI; the activation savings
  of the sharded stencil/loss pipeline are what buy the memory headroom.
* the **batch** axis stays data-parallel on the first mesh axis, identical
  to ``parallel/train.py``.

Everything is ``jax.shard_map`` so the collectives are explicit and XLA
schedules them on ICI; all functions are differentiable (ppermute /
all_gather transpose to themselves / reduce-scatter).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from advchain_tpu.ops.conv import effective_gaussian_ks, gaussian_kernel_1d
from advchain_tpu.ops.grid_sample import grid_sample

__all__ = [
    "make_spatial_mesh", "volume_sharding", "grid_sharding",
    "shard_volume", "shard_batch_spatial", "halo_exchange",
    "sharded_gaussian_smooth", "sharded_grid_sample",
]

_DATA, _SPACE = "data", "space"


def make_spatial_mesh(n_data: int, n_space: int, devices=None) -> Mesh:
    """2-D ``(data, space)`` mesh: batch x leading-spatial-axis sharding."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space
    assert len(devices) >= need, (
        f"need {need} devices for a {n_data}x{n_space} mesh, "
        f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, (_DATA, _SPACE))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """N sharded over 'data', leading spatial axis (D or H) over 'space'."""
    return NamedSharding(mesh, P(_DATA, None, _SPACE))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sampling grid (N, Do[, Ho], Wo, dim): Do/Ho-leading axis sharded."""
    return NamedSharding(mesh, P(_DATA, _SPACE))


def shard_volume(x, mesh: Mesh):
    """Place (N, C, D, H, W) or (N, C, H, W) with N over 'data' and the
    leading spatial axis over 'space'."""
    return jax.device_put(x, volume_sharding(mesh))


def shard_batch_spatial(batch, mesh: Mesh):
    """Place a {'image', 'label'} batch for a spatially-sharded train step:
    image (N, C, *S) with the leading spatial axis over 'space', hard label
    (N, *S) likewise (see ``parallel.train._mesh_shardings``)."""
    out = dict(batch)
    out["image"] = jax.device_put(batch["image"], volume_sharding(mesh))
    out["label"] = jax.device_put(
        batch["label"], NamedSharding(mesh, P(_DATA, _SPACE)))
    return out


def halo_exchange(x_local, halo: int, axis: int, axis_name: str = _SPACE):
    """Concatenate ``halo`` planes from each neighbour along ``axis``.

    Must run inside ``shard_map``.  Non-cyclic ppermute: edge shards get
    zeros in the missing halo, matching the dense ops' zero padding.
    """
    n = lax.axis_size(axis_name)
    if halo == 0 or n == 1:
        pad = [(0, 0)] * x_local.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(x_local, pad) if halo else x_local
    # my top `halo` planes -> left neighbour's bottom halo, and vice versa
    lo = lax.slice_in_dim(x_local, 0, halo, axis=axis)
    hi = lax.slice_in_dim(x_local, x_local.shape[axis] - halo, None,
                          axis=axis)
    from_left = lax.ppermute(hi, axis_name,
                             [(i, i + 1) for i in range(n - 1)])
    from_right = lax.ppermute(lo, axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x_local, from_right], axis=axis)


def _depthwise_1d(x, k1, axis: int, pad: int):
    """Depthwise conv with a 1-D kernel along ``axis`` of NC*S, explicit
    ``pad`` on that axis, SAME(=0 for size-1 kernels) elsewhere."""
    ndim = x.ndim - 2
    c = x.shape[1]
    shape = [1] * ndim
    shape[axis - 2] = k1.shape[0]
    w = jnp.broadcast_to(k1.reshape(shape), (c, 1) + tuple(shape))
    pads = [(0, 0)] * ndim
    pads[axis - 2] = (pad, pad)
    dims = ("NCHW", "OIHW", "NCHW") if ndim == 2 else \
        ("NCDHW", "OIDHW", "NCDHW")
    return lax.conv_general_dilated(
        x, w, window_strides=(1,) * ndim, padding=pads,
        dimension_numbers=dims, feature_group_count=c,
        precision=lax.Precision.HIGHEST)


def sharded_gaussian_smooth(x, mesh: Mesh, sigma: float = 1.0,
                            kernel_size: int = 5, iters: int = 1):
    """``ops.conv.gaussian_smooth`` with the leading spatial axis sharded.

    Separable per-axis passes; only the sharded axis needs the halo
    exchange (width ``(k_eff-1)//2`` per pass, re-exchanged per iteration).
    Bit-matches the dense op: interior shard boundaries see true neighbour
    planes, global boundaries see the same zeros SAME padding produces.
    """
    ndim = x.ndim - 2
    assert ndim in (2, 3), f"expected NCHW or NCDHW, got {x.ndim}-D"
    ks = effective_gaussian_ks(kernel_size, sigma, ndim)
    halo = (ks - 1) // 2
    n_space = mesh.shape[_SPACE]
    d_loc = x.shape[2] // n_space
    assert x.shape[2] % n_space == 0, (
        f"leading spatial axis {x.shape[2]} not divisible by "
        f"space={n_space}")
    assert d_loc >= halo, (
        f"local extent {d_loc} < halo {halo}: use fewer 'space' shards")
    k1 = gaussian_kernel_1d(ks, sigma).astype(x.dtype)

    def local(xl):
        out = xl
        for _ in range(iters):
            out = _depthwise_1d(halo_exchange(out, halo, axis=2), k1,
                                axis=2, pad=0)
            for axis in range(3, 2 + ndim):
                out = _depthwise_1d(out, k1, axis=axis, pad=halo)
        return out

    spec = P(_DATA, None, _SPACE)
    return jax.shard_map(local, mesh=mesh, in_specs=spec,
                         out_specs=spec, check_vma=False)(x)


def sharded_grid_sample(x, grid, mesh: Mesh, mode: str = "bilinear",
                        padding_mode: str = "zeros",
                        align_corners: bool = True,
                        tile_order: str = "rows"):
    """``ops.grid_sample`` with grid/output sharded on the leading output
    spatial axis and batch on 'data'; the source volume is all-gathered
    along 'space' (warps are global — see module docstring).  Each shard
    runs the regular sampler dispatch locally — on TPU that is the Pallas
    kernel (``tile_order`` passes through)."""
    from advchain_tpu.ops.grid_sample import spatial_sampling

    ndim = x.ndim - 2
    assert ndim in (2, 3)
    n_space = mesh.shape[_SPACE]
    assert grid.shape[1] % n_space == 0, (
        f"grid leading output axis {grid.shape[1]} not divisible by "
        f"space={n_space}")

    def local(xl, gl):
        xf = lax.all_gather(xl, _SPACE, axis=2, tiled=True)
        with spatial_sampling(None):  # per-shard call: no re-routing
            return grid_sample(xf, gl, mode=mode, padding_mode=padding_mode,
                               align_corners=align_corners,
                               tile_order=tile_order)

    vspec = P(_DATA, None, _SPACE)
    gspec = P(_DATA, _SPACE)
    # check_vma=False: pallas_call (the TPU sampler under grid_sample)
    # cannot annotate varying-mesh-axes on its out ShapeDtypeStructs yet
    return jax.shard_map(local, mesh=mesh, in_specs=(vspec, gspec),
                         out_specs=vspec, check_vma=False)(x, grid)
