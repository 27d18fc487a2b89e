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
    "chain_displacement_bound",
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


def _sin_cap(frac_of_pi: float) -> float:
    """sin of ``frac_of_pi``*pi, capped at 1 (angles past 90 deg)."""
    return float(np.sin(min(abs(frac_of_pi), 0.5) * np.pi))


def chain_displacement_bound(transforms) -> Optional[float]:
    """STATIC per-warp displacement bound (normalized grid units, where
    the full axis extent is 2.0) over a chain's geometric warps, derived
    from the transform configs alone — the lever that lets
    ``sharded_grid_sample`` exchange halo bands instead of all-gathering
    (VERDICT r4 weak #3).

    Every individual warp the chain traces (forward, inverse, prediction,
    mask roundtrips, and morph's scaling-and-squaring compositions whose
    intermediate displacement never exceeds the final |duv|) samples
    within its OWN transform's bound, so the chain-level bound is the max:

    * AdvMorph: |duv|_inf <= epsilon (the latent is unit-l2-normalised so
      per-element <= 1; Gaussian smoothing and bilinear upsampling cannot
      raise the max; scaling-and-squaring at most doubles per step from
      duv/2^n; grids clamp to [-1, 1]) -> min(epsilon, 2).
    * AdvAffine: |R C x + t - x| bounded via |RCx - Cx|_2 + |Cx - x| + |t|
      with the scale factor taken as the larger of forward (1+s) and
      inverse (1/(1-s)) — safe for both warp directions.

    Returns None when any geometric transform is unrecognised (caller
    falls back to the all-gather path)."""
    bound = 0.0
    for t in transforms:
        if not getattr(t, "is_geometric", lambda: 0)():
            continue
        name = getattr(t, "get_name", lambda: "")()
        if name == "morph":
            bound = max(bound, min(float(t.epsilon), 2.0))
        elif name == "affine":
            if t.spatial_dims == 2:
                rots = [getattr(t, "rot_ratio", 0.0)]
                scales = [getattr(t, "scale_x", 0.0),
                          getattr(t, "scale_y", 0.0)]
                shifts = [getattr(t, "translation_x", 0.0),
                          getattr(t, "translation_y", 0.0)]
                sdim = np.sqrt(2.0)
            else:
                rots = [getattr(t, "rot_x", 0.0), getattr(t, "rot_y", 0.0),
                        getattr(t, "rot_z", 0.0)]
                scales = [getattr(t, "scale_x", 0.0),
                          getattr(t, "scale_y", 0.0),
                          getattr(t, "scale_z", 0.0)]
                shifts = [getattr(t, "translation_x", 0.0),
                          getattr(t, "translation_y", 0.0),
                          getattr(t, "translation_z", 0.0)]
                sdim = np.sqrt(3.0)
            s = max(abs(float(v)) for v in scales)
            if s >= 1.0:
                return None  # inverse scale unbounded
            shift = max(abs(float(v)) for v in shifts)
            # |Rx - x|_2 <= sum_i 2 sin(theta_i / 2) * |x|_2
            rot_l2 = sum(2.0 * _sin_cap(abs(float(r)) / 2.0) for r in rots)
            f = max(1.0 + s, 1.0 / (1.0 - s))  # fwd vs inverse scaling
            bound = max(bound, sdim * f * rot_l2 + f * (s + shift))
        else:
            return None  # unknown geometric transform: no static bound
    return bound


def _halo_planes(max_disp: float, size: int) -> int:
    """Halo width (planes) for a normalized displacement bound on an
    align_corners=True axis of ``size`` planes: the farthest sample is
    ``max_disp * (size-1)/2`` planes away and its +1 bilinear tap one
    more."""
    return int(np.ceil(max_disp * 0.5 * (size - 1))) + 1


def sharded_grid_sample(x, grid, mesh: Mesh, mode: str = "bilinear",
                        padding_mode: str = "zeros",
                        align_corners: bool = True,
                        tile_order: str = "rows",
                        max_disp: Optional[float] = None):
    """``ops.grid_sample`` with grid/output sharded on the leading output
    spatial axis and batch on 'data'.

    Source exchange strategy (the point of spatial sharding is per-device
    memory headroom, VERDICT r4 weak #3):

    * ``max_disp`` given (a STATIC normalized displacement bound, e.g.
      from ``chain_displacement_bound``) and the implied halo fits inside
      one shard: exchange only neighbour halo bands (``halo_exchange``
      over ICI) and sample from the local slab — per-device live source
      is ``d_loc + 2*halo`` planes instead of the whole volume.  Requires
      align_corners=True and an output whose sharded axis matches the
      source's (same plane indexing).
    * otherwise: all-gather the full source along 'space' (warps are
      global in general — an affine rotation may move any output plane
      anywhere).

    Each shard runs the regular sampler dispatch locally — on TPU that is
    the Pallas kernel (``tile_order`` passes through)."""
    from advchain_tpu.ops.grid_sample import _prep_coord, spatial_sampling

    ndim = x.ndim - 2
    assert ndim in (2, 3)
    n_space = mesh.shape[_SPACE]
    assert grid.shape[1] % n_space == 0, (
        f"grid leading output axis {grid.shape[1]} not divisible by "
        f"space={n_space}")

    size0 = x.shape[2]
    d_loc = size0 // n_space
    halo = None
    if (max_disp is not None and align_corners
            and grid.shape[1] == size0 and n_space > 1):
        hp = _halo_planes(float(max_disp), size0)
        # halo_exchange reaches immediate neighbours only
        if hp < d_loc:
            halo = hp

    if halo is None:
        def local(xl, gl):
            xf = lax.all_gather(xl, _SPACE, axis=2, tiled=True)
            with spatial_sampling(None):  # per-shard call: no re-routing
                return grid_sample(xf, gl, mode=mode,
                                   padding_mode=padding_mode,
                                   align_corners=align_corners,
                                   tile_order=tile_order)
    else:
        zch = ndim - 1  # grid channel indexing the sharded axis (y or z)
        slab = d_loc + 2 * halo

        def local(xl, gl):
            idx = lax.axis_index(_SPACE)
            xh = halo_exchange(xl, halo, axis=2)  # zeros at global edges
            gz = gl[..., zch]
            # global pixel coordinate WITH the padding transform applied
            # globally (border clip / reflection fold); the local sampler
            # re-applies it on in-slab coordinates where it is the
            # identity.  zeros: out-of-global-range samples either hit
            # the zero-filled edge halos (dense parity: 0 contributions)
            # or stay out of the slab and are zeroed locally.
            pix = _prep_coord(gz, size0, True, padding_mode)
            off = (idx * d_loc - halo).astype(pix.dtype)
            gz_l = (pix - off) / (0.5 * (slab - 1)) - 1.0
            gl2 = jnp.concatenate(
                [gl[..., :zch], gz_l[..., None], gl[..., zch + 1:]],
                axis=-1)
            with spatial_sampling(None):
                return grid_sample(xh, gl2, mode=mode,
                                   padding_mode=padding_mode,
                                   align_corners=align_corners,
                                   tile_order=tile_order)

    vspec = P(_DATA, None, _SPACE)
    gspec = P(_DATA, _SPACE)
    # check_vma=False: pallas_call (the TPU sampler under grid_sample)
    # cannot annotate varying-mesh-axes on its out ShapeDtypeStructs yet
    return jax.shard_map(local, mesh=mesh, in_specs=(vspec, gspec),
                         out_specs=vspec, check_vma=False)(x, grid)
