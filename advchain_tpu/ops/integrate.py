"""Diffeomorphic vector-field integration (scaling & squaring) and flow
composition, plus base sampling grids and Jacobian diagnostics.

Replicates reference advchain/augmentor/adv_morph.py:14-55 (base grid),
:101-113 (integrate_by_add), :116-177 (exponentiation 2D/3D), :179-202
(composition) and :57-98 (Jacobian determinant) with JAX-friendly control
flow: the 3D adaptive step-count growth (adv_morph.py:160-162, a
data-dependent Python while loop) becomes a closed-form step count plus a
bounded `lax.cond` ladder so the whole path stays jittable AND
reverse-differentiable (the PGD loop needs gradients through all 8+
nested grid-samples).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from .grid_sample import (_stencil_impl, _stencil_warp_2d_xla_fn,
                          _stencil_warp_3d_xla_fn, grid_sample_2d,
                          grid_sample_3d, stencil_warp_2d, stencil_warp_3d)

__all__ = ["base_grid", "compose_flow", "exponentiate_flow",
           "jacobian_determinant_2d"]

# static upper bound on extra squaring steps beyond the configured count;
# each extra step halves the field, so 8 extra covers ||duv|| up to 2^8/2
# larger than the configured budget — far beyond any sane deformation.
_MAX_EXTRA_STEPS = 8


def base_grid(batch_size: int, spatial_shape, dtype=jnp.float32):
    """Identity grid (N, d, *spatial), values in [-1, 1].

    Channel i varies along spatial axis (d-1-i): channel 0 ('x') along the
    last axis, matching reference get_base_grid (adv_morph.py:14-55), so a
    channel-last permute of this grid feeds grid_sample directly.
    """
    spatial_shape = tuple(int(s) for s in spatial_shape)
    d = len(spatial_shape)
    axes = [jnp.linspace(-1.0, 1.0, s, dtype=dtype) for s in spatial_shape]
    mesh = jnp.meshgrid(*axes, indexing="ij")  # list of (*spatial)
    # channel order: x = last spatial axis first
    chans = [mesh[d - 1 - i] for i in range(d)]
    grid = jnp.stack(chans, axis=0)[None]  # (1, d, *spatial)
    return jnp.broadcast_to(grid, (batch_size, d) + spatial_shape)


def _stencil_enabled() -> bool:
    """Trace-time gate: ADVCHAIN_STENCIL=0 pins compose_flow to the
    sampler kernels (set before building programs).  Also OFF under a
    spatial (data, space) mesh: the lax.cond predicate is a max over a
    spatially-sharded field, and GSPMD lowers the branches to different
    collective sequences per shard — devices that disagree on the
    predicate deadlock in rendezvous (observed on the virtual 8-device
    CPU mesh).  Spatially-sharded steps take the sampler path, whose
    shard_map wrappers are mesh-aware."""
    from .grid_sample import _SPATIAL_MESH
    if _SPATIAL_MESH is not None:
        return False
    return os.environ.get("ADVCHAIN_STENCIL", "1") != "0"


def compose_flow(flow1, flow2, stencil_radius: int | None = None):
    """h = f(g(x)): sample flow1 at the positions given by flow2.

    flow*: (N, d, *spatial) channel-first deformation grids in [-1, 1].
    border padding + align_corners=True (reference adv_morph.py:179-202).

    2D fast path: scaling-and-squaring displacements start at |duv|/2^n
    and double per step, so early self-compositions sample within 1-2 px
    of their own output pixel.  A runtime ``lax.cond`` on the measured
    max displacement routes those through ``stencil_warp_2d`` (static
    shifts + spatially-varying weights: fused VPU elementwise, no gather,
    no MXU) and everything else through the sampler kernels.  Both
    branches compute exact bilinear-with-border, so this is a pure perf
    dispatch — results are identical to f32 rounding for ANY input.

    ``stencil_radius`` overrides the stencil tier's radius (and its cond
    threshold) per call site: scaling-and-squaring passes a PER-STEP
    ladder (the step-k displacement is ~|duv|/2^(n-k), so late steps get
    a wider tier instead of falling off to the band kernels — see
    exponentiate_flow).  None = the default tier (2D: 2, 3D: 1).
    """
    d = flow1.shape[1]
    if d == 2:
        def band(f):
            # the minor-dim transpose lives INSIDE the sampler branch so
            # the stencil branch (which reads channel-first directly)
            # never pays for it (round-4 device trace: the shared
            # moveaxis copies cost ~5% of the headline episode)
            grid = jnp.moveaxis(flow2, 1, -1)
            out = grid_sample_2d(f, grid, mode="bilinear",
                                 padding_mode="border", align_corners=True)
            return out.astype(f.dtype)  # XLA path promotes bf16 storage
        if not (_stencil_enabled() and flow1.shape == flow2.shape):
            return band(flow1)
        radius = 2 if stencil_radius is None else int(stencil_radius)
        h, w = flow1.shape[2:]
        base = base_grid(1, (h, w), dtype=flow2.dtype)
        u = flow2 - base
        dpx = jnp.maximum(jnp.max(jnp.abs(u[:, 0])) * (0.5 * (w - 1)),
                          jnp.max(jnp.abs(u[:, 1])) * (0.5 * (h - 1)))
        # DEFAULT: the jnp formulation under jax.checkpoint (the
        # (2R+1)^2 weight planes would otherwise be saved per step for
        # the backward — ~115 MB/step at headline shapes -> OOM through
        # 8 nested compositions; they are cheap elementwise functions of
        # the grid, so recompute them).  Opt-in ADVCHAIN_STENCIL_IMPL=
        # pallas swaps in the kernels/stencil.py custom-VJP path (see
        # _stencil_impl for why it is not yet the default).
        # ONE cond tier only — a nested R=1/R=2 ladder fragmented the
        # episode program's HBM allocation past capacity (78% frag OOM).
        if _stencil_impl() == "pallas":
            stencil = stencil_warp_2d
        else:
            stencil = jax.checkpoint(_stencil_warp_2d_xla_fn,
                                     static_argnums=(2, 3))
        return lax.cond(
            dpx < float(radius) - 1e-3,
            lambda f: stencil(f, flow2, radius, "first"),
            band, flow1)

    def band3(f):
        grid = jnp.moveaxis(flow2, 1, -1)
        out = grid_sample_3d(f, grid, mode="bilinear",
                             padding_mode="border", align_corners=True)
        return out.astype(f.dtype)  # XLA path promotes bf16 storage
    if not (_stencil_enabled() and flow1.shape == flow2.shape):
        return band3(flow1)
    radius = 1 if stencil_radius is None else int(stencil_radius)
    dd, h, w = flow1.shape[2:]
    base = base_grid(1, (dd, h, w), dtype=flow2.dtype)
    u = flow2 - base
    dpx = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(u[:, 0])) * (0.5 * (w - 1)),
                    jnp.max(jnp.abs(u[:, 1])) * (0.5 * (h - 1))),
        jnp.max(jnp.abs(u[:, 2])) * (0.5 * (dd - 1)))
    # single R=1 tier: an R=2 ladder measured EXACTLY the same 3D episode
    # throughput (2.377 vs 2.378 vol/s) — the adaptive step growth keeps
    # most compositions sub-voxel already and the doubling sequence skips
    # the (1, 2) px window — so keep the simpler program.
    if _stencil_impl() == "pallas":
        stencil3 = stencil_warp_3d
    else:
        stencil3 = jax.checkpoint(_stencil_warp_3d_xla_fn,
                                  static_argnums=(2, 3))
    return lax.cond(dpx < float(radius) - 1e-3,
                    lambda f: stencil3(f, flow2, radius, "first"),
                    band3, flow1)


def _ss_ladder(spatial_dims: int):
    """Per-step stencil radii for the LAST scaling-and-squaring steps
    (trace-time; ADVCHAIN_SS_LADDER="4,8" overrides, "" disables).

    Step k's displacement is ~|duv|/2^(n-k): only the last 2-3 steps
    exceed the default stencil tier.  The hypothesis was that widening
    THEIR tier keeps chains off the gather path cheaply — but the VPU
    stencil scales as (2R+1)^2 taps (R=4: 81, R=8: 289) plus VJPs, and
    MEASURED on the headline episode the (4, 8) ladder is a large LOSS:
    158 img/s vs 208 with no ladder (2026-08-21, batch 128; the band
    fallback's one MXU sweep beats a 289-tap VPU neighborhood).  Default
    is therefore NO ladder in both 2D and 3D; ADVCHAIN_SS_LADDER stays
    as the A/B override that produced the measurement."""
    ov = os.environ.get("ADVCHAIN_SS_LADDER")
    if ov is not None:
        return tuple(int(r) for r in ov.split(",") if r.strip())
    return ()


def exponentiate_flow(duv, nb_steps: int = 8, method: str = "ss",
                      adaptive: bool = False):
    """Vector-field exponentiation; returns the integrated *offset* field.

    duv: (N, d, *spatial) velocity field.  'ss' = scaling and squaring
    (Vercauteren diffeomorphic demons).  With ``adaptive=True`` (the 3D
    reference path) the step count grows until ||duv / 2^n||_F <= 0.5;
    here that is the closed form n = max(nb_steps, ceil(log2(||duv||/0.5)))
    with a static ladder of `lax.cond` squarings so it stays jittable.
    """
    d = duv.shape[1]
    spatial = duv.shape[2:]
    grid = base_grid(duv.shape[0], spatial, dtype=duv.dtype)
    # ADVCHAIN_FLOW_STORAGE=bf16 (trace-time A/B experiment, round-4
    # verdict item 4): carry the intermediate scaling-and-squaring flows
    # in bf16 between steps (compute stays f32 — all sampler paths
    # promote).  REJECTED as a default: measured parity cost 5.8 px at
    # 192 (bf16's 2^-9 absolute quantum near the grid corners compounds
    # through 8 compositions) for a throughput change recorded in
    # PARITY.md; the device trace shows the ss chain is sweep/VPU-bound,
    # not HBM-bound, so the byte saving does not buy time.  The knob
    # remains for A/B reproduction only.
    store = (jnp.bfloat16 if os.environ.get("ADVCHAIN_FLOW_STORAGE")
             == "bf16" else None)

    def _st(p):
        return p.astype(store) if store is not None else p

    # PARITY QUIRK (reference adv_morph.py:101-113,129-143): integrate_by_add
    # mutates the base grid IN PLACE, so the final `phi - grid_wh` subtracts
    # the MUTATED grid = grid + duv/2^n.  The returned "offset" is therefore
    # phi_final - (grid + duv/2^n), replicated here as `phi - phi0`.
    if method == "ss":
        if not adaptive:
            ladder = _ss_ladder(d)
            phi0 = grid + duv / (2.0 ** nb_steps)
            phi = _st(phi0)
            if not ladder and _stencil_impl() == "pallas":
                # kernel-path only: lax.scan traces the squaring ONCE,
                # so the program carries one stencil fwd kernel + one
                # bwd kernel instead of nb_steps copies (the unrolled
                # form crashes the remote TPU compiler at 16 kernel
                # instances).  The DEFAULT path stays UNROLLED — scan
                # blocks XLA's cross-step fusion there (measured 212 ->
                # 178 img/s on the headline).
                def _square(p, _):
                    return _st(compose_flow(p, p)), None

                phi, _ = lax.scan(_square, phi, None, length=nb_steps)
            else:
                for i in range(nb_steps):
                    li = i - (nb_steps - len(ladder))  # ladder index
                    r = ladder[li] if li >= 0 else None
                    phi = _st(compose_flow(phi, phi, stencil_radius=r))
            return phi.astype(duv.dtype) - phi0
        norm = jnp.linalg.norm(duv.reshape(-1))
        needed = jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / 0.5))
        n_dyn = jnp.maximum(jnp.int32(nb_steps), needed.astype(jnp.int32))
        n_dyn = jnp.minimum(n_dyn, jnp.int32(nb_steps + _MAX_EXTRA_STEPS))
        phi0 = grid + duv * jnp.exp2(-n_dyn.astype(duv.dtype))
        phi = _st(phi0)
        for i in range(nb_steps + _MAX_EXTRA_STEPS):
            phi = lax.cond(i < n_dyn, lambda p: _st(compose_flow(p, p)),
                           lambda p: p, phi)
        return phi.astype(duv.dtype) - phi0

    if method == "euler":
        # reference 2D euler: nb_steps compositions of the interval flow
        # (adv_morph.py:137-141); the 3D euler path crashes upstream
        # (range(2.0**n), adv_morph.py:172) — here fixed to int(2**n).
        phi0 = grid + duv / (2.0 ** nb_steps)
        phi = phi0
        interval_phi = phi0
        count = nb_steps if d == 2 else int(2 ** nb_steps)
        def body(_, p):
            return compose_flow(interval_phi, p)
        phi = lax.fori_loop(0, count, body, phi)
        return phi - phi0

    raise NotImplementedError(f"integration method {method!r}")


def _central_diff(images, axis: int):
    """Central difference with forward/backward at the borders
    (reference calculate_image_diff, adv_morph.py:57-76)."""
    fwd = jnp.take(images, jnp.arange(1, images.shape[axis]), axis=axis) - \
        jnp.take(images, jnp.arange(0, images.shape[axis] - 1), axis=axis)
    first = lax.index_in_dim(fwd, 0, axis=axis, keepdims=True)
    last = lax.index_in_dim(fwd, fwd.shape[axis] - 1, axis=axis, keepdims=True)
    n = images.shape[axis]
    mid = 0.5 * (jnp.take(images, jnp.arange(2, n), axis=axis)
                 - jnp.take(images, jnp.arange(0, n - 2), axis=axis))
    return jnp.concatenate([first, mid, last], axis=axis)


def jacobian_determinant_2d(displacement):
    """det J for a batch of 2-D displacement fields (N, 2, H, W) ->
    (N, 1, H, W); det = (1+dxx)(1+dyy) - dxy*dyx (adv_morph.py:79-98)."""
    assert displacement.ndim == 4 and displacement.shape[1] == 2
    dx = displacement[:, 0:1]
    dy = displacement[:, 1:2]
    dxx = _central_diff(dx, axis=3)
    dxy = _central_diff(dx, axis=2)
    dyx = _central_diff(dy, axis=3)
    dyy = _central_diff(dy, axis=2)
    return (1.0 + dxx) * (1.0 + dyy) - dxy * dyx
