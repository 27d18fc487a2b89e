"""Batched differentiable grid sampling (2D bilinear / 3D trilinear / nearest).

TPU-native replacement for the cuDNN-backed ``torch.nn.functional.grid_sample``
the reference leans on everywhere (reference: advchain/augmentor/adv_affine.py:303-313,
advchain/augmentor/adv_morph.py:546-557, adv_morph.py:179-202).  Semantics match
PyTorch exactly (validated against torch CPU in tests/test_ops_parity.py and
tests/test_kernels.py):

* ``align_corners=True``: grid value -1/+1 maps to the *centers* of the corner
  pixels, i.e. unnormalized coordinate ``(g + 1) / 2 * (size - 1)``.
* ``align_corners=False``: -1/+1 maps to the outer edges,
  ``((g + 1) * size - 1) / 2``.
* padding modes ``zeros`` / ``border`` / ``reflection`` (torch reflect rules).
* gradients flow to BOTH the input and the grid (the adversarial chain
  optimises deformation/affine parameters *through* the sampler).

Implementation notes (XLA-first):
  the gather is expressed as ``jnp.take_along_axis`` over the flattened
  spatial axis, which XLA lowers to a single dynamic-gather that tiles well on
  TPU; the 4 (resp. 8) corner contributions are fused elementwise by XLA.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "grid_sample_2d", "grid_sample_3d"]


def _unnormalize(coord, size: int, align_corners: bool):
    """[-1, 1] -> pixel coordinate, torch grid_sampler convention."""
    size = float(size)
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1.0)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord, size: int, align_corners: bool):
    """Reflect out-of-range pixel coordinates, matching torch `reflect_coordinates`.

    For align_corners=True the reflection window is [0, size-1]; otherwise
    [-0.5, size-0.5].
    """
    if align_corners:
        low, high = 0.0, float(size - 1)
    else:
        low, high = -0.5, float(size) - 0.5
    span = high - low
    if span <= 0:
        return jnp.zeros_like(coord)
    # fold into [low, low + 2*span) then reflect the upper half
    x = jnp.abs(coord - low)
    x = jnp.mod(x, 2.0 * span)
    x = jnp.where(x > span, 2.0 * span - x, x)
    return x + low


def _prep_coord(g, size: int, align_corners: bool, padding_mode: str):
    """Returns pixel-space coordinate, transformed per padding mode."""
    ix = _unnormalize(g, size, align_corners)
    if padding_mode == "reflection":
        ix = _reflect(ix, size, align_corners)
        # torch additionally clips reflected coords into bounds
        ix = jnp.clip(ix, 0.0, float(size - 1))
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0.0, float(size - 1))
    return ix


def _gather_nd(x_flat, idx_flat):
    """x_flat: (N, C, S); idx_flat: (N, P) int32 -> (N, C, P)."""
    n, c, _ = x_flat.shape
    idx = jnp.broadcast_to(idx_flat[:, None, :], (n, c, idx_flat.shape[-1]))
    return jnp.take_along_axis(x_flat, idx, axis=2)


def _on_tpu_device() -> bool:
    """True when computations target a TPU: honors jax_default_device (the
    test suite pins CPU while the axon plugin makes 'tpu' the default
    backend)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


_FORCE_IMPL = None  # 'xla' | 'pallas' | None; see force_impl()
_SPATIAL_MESH = None  # a ('data', 'space') Mesh; see spatial_sampling()
_SPATIAL_MAX_DISP = None  # static displacement bound for the halo path


@contextlib.contextmanager
def force_impl(impl):
    """Force the sampler implementation ('xla' | 'pallas') while tracing.

    Takes precedence over ADVCHAIN_GRID_SAMPLE_IMPL.  The dispatch happens
    OUTSIDE the per-impl jit caches, so traces under different impls never
    alias.
    """
    global _FORCE_IMPL
    assert impl in ("xla", "pallas", None), impl
    prev, _FORCE_IMPL = _FORCE_IMPL, impl
    try:
        yield
    finally:
        _FORCE_IMPL = prev


@contextlib.contextmanager
def spatial_sampling(mesh, max_disp=None):
    """Route grid_sample through the shard_map spatial wrapper while tracing.

    Under a ('data', 'space') mesh a bare pallas_call has no SPMD
    partitioning rule, so a GSPMD-partitioned program would either fall off
    the Pallas path or replicate the call.  Inside this context every
    bilinear grid_sample whose shapes divide the 'space' axis is traced as
    ``parallel.spatial.sharded_grid_sample`` — an explicit shard_map that
    exchanges the source over ICI and runs the Pallas sampler PER SHARD
    (grid/output stay sharded).  Non-dividing calls fall back to the XLA
    sampler, which GSPMD partitions natively.  Pass ``mesh=None`` to
    suppress routing (used inside the wrapper itself to avoid recursion).

    ``max_disp``: optional STATIC bound (normalized grid units; see
    ``parallel.spatial.chain_displacement_bound``) on every routed warp's
    displacement |sample - output position|.  When the implied halo is
    smaller than a shard, sharded_grid_sample exchanges only neighbour
    halo bands instead of all-gathering the full source volume — the
    memory lever spatial sharding exists for.  None = always all-gather.
    """
    global _SPATIAL_MESH, _SPATIAL_MAX_DISP
    prev = (_SPATIAL_MESH, _SPATIAL_MAX_DISP)
    _SPATIAL_MESH, _SPATIAL_MAX_DISP = mesh, max_disp
    try:
        yield
    finally:
        _SPATIAL_MESH, _SPATIAL_MAX_DISP = prev


def _spatial_route(x, grid):
    """(mesh, max_disp) when this call can ride the shard_map wrapper
    (leading output/source spatial axes divide |space|), else None."""
    mesh = _SPATIAL_MESH
    if mesh is None:
        return None
    n_space = mesh.shape.get("space", 1)
    if n_space <= 1:
        return None
    if x.shape[2] % n_space or grid.shape[1] % n_space:
        return None
    return mesh


def _use_pallas() -> bool:
    """Route bilinear/trilinear sampling through the Pallas gather-matmul
    kernels on TPU (XLA's TPU gather is ~3-10x slower for these patterns;
    see kernels/gather_matmul.py).  Override with ADVCHAIN_GRID_SAMPLE_IMPL
    = 'xla' | 'pallas' (or force_impl() while tracing)."""
    import os
    impl = _FORCE_IMPL or os.environ.get("ADVCHAIN_GRID_SAMPLE_IMPL", "auto")
    if impl == "xla":
        return False
    if impl == "pallas":
        return True
    return _on_tpu_device()


def _stencil_impl() -> str:
    """Stencil-warp implementation selector (trace-time):

    * ``'xla'`` (DEFAULT) — the original jnp formulation, differentiated
      by autodiff under jax.checkpoint.
    * ``'pallas'`` (ADVCHAIN_STENCIL_IMPL=pallas, opt-in) — the
      kernels/stencil.py VMEM-resident kernels with the analytic custom
      VJP: scaling-and-squaring fwd+bwd measured 89.5 -> 60.8 ms at the
      headline shapes (batch 128) standalone, but the FULL fused episode
      then crashes the remote TPU compile helper (subprocess exit 1, no
      diagnostic, reproducible at every <=64 chunk size) — so the default
      stays XLA until the toolchain can host it.  CPU tests drive the
      kernel path in interpret mode via this knob."""
    import os
    return os.environ.get("ADVCHAIN_STENCIL_IMPL", "xla")


def _stencil_pallas_ok(h: int, w: int, radius: int) -> bool:
    """Kernel-path eligibility: the roll-based taps need the frame's
    zero row margin to cover 2R (guaranteed for 8-multiple heights;
    tiny odd shapes fall back to the XLA formulation)."""
    margin_ok = ((-(-(h + 2 * radius) // 8) * 8) - (-(-h // 8) * 8)
                 >= 2 * radius)
    return margin_ok and _stencil_impl() == "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stencil_warp_2d(img, grid, radius: int, grid_layout: str = "last"):
    """Bilinear warp (border padding, align_corners=True) specialized for
    near-identity grids: every sample must lie within ``radius`` pixels of
    its own output pixel (the CALLER guarantees this — see
    ops/integrate.py::compose_flow's lax.cond dispatch).

    Under that bound the gather degenerates to (2*radius+1)^2 STATIC
    shifts of the image with spatially-varying bilinear weights — pure
    fused elementwise VPU work, no gather and no MXU.  This is the fast
    path for morph's scaling-and-squaring self-compositions (reference
    adv_morph.py:116-144), whose displacement doubles from |duv|/2^n per
    step: the first ~half of the steps are sub-pixel.  Math is exactly
    bilinear-with-border-clamp, so results match grid_sample_2d(...,
    padding_mode='border') to f32 rounding.

    Gradients flow through an ANALYTIC custom VJP (_stencil_warp_2d_bwd):
    autodiff through the (2R+1)^2 where-chains recomputed the weight
    selects once per derivative path (measured 4.6x the forward cost per
    scaling-and-squaring step); the analytic backward shares one tap
    sweep between d_img and the two weight-derivative contractions.
    Residuals are just (img, grid), so callers need no jax.checkpoint.

    ``grid_layout``: 'last' = (N, H, W, 2) torch convention; 'first' =
    (N, 2, H, W) channel-first flow, sparing the caller a minor-dim
    transpose (device trace: the moveaxis copies cost ~5% of the headline
    episode when both cond branches shared one channel-last grid).
    """
    n, c, h, w = img.shape
    R = int(radius)
    if _stencil_pallas_ok(h, w, R):
        from advchain_tpu.kernels.stencil import stencil_fwd_2d_pallas
        g2 = grid if grid_layout == "first" else jnp.moveaxis(grid, -1, 1)
        imgp = jnp.pad(img, ((0, 0), (0, 0), (R, R), (R, R)), mode="edge")
        return stencil_fwd_2d_pallas(imgp, g2, R).astype(img.dtype)
    return _stencil_warp_2d_xla_fn(img, grid, radius, grid_layout)


def _stencil_warp_2d_xla_fn(img, grid, radius: int,
                            grid_layout: str = "last"):
    """The plain-jnp stencil warp (autodiff-able) — compose_flow's
    DEFAULT under jax.checkpoint (see _stencil_impl)."""
    n, c, h, w = img.shape
    R = int(radius)
    # coordinate/weight math in f32 regardless of img.dtype: in bf16 the
    # pixel-coordinate error is up to ~h*2^-9 px (~0.4 px at h=192), which
    # silently breaks the caller-guaranteed radius bound and drops weight
    # mass; accumulate in f32, cast back at the end (advisor round-3)
    f = jnp.promote_types(img.dtype, jnp.float32)
    if grid_layout == "first":
        gx, gy = grid[:, 0], grid[:, 1]
    else:
        gx, gy = grid[..., 0], grid[..., 1]
    xpix = (gx.astype(f) + 1.0) * 0.5 * (w - 1)  # (N, Ho=H, Wo=W)
    ypix = (gy.astype(f) + 1.0) * 0.5 * (h - 1)
    y0 = jnp.floor(ypix)
    x0 = jnp.floor(xpix)
    fy = ypix - y0
    fx = xpix - x0
    iy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    dy = y0.astype(jnp.int32) - iy  # in [-radius, radius-1] by the bound
    dx = x0.astype(jnp.int32) - ix
    R = int(radius)
    imgp = jnp.pad(img, ((0, 0), (0, 0), (R, R), (R, R)), mode="edge")
    one = jnp.ones((), f)
    zero = jnp.zeros((), f)
    # tap row i+r gets weight (1-fy) where y0==i+r plus fy where y0+1==i+r;
    # border clamp == edge-replicated halo because taps stay within R of i.
    wys = [jnp.where(dy == r, one - fy, zero) + jnp.where(dy == r - 1, fy,
                                                          zero)
           for r in range(-R, R + 1)]
    wxs = [jnp.where(dx == s, one - fx, zero) + jnp.where(dx == s - 1, fx,
                                                          zero)
           for s in range(-R, R + 1)]
    # separable accumulation: sum_s wx_s * tap first, then one wy_r
    # multiply per row — (2R+1)^2 + (2R+1) multiplies per output instead
    # of 2*(2R+1)^2
    out = jnp.zeros((n, c, h, w), f)
    for r in range(-R, R + 1):
        inner = jnp.zeros((n, c, h, w), f)
        for s in range(-R, R + 1):
            tap = imgp[:, :, R + r:R + r + h, R + s:R + s + w]
            inner = inner + wxs[s + R][:, None] * tap.astype(f)
        out = out + wys[r + R][:, None] * inner
    return out.astype(img.dtype)


def _stencil_warp_2d_fwd(img, grid, radius: int, grid_layout: str):
    return stencil_warp_2d(img, grid, radius, grid_layout), (img, grid)


def _stencil_warp_2d_bwd(radius: int, grid_layout: str, res, g):
    """Analytic VJP.  Weight factorization: out = Σ_r wy_r · inner_r with
    inner_r = Σ_s wx_s · tap_{r,s}, and dwy_r/dfy = 1[dy==r-1] − 1[dy==r]
    (dwx likewise), so ONE sweep over the (2R+1)^2 taps yields both
    inner_r and dinner_r (= Σ_s dwx_s · tap); d_img is the transposed
    stencil — wy_r·wx_s·g accumulated at the shifted position — with the
    edge-replicated halo folded back onto the border pixels (the exact
    transpose of mode='edge' padding)."""
    img, grid = res
    n, c, h, w = img.shape
    R = int(radius)
    if _stencil_pallas_ok(h, w, R):
        from advchain_tpu.kernels.stencil import stencil_bwd_2d_pallas
        g2 = grid if grid_layout == "first" else jnp.moveaxis(grid, -1, 1)
        imgp = jnp.pad(img, ((0, 0), (0, 0), (R, R), (R, R)), mode="edge")
        d_imgp, d_fy, d_fx = stencil_bwd_2d_pallas(imgp, g2, g, R)
        # fold the edge-replicated halo (rows, then cols — 'edge'
        # corners replicate the corner pixel, so the folds compose)
        dr = d_imgp[:, :, R:R + h, :]
        dr = dr.at[:, :, 0, :].add(jnp.sum(d_imgp[:, :, :R, :], axis=2))
        dr = dr.at[:, :, h - 1, :].add(
            jnp.sum(d_imgp[:, :, R + h:, :], axis=2))
        d_img = dr[:, :, :, R:R + w]
        d_img = d_img.at[:, :, :, 0].add(jnp.sum(dr[:, :, :, :R], axis=3))
        d_img = d_img.at[:, :, :, w - 1].add(
            jnp.sum(dr[:, :, :, R + w:], axis=3))
        d_gx = d_fx * (0.5 * (w - 1))
        d_gy = d_fy * (0.5 * (h - 1))
        if grid_layout == "first":
            d_grid = jnp.stack([d_gx, d_gy], axis=1)
        else:
            d_grid = jnp.stack([d_gx, d_gy], axis=-1)
        return d_img.astype(img.dtype), d_grid.astype(grid.dtype)
    f = jnp.promote_types(img.dtype, jnp.float32)
    if grid_layout == "first":
        gx, gy = grid[:, 0], grid[:, 1]
    else:
        gx, gy = grid[..., 0], grid[..., 1]
    xpix = (gx.astype(f) + 1.0) * 0.5 * (w - 1)
    ypix = (gy.astype(f) + 1.0) * 0.5 * (h - 1)
    y0 = jnp.floor(ypix)
    x0 = jnp.floor(xpix)
    fy = ypix - y0
    fx = xpix - x0
    iy = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    dy = y0.astype(jnp.int32) - iy
    dx = x0.astype(jnp.int32) - ix
    R = int(radius)
    imgp = jnp.pad(img, ((0, 0), (0, 0), (R, R), (R, R)), mode="edge")
    one = jnp.ones((), f)
    zero = jnp.zeros((), f)
    wys = [jnp.where(dy == r, one - fy, zero)
           + jnp.where(dy == r - 1, fy, zero) for r in range(-R, R + 1)]
    dwys = [jnp.where(dy == r - 1, one, zero)
            - jnp.where(dy == r, one, zero) for r in range(-R, R + 1)]
    wxs = [jnp.where(dx == s, one - fx, zero)
           + jnp.where(dx == s - 1, fx, zero) for s in range(-R, R + 1)]
    dwxs = [jnp.where(dx == s - 1, one, zero)
            - jnp.where(dx == s, one, zero) for s in range(-R, R + 1)]
    gf = g.astype(f)

    d_fy = jnp.zeros((n, h, w), f)
    d_fx = jnp.zeros((n, h, w), f)
    d_imgp = jnp.zeros((n, c, h + 2 * R, w + 2 * R), f)
    for r in range(-R, R + 1):
        inner = jnp.zeros((n, c, h, w), f)
        dinner = jnp.zeros((n, c, h, w), f)
        for s in range(-R, R + 1):
            tap = imgp[:, :, R + r:R + r + h, R + s:R + s + w].astype(f)
            inner = inner + wxs[s + R][:, None] * tap
            dinner = dinner + dwxs[s + R][:, None] * tap
            # transposed stencil: wy_r·wx_s·g placed at offset (r, s) via
            # zero-PADDING, not .at[].add — dynamic-update-slices
            # serialize as full-buffer copies, while a sum of pads fuses
            # into one elementwise pass over the 25 taps
            t = (wys[r + R] * wxs[s + R])[:, None] * gf
            d_imgp = d_imgp + jnp.pad(
                t, ((0, 0), (0, 0), (R + r, R - r), (R + s, R - s)))
        gsum = jnp.sum(gf * inner, axis=1)  # Σ_c g·inner_r
        d_fy = d_fy + dwys[r + R] * gsum
        d_fx = d_fx + wys[r + R] * jnp.sum(gf * dinner, axis=1)

    # fold the edge-replicated halo back onto the border (rows, then cols
    # — 'edge' corners replicate the corner pixel, so the two folds
    # compose exactly)
    dr = d_imgp[:, :, R:R + h, :]
    dr = dr.at[:, :, 0, :].add(jnp.sum(d_imgp[:, :, :R, :], axis=2))
    dr = dr.at[:, :, h - 1, :].add(jnp.sum(d_imgp[:, :, R + h:, :], axis=2))
    d_img = dr[:, :, :, R:R + w]
    d_img = d_img.at[:, :, :, 0].add(jnp.sum(dr[:, :, :, :R], axis=3))
    d_img = d_img.at[:, :, :, w - 1].add(jnp.sum(dr[:, :, :, R + w:],
                                                 axis=3))

    d_gx = d_fx * (0.5 * (w - 1))
    d_gy = d_fy * (0.5 * (h - 1))
    if grid_layout == "first":
        d_grid = jnp.stack([d_gx, d_gy], axis=1)
    else:
        d_grid = jnp.stack([d_gx, d_gy], axis=-1)
    return d_img.astype(img.dtype), d_grid.astype(grid.dtype)


stencil_warp_2d.defvjp(_stencil_warp_2d_fwd, _stencil_warp_2d_bwd)


def grid_sample_2d(x, grid, mode: str = "bilinear", padding_mode: str = "zeros",
                   align_corners: bool = True, tile_order: str = "rows"):
    """Sample ``x`` (N, C, H, W) at ``grid`` (N, Ho, Wo, 2); grid[..., 0]=x (W axis).

    Matches ``torch.nn.functional.grid_sample`` bit-for-bit up to float32
    rounding (<1e-6 in tests).  Impl dispatch (pallas vs XLA) happens here,
    outside the jitted impls, so the jit caches never alias across impls.

    ``tile_order`` is a Pallas-path perf hint ('rows' | 'blocks'): pass
    'blocks' for warps with large rotation/shear (affine) where a row-major
    output tile's source band degenerates; ignored by the XLA impl.
    """
    n, c, h, w = x.shape
    _, ho, wo, two = grid.shape
    assert two == 2, f"2D grid last dim must be 2, got {two}"
    if mode == "bilinear":
        mesh = _spatial_route(x, grid)
        if mesh is not None:
            from advchain_tpu.parallel.spatial import sharded_grid_sample
            return sharded_grid_sample(x, grid, mesh, mode=mode,
                                       padding_mode=padding_mode,
                                       align_corners=align_corners,
                                       tile_order=tile_order,
                                       max_disp=_SPATIAL_MAX_DISP)
        if _SPATIAL_MESH is not None:
            # under a space mesh but shapes don't divide: XLA partitions
            # its own gather; a pallas_call would be replicated
            return _grid_sample_2d_xla(x, grid, mode, padding_mode,
                                       align_corners)
        if _use_pallas():
            from advchain_tpu.kernels.gather_matmul import \
                grid_sample_2d_pallas
            return grid_sample_2d_pallas(x, grid, padding_mode=padding_mode,
                                         align_corners=align_corners,
                                         tile_order=tile_order)
    elif mode == "nearest" and _SPATIAL_MESH is None and _use_pallas():
        # nearest is a single unit-weight tap on the same band kernels —
        # without this, nearest-interp configs (a legal reference setting,
        # adv_affine.py:79-82) land on XLA's pathological TPU gather
        from advchain_tpu.kernels.gather_matmul import \
            grid_sample_2d_pallas_nearest
        return grid_sample_2d_pallas_nearest(
            x, grid, padding_mode=padding_mode,
            align_corners=align_corners, tile_order=tile_order)
    return _grid_sample_2d_xla(x, grid, mode, padding_mode, align_corners)


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode",
                                             "align_corners"))
def _grid_sample_2d_xla(x, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True):
    n, c, h, w = x.shape
    _, ho, wo, _ = grid.shape
    compute_dtype = jnp.promote_types(x.dtype, grid.dtype)
    gx = grid[..., 0].astype(compute_dtype).reshape(n, ho * wo)
    gy = grid[..., 1].astype(compute_dtype).reshape(n, ho * wo)

    ix = _prep_coord(gx, w, align_corners, padding_mode)
    iy = _prep_coord(gy, h, align_corners, padding_mode)

    x_flat = x.astype(compute_dtype).reshape(n, c, h * w)

    if mode == "nearest":
        # torch uses round-half-to-even (std::nearbyint); jnp.round matches.
        ix_n = jnp.round(ix)
        iy_n = jnp.round(iy)
        inb = (ix_n >= 0) & (ix_n <= w - 1) & (iy_n >= 0) & (iy_n <= h - 1)
        ixc = jnp.clip(ix_n, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_n, 0, h - 1).astype(jnp.int32)
        vals = _gather_nd(x_flat, iyc * w + ixc)
        if padding_mode == "zeros":
            vals = vals * inb[:, None, :].astype(compute_dtype)
        return vals.reshape(n, c, ho, wo).astype(x.dtype)

    if mode != "bilinear":
        raise NotImplementedError(f"mode={mode!r}; only bilinear/nearest supported")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    out = None
    for xi, wxi in ((x0, wx0), (x1, wx1)):
        for yi, wyi in ((y0, wy0), (y1, wy1)):
            wgt = wxi * wyi
            if padding_mode == "zeros":
                inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                wgt = wgt * inb.astype(compute_dtype)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            v = _gather_nd(x_flat, yc * w + xc)
            contrib = v * wgt[:, None, :]
            out = contrib if out is None else out + contrib
    return out.reshape(n, c, ho, wo).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def stencil_warp_3d(img, grid, radius: int, grid_layout: str = "last"):
    """Trilinear warp (border padding, align_corners=True) specialized for
    near-identity grids — the 3D analogue of :func:`stencil_warp_2d`:
    every sample must lie within ``radius`` voxels of its own output voxel
    (caller-guaranteed via compose_flow's lax.cond).  (2R+1)^3 static
    shifts with spatially-varying separable weights; grid channel order is
    torch's (x=W, y=H, z=D).  ``grid_layout`` as in stencil_warp_2d.
    Gradients via the analytic custom VJP (see _stencil_warp_3d_bwd)."""
    return _stencil_warp_3d_xla_fn(img, grid, radius, grid_layout)


def _stencil_warp_3d_xla_fn(img, grid, radius: int,
                            grid_layout: str = "last"):
    """The plain-jnp 3D stencil warp (autodiff-able) — compose_flow's
    DEFAULT under jax.checkpoint (see _stencil_impl)."""
    n, c, d, h, w = img.shape
    # f32 coordinate/weight math + accumulation regardless of img.dtype
    # (see stencil_warp_2d)
    f = jnp.promote_types(img.dtype, jnp.float32)
    if grid_layout == "first":
        gx, gy, gz = grid[:, 0], grid[:, 1], grid[:, 2]
    else:
        gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]
    xpix = (gx.astype(f) + 1.0) * 0.5 * (w - 1)  # (N, D, H, W)
    ypix = (gy.astype(f) + 1.0) * 0.5 * (h - 1)
    zpix = (gz.astype(f) + 1.0) * 0.5 * (d - 1)
    z0 = jnp.floor(zpix)
    y0 = jnp.floor(ypix)
    x0 = jnp.floor(xpix)
    fz, fy, fx = zpix - z0, ypix - y0, xpix - x0
    iz = jnp.arange(d, dtype=jnp.int32)[None, :, None, None]
    iy = jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
    ix = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
    dz = z0.astype(jnp.int32) - iz
    dy = y0.astype(jnp.int32) - iy
    dx = x0.astype(jnp.int32) - ix
    R = int(radius)
    imgp = jnp.pad(img, ((0, 0), (0, 0), (R, R), (R, R), (R, R)),
                   mode="edge")
    one = jnp.ones((), f)
    zero = jnp.zeros((), f)

    def taps(di, frac):
        return [jnp.where(di == t, one - frac, zero)
                + jnp.where(di == t - 1, frac, zero)
                for t in range(-R, R + 1)]

    wzs, wys, wxs = taps(dz, fz), taps(dy, fy), taps(dx, fx)
    # separable accumulation (see stencil_warp_2d)
    out = jnp.zeros((n, c, d, h, w), f)
    for tz in range(-R, R + 1):
        pz = imgp[:, :, R + tz:R + tz + d]
        mid = jnp.zeros((n, c, d, h, w), f)
        for ty in range(-R, R + 1):
            py = pz[:, :, :, R + ty:R + ty + h]
            inner = jnp.zeros((n, c, d, h, w), f)
            for tx in range(-R, R + 1):
                tap = py[:, :, :, :, R + tx:R + tx + w]
                inner = inner + wxs[tx + R][:, None] * tap.astype(f)
            mid = mid + wys[ty + R][:, None] * inner
        out = out + wzs[tz + R][:, None] * mid
    return out.astype(img.dtype)


def _stencil_warp_3d_fwd(img, grid, radius: int, grid_layout: str):
    return stencil_warp_3d(img, grid, radius, grid_layout), (img, grid)


def _stencil_warp_3d_bwd(radius: int, grid_layout: str, res, g):
    """Analytic VJP (see _stencil_warp_2d_bwd): one sweep over the
    (2R+1)^3 taps yields inner and its fx-derivative; mid-level sums give
    the fy-derivative; the outer z loop the fz-derivative; d_img is the
    transposed stencil with the edge halo folded per axis."""
    img, grid = res
    n, c, d, h, w = img.shape
    f = jnp.promote_types(img.dtype, jnp.float32)
    if grid_layout == "first":
        gx, gy, gz = grid[:, 0], grid[:, 1], grid[:, 2]
    else:
        gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]
    xpix = (gx.astype(f) + 1.0) * 0.5 * (w - 1)
    ypix = (gy.astype(f) + 1.0) * 0.5 * (h - 1)
    zpix = (gz.astype(f) + 1.0) * 0.5 * (d - 1)
    z0, y0, x0 = jnp.floor(zpix), jnp.floor(ypix), jnp.floor(xpix)
    fz, fy, fx = zpix - z0, ypix - y0, xpix - x0
    iz = jnp.arange(d, dtype=jnp.int32)[None, :, None, None]
    iy = jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
    ix = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
    dz = z0.astype(jnp.int32) - iz
    dy = y0.astype(jnp.int32) - iy
    dx = x0.astype(jnp.int32) - ix
    R = int(radius)
    imgp = jnp.pad(img, ((0, 0), (0, 0), (R, R), (R, R), (R, R)),
                   mode="edge")
    one = jnp.ones((), f)
    zero = jnp.zeros((), f)

    def taps(di, frac):
        return [jnp.where(di == t, one - frac, zero)
                + jnp.where(di == t - 1, frac, zero)
                for t in range(-R, R + 1)]

    def dtaps(di):
        return [jnp.where(di == t - 1, one, zero)
                - jnp.where(di == t, one, zero)
                for t in range(-R, R + 1)]

    wzs, wys, wxs = taps(dz, fz), taps(dy, fy), taps(dx, fx)
    dwzs, dwys, dwxs = dtaps(dz), dtaps(dy), dtaps(dx)
    gf = g.astype(f)

    d_fz = jnp.zeros((n, d, h, w), f)
    d_fy = jnp.zeros_like(d_fz)
    d_fx = jnp.zeros_like(d_fz)
    d_imgp = jnp.zeros((n, c, d + 2 * R, h + 2 * R, w + 2 * R), f)
    for tz in range(-R, R + 1):
        pz = imgp[:, :, R + tz:R + tz + d]
        mid = jnp.zeros((n, c, d, h, w), f)
        dmid_y = jnp.zeros_like(mid)
        dmid_x = jnp.zeros_like(mid)
        for ty in range(-R, R + 1):
            py = pz[:, :, :, R + ty:R + ty + h]
            inner = jnp.zeros((n, c, d, h, w), f)
            dinner = jnp.zeros_like(inner)
            for tx in range(-R, R + 1):
                tap = py[:, :, :, :, R + tx:R + tx + w].astype(f)
                inner = inner + wxs[tx + R][:, None] * tap
                dinner = dinner + dwxs[tx + R][:, None] * tap
                # zero-pad placement (fusable), not .at[].add (serial
                # full-buffer copies) — see _stencil_warp_2d_bwd
                t = (wzs[tz + R] * wys[ty + R]
                     * wxs[tx + R])[:, None] * gf
                d_imgp = d_imgp + jnp.pad(
                    t, ((0, 0), (0, 0), (R + tz, R - tz),
                        (R + ty, R - ty), (R + tx, R - tx)))
            mid = mid + wys[ty + R][:, None] * inner
            dmid_y = dmid_y + dwys[ty + R][:, None] * inner
            dmid_x = dmid_x + wys[ty + R][:, None] * dinner
        wz = wzs[tz + R][:, None]
        d_fz = d_fz + dwzs[tz + R] * jnp.sum(gf * mid, axis=1)
        d_fy = d_fy + jnp.sum(gf * (wz * dmid_y), axis=1)
        d_fx = d_fx + jnp.sum(gf * (wz * dmid_x), axis=1)

    # fold the edge halo per axis (z, then y, then x)
    dv = d_imgp[:, :, R:R + d]
    dv = dv.at[:, :, 0].add(jnp.sum(d_imgp[:, :, :R], axis=2))
    dv = dv.at[:, :, d - 1].add(jnp.sum(d_imgp[:, :, R + d:], axis=2))
    dv2 = dv[:, :, :, R:R + h]
    dv2 = dv2.at[:, :, :, 0].add(jnp.sum(dv[:, :, :, :R], axis=3))
    dv2 = dv2.at[:, :, :, h - 1].add(jnp.sum(dv[:, :, :, R + h:], axis=3))
    d_img = dv2[:, :, :, :, R:R + w]
    d_img = d_img.at[:, :, :, :, 0].add(jnp.sum(dv2[:, :, :, :, :R],
                                                axis=4))
    d_img = d_img.at[:, :, :, :, w - 1].add(
        jnp.sum(dv2[:, :, :, :, R + w:], axis=4))

    d_gx = d_fx * (0.5 * (w - 1))
    d_gy = d_fy * (0.5 * (h - 1))
    d_gz = d_fz * (0.5 * (d - 1))
    if grid_layout == "first":
        d_grid = jnp.stack([d_gx, d_gy, d_gz], axis=1)
    else:
        d_grid = jnp.stack([d_gx, d_gy, d_gz], axis=-1)
    return d_img.astype(img.dtype), d_grid.astype(grid.dtype)


stencil_warp_3d.defvjp(_stencil_warp_3d_fwd, _stencil_warp_3d_bwd)


def grid_sample_3d(x, grid, mode: str = "bilinear", padding_mode: str = "zeros",
                   align_corners: bool = True, tile_order: str = "rows"):
    """Sample ``x`` (N, C, D, H, W) at ``grid`` (N, Do, Ho, Wo, 3).

    grid[..., 0] indexes W, [..., 1] indexes H, [..., 2] indexes D — the torch
    convention (``mode='bilinear'`` means trilinear for 5-D inputs).

    ``tile_order`` is the Pallas-path perf hint ('rows' | 'blocks'): pass
    'blocks' for warps with large rotation/shear; ignored by the XLA impl.
    """
    n, c, d, h, w = x.shape
    _, do, ho, wo, three = grid.shape
    assert three == 3, f"3D grid last dim must be 3, got {three}"
    if mode == "bilinear":
        mesh = _spatial_route(x, grid)
        if mesh is not None:
            from advchain_tpu.parallel.spatial import sharded_grid_sample
            return sharded_grid_sample(x, grid, mesh, mode=mode,
                                       padding_mode=padding_mode,
                                       align_corners=align_corners,
                                       tile_order=tile_order,
                                       max_disp=_SPATIAL_MAX_DISP)
        if _SPATIAL_MESH is not None:
            return _grid_sample_3d_xla(x, grid, mode, padding_mode,
                                       align_corners)
        if _use_pallas():
            from advchain_tpu.kernels.gather_matmul import \
                grid_sample_3d_pallas
            return grid_sample_3d_pallas(x, grid, padding_mode=padding_mode,
                                         align_corners=align_corners,
                                         tile_order=tile_order)
    elif mode == "nearest" and _SPATIAL_MESH is None and _use_pallas():
        # single unit-weight tap on the z-band kernels (see 2D dispatch)
        from advchain_tpu.kernels.gather_matmul import \
            grid_sample_3d_pallas_nearest
        return grid_sample_3d_pallas_nearest(
            x, grid, padding_mode=padding_mode,
            align_corners=align_corners, tile_order=tile_order)
    return _grid_sample_3d_xla(x, grid, mode, padding_mode, align_corners)


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode",
                                             "align_corners"))
def _grid_sample_3d_xla(x, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True):
    n, c, d, h, w = x.shape
    _, do, ho, wo, _ = grid.shape
    p = do * ho * wo
    compute_dtype = jnp.promote_types(x.dtype, grid.dtype)
    gx = grid[..., 0].astype(compute_dtype).reshape(n, p)
    gy = grid[..., 1].astype(compute_dtype).reshape(n, p)
    gz = grid[..., 2].astype(compute_dtype).reshape(n, p)

    ix = _prep_coord(gx, w, align_corners, padding_mode)
    iy = _prep_coord(gy, h, align_corners, padding_mode)
    iz = _prep_coord(gz, d, align_corners, padding_mode)

    x_flat = x.astype(compute_dtype).reshape(n, c, d * h * w)

    if mode == "nearest":
        ix_n, iy_n, iz_n = jnp.round(ix), jnp.round(iy), jnp.round(iz)
        inb = ((ix_n >= 0) & (ix_n <= w - 1) & (iy_n >= 0) & (iy_n <= h - 1)
               & (iz_n >= 0) & (iz_n <= d - 1))
        ixc = jnp.clip(ix_n, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_n, 0, h - 1).astype(jnp.int32)
        izc = jnp.clip(iz_n, 0, d - 1).astype(jnp.int32)
        vals = _gather_nd(x_flat, (izc * h + iyc) * w + ixc)
        if padding_mode == "zeros":
            vals = vals * inb[:, None, :].astype(compute_dtype)
        return vals.reshape(n, c, do, ho, wo).astype(x.dtype)

    if mode != "bilinear":
        raise NotImplementedError(f"mode={mode!r}; only bilinear/nearest supported")

    x0, y0, z0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    wx1, wy1, wz1 = ix - x0, iy - y0, iz - z0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    out = None
    for xi, wxi in ((x0, wx0), (x0 + 1.0, wx1)):
        for yi, wyi in ((y0, wy0), (y0 + 1.0, wy1)):
            for zi, wzi in ((z0, wz0), (z0 + 1.0, wz1)):
                wgt = wxi * wyi * wzi
                if padding_mode == "zeros":
                    inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                           & (zi >= 0) & (zi <= d - 1))
                    wgt = wgt * inb.astype(compute_dtype)
                xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                zc = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
                v = _gather_nd(x_flat, (zc * h + yc) * w + xc)
                contrib = v * wgt[:, None, :]
                out = contrib if out is None else out + contrib
    return out.reshape(n, c, do, ho, wo).astype(x.dtype)


def grid_sample(x, grid, mode: str = "bilinear", padding_mode: str = "zeros",
                align_corners: bool = True, tile_order: str = "rows"):
    """Dispatch on rank: 4-D input -> 2D sampler, 5-D input -> 3D sampler.

    ``tile_order`` is a Pallas perf hint ('rows' | 'blocks'; see
    grid_sample_2d / grid_sample_3d)."""
    if x.ndim == 4:
        return grid_sample_2d(x, grid, mode, padding_mode, align_corners,
                              tile_order=tile_order)
    if x.ndim == 5:
        return grid_sample_3d(x, grid, mode, padding_mode, align_corners,
                              tile_order=tile_order)
    raise ValueError(f"grid_sample expects 4-D or 5-D input, got {x.ndim}-D")
