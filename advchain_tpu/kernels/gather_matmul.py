"""Pallas TPU grid-sampling kernels: gather-as-one-hot-matmul.

Why: XLA's TPU gather/scatter lowering is pathological for the bilinear
sampling patterns in this framework — measured on v5e (with honest
device-to-host sync; the runtime's block_until_ready is unreliable under
the axon tunnel), one bilinear warp of a (16,1,192,192) image costs ~27 ms
via XLA and the 8-composition scaling-and-squaring field ~536 ms.  These
kernels replace the gather with VPU compares + MXU matmuls (~8 ms per warp
standalone, ~10x on composition chains; HBM on this slice sustains ~110
GB/s so standalone calls are traffic-bound):

  * ``corner_gather``: vals[n,c,p,k] = img[n,c, idx[n,p] + offset_k].  The
    one-hot matrix ``(idx - chunk_base == iota)`` is built in VMEM tile by
    tile — ONE compare per (pixel, source) pair; the K bilinear corner taps
    share the base index and read from K pre-shifted image copies stacked as
    extra matmul columns — and contracted on the MXU.  A per-tile dynamic
    chunk window (min/max of the tile's indices) prunes source chunks that
    cannot match (most of the sweep, for this domain's near-identity warps).

  * ``corner_scatter``: the exact transpose (VJP w.r.t. the image):
    dimg[idx+offset_k] += g_k, computed per source chunk as
    (g-tile) @ one-hot with the same shared compare, corner-shifted
    afterwards in XLA.

``grid_sample_2d_pallas`` / ``grid_sample_3d_pallas`` wire them into
drop-in bilinear/trilinear samplers with a ``jax.custom_vjp``: corner
values are piecewise-constant in the grid, so the grid gradient flows
entirely through the XLA-computed corner *weights*, and the custom VJP only
supplies d(img) (scatter kernel) and d(weights) (elementwise against saved
corner values).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["corner_gather", "corner_scatter", "grid_sample_2d_pallas",
           "grid_sample_3d_pallas"]

# output-pixel tile (sublanes of the one-hot) / source chunk (lanes)
_PT = 512
_CH = 512


def _interpret() -> bool:
    # pallas TPU kernels only compile on TPU; CPU runs use interpret mode
    from advchain_tpu.ops.grid_sample import _on_tpu_device
    return not _on_tpu_device()


def _pad_to(x, mult: int, axis: int, value=0):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value), size


@functools.partial(jax.jit, static_argnames=("offsets",))
def corner_gather(img, idx, offsets: Tuple[int, ...]):
    """img: (N, C, S); idx: (N, P) int32 with 0 <= idx < S (clipped);
    returns vals (N, K, C, P) with vals[:, k] = img[..., idx + offsets[k]]
    — P on the minor dim (a K-minor layout gets tile-padded 32-64x in HBM).
    Reads past S hit zero padding (call sites zero those taps' weights)."""
    n, c, s = img.shape
    k = len(offsets)
    assert min(offsets) >= 0, "corner offsets must be non-negative"
    max_off = max(offsets)
    img_p, _ = _pad_to(img, _CH, axis=2)
    # Mosaic requires lane-aligned loads; corner shifts become K pre-shifted
    # copies (K x one image of extra HBM, reused across all output tiles)
    img_p = jnp.pad(img_p, ((0, 0), (0, 0), (0, max_off)))
    sp = img_p.shape[2] - max_off
    img_k = jnp.stack([img_p[:, :, off:off + sp] for off in offsets],
                      axis=1)  # (N, K, C, SP)
    idx_p, p_orig = _pad_to(idx, _PT, axis=1)
    p = idx_p.shape[1]
    n_tiles = p // _PT
    idx_4d = idx_p.reshape(n, n_tiles, 1, _PT)
    n_chunks = sp // _CH

    def kernel(idx_ref, img_ref, out_ref):
        pix = idx_ref[0, 0, 0, :]  # (PT,) — the j-th tile via index_map
        lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, _CH), 1)
        # dynamic band window: only chunks covering [min, max] of this tile
        lo = jnp.min(pix) // _CH
        hi = jnp.minimum(jnp.max(pix) // _CH + 1, n_chunks)

        def body(ci, acc):
            base = pl.multiple_of(ci * _CH, _CH)
            oh = (pix[:, None] - base == lane).astype(jnp.float32)
            rhs = img_ref[0, :, :, pl.ds(base, _CH)]  # (K, C, CH)
            rhs = rhs.reshape(k * c, _CH)
            # (K*C, CH) @ (PT, CH)^T -> (K*C, PT): keeping PT on the minor
            # (lane) dim makes the VMEM accumulator and HBM write tile-dense
            # (a (PT, K*C) layout pads lanes K*C -> 128)
            return acc + jax.lax.dot_general(
                rhs, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            lo, hi, body, jnp.zeros((k * c, _PT), jnp.float32))
        out_ref[0, 0] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, k * c, _PT),
                                       jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, c, sp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k * c, _PT), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(idx_4d, img_k)
    # (N, T, K, C, PT) -> (N, K, C, P)
    out = out.reshape(n, n_tiles, k, c, _PT)
    out = jnp.moveaxis(out, 1, 3)  # (N, K, C, T, PT)
    return out.reshape(n, k, c, p)[..., :p_orig]


@functools.partial(jax.jit, static_argnames=("offsets", "s_out"))
def corner_scatter(g, idx, offsets: Tuple[int, ...], s_out: int):
    """Transpose of corner_gather: g (N, K, C, P), idx (N, P) ->
    dimg (N, C, s_out) with dimg[:, k] scattered at idx + offsets[k].

    The pixel axis is STREAMED as a third grid dimension (p-tiles of the
    idx/grad blocks), accumulating into the VMEM-resident output chunk —
    whole-P blocks OOM VMEM for 3D volumes.  Per-p-tile index ranges (SMEM
    scalars) skip tiles that cannot touch the current source chunk.
    """
    n, k, c, p0 = g.shape
    assert min(offsets) >= 0, "corner offsets must be non-negative"
    idx_p, _ = _pad_to(idx, _PT, axis=1, value=-10 ** 8)  # pad misses all
    p = idx_p.shape[1]
    n_ptiles = p // _PT
    idx_4d = idx_p.reshape(n, n_ptiles, 1, _PT)
    # (N, K, C, P): P already on the minor (lane) dim -> tile-dense blocks
    g_r = g.reshape(n, k * c, p0)
    g_r, _ = _pad_to(g_r, _PT, axis=2)
    # (N, T, K*C, PT): tile axis second so blocks keep valid (K*C, PT)
    # trailing dims
    g_r = jnp.moveaxis(g_r.reshape(n, k * c, n_ptiles, _PT), 1, 2)
    s_pad = -(-s_out // _CH) * _CH
    tiles = idx_4d[:, :, 0, :]
    tmin = jnp.min(jnp.where(tiles < 0, 10 ** 8, tiles), axis=2)
    tmax = jnp.max(tiles, axis=2).astype(jnp.int32).reshape(n, 1, n_ptiles)
    tmin = tmin.astype(jnp.int32).reshape(n, 1, n_ptiles)

    def kernel(tmin_ref, tmax_ref, idx_ref, g_ref, out_ref):
        sj = pl.program_id(1)
        pi = pl.program_id(2)
        base = sj * _CH

        @pl.when(pi == 0)
        def _():
            out_ref[0, 0] = jnp.zeros((k * c, _CH), jnp.float32)

        overlap = (tmax_ref[0, 0, pi] >= base) & \
            (tmin_ref[0, 0, pi] < base + _CH)

        @pl.when(overlap)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, _CH), 1)
            pix = idx_ref[0, 0, 0, :]  # (PT,) — pi-th tile via index_map
            oh = (pix[:, None] - base == lane).astype(jnp.float32)
            gt = g_ref[0, 0]  # (K*C, PT)
            out_ref[0, 0] += jax.lax.dot_general(
                gt, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s_pad // _CH, k * c, _CH),
                                       jnp.float32),
        grid=(n, s_pad // _CH, n_ptiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_ptiles), lambda i, j, q: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_ptiles), lambda i, j, q: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j, q: (i, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k * c, _PT), lambda i, j, q: (i, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k * c, _CH),
                               lambda i, j, q: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(tmin, tmax, idx_4d, g_r)
    # (N, S//CH, K*C, CH) -> (N, K, C, S)
    out = jnp.moveaxis(out, 2, 1).reshape(n, k, c, s_pad)[..., :s_out]
    # contributions of corner k land at idx + offsets[k]: shift each plane
    dimg = jnp.zeros((n, c, s_out), jnp.float32)
    for ki, off in enumerate(offsets):
        plane = out[:, ki]
        if off > 0:
            plane = jnp.pad(plane, ((0, 0), (0, 0), (off, 0)))[:, :, :s_out]
        dimg = dimg + plane
    return dimg


# ----------------------------------------------------------- 2D sampler
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _weighted_corner_sample(img, payload, offsets: Tuple[int, ...],
                            s_out: int):
    """out[n,c,p] = sum_k w[n,k,p] * img[n,c, idx[n,p]+offsets[k]].

    payload = (idx int32 (N,P), weights (N,K,P)).  Gradients flow to img
    (scatter kernel) and weights (saved corner values); idx is non-diff.
    """
    idx, weights = payload
    vals = corner_gather(img, idx, offsets)  # (N, K, C, P)
    return jnp.einsum("nkp,nkcp->ncp", weights, vals)


def _wcs_fwd(img, payload, offsets, s_out):
    idx, weights = payload
    vals = corner_gather(img, idx, offsets)  # (N, K, C, P)
    out = jnp.einsum("nkp,nkcp->ncp", weights, vals)
    return out, (idx, weights, vals)


def _wcs_bwd(offsets, s_out, res, g):
    idx, weights, vals = res
    d_weights = jnp.einsum("ncp,nkcp->nkp", g, vals)
    g_corners = jnp.einsum("ncp,nkp->nkcp", g, weights)
    d_img = corner_scatter(g_corners, idx, offsets, s_out)
    return d_img, (None, d_weights)


_weighted_corner_sample.defvjp(_wcs_fwd, _wcs_bwd)


# per-sample K-stacked image budget; Mosaic double-buffers the image block
# so the safe envelope is well under half of the 16MB VMEM
_VMEM_IMG_BUDGET = 5 * 1024 * 1024


def _fits_vmem(k: int, c: int, s: int) -> bool:
    return k * c * s * 4 <= _VMEM_IMG_BUDGET


def grid_sample_2d_pallas(x, grid, padding_mode: str = "zeros",
                          align_corners: bool = True):
    """Drop-in bilinear 2D grid sample (torch semantics) on the Pallas
    gather-matmul path.  x: (N, C, H, W); grid: (N, Ho, Wo, 2)."""
    from advchain_tpu.ops.grid_sample import _prep_coord

    if not _fits_vmem(4, x.shape[1], x.shape[2] * x.shape[3]):
        from advchain_tpu.ops.grid_sample import _grid_sample_2d_xla
        return _grid_sample_2d_xla(x, grid, "bilinear", padding_mode,
                                   align_corners)

    n, c, h, w = x.shape
    _, ho, wo, two = grid.shape
    assert two == 2
    gx = grid[..., 0].reshape(n, ho * wo)
    gy = grid[..., 1].reshape(n, ho * wo)
    ix = _prep_coord(gx, w, align_corners, padding_mode)
    iy = _prep_coord(gy, h, align_corners, padding_mode)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    def inb(xi, yi):
        if padding_mode == "zeros":
            return ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
                    & (yi <= h - 1)).astype(jnp.float32)
        return jnp.ones_like(fx)

    # corner taps use CLIPPED coordinates; offsets from the clipped base are
    # 0/1 per axis, so fold any tap whose clipped coord collapses onto the
    # base into the base tap's weight (keeps the static offsets correct)
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    dxf = (x1c - x0c).astype(jnp.float32)  # 0.0 or 1.0
    dyf = (y1c - y0c).astype(jnp.float32)
    # integer index arithmetic: float32 combine loses exactness above 2^24
    base = y0c.astype(jnp.int32) * w + x0c.astype(jnp.int32)

    w00 = (1 - fx) * (1 - fy) * inb(x0, y0)
    w01 = fx * (1 - fy) * inb(x0 + 1, y0)
    w10 = (1 - fx) * fy * inb(x0, y0 + 1)
    w11 = fx * fy * inb(x0 + 1, y0 + 1)

    cw00 = w00 + w01 * (1 - dxf) + w10 * (1 - dyf) \
        + w11 * (1 - dxf) * (1 - dyf)
    cw01 = w01 * dxf + w11 * dxf * (1 - dyf)
    cw10 = w10 * dyf + w11 * (1 - dxf) * dyf
    cw11 = w11 * dxf * dyf
    weights = jnp.stack([cw00, cw01, cw10, cw11], axis=1)  # (N, 4, P)

    out = _weighted_corner_sample(
        x.reshape(n, c, h * w).astype(jnp.float32),
        (base, weights.astype(jnp.float32)),
        (0, 1, w, w + 1), h * w)
    return out.reshape(n, c, ho, wo).astype(x.dtype)


def grid_sample_3d_pallas(x, grid, padding_mode: str = "zeros",
                          align_corners: bool = True):
    """Trilinear 3D grid sample (torch semantics) on the Pallas path.

    x: (N, C, D, H, W); grid: (N, Do, Ho, Wo, 3), torch channel order
    (grid[..., 0] -> W, [..., 1] -> H, [..., 2] -> D).

    Formulated as FOUR (z, y) base indices x TWO x-taps so the kernel needs
    only K=2 pre-shifted volume copies (8 copies of a 3D volume would blow
    VMEM) and each index sub-tile stays window-coherent: the bases are
    concatenated along the pixel axis of one corner_gather call.  Volumes
    whose K-stack exceeds the VMEM budget fall back to the XLA sampler.
    """
    from advchain_tpu.ops.grid_sample import _prep_coord

    if not _fits_vmem(2, x.shape[1], x.shape[2] * x.shape[3] * x.shape[4]):
        from advchain_tpu.ops.grid_sample import _grid_sample_3d_xla
        return _grid_sample_3d_xla(x, grid, "bilinear", padding_mode,
                                   align_corners)

    n, c, d, h, w = x.shape
    _, do, ho, wo, three = grid.shape
    assert three == 3
    p = do * ho * wo
    gx = grid[..., 0].reshape(n, p)
    gy = grid[..., 1].reshape(n, p)
    gz = grid[..., 2].reshape(n, p)
    ix = _prep_coord(gx, w, align_corners, padding_mode)
    iy = _prep_coord(gy, h, align_corners, padding_mode)
    iz = _prep_coord(gz, d, align_corners, padding_mode)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    fx, fy, fz = ix - x0, iy - y0, iz - z0

    def inb(xi, yi, zi):
        if padding_mode == "zeros":
            return ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                    & (zi >= 0) & (zi <= d - 1)).astype(jnp.float32)
        return jnp.ones_like(fx)

    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    dxf = (x1c - x0c).astype(jnp.float32)  # 0.0/1.0: x tap distinct?
    ys = [jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)]
    zs = [jnp.clip(z0, 0, d - 1), jnp.clip(z0 + 1, 0, d - 1)]
    hw = h * w

    bases = []
    w0s = []
    w1s = []
    for dz in (0, 1):
        for dy in (0, 1):
            base = ((zs[dz].astype(jnp.int32) * h
                     + ys[dy].astype(jnp.int32)) * w
                    + x0c.astype(jnp.int32))
            wyz = ((fy if dy else 1 - fy) * (fz if dz else 1 - fz))
            w_x0 = (1 - fx) * wyz * inb(x0, y0 + dy, z0 + dz)
            w_x1 = fx * wyz * inb(x0 + 1, y0 + dy, z0 + dz)
            # fold x-collapsed taps (clipped x1 == x0) into the base tap
            bases.append(base)
            w0s.append(w_x0 + w_x1 * (1 - dxf))
            w1s.append(w_x1 * dxf)

    # one sampler call per (z, y) base: a concatenated (N, 4P) index stack
    # tempts XLA into a pathological minor-N layout (32x HBM padding seen on
    # volume workloads); separate calls keep every buffer P-minor
    x_flat = x.reshape(n, c, d * h * w).astype(jnp.float32)
    out = None
    for base, w0, w1 in zip(bases, w0s, w1s):
        wpair = jnp.stack([w0, w1], axis=1).astype(jnp.float32)  # (N, 2, P)
        part = _weighted_corner_sample(x_flat, (base, wpair), (0, 1),
                                       d * h * w)
        out = part if out is None else out + part
    return out.reshape(n, c, do, ho, wo).astype(x.dtype)
