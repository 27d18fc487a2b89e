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
import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["corner_gather", "corner_scatter", "plane_gather",
           "plane_scatter", "band_gather", "band_scatter",
           "grid_sample_2d_pallas", "grid_sample_3d_pallas",
           "grid_sample_2d_pallas_nearest", "grid_sample_3d_pallas_nearest"]

# output-pixel tile (sublanes of the one-hot) / source chunk (lanes).
# PT=1024 measured uniformly faster than 512 on the 2D warp shapes
# (fwd_c1 1.38->1.20 ms, grad_c1 2.30->1.93, scripts/kernel_tile_bench.py):
# per-tile fixed costs (one-hot build, loop setup, output writes) amortize
# over twice the pixels while band segment counts stay flat for smooth
# warps.  Env override for A/B: ADVCHAIN_PT.
_PT = int(os.environ.get("ADVCHAIN_PT", "1024"))
_CH = 512


def _dot_f32(vals, oh, dims, splits: int = 3):
    """MXU matmuls round f32 inputs to bf16 (~1e-3 relative error —
    measured on v5e; torch-parity demands <1e-4).  The one-hot side is
    exactly representable (0/1), so splitting the VALUE side into THREE
    bf16 terms (hi + mid + residual, ~8 mantissa bits each) makes the
    selection f32-EXACT: each pass's nonzero products are exact bf16*1
    selections and hi+mid+lo reconstructs the f32 value to <=2^-24
    relative.  Exactness matters beyond aesthetics: morph's
    scaling-and-squaring self-composes the sampled flow 8 times, doubling
    any per-warp rounding each step (~256x) — the earlier TWO-term split
    (~1e-5 per warp) produced ~4e-3 adv_data deviations vs the exact-gather
    XLA path at episode level.

    ``splits=2`` (hi + mid, ~2.5e-6 relative) is the GRADIENT tier: the
    scatter kernels run only inside VJPs, where per-warp rounding SUMS
    through the backward chain (8 linear steps -> ~2e-5) instead of
    self-composing — forward flows keep splits=3."""
    hi = vals.astype(jnp.bfloat16)
    r1 = vals - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    if splits == 2:
        parts = [hi, mid]
    else:
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        parts = [hi, mid, lo]
    # ONE matmul with the splits stacked on the M (row) axis: the MXU
    # runs ceil(M/128) passes per block regardless of fill, and M=K*C is
    # 4-24 here, so separate M-row matmuls cost splits-times the passes of
    # one stacked matmul.  The splits are bf16-exact by construction and
    # the one-hot is 0/1, so explicit bf16 inputs keep the selection exact
    # per term.
    m = vals.shape[0]
    stacked = jnp.concatenate(parts, axis=0)
    out = jax.lax.dot_general(stacked, oh.astype(jnp.bfloat16), dims,
                              preferred_element_type=jnp.float32)
    acc = out[:m]
    for s in range(1, len(parts)):
        acc = acc + out[s * m:(s + 1) * m]
    return acc


def _scatter_splits() -> int:
    """Value-split terms for the scatter (VJP-only) kernels, trace-time.
    Default 2 (see _dot_f32): measured -6% (c=1) to -21% (c=5, wide span)
    per scatter with ~2.5e-6 relative d_img rounding, far under the 1e-3
    gradient-parity bars.  ADVCHAIN_SCATTER_SPLIT=3 restores the exact
    tier for A/B."""
    ov = os.environ.get("ADVCHAIN_SCATTER_SPLIT")
    return int(ov) if ov else 2


def _interpret() -> bool:
    # pallas TPU kernels only compile on TPU; CPU runs use interpret mode
    from advchain_tpu.ops.grid_sample import _on_tpu_device
    return not _on_tpu_device()


def _band_enabled() -> bool:
    """Trace-time escape hatch: ADVCHAIN_BAND_KERNEL=0 pins the 2D sampler
    to the chunk kernels (A/B benchmarking; programs cache per value)."""
    return os.environ.get("ADVCHAIN_BAND_KERNEL", "1") != "0"


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
    Reads past S hit zero padding (call sites zero those taps' weights).

    Dispatch: when the K-stacked image fits the per-sample VMEM budget it is
    kept resident in VMEM (fastest); otherwise the streamed variant keeps it
    in HBM and double-buffers chunk DMAs (no size limit)."""
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

    if not _fits_vmem(k, c, sp):
        return _corner_gather_streamed(img_k, idx_4d, k, c, sp,
                                       p_orig)

    def kernel(idx_ref, img_ref, out_ref):
        pix = idx_ref[0, 0, 0, :]  # (PT,) — the j-th tile via index_map
        # transposed (CH, PT) one-hot: both matmul operands in natural MXU
        # layout (LHS K-minor, RHS K-major), no per-chunk RHS relayout
        lane = jax.lax.broadcasted_iota(jnp.int32, (_CH, _PT), 0)
        # dynamic band window: only chunks covering [min, max] of this tile
        lo = jnp.min(pix) // _CH
        hi = jnp.minimum(jnp.max(pix) // _CH + 1, n_chunks)

        def body(ci, acc):
            base = pl.multiple_of(ci * _CH, _CH)
            oh = (pix[None, :] - base == lane).astype(jnp.float32)
            rhs = img_ref[0, :, :, pl.ds(base, _CH)]  # (K, C, CH)
            rhs = rhs.reshape(k * c, _CH)
            # (K*C, CH) @ (CH, PT) -> (K*C, PT): keeping PT on the minor
            # (lane) dim makes the VMEM accumulator and HBM write tile-dense
            # (a (PT, K*C) layout pads lanes K*C -> 128)
            return acc + _dot_f32(rhs, oh, (((1,), (0,)), ((), ())))

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


def _corner_gather_streamed(img_k, idx_4d, k: int, c: int, sp: int,
                            p_orig: int):
    """corner_gather for images whose K-stack exceeds the VMEM budget: the
    stacked image stays in HBM (memory_space=ANY) and each source chunk in
    the tile's dynamic band window is DMA'd into a double-buffered VMEM
    scratch (2 x K*C x CH floats — independent of image size), overlapping
    the next chunk's fetch with the current chunk's compare + MXU matmul.

    img_k: (N, K, C, SP) zero-padded, pre-shifted per corner offset;
    idx_4d: (N, T, 1, PT) int32 base indices.  Returns (N, K, C, p_orig).
    """
    n = img_k.shape[0]
    n_tiles = idx_4d.shape[1]
    p = n_tiles * _PT
    n_chunks = sp // _CH
    img_r = img_k.reshape(n, k * c, sp)

    def kernel(idx_ref, img_ref, out_ref):
        i = pl.program_id(0)
        pix = idx_ref[0, 0, 0, :]  # (PT,)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_CH, _PT), 0)
        lo = jnp.min(pix) // _CH
        hi = jnp.minimum(jnp.max(pix) // _CH + 1, n_chunks)

        def scoped(scratch, sem):
            def get_dma(slot, ci):
                base = pl.multiple_of(ci * _CH, _CH)
                return pltpu.make_async_copy(
                    img_ref.at[i, :, pl.ds(base, _CH)],
                    scratch.at[slot], sem.at[slot])

            get_dma(0, lo).start()

            def body(ci, acc):
                slot = jax.lax.rem(ci - lo, 2)

                @pl.when(ci + 1 < hi)
                def _():
                    get_dma(1 - slot, ci + 1).start()

                get_dma(slot, ci).wait()
                base = pl.multiple_of(ci * _CH, _CH)
                oh = (pix[None, :] - base == lane).astype(jnp.float32)
                rhs = scratch[slot]  # (K*C, CH)
                return acc + _dot_f32(rhs, oh, (((1,), (0,)), ((), ())))

            out_ref[0, 0] = jax.lax.fori_loop(
                lo, hi, body, jnp.zeros((k * c, _PT), jnp.float32))

        pl.run_scoped(
            scoped,
            pltpu.VMEM((2, k * c, _CH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, k * c, _PT),
                                       jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, k * c, _PT), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(idx_4d, img_r)
    out = out.reshape(n, n_tiles, k, c, _PT)
    out = jnp.moveaxis(out, 1, 3)
    return out.reshape(n, k, c, p)[..., :p_orig]


@functools.partial(jax.jit, static_argnames=("offsets", "s_out"))
def corner_scatter(g, idx, offsets: Tuple[int, ...], s_out: int):
    """Transpose of corner_gather: g (N, K, C, P), idx (N, P) ->
    dimg (N, C, s_out) with dimg[:, k] scattered at idx + offsets[k].

    Dispatch mirrors plane_scatter: when the whole (K*C, s_pad) output fits
    the VMEM budget it stays RESIDENT across streamed pixel tiles
    (grid = (N, T)) and each tile read-modify-writes only its banded source
    chunks — the chunk-major grid below pays (S/CH)*(P/PT) mostly-skipped
    grid steps per call (~83k at 192^2, the dominant cost of the 2D
    backward).  Larger outputs (the 3D volume fallback) stream source
    chunks as a third grid dimension with SMEM per-tile range skips.
    """
    n, k, c, p0 = g.shape
    assert min(offsets) >= 0, "corner offsets must be non-negative"
    idx_p, _ = _pad_to(idx, _PT, axis=1, value=-1)  # pad misses all chunks
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
    if _fits_vmem(k, c, s_pad):
        out = _corner_scatter_resident(g_r, idx_4d, k, c, s_pad)
    else:
        out = _corner_scatter_chunk_major(g_r, idx_4d, k, c, s_pad)
    out = out.reshape(n, k, c, s_pad)[..., :s_out]
    # contributions of corner k land at idx + offsets[k]: shift each plane
    dimg = jnp.zeros((n, c, s_out), jnp.float32)
    for ki, off in enumerate(offsets):
        plane = out[:, ki]
        if off > 0:
            plane = jnp.pad(plane, ((0, 0), (0, 0), (off, 0)))[:, :, :s_out]
        dimg = dimg + plane
    return dimg


def _corner_scatter_resident(g_r, idx_4d, k: int, c: int, s_pad: int):
    """Banded scatter with the whole (K*C, s_pad) accumulator VMEM-resident
    across pixel tiles (grid = (N, T)); each tile touches only the source
    chunks in its [min, max] index band.  Returns (N, K*C, s_pad)."""
    n, n_ptiles = idx_4d.shape[0], idx_4d.shape[1]
    n_chunks = s_pad // _CH

    def kernel(idx_ref, g_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[0] = jnp.zeros((k * c, s_pad), jnp.float32)

        pix = idx_ref[0, 0, 0, :]  # (PT,)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, _CH), 1)
        # -1 pads match nothing: exclude them from the band min (else a
        # tail tile sweeps chunks from 0) and clamp against n_chunks
        lo = jnp.minimum(
            jnp.min(jnp.where(pix < 0, jnp.int32(2 ** 30), pix)) // _CH,
            n_chunks)
        hi = jnp.minimum(jnp.max(pix) // _CH + 1, n_chunks)
        gt = g_ref[0, 0]  # (K*C, PT)

        def body(ci, _):
            base = pl.multiple_of(ci * _CH, _CH)
            oh = (pix[:, None] - base == lane).astype(jnp.float32)
            out_ref[0, :, pl.ds(base, _CH)] += _dot_f32(
                gt, oh, (((1,), (0,)), ((), ())),
                splits=_scatter_splits())
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, k * c, s_pad), jnp.float32),
        grid=(n, n_ptiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k * c, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * c, s_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(idx_4d, g_r)


def _corner_scatter_chunk_major(g_r, idx_4d, k: int, c: int, s_pad: int):
    """Chunk-major scatter for outputs over the VMEM budget: source chunks
    stream as a grid dimension, pixel tiles as another; SMEM per-tile index
    ranges skip (chunk, tile) pairs that cannot overlap.  Returns
    (N, K*C, s_pad)."""
    n, n_ptiles = idx_4d.shape[0], idx_4d.shape[1]
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
            out_ref[0, 0] += _dot_f32(gt, oh, (((1,), (0,)), ((), ())),
                                      splits=_scatter_splits())

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
    # (N, S//CH, K*C, CH) -> (N, K*C, S)
    return jnp.moveaxis(out, 2, 1).reshape(n, k * c, s_pad)


# ------------------------------------------------- 3D (z, yx) plane kernels
#
# The flat-index band window dies in 3D: a +-1 voxel z-spread inside one
# output tile spans H*W flat indices (~72 chunks at 192^2), so the 1D
# corner kernels degrade to a near-full sweep (measured 17-22x SLOWER than
# even XLA's bad gather on volume warps).  The plane kernels keep the z
# coordinate separate: one-hot = (z_pix == z) & (yx_pix - base == lane),
# and the band is the CARTESIAN product of a tiny z range (2-3 planes for
# smooth warps) and a tight per-plane yx window — restoring the 2D kernel's
# pruning behavior plane by plane.


def _plane_pack(img, offsets: Tuple[int, ...]):
    """(N, C, D, HW) -> (N, K*C, D, HWP) with K pre-shifted per-plane
    copies (zero padding past HW; shifts never bleed across planes)."""
    n, c, d, hw = img.shape
    k = len(offsets)
    max_off = max(offsets)
    img_p, _ = _pad_to(img, _CH, axis=3)
    img_p = jnp.pad(img_p, ((0, 0), (0, 0), (0, 0), (0, max_off)))
    hwp = img_p.shape[3] - max_off
    img_k = jnp.stack([img_p[..., off:off + hwp] for off in offsets],
                      axis=1)  # (N, K, C, D, HWP)
    return img_k.reshape(n, k * c, d, hwp), hwp


def _plane_tiles(zidx, yxidx):
    """Pad to _PT and tile: z pad -1 (matches no plane), yx pad 0."""
    n = zidx.shape[0]
    z_p, p_orig = _pad_to(zidx, _PT, axis=1, value=-1)
    yx_p, _ = _pad_to(yxidx, _PT, axis=1)
    t = z_p.shape[1] // _PT
    return (z_p.reshape(n, t, 1, _PT), yx_p.reshape(n, t, 1, _PT), t,
            p_orig)


@functools.partial(jax.jit, static_argnames=("offsets",))
def plane_gather(img, zidx, yxidx, offsets: Tuple[int, ...]):
    """img: (N, C, D, HW); zidx, yxidx: (N, P) int32 (clipped in range);
    returns vals (N, K, C, P), vals[:, k] = img[n, c, z, yx + offsets[k]].

    VMEM-resident when the packed stack fits the budget; otherwise the
    image stays in HBM and each (plane, chunk) block in the band is DMA'd
    into a small VMEM scratch."""
    n, c, d, hw = img.shape
    k = len(offsets)
    assert min(offsets) >= 0, "corner offsets must be non-negative"
    img_r, hwp = _plane_pack(img, offsets)
    z4, yx4, n_tiles, p_orig = _plane_tiles(zidx, yxidx)
    n_chunks = hwp // _CH
    resident = _fits_vmem(k, c, d * hwp)

    def make_body(read_chunk):
        def tile_acc(zp, yxp):
            lane = jax.lax.broadcasted_iota(jnp.int32, (_CH, _PT), 0)
            zlo = jnp.maximum(jnp.min(zp), 0)  # -1 pads match nothing
            zhi = jnp.max(zp) + 1
            lo = jnp.min(yxp) // _CH
            hi = jnp.minimum(jnp.max(yxp) // _CH + 1, n_chunks)

            def zbody(z, acc):
                def cbody(ci, acc):
                    base = pl.multiple_of(ci * _CH, _CH)
                    oh = ((zp[None, :] == z)
                          & (yxp[None, :] - base == lane)).astype(
                              jnp.float32)
                    rhs = read_chunk(z, base)  # (K*C, CH)
                    return acc + _dot_f32(rhs,
                                          oh, (((1,), (0,)), ((), ())))

                return jax.lax.fori_loop(lo, hi, cbody, acc)

            return jax.lax.fori_loop(
                zlo, zhi, zbody, jnp.zeros((k * c, _PT), jnp.float32))

        return tile_acc

    if resident:
        def kernel(z_ref, yx_ref, img_ref, out_ref):
            tile_acc = make_body(
                lambda z, base: img_ref[0, :, z, pl.ds(base, _CH)])
            out_ref[0, 0] = tile_acc(z_ref[0, 0, 0, :], yx_ref[0, 0, 0, :])

        img_spec = pl.BlockSpec((1, k * c, d, hwp), lambda i, j: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # streamed: the packed image stays in HBM; the tile's band — the
        # cartesian product of its z range and yx chunk window, flattened
        # to one loop — is DMA'd through a double-buffered (2, KCP, CH)
        # scratch, overlapping the next block's fetch with the current
        # block's compare + MXU matmuls.  Mosaic DMA slices of HBM
        # buffers must be tile-aligned on the LAST TWO dims: the image is
        # addressed FLAT (N, KCP, D*HWP) — a dynamic z index on a separate
        # axis is an illegal memref slice, while a lane offset
        # z*hwp + chunk*CH is 512-aligned — with the row dim zero-padded
        # from K*C up to KCP (multiple of 8, the f32 sublane tile).
        kcp = -(-(k * c) // 8) * 8

        def kernel(z_ref, yx_ref, img_ref, out_ref):
            i = pl.program_id(0)
            zp = z_ref[0, 0, 0, :]
            yxp = yx_ref[0, 0, 0, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (_CH, _PT), 0)
            zlo = jnp.maximum(jnp.min(zp), 0)  # -1 pads match nothing
            zhi = jnp.max(zp) + 1
            lo = jnp.min(yxp) // _CH
            hi = jnp.minimum(jnp.max(yxp) // _CH + 1, n_chunks)
            total = jnp.maximum(zhi - zlo, 0) * jnp.maximum(hi - lo, 0)
            ncb = jnp.maximum(hi - lo, 1)  # div-safe (total==0 skips all)

            def scoped(scratch, sem):
                def get_dma(slot, t):
                    z = zlo + t // ncb
                    ci = lo + jax.lax.rem(t, ncb)
                    off = pl.multiple_of(z * hwp + ci * _CH, _CH)
                    return pltpu.make_async_copy(
                        img_ref.at[i, :, pl.ds(off, _CH)],
                        scratch.at[slot], sem.at[slot])

                @pl.when(total > 0)
                def _():
                    get_dma(0, 0).start()

                def body(t, acc):
                    slot = jax.lax.rem(t, 2)

                    @pl.when(t + 1 < total)
                    def _():
                        get_dma(1 - slot, t + 1).start()

                    get_dma(slot, t).wait()
                    z = zlo + t // ncb
                    ci = lo + jax.lax.rem(t, ncb)
                    base = pl.multiple_of(ci * _CH, _CH)
                    oh = ((zp[None, :] == z)
                          & (yxp[None, :] - base == lane)).astype(
                              jnp.float32)
                    return acc + _dot_f32(scratch[slot], oh,
                                          (((1,), (0,)), ((), ())))

                out_ref[0, 0] = jax.lax.fori_loop(
                    0, total, body, jnp.zeros((kcp, _PT), jnp.float32))

            pl.run_scoped(scoped, pltpu.VMEM((2, kcp, _CH), jnp.float32),
                          pltpu.SemaphoreType.DMA((2,)))

        img_spec = pl.BlockSpec(memory_space=pl.ANY)
        img_r = img_r.reshape(n, k * c, d * hwp)  # flat lane addressing
        if kcp != k * c:
            img_r = jnp.pad(img_r, ((0, 0), (0, kcp - k * c), (0, 0)))

    rows = k * c if resident else kcp
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, rows, _PT),
                                       jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            img_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, rows, _PT), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(z4, yx4, img_r)
    out = out[:, :, :k * c].reshape(n, n_tiles, k, c, _PT)
    out = jnp.moveaxis(out, 1, 3)
    return out.reshape(n, k, c, n_tiles * _PT)[..., :p_orig]


@functools.partial(jax.jit, static_argnames=("offsets", "d", "hw"))
def plane_scatter(g, zidx, yxidx, offsets: Tuple[int, ...], d: int, hw: int):
    """Transpose of plane_gather: g (N, K, C, P) -> dimg (N, C, D, HW) with
    g[:, k] accumulated at (z, yx + offsets[k]).

    The whole (K*C, D, HWP) output stays VMEM-resident across the streamed
    pixel tiles (grid = (N, T)) and each tile applies its banded one-hot
    matmuls as read-modify-writes — the (source-chunk x pixel-tile) grid of
    the flat corner_scatter would pay ~520k mostly-skipped grid steps per
    volume here.  When the output exceeds the VMEM budget the accumulator
    stays in HBM and each tile's banded chunks are read-modify-written
    through a VMEM scratch (_plane_scatter_streamed)."""
    n, k, c, p0 = g.shape
    assert min(offsets) >= 0, "corner offsets must be non-negative"
    hwp = -(-hw // _CH) * _CH
    n_chunks = hwp // _CH
    z4, yx4, n_tiles, _ = _plane_tiles(zidx, yxidx)
    g_r = g.reshape(n, k * c, p0)
    g_r, _ = _pad_to(g_r, _PT, axis=2)
    g_r = jnp.moveaxis(g_r.reshape(n, k * c, n_tiles, _PT), 1, 2)
    if not _fits_vmem(k, c, d * hwp):
        out = _plane_scatter_streamed(g_r, z4, yx4, k, c, d, hwp)
        return _plane_scatter_shift(out, n, k, c, d, hw, offsets)

    def kernel(z_ref, yx_ref, g_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[0] = jnp.zeros((k * c, d, hwp), jnp.float32)

        zp = z_ref[0, 0, 0, :]
        yxp = yx_ref[0, 0, 0, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, _CH), 1)
        zlo = jnp.maximum(jnp.min(zp), 0)
        zhi = jnp.max(zp) + 1
        lo = jnp.min(yxp) // _CH
        hi = jnp.minimum(jnp.max(yxp) // _CH + 1, n_chunks)
        gt = g_ref[0, 0]  # (K*C, PT)

        def zbody(z, _):
            def cbody(ci, _):
                base = pl.multiple_of(ci * _CH, _CH)
                oh = ((zp[:, None] == z)
                      & (yxp[:, None] - base == lane)).astype(jnp.float32)
                out_ref[0, :, z, pl.ds(base, _CH)] += _dot_f32(
                    gt, oh, (((1,), (0,)), ((), ())),
                    splits=_scatter_splits())
                return 0

            return jax.lax.fori_loop(lo, hi, cbody, 0)

        jax.lax.fori_loop(zlo, zhi, zbody, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, k * c, d, hwp), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k * c, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * c, d, hwp), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(z4, yx4, g_r)
    return _plane_scatter_shift(out, n, k, c, d, hw, offsets)


def _plane_scatter_shift(out, n, k, c, d, hw, offsets):
    """Corner k's contribution lands at yx + offsets[k] within its plane."""
    out = out.reshape(n, k, c, d, out.shape[-1])
    dimg = jnp.zeros((n, c, d, hw), jnp.float32)
    for ki, off in enumerate(offsets):
        plane = out[:, ki]
        if off > 0:
            plane = jnp.pad(plane,
                            ((0, 0), (0, 0), (0, 0), (off, 0)))[..., :hw]
        else:
            plane = plane[..., :hw]
        dimg = dimg + plane
    return dimg


def _plane_scatter_streamed(g_r, z4, yx4, k: int, c: int, d: int, hwp: int):
    """plane_scatter for accumulators over the VMEM budget: the whole
    accumulator lives in HBM (zero-initialized input aliased to the
    output, addressed FLAT (N, K*C, D*HWP) — see the streamed gather's
    Mosaic alignment note) and each pixel tile read-modify-writes only its
    banded (z, chunk) blocks through a (K*C, CH) VMEM scratch.  Grid steps
    are sequential per core, so the RMWs cannot race.  Returns
    (N, K*C, D, HWP)."""
    n, n_tiles = z4.shape[0], z4.shape[1]
    n_chunks = hwp // _CH
    # HBM DMA slices must be tile-aligned on the last two dims: pad the
    # row dim to KCP (multiple of 8) like the streamed gather
    kcp = -(-(k * c) // 8) * 8
    if kcp != k * c:
        g_r = jnp.pad(g_r, ((0, 0), (0, 0), (0, kcp - k * c), (0, 0)))
    init = jnp.zeros((n, kcp, d * hwp), jnp.float32)

    def kernel(z_ref, yx_ref, g_ref, acc_in_ref, acc_ref):
        del acc_in_ref  # aliased to acc_ref (zero-initialized)
        i = pl.program_id(0)
        zp = z_ref[0, 0, 0, :]
        yxp = yx_ref[0, 0, 0, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, _CH), 1)
        zlo = jnp.maximum(jnp.min(zp), 0)
        zhi = jnp.max(zp) + 1
        lo = jnp.min(yxp) // _CH
        hi = jnp.minimum(jnp.max(yxp) // _CH + 1, n_chunks)
        total = jnp.maximum(zhi - zlo, 0) * jnp.maximum(hi - lo, 0)
        ncb = jnp.maximum(hi - lo, 1)
        gt = g_ref[0, 0]  # (K*C, PT)

        def scoped(scratch, sem_r, sem_w):
            def body(t, _):
                z = zlo + t // ncb
                ci = lo + jax.lax.rem(t, ncb)
                base = pl.multiple_of(ci * _CH, _CH)
                off = pl.multiple_of(z * hwp + ci * _CH, _CH)
                blk = acc_ref.at[i, :, pl.ds(off, _CH)]
                rd = pltpu.make_async_copy(blk, scratch, sem_r)
                rd.start()
                rd.wait()
                oh = ((zp[:, None] == z)
                      & (yxp[:, None] - base == lane)).astype(jnp.float32)
                scratch[...] += _dot_f32(gt, oh, (((1,), (0,)), ((), ())),
                                         splits=_scatter_splits())
                wr = pltpu.make_async_copy(scratch, blk, sem_w)
                wr.start()
                wr.wait()
                return 0

            jax.lax.fori_loop(0, total, body, 0)

        pl.run_scoped(scoped, pltpu.VMEM((kcp, _CH), jnp.float32),
                      pltpu.SemaphoreType.DMA(()),
                      pltpu.SemaphoreType.DMA(()))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, kcp, d * hwp), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kcp, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases={3: 0},
        interpret=_interpret(),
    )(z4, yx4, g_r, init)
    return out[:, :k * c].reshape(n, k * c, d, hwp)


# --------------------------------------------------- 2D row-band kernels
#
# The chunk kernels above pay, per (tile, source chunk) pair, a full
# (PT x CH) = 512x512 one-hot compare plus an M = K*C-row MXU matmul —
# ~3-9% MXU row utilization, with the compare rebuilt for every chunk in
# the band.  The row-band kernels exploit the 2D structure instead: the
# one-hot runs over COLUMNS only ((PT x Wp), built ONCE per output tile),
# the matmul rows are an RB-row BAND of the image (M = 3*K*C*RB = 96-192
# rows -> 1-2 MXU row blocks), and the per-pixel row choice becomes a cheap
# VPU select over the RB band rows afterwards.  For the near-identity and
# blocked-rotation tiles this domain produces, the band is 1-2 RB segments,
# so a warp costs ~8-16 MXU passes/tile vs ~16 per CHUNK before.
#
# Both x taps (x, x+1) ride as K=2 pre-shifted image copies (extra matmul
# rows); both y taps (y, y+1) come from the same band matmul via two row
# selects — one kernel pass yields all four bilinear corners.

_RB = 16  # max band rows per segment (sublane-aligned; M = 3*K*C*RB)


def _band_rb(kc: int) -> int:
    """Band rows per segment for a KC-channel packed image (trace-time;
    ADVCHAIN_BAND_RB overrides for A/B benching).  RB=16 measured best at
    every KC: shrinking to RB=8 at KC=4 makes M = 3*KC*RB one MXU row
    block instead of two, but the 8-aligned band start means a 512-px
    row-major tile's ~3-11-row span then needs a second segment (own
    matmul + row selects), which costs more than the saved row block
    (measured: warp c=2 37.8->45.6 ms, ss8 fwd+bwd 190->200 ms)."""
    ov = os.environ.get("ADVCHAIN_BAND_RB")
    if ov:
        rb = int(ov)
        # band segments start at 8-aligned rows and the kernel promises
        # pl.multiple_of(rlo8 + si*rb, 8) — a non-multiple-of-8 override
        # would be a false alignment promise (silent wrong results)
        assert rb > 0 and rb % 8 == 0, \
            f"ADVCHAIN_BAND_RB must be a positive multiple of 8, got {rb}"
        return rb
    return 16


def _band_pack(img, rb):
    """(N, C, H, W) -> (N, 2C, Hp, Wp): K=2 x-shifted copies, rows padded
    so any RB segment starting at an 8-aligned row <= max(y)+1 stays in
    bounds without clamping (clamping would re-cover rows and double-count
    in the scatter), columns padded to the 128 lane tile."""
    n, c, h, w = img.shape
    hp = -(-(h + rb) // 8) * 8
    wp = -(-w // 128) * 128
    img_p = jnp.pad(img, ((0, 0), (0, 0), (0, hp - h), (0, wp + 1 - w)))
    img_k = jnp.stack([img_p[..., 0:wp], img_p[..., 1:wp + 1]], axis=1)
    return img_k.reshape(n, 2 * c, hp, wp), hp, wp


def _band_tiles(yidx, xidx):
    """Pad to _PT and tile; y pads -1 (excluded from the band min; its
    sel1 row-0 match gathers garbage into sliced-off outputs only)."""
    n = yidx.shape[0]
    y_p, p_orig = _pad_to(yidx, _PT, axis=1, value=-1)
    x_p, _ = _pad_to(xidx, _PT, axis=1)
    t = y_p.shape[1] // _PT
    return y_p.reshape(n, t, 1, _PT), x_p.reshape(n, t, 1, _PT), t, p_orig


def _band_ranges(yp, rb):
    """8-aligned band start and segment count covering [min(y), max(y)+1]."""
    rlo = jnp.min(jnp.where(yp < 0, jnp.int32(2 ** 30), yp))
    rlo8 = jnp.minimum(rlo, jnp.int32(2 ** 30 - 8)) // 8 * 8
    rhi = jnp.max(yp) + 1
    nseg = jnp.maximum((rhi - rlo8) // rb + 1, 0)
    return rlo8, nseg


@functools.partial(jax.jit, static_argnames=())
def band_gather(img, yidx, xidx):
    """img: (N, C, H, W); yidx/xidx: (N, P) int32 clipped to the image;
    returns vals (N, 4, C, P) = img at [(y,x), (y,x+1), (y+1,x), (y+1,x+1)]
    with zero padding past H/W (call sites fold collapsed-tap weights)."""
    n, c, h, w = img.shape
    kc = 2 * c
    rb = _band_rb(kc)
    img_k, hp, wp = _band_pack(img, rb)
    y4, x4, n_tiles, p_orig = _band_tiles(yidx, xidx)

    def kernel(y_ref, x_ref, img_ref, out_ref):
        yp = y_ref[0, 0, 0, :]
        xp = x_ref[0, 0, 0, :]
        # one-hot built TRANSPOSED (Wp, PT): the matmul then contracts
        # natural-layout operands — LHS (M, Wp) K-minor, RHS (Wp, PT)
        # K-major — so Mosaic issues no RHS relayout per tile (measured
        # -23% on the c=1 warp, -21% c=2, -12% c=5 vs the (PT, Wp)
        # orientation; scripts/band_variants_bench.py)
        lane = jax.lax.broadcasted_iota(jnp.int32, (wp, _PT), 0)
        oh = (xp[None, :] == lane).astype(jnp.bfloat16)
        rlo8, nseg = _band_ranges(yp, rb)

        def seg(si, accs):
            a0, a1 = accs
            base = pl.multiple_of(rlo8 + si * rb, 8)
            band = img_ref[0, :, pl.ds(base, rb), :]  # (KC, RB, Wp)
            r = _dot_f32(band.reshape(kc * rb, wp), oh,
                         (((1,), (0,)), ((), ())))  # (KC*RB, PT)
            r3 = r.reshape(kc, rb, _PT)
            rowi = base + jax.lax.broadcasted_iota(jnp.int32, (rb, _PT), 0)
            s0 = (yp[None, :] == rowi).astype(jnp.float32)
            s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
            return (a0 + jnp.sum(r3 * s0[None], axis=1),
                    a1 + jnp.sum(r3 * s1[None], axis=1))

        z = jnp.zeros((kc, _PT), jnp.float32)
        a0, a1 = jax.lax.fori_loop(0, nseg, seg, (z, z))
        # rows: [v00 (C), v01 (C), v10 (C), v11 (C)] — x-shift major in a0/a1
        res = jnp.concatenate([a0, a1], axis=0)
        if direct:
            out_ref[0] = res
        else:
            out_ref[0, 0] = res

    # Direct (N, 4C, T*PT) output layout (blocks land at (i, 0, j), the
    # corner-major result is a free reshape — no XLA moveaxis pass):
    # round-4 measured it -1.4% pre-transposed-one-hot; re-measured round 5
    # as an A/B knob since the kernel balance changed.  ADVCHAIN_BAND_DIRECT.
    direct = os.environ.get("ADVCHAIN_BAND_DIRECT", "0") == "1"
    if direct:
        out_shape = jax.ShapeDtypeStruct((n, 4 * c, n_tiles * _PT),
                                         jnp.float32)
        out_spec = pl.BlockSpec((1, 4 * c, _PT), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((n, n_tiles, 4 * c, _PT),
                                         jnp.float32)
        out_spec = pl.BlockSpec((1, 1, 4 * c, _PT), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, hp, wp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=_interpret(),
    )(y4, x4, img_k)
    if direct:
        # rows are [y0:(x0 C | x1 C) | y1:(x0 C | x1 C)] = corner order
        return out.reshape(n, 4, c, n_tiles * _PT)[..., :p_orig]
    # (N, T, [x0|x1 per y-tap]*C, PT) -> (N, 4, C, P) in corner order
    out = out.reshape(n, n_tiles, 2, 2, c, _PT)  # (.., y-tap, x-shift, C, .)
    out = jnp.moveaxis(out, 1, 4)  # (N, ytap, xshift, C, T, PT)
    return out.reshape(n, 4, c, n_tiles * _PT)[..., :p_orig]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def band_scatter(g, yidx, xidx, h: int, w: int):
    """Transpose of band_gather: g (N, 4, C, P) in corner order
    [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] -> dimg (N, C, H, W).
    Contributions past H/W (collapsed taps; their weights are zero) drop."""
    n, four, c, p0 = g.shape
    assert four == 4
    kc = 2 * c
    rb = _band_rb(kc)
    hp = -(-(h + rb) // 8) * 8
    wp = -(-w // 128) * 128
    y4, x4, n_tiles, _ = _band_tiles(yidx, xidx)
    # direct mode reads g blocks straight from the free-reshape (N, 4C, P)
    # layout at (i, 0, j) — no XLA moveaxis pass (see band_gather's NOTE)
    direct = os.environ.get("ADVCHAIN_BAND_DIRECT", "0") == "1"
    g_r = g.reshape(n, 2, 2, c, p0).reshape(n, 4 * c, p0)
    g_r, _ = _pad_to(g_r, _PT, axis=2)
    if not direct:
        # (N, 4C, P) -> (N, T, 4C, PT): tile-major blocks
        g_r = jnp.moveaxis(g_r.reshape(n, 4 * c, n_tiles, _PT), 1, 2)

    def kernel(y_ref, x_ref, g_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[0] = jnp.zeros((kc, hp, wp), jnp.float32)

        yp = y_ref[0, 0, 0, :]
        xp = x_ref[0, 0, 0, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, wp), 1)
        oh = (xp[:, None] == lane).astype(jnp.bfloat16)
        rlo8, nseg = _band_ranges(yp, rb)
        gt = g_ref[0] if direct else g_ref[0, 0]  # (4C, PT), C rows per tap
        g0 = gt[:kc]      # y-tap 0, both x shifts
        g1 = gt[kc:]      # y-tap 1

        def seg(si, _):
            base = pl.multiple_of(rlo8 + si * rb, 8)
            rowi = base + jax.lax.broadcasted_iota(jnp.int32, (rb, _PT), 0)
            s0 = (yp[None, :] == rowi).astype(jnp.float32)
            s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
            gb = (g0[:, None, :] * s0[None] + g1[:, None, :] * s1[None])
            contrib = _dot_f32(gb.reshape(kc * rb, _PT), oh,
                               (((1,), (0,)), ((), ())),
                               splits=_scatter_splits())  # (KC*RB, Wp)
            out_ref[0, :, pl.ds(base, rb), :] += contrib.reshape(
                kc, rb, wp)
            return 0

        jax.lax.fori_loop(0, nseg, seg, 0)

    if direct:
        g_spec = pl.BlockSpec((1, 4 * c, _PT), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
    else:
        g_spec = pl.BlockSpec((1, 1, 4 * c, _PT), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, kc, hp, wp), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            g_spec,
        ],
        out_specs=pl.BlockSpec((1, kc, hp, wp), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(y4, x4, g_r)
    out = out.reshape(n, 2, c, hp, wp)
    dimg = out[:, 0, :, :h, :w]
    # the x+1 copy's column x holds the (., x+1) tap: shift right one col
    dimg = dimg.at[:, :, :, 1:].add(out[:, 1, :, :h, :w - 1])
    return dimg


# ------------------------------------------- 3D (z, y)-band trilinear path
#
# The plane kernels sweep a per-(z, chunk) one-hot over 512-lane windows:
# at 10-deg rotation a blocked (1, 8, 64) tile still sweeps ~16 blocks of
# 16 MXU tiles each for 512 outputs (round-4 device trace: plane gathers
# sustain 2-16 GB/s operand bandwidth and own ~77% of the 3D episode).
# The z-band kernel is band_gather lifted to 3D: one x one-hot (PT, Wp)
# built per tile and shared across every (z, y-band) block; each block is
# ONE (3*2C*RB, Wp) x (PT, Wp) matmul over a contiguous y band of one z
# plane, and the (z0/z1, y0/y1) tap choice is 4 cheap VPU row selects.
# Blocks per tile ~ zrange * ceil(yspan/RB) ~ 2-4 at 10 deg (vs ~16), each
# 8 MXU tiles (vs 16): ~10x less MXU sweep for rotated c=1 volume warps.

_ZRB = 16  # y rows per band segment (sublane-aligned)


def _zband_budget() -> int:
    ov = os.environ.get("ADVCHAIN_ZBAND_BUDGET")
    return int(ov) if ov else 6 * 1024 * 1024


def _zband_dims(c: int, d: int, h: int, w: int):
    hp = -(-(h + _ZRB) // 8) * 8
    wp = -(-w // 128) * 128
    return hp, wp, 2 * c * d * hp * wp * 4


def _zband_channel_groups(c: int, w: int):
    """Balanced channel groups for the z-band path.  The streamed kernel's
    VMEM working set scales linearly with the channel count — the
    double-buffered (2, 2C, RB, Wp) scratch plus the (8C, PT) output /
    accumulator / gradient blocks — so very wide volumes (~100+ channels
    at w=192) would exceed VMEM and fail Mosaic compilation in one call.
    Groups are capped so the per-group working set stays ~4 MiB."""
    wp = -(-w // 128) * 128
    per_c = 256 * wp + 128 * 1024  # scratch + out/acc/grad blocks, bytes
    cg = max(1, (4 * 1024 * 1024) // per_c)
    if c <= cg:
        return [(0, c)]
    n_groups = -(-c // cg)
    size = -(-c // n_groups)  # balanced: avoids an odd-size final group
    return [(i, min(size, c - i)) for i in range(0, c, size)]




def _zband_pack(img, rb):
    """(N, C, D, H, W) -> (N, 2C, D, Hp, Wp): K=2 x-shifted copies; rows
    padded per plane so any RB band starting at an 8-aligned row
    <= max(y)+1 stays inside its plane; columns padded to the lane tile."""
    n, c, d, h, w = img.shape
    hp, wp, _ = _zband_dims(c, d, h, w)
    img_p = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, hp - h),
                          (0, wp + 1 - w)))
    img_k = jnp.stack([img_p[..., 0:wp], img_p[..., 1:wp + 1]], axis=1)
    return img_k.reshape(n, 2 * c, d, hp, wp), hp, wp


def _zband_tiles(zidx, yidx, xidx):
    """Pad to _PT and tile; z/y pad -1 (excluded from band minima; their
    +1-tap matches gather garbage into sliced-off outputs only)."""
    n = zidx.shape[0]
    z_p, p_orig = _pad_to(zidx, _PT, axis=1, value=-1)
    y_p, _ = _pad_to(yidx, _PT, axis=1, value=-1)
    x_p, _ = _pad_to(xidx, _PT, axis=1)
    t = z_p.shape[1] // _PT
    return (z_p.reshape(n, t, 1, _PT), y_p.reshape(n, t, 1, _PT),
            x_p.reshape(n, t, 1, _PT), t, p_orig)


def _zband_zrange(zp, d):
    """z loop bounds covering both z taps; empty for all-padding tiles."""
    zlo = jnp.minimum(jnp.min(jnp.where(zp < 0, jnp.int32(2 ** 30), zp)),
                      jnp.int32(d))
    zhi = jnp.minimum(jnp.max(zp) + 2, jnp.int32(d))
    return zlo, jnp.maximum(zhi - zlo, 0)


@functools.partial(jax.jit, static_argnames=())
def zband_gather(img, zidx, yidx, xidx):
    """img: (N, C, D, H, W); z/y/xidx: (N, P) int32 clipped bases; returns
    vals (N, 8, C, P) at the 8 trilinear corners in (dz, dy, dx) binary
    order, zero past D/H/W (call sites fold collapsed-tap weights).

    VMEM-resident when the K=2 x-shifted stack fits the z-band budget;
    otherwise the stack stays in HBM and each (z, y-band) block streams
    through a double-buffered (2, KC, RB, Wp) scratch — ONE multi-channel
    call whose one-hot/selects are shared by every channel as extra
    matmul rows, instead of per-channel-group resident calls each
    rebuilding them (round-4: prediction warp c=5 18.0 -> ~14 ms)."""
    n, c, d, h, w = img.shape
    kc = 2 * c
    rb = _ZRB
    img_k, hp, wp = _zband_pack(img, rb)
    z4, y4, x4, n_tiles, p_orig = _zband_tiles(zidx, yidx, xidx)
    resident = kc * d * hp * wp * 4 <= _zband_budget()

    def tile_state(z_ref, y_ref, x_ref):
        zp = z_ref[0, 0, 0, :]
        yp = y_ref[0, 0, 0, :]
        xp = x_ref[0, 0, 0, :]
        # transposed (Wp, PT) one-hot: natural MXU layouts on both matmul
        # operands, no per-tile RHS relayout (see band_gather)
        lane = jax.lax.broadcasted_iota(jnp.int32, (wp, _PT), 0)
        oh = (xp[None, :] == lane).astype(jnp.bfloat16)
        rlo8, nseg = _band_ranges(yp, rb)
        zlo, nz = _zband_zrange(zp, d)
        total = nz * jnp.maximum(nseg, 0)
        nsg = jnp.maximum(nseg, 1)  # div-safe (total==0 skips the loop)
        return zp, yp, oh, rlo8, zlo, total, nsg

    def accumulate(band, zp, yp, oh, z, base, accs):
        a00, a01, a10, a11 = accs
        r = _dot_f32(band.reshape(kc * rb, wp), oh,
                     (((1,), (0,)), ((), ())))  # (KC*RB, PT)
        r3 = r.reshape(kc, rb, _PT)
        rowi = base + jax.lax.broadcasted_iota(jnp.int32, (rb, _PT), 0)
        sy0 = (yp[None, :] == rowi)
        sy1 = (yp[None, :] + 1 == rowi)
        sz0 = (zp == z)[None, :]
        sz1 = (zp + 1 == z)[None, :]
        s00 = (sy0 & sz0).astype(jnp.float32)
        s01 = (sy1 & sz0).astype(jnp.float32)
        s10 = (sy0 & sz1).astype(jnp.float32)
        s11 = (sy1 & sz1).astype(jnp.float32)
        return (a00 + jnp.sum(r3 * s00[None], axis=1),
                a01 + jnp.sum(r3 * s01[None], axis=1),
                a10 + jnp.sum(r3 * s10[None], axis=1),
                a11 + jnp.sum(r3 * s11[None], axis=1))

    zero3 = (kc, _PT)

    if resident:
        def kernel(z_ref, y_ref, x_ref, img_ref, out_ref):
            zp, yp, oh, rlo8, zlo, total, nsg = tile_state(z_ref, y_ref,
                                                           x_ref)

            def blk(t, accs):
                z = zlo + t // nsg
                si = jax.lax.rem(t, nsg)
                base = pl.multiple_of(rlo8 + si * rb, 8)
                band = img_ref[0, :, z, pl.ds(base, rb), :]
                return accumulate(band, zp, yp, oh, z, base, accs)

            zero = jnp.zeros(zero3, jnp.float32)
            a00, a01, a10, a11 = jax.lax.fori_loop(
                0, total, blk, (zero, zero, zero, zero))
            # rows: (z-tap, y-tap, x-shift, C) major to minor
            out_ref[0] = jnp.concatenate([a00, a01, a10, a11], axis=0)

        img_spec = pl.BlockSpec((1, kc, d, hp, wp),
                                lambda i, j: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # streamed: the packed stack stays in HBM as (N, KC, D*Hp, Wp) —
        # a band at (z, base) is rows [z*hp + base, +RB) of the flattened
        # row axis, an 8-aligned slice on the second-minor dim (Hp, base,
        # RB all multiples of 8) with full Wp lanes.  Double-buffered:
        # block t+1's DMA overlaps block t's matmul + selects.
        img_k = img_k.reshape(n, kc, d * hp, wp)

        def kernel(z_ref, y_ref, x_ref, img_ref, out_ref):
            i = pl.program_id(0)
            zp, yp, oh, rlo8, zlo, total, nsg = tile_state(z_ref, y_ref,
                                                           x_ref)

            def scoped(scratch, sem):
                def get_dma(slot, t):
                    z = zlo + t // nsg
                    si = jax.lax.rem(t, nsg)
                    r0 = pl.multiple_of(z * hp + rlo8 + si * rb, 8)
                    return pltpu.make_async_copy(
                        img_ref.at[i, :, pl.ds(r0, rb), :],
                        scratch.at[slot], sem.at[slot])

                @pl.when(total > 0)
                def _():
                    get_dma(0, 0).start()

                def blk(t, accs):
                    slot = jax.lax.rem(t, 2)

                    @pl.when(t + 1 < total)
                    def _():
                        get_dma(1 - slot, t + 1).start()

                    get_dma(slot, t).wait()
                    z = zlo + t // nsg
                    si = jax.lax.rem(t, nsg)
                    base = pl.multiple_of(rlo8 + si * rb, 8)
                    return accumulate(scratch[slot], zp, yp, oh, z, base,
                                      accs)

                zero = jnp.zeros(zero3, jnp.float32)
                a00, a01, a10, a11 = jax.lax.fori_loop(
                    0, total, blk, (zero, zero, zero, zero))
                out_ref[0] = jnp.concatenate([a00, a01, a10, a11], axis=0)

            pl.run_scoped(scoped, pltpu.VMEM((2, kc, rb, wp), jnp.float32),
                          pltpu.SemaphoreType.DMA((2,)))

        img_spec = pl.BlockSpec(memory_space=pl.ANY)

    # blocks land directly in the (N, 8C, T*PT) global layout so the
    # corner-major result is a free reshape (see band_gather)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 8 * c, n_tiles * _PT),
                                       jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            img_spec,
        ],
        out_specs=pl.BlockSpec((1, 8 * c, _PT), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(z4, y4, x4, img_k)
    # (N, [ztap, ytap, xshift, C], P) -> (N, 8, C, P), (dz, dy, dx) order
    return out.reshape(n, 8, c, n_tiles * _PT)[..., :p_orig]


@functools.partial(jax.jit, static_argnames=("d", "h", "w"))
def zband_scatter(g, zidx, yidx, xidx, d: int, h: int, w: int):
    """Transpose of zband_gather: g (N, 8, C, P) in (dz, dy, dx) corner
    order -> dimg (N, C, D, H, W).  Contributions past D/H/W (collapsed
    taps; zero weights) drop.  VMEM-resident accumulator when the stack
    fits the z-band budget; otherwise the accumulator lives in HBM (flat
    (N, KC, D*Hp, Wp), zero-init input aliased to the output) and each
    (z, y-band) block is read-modify-written through a VMEM scratch —
    grid steps are sequential per core, so the RMWs cannot race."""
    n, eight, c, p0 = g.shape
    assert eight == 8
    kc = 2 * c
    rb = _ZRB
    hp, wp, _ = _zband_dims(c, d, h, w)
    z4, y4, x4, n_tiles, _ = _zband_tiles(zidx, yidx, xidx)
    # (N, 8C, T*PT) — tile j reads its PT columns via the index map
    g_r = g.reshape(n, 8 * c, p0)
    g_r, _ = _pad_to(g_r, _PT, axis=2)
    resident = kc * d * hp * wp * 4 <= _zband_budget()

    def tile_state(z_ref, y_ref, x_ref, g_ref):
        zp = z_ref[0, 0, 0, :]
        yp = y_ref[0, 0, 0, :]
        xp = x_ref[0, 0, 0, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, wp), 1)
        oh = (xp[:, None] == lane).astype(jnp.bfloat16)
        rlo8, nseg = _band_ranges(yp, rb)
        zlo, nz = _zband_zrange(zp, d)
        total = nz * jnp.maximum(nseg, 0)
        nsg = jnp.maximum(nseg, 1)
        gt = g_ref[0]  # (8C, PT): (ztap, ytap, xshift, C) rows
        return zp, yp, oh, rlo8, zlo, total, nsg, gt

    def block_contrib(zp, yp, oh, gt, z, base):
        g00, g01, g10, g11 = (gt[:kc], gt[kc:2 * kc], gt[2 * kc:3 * kc],
                              gt[3 * kc:])
        rowi = base + jax.lax.broadcasted_iota(jnp.int32, (rb, _PT), 0)
        sy0 = (yp[None, :] == rowi)
        sy1 = (yp[None, :] + 1 == rowi)
        sz0 = (zp == z)[None, :]
        sz1 = (zp + 1 == z)[None, :]
        gb = (g00[:, None, :] * (sy0 & sz0).astype(jnp.float32)[None]
              + g01[:, None, :] * (sy1 & sz0).astype(jnp.float32)[None]
              + g10[:, None, :] * (sy0 & sz1).astype(jnp.float32)[None]
              + g11[:, None, :] * (sy1 & sz1).astype(jnp.float32)[None])
        contrib = _dot_f32(gb.reshape(kc * rb, _PT), oh,
                           (((1,), (0,)), ((), ())),
                           splits=_scatter_splits())  # (KC*RB, Wp)
        return contrib.reshape(kc, rb, wp)

    if resident:
        def kernel(z_ref, y_ref, x_ref, g_ref, out_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                out_ref[0] = jnp.zeros((kc, d, hp, wp), jnp.float32)

            zp, yp, oh, rlo8, zlo, total, nsg, gt = tile_state(
                z_ref, y_ref, x_ref, g_ref)

            def blk(t, _):
                z = zlo + t // nsg
                si = jax.lax.rem(t, nsg)
                base = pl.multiple_of(rlo8 + si * rb, 8)
                out_ref[0, :, z, pl.ds(base, rb), :] += block_contrib(
                    zp, yp, oh, gt, z, base)
                return 0

            jax.lax.fori_loop(0, total, blk, 0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, kc, d, hp, wp), jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8 * c, _PT), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, kc, d, hp, wp),
                                   lambda i, j: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(z4, y4, x4, g_r)
        out = out.reshape(n, 2, c, d, hp, wp)
    else:
        init = jnp.zeros((n, kc, d * hp, wp), jnp.float32)

        def kernel(z_ref, y_ref, x_ref, g_ref, acc_in_ref, acc_ref):
            del acc_in_ref  # aliased to acc_ref (zero-initialized)
            i = pl.program_id(0)
            zp, yp, oh, rlo8, zlo, total, nsg, gt = tile_state(
                z_ref, y_ref, x_ref, g_ref)

            def scoped(scratch, sem_r, sem_w):
                def blk(t, _):
                    z = zlo + t // nsg
                    si = jax.lax.rem(t, nsg)
                    base = pl.multiple_of(rlo8 + si * rb, 8)
                    r0 = pl.multiple_of(z * hp + base, 8)
                    blk_ref = acc_ref.at[i, :, pl.ds(r0, rb), :]
                    rd = pltpu.make_async_copy(blk_ref, scratch, sem_r)
                    rd.start()
                    rd.wait()
                    scratch[...] += block_contrib(zp, yp, oh, gt, z, base)
                    wr = pltpu.make_async_copy(scratch, blk_ref, sem_w)
                    wr.start()
                    wr.wait()
                    return 0

                jax.lax.fori_loop(0, total, blk, 0)

            pl.run_scoped(scoped, pltpu.VMEM((kc, rb, wp), jnp.float32),
                          pltpu.SemaphoreType.DMA(()),
                          pltpu.SemaphoreType.DMA(()))

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, kc, d * hp, wp),
                                           jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8 * c, _PT), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            input_output_aliases={4: 0},
            interpret=_interpret(),
        )(z4, y4, x4, g_r, init)
        out = out.reshape(n, 2, c, d, hp, wp)
    dimg = out[:, 0, :, :, :h, :w]
    # the x+1 copy's column x holds the (., ., x+1) tap: shift right one
    dimg = dimg.at[:, :, :, :, 1:].add(out[:, 1, :, :, :h, :w - 1])
    return dimg


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _weighted_zband_sample(img, payload, d: int, h: int, w: int):
    """out[n,c,p] = sum_k w[n,k,p] * img[n,c, z+dz_k, y+dy_k, x+dx_k] on
    the z-band kernels; payload = (zidx, yidx, xidx int32 (N,P), weights
    (N,8,P)) in (dz, dy, dx) binary corner order."""
    zidx, yidx, xidx, weights = payload
    vals = zband_gather(img, zidx, yidx, xidx)
    return jnp.einsum("nkp,nkcp->ncp", weights, vals)


def _wzs_fwd(img, payload, d, h, w):
    zidx, yidx, xidx, weights = payload
    vals = zband_gather(img, zidx, yidx, xidx)
    out = jnp.einsum("nkp,nkcp->ncp", weights, vals)
    return out, (zidx, yidx, xidx, weights, vals)


def _wzs_bwd(d, h, w, res, g):
    zidx, yidx, xidx, weights, vals = res
    d_weights = jnp.einsum("ncp,nkcp->nkp", g, vals)
    g_corners = jnp.einsum("ncp,nkp->nkcp", g, weights)
    d_img = zband_scatter(g_corners, zidx, yidx, xidx, d, h, w)
    return d_img, (None, None, None, d_weights)


_weighted_zband_sample.defvjp(_wzs_fwd, _wzs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _weighted_band_sample(img, payload, h: int, w: int):
    """out[n,c,p] = sum_k w[n,k,p] * img[n,c, y+dy_k, x+dx_k] on the
    row-band kernels; payload = (yidx, xidx int32 (N,P), weights (N,4,P))
    in corner order [(0,0), (0,1), (1,0), (1,1)]."""
    yidx, xidx, weights = payload
    vals = band_gather(img, yidx, xidx)
    return jnp.einsum("nkp,nkcp->ncp", weights, vals)


def _wbs_fwd(img, payload, h, w):
    yidx, xidx, weights = payload
    vals = band_gather(img, yidx, xidx)
    out = jnp.einsum("nkp,nkcp->ncp", weights, vals)
    return out, (yidx, xidx, weights, vals)


def _wbs_bwd(h, w, res, g):
    yidx, xidx, weights, vals = res
    d_weights = jnp.einsum("ncp,nkcp->nkp", g, vals)
    g_corners = jnp.einsum("ncp,nkp->nkcp", g, weights)
    d_img = band_scatter(g_corners, yidx, xidx, h, w)
    return d_img, (None, None, d_weights)


_weighted_band_sample.defvjp(_wbs_fwd, _wbs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _weighted_plane_sample(img, payload, offsets: Tuple[int, ...], d: int,
                           hw: int):
    """out[n,c,p] = sum_k w[n,k,p] * img[n,c, z[n,p], yx[n,p]+offsets[k]].

    payload = (zidx, yxidx int32 (N,P), weights (N,K,P)).  Gradients flow
    to img (plane_scatter) and weights; indices are non-differentiable."""
    zidx, yxidx, weights = payload
    vals = plane_gather(img, zidx, yxidx, offsets)
    return jnp.einsum("nkp,nkcp->ncp", weights, vals)


def _wps_fwd(img, payload, offsets, d, hw):
    zidx, yxidx, weights = payload
    vals = plane_gather(img, zidx, yxidx, offsets)
    out = jnp.einsum("nkp,nkcp->ncp", weights, vals)
    return out, (zidx, yxidx, weights, vals)


def _wps_bwd(offsets, d, hw, res, g):
    zidx, yxidx, weights, vals = res
    d_weights = jnp.einsum("ncp,nkcp->nkp", g, vals)
    g_corners = jnp.einsum("ncp,nkp->nkcp", g, weights)
    d_img = plane_scatter(g_corners, zidx, yxidx, offsets, d, hw)
    return d_img, (None, None, d_weights)


_weighted_plane_sample.defvjp(_wps_fwd, _wps_bwd)


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


def _vmem_budget() -> int:
    """Trace-time A/B knob (scripts/warp3d_bench.py)."""
    ov = os.environ.get("ADVCHAIN_VMEM_IMG_BUDGET")
    return int(ov) if ov else _VMEM_IMG_BUDGET


def _fits_vmem(k: int, c: int, s: int) -> bool:
    return k * c * s * 4 <= _vmem_budget()


def _channel_groups(k: int, c: int, s: int):
    """Split C channels into balanced groups whose K-stacked image fits the
    VMEM budget (the one-hot compare is recomputed per group, but the kernel
    stays on the Pallas path instead of falling back to XLA's pathological
    gather).  Returns a list of (start, size) or None when even one channel
    does not fit."""
    budget = _vmem_budget()
    per_c = k * s * 4
    if per_c > budget:
        return None
    cg = min(c, budget // per_c)
    n_groups = -(-c // cg)
    size = -(-c // n_groups)  # balanced: avoids an odd-size final group
    return [(i, min(size, c - i)) for i in range(0, c, size)]


# blocked output-tile patch (PH x PW = _PT): keeps each kernel tile's source
# band narrow for ROTATING warps, where row-major tiles are pathological (a
# rotation theta spreads one 512-px row-major tile over ~sin(theta)*W source
# rows -> a near-full chunk sweep; a 16x32 patch spreads only
# ~sin(theta)*32 + cos(theta)*16 rows).  Row-major stays optimal for the
# near-identity warps (morph flows), so the order is a per-call-site hint.
_BPH, _BPW = (16, 32) if _PT == 512 else (32, _PT // 32)
assert _BPH * _BPW == _PT


def _blockify_2d(t, ho: int, wo: int):
    """(N, Ho, Wo, ...) -> (N, P, ...) in (patch-row, patch-col, in-patch)
    order."""
    lead, trail = t.shape[:1], t.shape[3:]
    t = t.reshape(lead + (ho // _BPH, _BPH, wo // _BPW, _BPW) + trail)
    t = jnp.swapaxes(t, 2, 3)
    return t.reshape(lead + (ho * wo,) + trail)


def _deblockify_2d(out, ho: int, wo: int):
    """(N, C, P) in blocked order -> (N, C, Ho, Wo)."""
    n, c = out.shape[:2]
    out = out.reshape(n, c, ho // _BPH, wo // _BPW, _BPH, _BPW)
    out = jnp.swapaxes(out, 3, 4)
    return out.reshape(n, c, ho, wo)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "tile_order"))
def grid_sample_2d_pallas(x, grid, padding_mode: str = "zeros",
                          align_corners: bool = True,
                          tile_order: str = "rows"):
    """Drop-in bilinear 2D grid sample (torch semantics) on the Pallas
    gather-matmul path.  x: (N, C, H, W); grid: (N, Ho, Wo, 2).

    ``tile_order``: 'rows' (default; optimal for near-identity warps) or
    'blocks' (16x32 output patches per kernel tile; use for warps with
    large rotation/shear where a row-major tile's source band degenerates
    to a full-image sweep).  Falls back to 'rows' when the output shape
    doesn't tile into 16x32 patches."""
    from advchain_tpu.ops.grid_sample import _prep_coord

    groups = _channel_groups(4, x.shape[1], x.shape[2] * x.shape[3])
    if groups is None:  # streamed kernel: no channel split needed
        groups = [(0, x.shape[1])]

    n, c, h, w = x.shape
    _, ho, wo, two = grid.shape
    assert two == 2
    blocked = (tile_order == "blocks" and ho % _BPH == 0 and wo % _BPW == 0)
    if blocked:
        grid = _blockify_2d(grid, ho, wo)
        gx = grid[..., 0]
        gy = grid[..., 1]
    else:
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

    # row-band kernel dispatch: per channel group, the packed (2C, Hp, Wp)
    # band image must fit the VMEM budget (the band path has no streamed
    # variant; oversized images fall back to the streamed chunk kernels).
    # Budget with the actual (possibly env-overridden) RB, not the default.
    hp_b = -(-(h + _band_rb(2 * c)) // 8) * 8
    wp_b = -(-w // 128) * 128
    bgroups = _channel_groups(2, c, hp_b * wp_b) if _band_enabled() else None
    if bgroups is not None:
        yb = y0c.astype(jnp.int32)
        xb = x0c.astype(jnp.int32)
        xf = x.astype(jnp.float32)
        payload = (yb, xb, weights.astype(jnp.float32))
        parts = [_weighted_band_sample(xf[:, i:i + sz], payload, h, w)
                 for i, sz in bgroups]
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        if blocked:
            return _deblockify_2d(out, ho, wo).astype(x.dtype)
        return out.reshape(n, c, ho, wo).astype(x.dtype)

    x_flat = x.reshape(n, c, h * w).astype(jnp.float32)
    payload = (base, weights.astype(jnp.float32))
    parts = [_weighted_corner_sample(x_flat[:, i:i + sz], payload,
                                     (0, 1, w, w + 1), h * w)
             for i, sz in groups]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if blocked:
        return _deblockify_2d(out, ho, wo).astype(x.dtype)
    return out.reshape(n, c, ho, wo).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "tile_order"))
def grid_sample_2d_pallas_nearest(x, grid, padding_mode: str = "zeros",
                                  align_corners: bool = True,
                                  tile_order: str = "rows"):
    """Nearest-neighbor 2D grid sample (torch semantics) on the Pallas
    band kernels: a nearest tap is the bilinear gather's corner 0 with
    unit weight (round the coordinate, zero the other three corners), so
    nearest-interp configs (reference adv_affine.py:79-82 legal
    ``forward_interp='nearest'``; my_rand_augment.py warps) ride the same
    TPU path instead of XLA's pathological gather.  Grid gradients are
    zero (piecewise-constant), matching torch."""
    from advchain_tpu.ops.grid_sample import _prep_coord

    n, c, h, w = x.shape
    _, ho, wo, two = grid.shape
    assert two == 2
    blocked = (tile_order == "blocks" and ho % _BPH == 0 and wo % _BPW == 0)
    if blocked:
        grid = _blockify_2d(grid, ho, wo)
        gx, gy = grid[..., 0], grid[..., 1]
    else:
        gx = grid[..., 0].reshape(n, ho * wo)
        gy = grid[..., 1].reshape(n, ho * wo)
    ix = _prep_coord(gx, w, align_corners, padding_mode)
    iy = _prep_coord(gy, h, align_corners, padding_mode)
    # torch rounds half-to-even (std::nearbyint); jnp.round matches
    ix_n = jnp.round(ix)
    iy_n = jnp.round(iy)
    if padding_mode == "zeros":
        w0 = ((ix_n >= 0) & (ix_n <= w - 1) & (iy_n >= 0)
              & (iy_n <= h - 1)).astype(jnp.float32)
    else:
        w0 = jnp.ones_like(ix_n)
    xb = jnp.clip(ix_n, 0, w - 1).astype(jnp.int32)
    yb = jnp.clip(iy_n, 0, h - 1).astype(jnp.int32)
    zero = jnp.zeros_like(w0)
    hp_b = -(-(h + _band_rb(2 * c)) // 8) * 8
    wp_b = -(-w // 128) * 128
    bgroups = _channel_groups(2, c, hp_b * wp_b) if _band_enabled() else None
    xf = x.astype(jnp.float32)
    if bgroups is not None:
        weights = jnp.stack([w0, zero, zero, zero], axis=1)  # (N, 4, P)
        payload = (yb, xb, weights)
        parts = [_weighted_band_sample(xf[:, i:i + sz], payload, h, w)
                 for i, sz in bgroups]
    else:
        base = yb * w + xb
        weights = w0[:, None, :]  # (N, 1, P): single unit-weight tap
        groups = _channel_groups(1, c, h * w) or [(0, c)]
        x_flat = xf.reshape(n, c, h * w)
        parts = [_weighted_corner_sample(x_flat[:, i:i + sz],
                                         (base, weights), (0,), h * w)
                 for i, sz in groups]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if blocked:
        return _deblockify_2d(out, ho, wo).astype(x.dtype)
    return out.reshape(n, c, ho, wo).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "tile_order"))
def grid_sample_3d_pallas_nearest(x, grid, padding_mode: str = "zeros",
                                  align_corners: bool = True,
                                  tile_order: str = "rows"):
    """Nearest-neighbor 3D grid sample on the z-band kernels (see the 2D
    variant): rounded clipped bases, corner-0 unit weight."""
    from advchain_tpu.ops.grid_sample import _prep_coord

    n, c, d, h, w = x.shape
    _, do, ho, wo, three = grid.shape
    assert three == 3
    p = do * ho * wo
    blocked = (tile_order == "blocks" and do % _BPZ3 == 0
               and ho % _BPY3 == 0 and wo % _BPX3 == 0)
    if blocked:
        grid = _blockify_3d(grid, do, ho, wo)
        gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]
    else:
        gx = grid[..., 0].reshape(n, p)
        gy = grid[..., 1].reshape(n, p)
        gz = grid[..., 2].reshape(n, p)
    ix = _prep_coord(gx, w, align_corners, padding_mode)
    iy = _prep_coord(gy, h, align_corners, padding_mode)
    iz = _prep_coord(gz, d, align_corners, padding_mode)
    ix_n, iy_n, iz_n = jnp.round(ix), jnp.round(iy), jnp.round(iz)
    if padding_mode == "zeros":
        w0 = ((ix_n >= 0) & (ix_n <= w - 1) & (iy_n >= 0) & (iy_n <= h - 1)
              & (iz_n >= 0) & (iz_n <= d - 1)).astype(jnp.float32)
    else:
        w0 = jnp.ones_like(ix_n)
    xb = jnp.clip(ix_n, 0, w - 1).astype(jnp.int32)
    yb = jnp.clip(iy_n, 0, h - 1).astype(jnp.int32)
    zb = jnp.clip(iz_n, 0, d - 1).astype(jnp.int32)
    zero = jnp.zeros_like(w0)
    weights = jnp.stack([w0] + [zero] * 7, axis=1)  # (N, 8, P)
    xf = x.astype(jnp.float32)
    parts = [_weighted_zband_sample(xf[:, i:i + sz],
                                    (zb, yb, xb, weights), d, h, w)
             for i, sz in _zband_channel_groups(c, w)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if blocked:
        return _deblockify_3d(out, do, ho, wo).astype(x.dtype)
    return out.reshape(n, c, do, ho, wo).astype(x.dtype)


# 3D blocked output-tile patch (1 z-plane x _BPY3 x _BPX3 = _PT points).
# Same rationale as the 2D _BPH x _BPW patch: a rotated 3D affine spreads a
# row-major 512-pt tile over ~sin(th)*W source rows (and several z planes),
# degenerating the plane kernel's band windows (measured: 44 -> 258 ms fwd
# at 10 deg, c=1, 12x192x192).  The (1, _PT//64, 64) patch — (1, 16, 64)
# at the default PT=1024 — keeps the in-plane band at
# ~(_PT//64 + sin(th)*64) rows and never straddles output z planes.
_BPZ3, _BPY3, _BPX3 = 1, _PT // 64, 64
assert _BPZ3 * _BPY3 * _BPX3 == _PT


def _blockify_3d(t, do: int, ho: int, wo: int):
    """(N, Do, Ho, Wo, ...) -> (N, P, ...) in (patch, in-patch) order."""
    lead, trail = t.shape[:1], t.shape[4:]
    nt = len(trail)
    t = t.reshape(lead + (do // _BPZ3, _BPZ3, ho // _BPY3, _BPY3,
                          wo // _BPX3, _BPX3) + trail)
    t = jnp.transpose(t, (0, 1, 3, 5, 2, 4, 6)
                      + tuple(range(7, 7 + nt)))
    return t.reshape(lead + (do * ho * wo,) + trail)


def _deblockify_3d(out, do: int, ho: int, wo: int):
    """(N, C, P) in 3D blocked order -> (N, C, Do, Ho, Wo)."""
    n, c = out.shape[:2]
    out = out.reshape(n, c, do // _BPZ3, ho // _BPY3, wo // _BPX3,
                      _BPZ3, _BPY3, _BPX3)
    out = jnp.transpose(out, (0, 1, 2, 5, 3, 6, 4, 7))
    return out.reshape(n, c, do, ho, wo)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "tile_order"))
def _grid_sample_3d_pallas_packed(x, grid, padding_mode: str = "zeros",
                                  align_corners: bool = True,
                                  tile_order: str = "rows"):
    """Channel-packed trilinear sampler: TWO z-base plane calls with FOUR
    in-plane offsets (0, 1, w, w+1) over ALL channels at once — the 2D
    kernel's offset/fold scheme lifted per z plane.  Used when the 4-base
    K=2 stack would need channel groups: the one-hot compare is built once
    per (tile, z, chunk) and shared by every channel as extra matmul rows
    (the MXU is idle below 128 rows either way), and the streamed
    gather/scatter kernels bound VMEM independent of C."""
    from advchain_tpu.ops.grid_sample import _prep_coord

    n, c, d, h, w = x.shape
    _, do, ho, wo, three = grid.shape
    assert three == 3
    hw = h * w
    p = do * ho * wo
    blocked = (tile_order == "blocks" and do % _BPZ3 == 0
               and ho % _BPY3 == 0 and wo % _BPX3 == 0)
    if blocked:
        grid = _blockify_3d(grid, do, ho, wo)
        gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]
    else:
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

    # clipped taps; offsets from the clipped base are (0, 1, w, w+1), so
    # fold any tap whose clipped coordinate collapses onto the base into
    # the base tap's weight (same scheme as grid_sample_2d_pallas)
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    dxf = (x1c - x0c).astype(jnp.float32)  # 0.0 or 1.0
    dyf = (y1c - y0c).astype(jnp.float32)
    yxb = y0c.astype(jnp.int32) * w + x0c.astype(jnp.int32)
    zs = [jnp.clip(z0, 0, d - 1).astype(jnp.int32),
          jnp.clip(z0 + 1, 0, d - 1).astype(jnp.int32)]

    x_r = x.reshape(n, c, d, hw).astype(jnp.float32)
    out = None
    for dz in (0, 1):
        wz = fz if dz else (1.0 - fz)
        w00 = (1 - fx) * (1 - fy) * wz * inb(x0, y0, z0 + dz)
        w01 = fx * (1 - fy) * wz * inb(x0 + 1, y0, z0 + dz)
        w10 = (1 - fx) * fy * wz * inb(x0, y0 + 1, z0 + dz)
        w11 = fx * fy * wz * inb(x0 + 1, y0 + 1, z0 + dz)
        cw00 = w00 + w01 * (1 - dxf) + w10 * (1 - dyf) \
            + w11 * (1 - dxf) * (1 - dyf)
        cw01 = w01 * dxf + w11 * dxf * (1 - dyf)
        cw10 = w10 * dyf + w11 * (1 - dxf) * dyf
        cw11 = w11 * dxf * dyf
        weights = jnp.stack([cw00, cw01, cw10, cw11],
                            axis=1).astype(jnp.float32)  # (N, 4, P)
        part = _weighted_plane_sample(x_r, (zs[dz], yxb, weights),
                                      (0, 1, w, w + 1), d, hw)
        out = part if out is None else out + part
    if blocked:
        return _deblockify_3d(out, do, ho, wo).astype(x.dtype)
    return out.reshape(n, c, do, ho, wo).astype(x.dtype)


def _grid_sample_3d_zband(x, grid, groups, padding_mode, align_corners,
                          tile_order):
    """Trilinear sampler on the z-band kernels: clipped (z0, y0, x0) bases
    + 8 folded corner weights, one kernel call per channel group."""
    from advchain_tpu.ops.grid_sample import _prep_coord

    n, c, d, h, w = x.shape
    _, do, ho, wo, _ = grid.shape
    p = do * ho * wo
    blocked = (tile_order == "blocks" and do % _BPZ3 == 0
               and ho % _BPY3 == 0 and wo % _BPX3 == 0)
    if blocked:
        grid = _blockify_3d(grid, do, ho, wo)
        gx, gy, gz = grid[..., 0], grid[..., 1], grid[..., 2]
    else:
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
    y0c = jnp.clip(y0, 0, h - 1)
    z0c = jnp.clip(z0, 0, d - 1)
    # collapse indicators: does the clipped +1 tap differ from the base?
    dxf = (jnp.clip(x0 + 1, 0, w - 1) - x0c).astype(jnp.float32)
    dyf = (jnp.clip(y0 + 1, 0, h - 1) - y0c).astype(jnp.float32)
    dzf = (jnp.clip(z0 + 1, 0, d - 1) - z0c).astype(jnp.float32)

    wxs = (1 - fx, fx)
    wys = (1 - fy, fy)
    wzs = (1 - fz, fz)
    raw = {}
    for pz in (0, 1):
        for py in (0, 1):
            for px in (0, 1):
                raw[(pz, py, px)] = (wzs[pz] * wys[py] * wxs[px]
                                     * inb(x0 + px, y0 + py, z0 + pz))

    def fold(tap, corner, m):
        # tap-0 weight stays on corner 0; a collapsed +1 tap (m == 0)
        # folds onto the base corner (same scheme as the 2D band path)
        if tap == 0:
            return 1.0 if corner == 0 else None
        return m if corner == 1 else (1 - m)

    corners = []
    for a in (0, 1):
        for b in (0, 1):
            for cc in (0, 1):
                acc = None
                for (pz, py, px), wv in raw.items():
                    fz_ = fold(pz, a, dzf)
                    fy_ = fold(py, b, dyf)
                    fx_ = fold(px, cc, dxf)
                    if fz_ is None or fy_ is None or fx_ is None:
                        continue
                    term = wv
                    for f in (fz_, fy_, fx_):
                        if not (isinstance(f, float) and f == 1.0):
                            term = term * f
                    acc = term if acc is None else acc + term
                corners.append(acc)
    weights = jnp.stack(corners, axis=1).astype(jnp.float32)  # (N, 8, P)

    zb = z0c.astype(jnp.int32)
    yb = y0c.astype(jnp.int32)
    xb = x0c.astype(jnp.int32)
    xf32 = x.astype(jnp.float32)
    parts = [_weighted_zband_sample(xf32[:, i:i + sz],
                                    (zb, yb, xb, weights), d, h, w)
             for i, sz in groups]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if blocked:
        return _deblockify_3d(out, do, ho, wo).astype(x.dtype)
    return out.reshape(n, c, do, ho, wo).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners",
                                             "tile_order"))
def grid_sample_3d_pallas(x, grid, padding_mode: str = "zeros",
                          align_corners: bool = True,
                          tile_order: str = "rows"):
    """Trilinear 3D grid sample (torch semantics) on the Pallas path.

    x: (N, C, D, H, W); grid: (N, Do, Ho, Wo, 3), torch channel order
    (grid[..., 0] -> W, [..., 1] -> H, [..., 2] -> D).

    Formulated as FOUR (z, y) base (plane, row) pairs x TWO x-taps on the
    plane_gather kernel: the z coordinate is kept separate from the
    in-plane yx index so the band-window pruning survives z spread (a flat
    3D index makes a +-1 voxel z range span ~H*W/CH chunks and the kernel
    degrades to a full sweep).  Multi-channel volumes are split into
    channel groups that fit the VMEM budget; when even a single channel
    exceeds it, the streamed plane_gather keeps the volume in HBM.

    ``tile_order``: 'rows' (default; optimal for near-identity warps) or
    'blocks' ((1, 8, 64) output patches per kernel tile; use for warps
    with large rotation/shear).  Falls back to 'rows' when the output
    shape doesn't tile into patches.
    """
    from advchain_tpu.ops.grid_sample import _prep_coord

    n, c, d, h, w = x.shape
    _, do, ho, wo, three = grid.shape
    assert three == 3
    # z-band path (round 4): one x one-hot per tile shared across every
    # (z, y-band) block — ~10x less MXU sweep than the plane kernels for
    # rotated volume warps (see the z-band section above).  Used whenever
    # the K=2 x-shifted per-group stack fits its VMEM budget.
    # the z-band kernels handle ANY volume size: VMEM-resident when the
    # K=2 stack fits the budget, streamed HBM bands otherwise (the
    # one-hot/selects are shared by all channels of a group as extra
    # matmul rows); very wide channel counts are split into groups whose
    # streamed working set fits VMEM (_zband_channel_groups)
    zgroups = (None if os.environ.get("ADVCHAIN_ZBAND") == "0"
               else _zband_channel_groups(c, w))
    if zgroups is not None:
        return _grid_sample_3d_zband(x, grid, zgroups, padding_mode,
                                     align_corners, tile_order)
    hw = h * w
    hwp = -(-hw // _CH) * _CH
    groups = _channel_groups(2, c, d * hwp)
    # channel-packing dispatch: when the K=2 per-(z,y)-base stack of ALL
    # channels fits VMEM, the 4-base resident path below is fastest.  When
    # it would need channel groups (or doesn't fit at all), pack every
    # channel into ONE K=4-offset streamed call pair instead — the one-hot
    # compare (the dominant per-band cost) is built once and shared by all
    # channels as extra matmul rows, instead of being rebuilt per group
    # (4 groups x 4 bases = 16 sweeps at c=4 -> 2 sweeps).
    packed = groups is None or len(groups) > 1
    if os.environ.get("ADVCHAIN_PLANE_PACKED_C1") == "1":  # A/B knob
        packed = True
    if packed:
        return _grid_sample_3d_pallas_packed(x, grid, padding_mode,
                                             align_corners, tile_order)
    groups = [(0, c)] if groups is None else groups

    p = do * ho * wo
    blocked = (tile_order == "blocks" and do % _BPZ3 == 0
               and ho % _BPY3 == 0 and wo % _BPX3 == 0)
    if blocked:
        grid = _blockify_3d(grid, do, ho, wo)
        gx = grid[..., 0]
        gy = grid[..., 1]
        gz = grid[..., 2]
    else:
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

    bases = []  # (zidx, yxidx) pairs
    w0s = []
    w1s = []
    for dz in (0, 1):
        for dy in (0, 1):
            zb = zs[dz].astype(jnp.int32)
            yxb = ys[dy].astype(jnp.int32) * w + x0c.astype(jnp.int32)
            wyz = ((fy if dy else 1 - fy) * (fz if dz else 1 - fz))
            w_x0 = (1 - fx) * wyz * inb(x0, y0 + dy, z0 + dz)
            w_x1 = fx * wyz * inb(x0 + 1, y0 + dy, z0 + dz)
            # fold x-collapsed taps (clipped x1 == x0) into the base tap
            bases.append((zb, yxb))
            w0s.append(w_x0 + w_x1 * (1 - dxf))
            w1s.append(w_x1 * dxf)

    # one sampler call per (z, y) base: a concatenated (N, 4P) index stack
    # tempts XLA into a pathological minor-N layout (32x HBM padding seen on
    # volume workloads); separate calls keep every buffer P-minor
    x_r = x.reshape(n, c, d, hw).astype(jnp.float32)
    chunks = []
    for i, sz in groups:
        out = None
        for (zb, yxb), w0, w1 in zip(bases, w0s, w1s):
            wpair = jnp.stack([w0, w1],
                              axis=1).astype(jnp.float32)  # (N, 2, P)
            part = _weighted_plane_sample(x_r[:, i:i + sz],
                                          (zb, yxb, wpair), (0, 1), d, hw)
            out = part if out is None else out + part
        chunks.append(out)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    if blocked:
        return _deblockify_3d(out, do, ho, wo).astype(x.dtype)
    return out.reshape(n, c, do, ho, wo).astype(x.dtype)
