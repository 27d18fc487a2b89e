"""Pallas TPU kernels for the near-identity stencil warp (fwd + analytic
backward).

Role match: the sub-``radius``-px fast path of flow composition
(reference advchain/augmentor/adv_morph.py:179-202 via F.grid_sample with
padding_mode='border') — see ops/grid_sample.py::stencil_warp_2d for the
math contract.

Why a kernel: the XLA formulation builds the (2R+1) per-axis weight
planes as where-chains, and XLA duplicates those cheap producers into
every consumer fusion — the backward pass recomputes them per tap per
derivative path (measured ~9.9 ms/step at the headline shapes, ~5x the
VPU floor).  Here the weight planes are computed ONCE into VMEM and
reused across every (2R+1)^2 tap; taps are lane/sublane ROLLS of the
VMEM-resident image (never unaligned slices), so each scaling-and-
squaring step is one resident pass per image: read flow1/flow2/(g) once
from HBM, write out (or d_imgp/d_fy/d_fx) once.

Layout: one grid step per batch image.  All operands share one frame —
rows padded to HPAD8 = roundup(H+2R, 8), lanes to WPAD = roundup(W+2R,
128) — with the image EDGE-padded by R (XLA-side) before lane/row
zero-padding; rolls wrap only through those zero margins, so wraparound
never touches live data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_fwd_2d_pallas", "stencil_bwd_2d_pallas"]


def _frame(h: int, w: int, R: int):
    h8 = -(-h // 8) * 8
    hpad8 = -(-(h + 2 * R) // 8) * 8
    wpad = -(-(w + 2 * R) // 128) * 128
    assert hpad8 - h8 >= 2 * R or True
    return h8, hpad8, wpad


def _pad_to_shape(x, rows, lanes):
    pr = rows - x.shape[-2]
    pc = lanes - x.shape[-1]
    if pr == 0 and pc == 0:
        return x
    pads = [(0, 0)] * (x.ndim - 2) + [(0, pr), (0, pc)]
    return jnp.pad(x, pads)


def _weights_2d(g2, h, w, R, f):
    """Separable weight planes from the (2, ROWS, LANES) grid block;
    entries past (h, w) are garbage — callers mask via ``valid``."""
    gx, gy = g2[0], g2[1]
    xpix = (gx + 1.0) * (0.5 * (w - 1))
    ypix = (gy + 1.0) * (0.5 * (h - 1))
    y0 = jnp.floor(ypix)
    x0 = jnp.floor(xpix)
    fy = ypix - y0
    fx = xpix - x0
    rows, lanes = gx.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    dy = y0.astype(jnp.int32) - iy
    dx = x0.astype(jnp.int32) - ix
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
    return wys, dwys, wxs, dwxs


def _tap(imgf, r, s, R):
    """imgf: (C, HPAD8, WPAD) edge-padded frame; returns the full-frame
    window whose [i, j] element is imgf[R+r+i, R+s+j] — two rolls, no
    slicing.  Wraparound passes only through the zero margins (rows >= h
    and lanes >= w are masked by every consumer)."""
    return _roll(_roll(imgf, -(R + r), -2), -(R + s), -1)


def _roll(x, shift: int, axis: int):
    """jnp.roll with a static-zero guard: a 0-shift roll lowers to a
    0-size slice + concat, which Mosaic rejects (zero-size vectors)."""
    if shift == 0:
        return x
    return jnp.roll(x, shift, axis=axis)


# the remote TPU compiler crashes (helper subprocess exit 1, no
# diagnostic) when one program aggregates too many of these grid steps:
# a standalone kernel call compiles at 64 steps but the fwd+bwd grad
# program needs <=32 per call (bisected at the headline shapes).
# Batches are split into <=32-image chunks — four sequential
# pallas_calls at batch 128, negligible against the per-image work.
_MAX_GRID = 16


def _chunked(fn, n, *args):
    if n <= _MAX_GRID:
        return fn(*args)
    outs = [fn(*(a[i:i + _MAX_GRID] for a in args))
            for i in range(0, n, _MAX_GRID)]
    if isinstance(outs[0], tuple):
        return tuple(jnp.concatenate(parts, axis=0)
                     for parts in zip(*outs))
    return jnp.concatenate(outs, axis=0)


def stencil_fwd_2d_pallas(imgp, flow2, radius: int):
    return _chunked(functools.partial(_stencil_fwd_2d_pallas,
                                      radius=radius),
                    imgp.shape[0], imgp, flow2)


def stencil_bwd_2d_pallas(imgp, flow2, g, radius: int):
    return _chunked(functools.partial(_stencil_bwd_2d_pallas,
                                      radius=radius),
                    imgp.shape[0], imgp, flow2, g)


@functools.partial(jax.jit, static_argnames=("radius",))
def _stencil_fwd_2d_pallas(imgp, flow2, radius: int):
    """imgp: (N, C, H+2R, W+2R) EDGE-padded image; flow2: (N, 2, H, W)
    channel-first grid in [-1, 1].  Returns (N, C, H, W)."""
    R = int(radius)
    n, c, hpad, wpad_in = imgp.shape
    h, w = hpad - 2 * R, wpad_in - 2 * R
    f = jnp.float32
    h8, hpad8, wpad = _frame(h, w, R)
    imgp_l = _pad_to_shape(imgp.astype(f), hpad8, wpad)
    flow2_l = _pad_to_shape(flow2.astype(f), hpad8, wpad)

    def kernel(img_ref, g2_ref, out_ref):
        wys, _, wxs, _ = _weights_2d(g2_ref[0], h, w, R, f)
        imgf = img_ref[0]
        out = jnp.zeros((c, hpad8, wpad), f)
        for r in range(-R, R + 1):
            inner = jnp.zeros((c, hpad8, wpad), f)
            for s in range(-R, R + 1):
                inner = inner + wxs[s + R][None] * _tap(imgf, r, s, R)
            out = out + wys[r + R][None] * inner
        out_ref[0] = out

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, hpad8, wpad), f),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, hpad8, wpad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hpad8, wpad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hpad8, wpad), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(imgp_l, flow2_l)
    return out[:, :, :h, :w]


@functools.partial(jax.jit, static_argnames=("radius",))
def _stencil_bwd_2d_pallas(imgp, flow2, g, radius: int):
    """Analytic backward: returns (d_imgp (N, C, H+2R, W+2R) — the
    UNFOLDED transposed stencil in the padded frame; the caller folds
    the edge halo — plus d_fy, d_fx (N, H, W))."""
    R = int(radius)
    n, c, hpad, wpad_in = imgp.shape
    h, w = hpad - 2 * R, wpad_in - 2 * R
    f = jnp.float32
    h8, hpad8, wpad = _frame(h, w, R)
    imgp_l = _pad_to_shape(imgp.astype(f), hpad8, wpad)
    flow2_l = _pad_to_shape(flow2.astype(f), hpad8, wpad)
    g_l = _pad_to_shape(g.astype(f), hpad8, wpad)

    def kernel(img_ref, g2_ref, g_ref, out_ref):
        wys, dwys, wxs, dwxs = _weights_2d(g2_ref[0], h, w, R, f)
        imgf = img_ref[0]
        # mask garbage rows/lanes of the cotangent (padding area)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hpad8, wpad), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (hpad8, wpad), 1)
        valid = ((rows < h) & (lane < w)).astype(f)
        gf = g_ref[0] * valid[None]
        d_fy = jnp.zeros((hpad8, wpad), f)
        d_fx = jnp.zeros((hpad8, wpad), f)
        d_imgp = jnp.zeros((c, hpad8, wpad), f)
        for r in range(-R, R + 1):
            inner = jnp.zeros((c, hpad8, wpad), f)
            dinner = jnp.zeros((c, hpad8, wpad), f)
            wy = wys[r + R][None]
            for s in range(-R, R + 1):
                tap = _tap(imgf, r, s, R)
                inner = inner + wxs[s + R][None] * tap
                dinner = dinner + dwxs[s + R][None] * tap
                # transposed placement: t[i, j] contributes to
                # d_imgp[R+r+i, R+s+j] — inverse rolls through the zero
                # margins (t is valid-masked, so wrapped entries are 0)
                t = wy * wxs[s + R][None] * gf
                d_imgp = d_imgp + _roll(_roll(t, R + r, -2), R + s, -1)
            d_fy = d_fy + dwys[r + R] * jnp.sum(gf * inner, axis=0)
            d_fx = d_fx + wys[r + R] * jnp.sum(gf * dinner, axis=0)
        # single stacked output (channels [0, c) = d_imgp, c = d_fy,
        # c+1 = d_fx): one result buffer keeps the Mosaic kernel simple
        out_ref[0] = jnp.concatenate(
            [d_imgp, d_fy[None], d_fx[None]], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c + 2, hpad8, wpad), f),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, hpad8, wpad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hpad8, wpad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hpad8, wpad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c + 2, hpad8, wpad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(imgp_l, flow2_l, g_l)
    return (out[:, :c, :hpad, :wpad_in], out[:, c, :h, :w],
            out[:, c + 1, :h, :w])


def _interpret() -> bool:
    from advchain_tpu.ops.grid_sample import _on_tpu_device
    return not _on_tpu_device()
