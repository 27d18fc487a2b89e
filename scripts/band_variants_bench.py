"""A/B microbench: band_gather inner-loop variants on the real TPU.

The round-4 trace shows band_gather+band_scatter own 337 ms of the 703 ms
headline episode at ~48 GB/s effective — compute/overhead-limited inside
the kernel, not traffic-limited.  This script times isolated variants of
the gather kernel to find where the per-tile cycles go:

  base      : current band_gather (3-way f32 split, (PT,Wp) one-hot,
              dynamic-nseg fori_loop, RB=16)
  onehot_t  : one-hot built transposed (Wp, PT) so the MXU contracts
              natural-layout operands (no RHS transpose)
  split1    : single bf16 matmul (accuracy-breaking; isolates split cost)
  fusedw    : weights folded into the kernel (output C rows, not 4C)
  rb32      : RB=32 (fewer segments, bigger matmul)
  static2   : static 2-segment unroll with masking (no dynamic fori_loop)

Usage: python scripts/band_variants_bench.py [variant ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from advchain_tpu.kernels.gather_matmul import (  # noqa: E402
    _band_pack, _band_ranges, _band_rb, _band_tiles, _dot_f32, _interpret,
    _pad_to, band_gather, _PT)

REPS = 50


def _bench(f, *args, outer=3):
    out = f(*args)
    float(jnp.sum(out))
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def _chain(gather_fn):
    """Chain REPS gathers inside one jit; returns (N,4,C,P) summed."""
    @jax.jit
    def run(img, yi, xi):
        def body(_, acc):
            v = gather_fn(img + acc * 1e-9, yi, xi)
            return jnp.sum(v) * 1e-9
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    return run


def make_band_gather(onehot_t=False, split=3, rb=None, fuse_weights=False):
    """Parameterized copy of band_gather for A/B testing."""

    def dot_split(vals, oh, dims):
        if split == 1:
            return jax.lax.dot_general(
                vals.astype(jnp.bfloat16), oh, dims,
                preferred_element_type=jnp.float32)
        hi = vals.astype(jnp.bfloat16)
        r1 = vals - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        if split == 2:
            stacked = jnp.concatenate([hi, mid], axis=0)
        else:
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            stacked = jnp.concatenate([hi, mid, lo], axis=0)
        m = vals.shape[0]
        out = jax.lax.dot_general(stacked, oh, dims,
                                  preferred_element_type=jnp.float32)
        acc = out[:m]
        for s in range(1, split):
            acc = acc + out[s * m:(s + 1) * m]
        return acc

    @jax.jit
    def gather(img, yidx, xidx):
        n, c, h, w = img.shape
        kc = 2 * c
        rbv = rb or _band_rb(kc)
        img_k, hp, wp = _band_pack(img, rbv)
        y4, x4, n_tiles, p_orig = _band_tiles(yidx, xidx)

        def kernel(y_ref, x_ref, img_ref, out_ref):
            yp = y_ref[0, 0, 0, :]
            xp = x_ref[0, 0, 0, :]
            if onehot_t:
                lane = jax.lax.broadcasted_iota(jnp.int32, (wp, _PT), 0)
                oh = (xp[None, :] == lane).astype(jnp.bfloat16)
                dims = (((1,), (0,)), ((), ()))
            else:
                lane = jax.lax.broadcasted_iota(jnp.int32, (_PT, wp), 1)
                oh = (xp[:, None] == lane).astype(jnp.bfloat16)
                dims = (((1,), (1,)), ((), ()))
            rlo8, nseg = _band_ranges(yp, rbv)

            def seg(si, accs):
                a0, a1 = accs
                base = pl.multiple_of(rlo8 + si * rbv, 8)
                band = img_ref[0, :, pl.ds(base, rbv), :]
                r = dot_split(band.reshape(kc * rbv, wp), oh, dims)
                r3 = r.reshape(kc, rbv, _PT)
                rowi = base + jax.lax.broadcasted_iota(
                    jnp.int32, (rbv, _PT), 0)
                s0 = (yp[None, :] == rowi).astype(jnp.float32)
                s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
                return (a0 + jnp.sum(r3 * s0[None], axis=1),
                        a1 + jnp.sum(r3 * s1[None], axis=1))

            z = jnp.zeros((kc, _PT), jnp.float32)
            a0, a1 = jax.lax.fori_loop(0, nseg, seg, (z, z))
            out_ref[0, 0] = jnp.concatenate([a0, a1], axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, n_tiles, 4 * c, _PT),
                                           jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kc, hp, wp), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 4 * c, _PT),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(y4, x4, img_k)
        out = out.reshape(n, n_tiles, 2, 2, c, _PT)
        out = jnp.moveaxis(out, 1, 4)
        return out.reshape(n, 4, c, n_tiles * _PT)[..., :p_orig]

    return gather


def make_band_gather_presplit(fuse_weights=False, pt=None):
    """Transposed one-hot + image pre-split into 3 stacked bf16 planes at
    pack time: the kernel's matmul LHS is a direct (3*KC*RB, Wp) bf16 ref
    slice — no in-kernel f32 split, no concatenate.  Optionally folds the
    4 corner weights into the kernel (output C rows instead of 4C)."""
    PT = pt or _PT

    @jax.jit
    def gather(img, yidx, xidx, weights=None):
        n, c, h, w = img.shape
        kc = 2 * c
        rbv = _band_rb(kc)
        img_k, hp, wp = _band_pack(img, rbv)
        hi = img_k.astype(jnp.bfloat16)
        r1 = img_k - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        img_s = jnp.concatenate([hi, mid, lo], axis=1)  # (N, 3KC, Hp, Wp)
        y_p, p_orig = _pad_to(yidx, PT, axis=1, value=-1)
        x_p, _ = _pad_to(xidx, PT, axis=1)
        t = y_p.shape[1] // PT
        y4 = y_p.reshape(n, t, 1, PT)
        x4 = x_p.reshape(n, t, 1, PT)
        n_tiles = t
        if fuse_weights:
            w_p, _ = _pad_to(weights, PT, axis=2)
            w4 = jnp.moveaxis(w_p.reshape(n, 4, n_tiles, PT), 1, 2)

        def kernel(*refs):
            if fuse_weights:
                y_ref, x_ref, w_ref, img_ref, out_ref = refs
            else:
                y_ref, x_ref, img_ref, out_ref = refs
            yp = y_ref[0, 0, 0, :]
            xp = x_ref[0, 0, 0, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (wp, PT), 0)
            oh = (xp[None, :] == lane).astype(jnp.bfloat16)
            rlo8, nseg = _band_ranges(yp, rbv)

            def seg(si, accs):
                a0, a1 = accs
                base = pl.multiple_of(rlo8 + si * rbv, 8)
                band = img_ref[0, :, pl.ds(base, rbv), :]  # (3KC, RB, Wp)
                r = jax.lax.dot_general(
                    band.reshape(3 * kc * rbv, wp), oh,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                r3 = r.reshape(3, kc, rbv, PT)
                r3 = r3[0] + r3[1] + r3[2]
                rowi = base + jax.lax.broadcasted_iota(
                    jnp.int32, (rbv, PT), 0)
                s0 = (yp[None, :] == rowi).astype(jnp.float32)
                s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
                return (a0 + jnp.sum(r3 * s0[None], axis=1),
                        a1 + jnp.sum(r3 * s1[None], axis=1))

            z = jnp.zeros((kc, PT), jnp.float32)
            a0, a1 = jax.lax.fori_loop(0, nseg, seg, (z, z))
            if fuse_weights:
                wt = w_ref[0, 0]  # (4, PT)
                out_ref[0, 0] = (wt[0:1] * a0[:c] + wt[1:2] * a0[c:]
                                 + wt[2:3] * a1[:c] + wt[3:4] * a1[c:])
            else:
                out_ref[0, 0] = jnp.concatenate([a0, a1], axis=0)

        oc = c if fuse_weights else 4 * c
        in_specs = [
            pl.BlockSpec((1, 1, 1, PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PT), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs = [y4, x4]
        if fuse_weights:
            in_specs.append(
                pl.BlockSpec((1, 1, 4, PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM))
            inputs.append(w4)
        in_specs.append(
            pl.BlockSpec((1, 3 * kc, hp, wp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(img_s)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, n_tiles, oc, PT),
                                           jnp.float32),
            grid=(n, n_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, oc, PT), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(*inputs)
        if fuse_weights:
            out = jnp.moveaxis(out, 1, 2)  # (N, C, T, PT)
            return out.reshape(n, c, n_tiles * PT)[..., :p_orig]
        out = out.reshape(n, n_tiles, 2, 2, c, PT)
        out = jnp.moveaxis(out, 1, 4)
        return out.reshape(n, 4, c, n_tiles * PT)[..., :p_orig]

    return gather


def make_band_scatter_presplit():
    """band_scatter with the g-side 3-way split hoisted out of the segment
    loop (split g0/g1 once per tile; per-segment gb built by 0/1 selects on
    the pre-split bf16 rows — exact, since bf16*{0,1} is exact)."""
    from advchain_tpu.kernels.gather_matmul import _band_tiles as _bt

    @functools.partial(jax.jit, static_argnames=("h", "w"))
    def scatter(g, yidx, xidx, h, w):
        n, four, c, p0 = g.shape
        kc = 2 * c
        rb = _band_rb(kc)
        hp = -(-(h + rb) // 8) * 8
        wp = -(-w // 128) * 128
        y4, x4, n_tiles, _ = _bt(yidx, xidx)
        g_r = g.reshape(n, 2, 2, c, p0).reshape(n, 4 * c, p0)
        g_r, _ = _pad_to(g_r, _PT, axis=2)
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
            gt = g_ref[0, 0]  # (4C, PT)
            hi = gt.astype(jnp.bfloat16)
            r1 = gt - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            gs = jnp.concatenate([hi, mid, lo], axis=0)  # (12C, PT)
            g0 = jnp.concatenate([gs[s * 2 * kc:s * 2 * kc + kc]
                                  for s in range(3)], axis=0)  # y-tap0 x3
            g1 = jnp.concatenate([gs[s * 2 * kc + kc:(s + 1) * 2 * kc]
                                  for s in range(3)], axis=0)

            def seg(si, _):
                base = pl.multiple_of(rlo8 + si * rb, 8)
                rowi = base + jax.lax.broadcasted_iota(
                    jnp.int32, (rb, _PT), 0)
                s0 = (yp[None, :] == rowi).astype(jnp.bfloat16)
                s1 = (yp[None, :] + 1 == rowi).astype(jnp.bfloat16)
                gb = (g0[:, None, :] * s0[None]
                      + g1[:, None, :] * s1[None])
                r = jax.lax.dot_general(
                    gb.reshape(3 * kc * rb, _PT), oh,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                r3 = r.reshape(3, kc, rb, wp)
                out_ref[0, :, pl.ds(base, rb), :] += r3[0] + r3[1] + r3[2]
                return 0

            jax.lax.fori_loop(0, nseg, seg, 0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, kc, hp, wp), jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 4 * c, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, kc, hp, wp),
                                   lambda i, j: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(y4, x4, g_r)
        out = out.reshape(n, 2, c, hp, wp)
        dimg = out[:, 0, :, :h, :w]
        dimg = dimg.at[:, :, :, 1:].add(out[:, 1, :, :h, :w - 1])
        return dimg

    return scatter


def make_band_gather_xwin():
    """Transposed one-hot + K-axis windowing: per tile, contract only the
    128-aligned column windows covering [min(x), max(x)+1] instead of the
    full Wp.  Blocked affine tiles span ~50 columns -> usually ONE 128-col
    window (half the MXU K passes at w=192; more at larger w).  Row-major
    tiles span the full width -> same passes as the full sweep."""

    @jax.jit
    def gather(img, yidx, xidx):
        n, c, h, w = img.shape
        kc = 2 * c
        rbv = _band_rb(kc)
        img_k, hp, wp = _band_pack(img, rbv)
        y4, x4, n_tiles, p_orig = _band_tiles(yidx, xidx)
        nw_max = wp // 128

        def kernel(y_ref, x_ref, img_ref, out_ref):
            yp = y_ref[0, 0, 0, :]
            xp = x_ref[0, 0, 0, :]
            rlo8, nseg = _band_ranges(yp, rbv)
            xlo = jnp.min(xp)
            w0 = xlo // 128 * 128
            # +1 x-tap lives in the shifted copy at column xmax, so the
            # window only needs to cover [xlo, xmax]
            nwin = jnp.minimum((jnp.max(xp) - w0) // 128 + 1,
                               jnp.int32(nw_max))
            lane = jax.lax.broadcasted_iota(jnp.int32, (128, _PT), 0)

            def seg(si, accs):
                a0, a1 = accs
                base = pl.multiple_of(rlo8 + si * rbv, 8)

                def win(wi, racc):
                    c0 = pl.multiple_of(w0 + wi * 128, 128)
                    bw = img_ref[0, :, pl.ds(base, rbv), pl.ds(c0, 128)]
                    ohw = (xp[None, :] - c0 == lane).astype(jnp.bfloat16)
                    return racc + _dot_f32(bw.reshape(kc * rbv, 128), ohw,
                                           (((1,), (0,)), ((), ())))

                r = jax.lax.fori_loop(
                    0, nwin, win, jnp.zeros((kc * rbv, _PT), jnp.float32))
                r3 = r.reshape(kc, rbv, _PT)
                rowi = base + jax.lax.broadcasted_iota(
                    jnp.int32, (rbv, _PT), 0)
                s0 = (yp[None, :] == rowi).astype(jnp.float32)
                s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
                return (a0 + jnp.sum(r3 * s0[None], axis=1),
                        a1 + jnp.sum(r3 * s1[None], axis=1))

            z = jnp.zeros((kc, _PT), jnp.float32)
            a0, a1 = jax.lax.fori_loop(0, nseg, seg, (z, z))
            out_ref[0, 0] = jnp.concatenate([a0, a1], axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, n_tiles, 4 * c, _PT),
                                           jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kc, hp, wp), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 4 * c, _PT),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(y4, x4, img_k)
        out = out.reshape(n, n_tiles, 2, 2, c, _PT)
        out = jnp.moveaxis(out, 1, 4)
        return out.reshape(n, 4, c, n_tiles * _PT)[..., :p_orig]

    return gather


def make_band_gather_direct():
    """band_gather with a DIRECT (N, 4C, T*PT) output layout: blocks land
    at (i, 0, j) so the corner-major (N, 4, C, P) result is a free
    reshape — no XLA moveaxis pass over the 4C*P output."""

    @jax.jit
    def gather(img, yidx, xidx):
        n, c, h, w = img.shape
        kc = 2 * c
        rbv = _band_rb(kc)
        img_k, hp, wp = _band_pack(img, rbv)
        y4, x4, n_tiles, p_orig = _band_tiles(yidx, xidx)

        def kernel(y_ref, x_ref, img_ref, out_ref):
            yp = y_ref[0, 0, 0, :]
            xp = x_ref[0, 0, 0, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (wp, _PT), 0)
            oh = (xp[None, :] == lane).astype(jnp.bfloat16)
            rlo8, nseg = _band_ranges(yp, rbv)

            def seg(si, accs):
                a0, a1 = accs
                base = pl.multiple_of(rlo8 + si * rbv, 8)
                band = img_ref[0, :, pl.ds(base, rbv), :]
                r = _dot_f32(band.reshape(kc * rbv, wp), oh,
                             (((1,), (0,)), ((), ())))
                r3 = r.reshape(kc, rbv, _PT)
                rowi = base + jax.lax.broadcasted_iota(
                    jnp.int32, (rbv, _PT), 0)
                s0 = (yp[None, :] == rowi).astype(jnp.float32)
                s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
                return (a0 + jnp.sum(r3 * s0[None], axis=1),
                        a1 + jnp.sum(r3 * s1[None], axis=1))

            z = jnp.zeros((kc, _PT), jnp.float32)
            a0, a1 = jax.lax.fori_loop(0, nseg, seg, (z, z))
            out_ref[0] = jnp.concatenate([a0, a1], axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 4 * c, n_tiles * _PT),
                                           jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kc, hp, wp), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 4 * c, _PT), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(y4, x4, img_k)
        # rows are [y0:(x0 C | x1 C) | y1:(x0 C | x1 C)] = corner order
        return out.reshape(n, 4, c, n_tiles * _PT)[..., :p_orig]

    return gather


def make_band_scatter_direct():
    """band_scatter accepting g in the free-reshape (N, 4C, P) layout:
    blocks read at (i, 0, j) — no XLA moveaxis pass over the input."""
    @functools.partial(jax.jit, static_argnames=("h", "w"))
    def scatter(g, yidx, xidx, h, w):
        n, four, c, p0 = g.shape
        kc = 2 * c
        rb = _band_rb(kc)
        hp = -(-(h + rb) // 8) * 8
        wp = -(-w // 128) * 128
        y4, x4, n_tiles, _ = _band_tiles(yidx, xidx)
        g_r = g.reshape(n, 4 * c, p0)  # free
        g_r, _ = _pad_to(g_r, _PT, axis=2)

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
            gt = g_ref[0]  # (4C, PT)
            g0 = gt[:kc]
            g1 = gt[kc:]

            def seg(si, _):
                base = pl.multiple_of(rlo8 + si * rb, 8)
                rowi = base + jax.lax.broadcasted_iota(
                    jnp.int32, (rb, _PT), 0)
                s0 = (yp[None, :] == rowi).astype(jnp.float32)
                s1 = (yp[None, :] + 1 == rowi).astype(jnp.float32)
                gb = (g0[:, None, :] * s0[None] + g1[:, None, :] * s1[None])
                contrib = _dot_f32(gb.reshape(kc * rb, _PT), oh,
                                   (((1,), (0,)), ((), ())))
                out_ref[0, :, pl.ds(base, rb), :] += contrib.reshape(
                    kc, rb, wp)
                return 0

            jax.lax.fori_loop(0, nseg, seg, 0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, kc, hp, wp), jnp.float32),
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, _PT), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * c, _PT), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, kc, hp, wp),
                                   lambda i, j: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(y4, x4, g_r)
        out = out.reshape(n, 2, c, hp, wp)
        dimg = out[:, 0, :, :h, :w]
        dimg = dimg.at[:, :, :, 1:].add(out[:, 1, :, :h, :w - 1])
        return dimg

    return scatter


def blocked_affine_indices(n, h, w, deg, seed=0):
    """(yidx, xidx) for a rotation by ``deg`` in BLOCKED (32x32 at PT=1024)
    tile order — the affine warp's operating pattern."""
    from advchain_tpu.kernels.gather_matmul import _blockify_2d
    th = np.deg2rad(deg)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    cy, cx = (h - 1) / 2, (w - 1) / 2
    ys = np.cos(th) * (yy - cy) - np.sin(th) * (xx - cx) + cy
    xs = np.sin(th) * (yy - cy) + np.cos(th) * (xx - cx) + cx
    yi = np.clip(np.floor(ys), 0, h - 1).astype(np.int32)
    xi = np.clip(np.floor(xs), 0, w - 1).astype(np.int32)
    yi = np.broadcast_to(yi[None], (n, h, w))
    xi = np.broadcast_to(xi[None], (n, h, w))
    yb = np.asarray(_blockify_2d(jnp.asarray(yi[..., None]), h, w))[..., 0]
    xb = np.asarray(_blockify_2d(jnp.asarray(xi[..., None]), h, w))[..., 0]
    return jnp.asarray(yb), jnp.asarray(xb)


def main():
    n, h, w = 16, 192, 192
    p = h * w
    r = np.random.RandomState(0)
    # near-identity warp indices: y ~ row-major row +- 2, x arbitrary col
    rows = np.arange(p) // w
    yi = np.clip(rows[None].repeat(n, 0)
                 + r.randint(-2, 3, size=(n, p)), 0, h - 1).astype(np.int32)
    xi = r.randint(0, w - 1, size=(n, p)).astype(np.int32)
    yi_j = jnp.asarray(yi)
    xi_j = jnp.asarray(xi)

    variants = {
        "base": band_gather,
        "onehot_t": make_band_gather(onehot_t=True),
        "split1": make_band_gather(split=1),
        "split2": make_band_gather(split=2),
        "rb32": make_band_gather(rb=32),
        "rb32_t": make_band_gather(rb=32, onehot_t=True),
        "presplit": make_band_gather_presplit(),
        "presplit2k": make_band_gather_presplit(pt=2048),
        "xwin": make_band_gather_xwin(),
    }
    # blocked-affine pattern (the headline's rotation warps)
    if "xwin" in (sys.argv[1:] or variants):
        xw = variants["xwin"]
        for c in (1, 2, 5):
            img = jnp.asarray(np.random.RandomState(1)
                              .rand(n, c, h, w).astype(np.float32))
            for deg in (0, 10, 30):
                yb, xb = blocked_affine_indices(n, h, w, deg)
                ref = np.asarray(band_gather(img, yb, xb))
                got = np.asarray(xw(img, yb, xb))
                err = np.abs(ref - got).max()
                tb = _bench(_chain(band_gather), img, yb, xb)
                tx = _bench(_chain(xw), img, yb, xb)
                print(f"blocked c={c} rot={deg}: err={err:.1e} "
                      f"base={tb:.3f}ms xwin={tx:.3f}ms", flush=True)
    fusedw = make_band_gather_presplit(fuse_weights=True)
    fusedw2k = make_band_gather_presplit(fuse_weights=True, pt=2048)
    want = sys.argv[1:] or list(variants)
    for c in (1, 2, 5):
        img = jnp.asarray(r.rand(n, c, h, w).astype(np.float32))
        # parity check: presplit must match base bitwise-ish
        ref = np.asarray(band_gather(img, yi_j, xi_j))
        got = np.asarray(variants["presplit"](img, yi_j, xi_j))
        err = np.abs(ref - got).max()
        line = [f"presplit_err={err:.2e}"]
        for name in want:
            fn = variants[name]
            ms = _bench(_chain(fn), img, yi_j, xi_j)
            line.append(f"{name}={ms:.3f}ms")
        # fused-weights variant needs weights arg
        wts = jnp.asarray(r.rand(n, 4, h * w).astype(np.float32))

        @jax.jit
        def fw_chain(img, yi, xi, wts, fn=fusedw):
            def body(_, acc):
                v = fn(img + acc * 1e-9, yi, xi, wts)
                return jnp.sum(v) * 1e-9
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        @jax.jit
        def fw2k_chain(img, yi, xi, wts, fn=fusedw2k):
            def body(_, acc):
                v = fn(img + acc * 1e-9, yi, xi, wts)
                return jnp.sum(v) * 1e-9
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        line.append(f"fusedw={_bench(fw_chain, img, yi_j, xi_j, wts):.3f}ms")
        line.append(
            f"fusedw2k={_bench(fw2k_chain, img, yi_j, xi_j, wts):.3f}ms")

        # scatter: base vs presplit
        from advchain_tpu.kernels.gather_matmul import band_scatter
        sc_ps = make_band_scatter_presplit()
        g4 = jnp.asarray(r.rand(n, 4, c, p).astype(np.float32))
        ref_s = np.asarray(band_scatter(g4, yi_j, xi_j, h, w))
        got_s = np.asarray(sc_ps(g4, yi_j, xi_j, h, w))
        line.append(f"scat_err={np.abs(ref_s - got_s).max():.2e}")

        def sc_chain(fn):
            @jax.jit
            def run(g4, yi, xi):
                def body(_, acc):
                    v = fn(g4 + acc * 1e-9, yi, xi, h, w)
                    return jnp.sum(v) * 1e-9
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
            return run

        line.append(f"scat_base={_bench(sc_chain(band_scatter), g4, yi_j, xi_j):.3f}ms")
        line.append(f"scat_ps={_bench(sc_chain(sc_ps), g4, yi_j, xi_j):.3f}ms")
        print(f"c={c}: " + " ".join(line), flush=True)


if __name__ == "__main__":
    main()
