"""Microbenchmark: 3D trilinear warp kernels on the 3D episode's hot
shapes (12x192x192 volumes, batch 2 — bench.py config #4).

Cases (from the round-4 device-trace attribution, TRACE_ROOFLINE.json:
~77% of the 3D episode is plane_gather/scatter custom calls):
  affine_c1      10-deg rotated warp, c=1, 'blocks' order (image warp)
  affine_c1_grad same, forward + grad wrt image and grid
  pred_c5        10-deg rotated warp, c=5 (logits+mask warp-back)
  near_c3        near-identity flow warp, c=3, 'rows' (ss sampler branch)

Usage: python scripts/warp3d_bench.py [label]
Env knobs read by the kernels at trace time (A/B in fresh processes):
  ADVCHAIN_VMEM_IMG_BUDGET   bytes (default 5 MiB)
  ADVCHAIN_PLANE_PACKED_C1   route c=1 through the packed path too
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from advchain_tpu.kernels.gather_matmul import grid_sample_3d_pallas  # noqa

REPS = 20
N, D, H, W = 2, 12, 192, 192


def rotated_grid(n, d, h, w, deg=10.0):
    """Affine-style grid: rot_x = rot_y = rot_z = deg, small scale/shift."""
    t = np.radians(deg)
    cz, sz = np.cos(t), np.sin(t)
    cy, sy = np.cos(t), np.sin(t)
    cx, sx = np.cos(t), np.sin(t)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    m = rz @ ry @ rx
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w), indexing="ij")
    pts = np.stack([xx, yy, zz], -1) @ m.T
    return jnp.asarray(np.broadcast_to(pts[None], (n, d, h, w, 3))
                       .astype(np.float32))


def near_identity_grid(n, d, h, w, scale=2.5, seed=0):
    """Flow-composition-style grid: a few voxels of smooth displacement."""
    r = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w), indexing="ij")
    g = np.stack([xx, yy, zz], -1)[None].repeat(n, 0)
    g[..., 0] += scale * 2 / w * r.randn(n, 1, 1, 1)
    g[..., 1] += scale * 2 / h * r.randn(n, 1, 1, 1)
    g[..., 2] += 0.5 * 2 / d * r.randn(n, 1, 1, 1)
    return jnp.asarray(g.astype(np.float32))


def chain(warp):
    """REPS warps chained in one jit (output perturbs the next input) so
    tunnel dispatch amortizes; honest sync via scalar transfer."""

    @jax.jit
    def run(x, g):
        def body(_, acc):
            out = warp(acc, g)
            return acc + 1e-12 * out

        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x))

    return run


def time_program(f, *args, outer=3):
    float(f(*args))
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "base"
    r = np.random.RandomState(0)
    rot = rotated_grid(N, D, H, W)
    near = near_identity_grid(N, D, H, W)
    results = {}

    x1 = jnp.asarray(r.rand(N, 1, D, H, W).astype(np.float32))
    warp_b = lambda x, g: grid_sample_3d_pallas(x, g, tile_order="blocks")
    results["affine_c1"] = time_program(chain(warp_b), x1, rot)

    def loss(x, g):
        return jnp.sum(grid_sample_3d_pallas(x, g, tile_order="blocks") ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def grad_chain(x, g):
        def body(_, carry):
            x_, g_ = carry
            dx, dg = grad_fn(x_, g_)
            return x_ + 1e-12 * dx, g_ + 1e-12 * dg

        xo, go = jax.lax.fori_loop(0, REPS, body, (x, g))
        return jnp.sum(xo) + jnp.sum(go)

    results["affine_c1_grad"] = time_program(grad_chain, x1, rot)

    x5 = jnp.asarray(r.rand(N, 5, D, H, W).astype(np.float32))
    results["pred_c5"] = time_program(chain(warp_b), x5, rot)

    x3 = jnp.asarray(r.rand(N, 3, D, H, W).astype(np.float32))
    warp_r = lambda x, g: grid_sample_3d_pallas(x, g, tile_order="rows")
    results["near_c3"] = time_program(chain(warp_r), x3, near)

    for k, v in results.items():
        print(f"[{label}] {k:16}: {v:8.2f} ms")


if __name__ == "__main__":
    main()
