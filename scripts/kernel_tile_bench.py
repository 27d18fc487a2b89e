"""Microbenchmark: Pallas gather/scatter tile sizes on the 2D warp shapes.

Usage: python scripts/kernel_tile_bench.py PT CH
Times grid_sample_2d_pallas forward and forward+grad on the episode's hot
shapes (image warp c=1, flow composition c=2, logits+mask warp-back c=5) at
the headline workload's (16, c, 192, 192).  Reps are chained INSIDE one
jitted fori_loop (output feeds the next warp's input) so tunnel dispatch
latency and the device->host sync amortize over all reps; honest final sync
via a scalar transfer (block_until_ready is a no-op under the axon tunnel).
Run each (PT, CH) in a fresh process (module constants are read at trace
time).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PT, CH = int(sys.argv[1]), int(sys.argv[2])

import advchain_tpu.kernels.gather_matmul as gm  # noqa: E402

gm._PT = PT
gm._CH = CH

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from advchain_tpu.kernels.gather_matmul import grid_sample_2d_pallas  # noqa

REPS = 50


def near_identity_grid(n, h, w, scale=0.05, seed=0):
    r = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    g = np.stack([xx, yy], axis=-1)[None].repeat(n, 0)
    g = g + scale * r.randn(n, h, w, 2) / h * 8
    return jnp.asarray(g.astype(np.float32))


def time_program(f, *args, outer=3):
    out = f(*args)  # compile
    float(jnp.sum(out))
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def main():
    n, h, w = 16, 192, 192
    grid = near_identity_grid(n, h, w)
    results = {}
    for c in (1, 2, 5):
        x = jnp.asarray(np.random.RandomState(1).rand(n, c, h, w)
                        .astype(np.float32))

        @jax.jit
        def fwd_chain(x, g):
            def body(_, acc):
                return grid_sample_2d_pallas(acc, g) * 0.999 + 1e-6

            return jax.lax.fori_loop(0, REPS, body, x)

        results[f"fwd_c{c}"] = time_program(fwd_chain, x, grid)

        def loss(x, g):
            return jnp.sum(grid_sample_2d_pallas(x, g) ** 2)

        gradf = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def grad_chain(x, g):
            def body(_, carry):
                xc, gc = carry
                dx, dg = gradf(xc, gc)
                return (xc + 1e-7 * dx, gc + 1e-7 * dg)

            xo, go = jax.lax.fori_loop(0, REPS, body, (x, g))
            return jnp.sum(xo) + jnp.sum(go)

        results[f"grad_c{c}"] = time_program(grad_chain, x, grid)
    print(f"PT={PT} CH={CH} " + " ".join(
        f"{k}={v:.2f}ms" for k, v in results.items()))


if __name__ == "__main__":
    main()
