"""A/B the scaling-and-squaring stencil-radius ladder on the real chip.

Times the morph exponentiation (the headline episode's dominant sampler
load: 8 self-compositions of a (128, 2, 192, 192) flow, fwd and fwd+grad)
under different ADVCHAIN_SS_LADDER settings, plus the demons final
compose.  Reps are chained inside one jit so tunnel dispatch amortizes;
every measured section ends with a device->host transfer (the only honest
sync under the axon tunnel).

Usage: python scripts/ss_radius_bench.py [ladder ...]
  e.g. python scripts/ss_radius_bench.py "" "4,8" "4,16" band
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

BATCH = 128
SHAPE = (192, 192)
REPS = 10


def build_duv():
    """Typical headline morph velocity: unit-l2 latent (B, 2, 12, 12),
    epsilon 1.5, smoothed + upsampled like demons_compose."""
    from advchain_tpu.ops.conv import gaussian_smooth
    from advchain_tpu.ops.resize import interpolate
    r = np.random.RandomState(0)
    v = r.rand(BATCH, 2, SHAPE[0] // 16, SHAPE[1] // 16).astype(np.float32)
    v = 2 * v - 1
    v /= np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
    duv = 1.5 * jnp.asarray(v)
    duv = gaussian_smooth(duv, sigma=1, kernel_size=9, iters=1)
    return interpolate(duv, size=SHAPE, mode="bilinear", align_corners=False)


def time_program(f, outer=3):
    out = float(f())
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def rep(probe, duv):
    @jax.jit
    def chained():
        def body(_, eps):
            return probe(duv + eps) * 1e-24

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros(()))

    return chained


def main():
    variants = sys.argv[1:] or ["", "4,8", "band"]
    duv = build_duv()
    mx = float(jnp.max(jnp.abs(duv)))
    print(f"# |duv|_inf = {mx:.4f} grid units = "
          f"{mx * (SHAPE[0] - 1) / 2:.2f} px")
    for ladder in variants:
        if ladder == "band":
            os.environ["ADVCHAIN_STENCIL"] = "0"
            os.environ.pop("ADVCHAIN_SS_LADDER", None)
        else:
            os.environ.pop("ADVCHAIN_STENCIL", None)
            os.environ["ADVCHAIN_SS_LADDER"] = ladder
        jax.clear_caches()
        from advchain_tpu.ops.integrate import (base_grid, compose_flow,
                                                exponentiate_flow)

        def expo(d):
            return jnp.sum(exponentiate_flow(d, nb_steps=8))

        def expo_grad(d):
            v, g = jax.value_and_grad(expo)(d)
            return v + jnp.sum(g) * 1e-12

        def demons_tail(d):
            grid = base_grid(d.shape[0], SHAPE, dtype=d.dtype)
            off = exponentiate_flow(d, nb_steps=8)
            return jnp.sum(compose_flow(grid, off + grid))

        fwd = time_program(rep(expo, duv))
        fb = time_program(rep(expo_grad, duv))
        tail = time_program(rep(demons_tail, duv))
        name = ("band-only" if ladder == "band"
                else f"ladder=[{ladder or 'default R=2'}]")
        print(f"{name:>24}: expo fwd {fwd:7.2f} ms  fwd+grad {fb:7.2f} ms"
              f"  +final-compose {tail:7.2f} ms")


if __name__ == "__main__":
    main()
