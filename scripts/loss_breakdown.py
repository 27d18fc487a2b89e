"""Second-level breakdown: consistency-loss cost and morph precompute
internals on the bench workload.  Same rep-chaining methodology as
episode_breakdown.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph, AdvNoise,
                                    ComposeAdversarialTransformSolver)
from advchain_tpu.losses import calc_segmentation_consistency

sys.path.insert(0, "/root/repo")
from bench import BATCH, SHAPE, chain_configs, make_image  # noqa

REPS = 20


def time_program(f, outer=3):
    float(f())
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def rep(probe):
    @jax.jit
    def chained():
        def body(_, eps):
            return probe(eps) * 1e-24

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros(()))

    return chained


def main():
    cfg = chain_configs(BATCH, SHAPE)
    r = np.random.RandomState(0)
    pred = jnp.asarray(r.randn(BATCH, 4, *SHAPE).astype(np.float32))
    ref = jnp.asarray(r.randn(BATCH, 4, *SHAPE).astype(np.float32))
    mask = jnp.asarray((r.rand(BATCH, 1, *SHAPE) > 0.1).astype(np.float32))

    results = {}
    for dtypes, w in ((["mse"], [1.0]), (["contour"], [0.5]),
                      (["mse", "contour"], [1.0, 0.5]), (["kl"], [1.0])):
        name = "+".join(dtypes)
        results[f"loss[{name}]"] = time_program(rep(
            lambda eps, dt=tuple(dtypes), ww=tuple(w):
            calc_segmentation_consistency(
                output=pred + eps, reference=ref,
                divergence_types=list(dt), divergence_weights=list(ww),
                mask=mask)))
        results[f"loss[{name}]+grad"] = time_program(rep(
            lambda eps, dt=tuple(dtypes), ww=tuple(w):
            jax.grad(lambda p: calc_segmentation_consistency(
                output=p, reference=ref, divergence_types=list(dt),
                divergence_weights=list(ww), mask=mask))(pred + eps).sum()))

    # morph precompute alone (expo) vs affine/bias precompute
    for nm in ("noise", "bias", "affine", "morph"):
        t = {"noise": AdvNoise, "bias": AdvBias, "affine": AdvAffine,
             "morph": AdvMorph}[nm](config_dict=cfg[nm])
        p0 = t.init_params(jax.random.PRNGKey(0))

        def probe(eps, t=t, p0=p0):
            p = jax.tree_util.tree_map(lambda a: a + eps, p0)
            aux = t.precompute(p, training=False)
            return sum(jnp.sum(leaf)
                       for leaf in jax.tree_util.tree_leaves(aux))

        results[f"precompute[{nm}]"] = time_program(rep(probe))

    for k, v in results.items():
        print(f"{k:>24}: {v:8.2f} ms")


if __name__ == "__main__":
    main()
