"""Where does the episode's time go?  Times each sub-program of the fused
adversarial episode (bench.py workload) separately on the real chip, with
reps chained inside one jit so tunnel dispatch/sync amortizes.  Each probe
takes a scalar ``eps`` mixed into its inputs and returns a scalar, and the
rep loop feeds the output into the next iteration's eps — the data
dependence stops XLA from hoisting the body out of the loop.

Usage: python scripts/episode_breakdown.py
"""

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
from advchain_tpu.models import get_unet_model

sys.path.insert(0, "/root/repo")
from bench import BATCH, SHAPE, CKPT, chain_configs, make_image  # noqa

REPS = 20


def time_program(f, outer=3):
    out = float(f())
    best = 1e9
    for _ in range(outer):
        t0 = time.perf_counter()
        float(f())
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def rep(probe):
    """Chain REPS probe applications inside one jit via the eps carry."""

    @jax.jit
    def chained():
        def body(_, eps):
            return probe(eps) * 1e-24

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros(()))

    return chained


def main():
    cfg = chain_configs(BATCH, SHAPE)
    chain = [
        AdvNoise(config_dict=cfg["noise"]),
        AdvBias(config_dict=cfg["bias"]),
        AdvAffine(config_dict=cfg["affine"]),
        AdvMorph(config_dict=cfg["morph"]),
    ]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5])
    model = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16")
    data = jnp.asarray(make_image(BATCH, SHAPE))

    transforms = tuple(chain)
    keys = jax.random.split(jax.random.PRNGKey(0), len(transforms))
    params0 = tuple(t.init_params(k) for t, k in zip(transforms, keys))
    eval_flags = (False,) * len(transforms)

    variables = {"params": model.params, "batch_stats": model.batch_stats}

    def model_fn(x):
        return model.module.apply(variables, x, train=True, mutable=False)

    def params_with(eps):
        return tuple(jax.tree_util.tree_map(lambda a: a + eps, p)
                     for p in params0)

    results = {}

    results["unet_fwd"] = time_program(
        rep(lambda eps: jnp.sum(model_fn(data + eps))))

    def precompute(eps):
        auxs = solver._precompute_chain(transforms, params_with(eps),
                                        eval_flags)
        return sum(jnp.sum(leaf) for a in auxs
                   for leaf in jax.tree_util.tree_leaves(a))

    results["precompute"] = time_program(rep(precompute))

    def chain_apply(eps):
        p = params_with(eps)
        auxs = solver._precompute_chain(transforms, p, eval_flags)
        return jnp.sum(solver._chain_apply_pure(transforms, p, data,
                                                eval_flags, auxs))

    results["precompute+apply"] = time_program(rep(chain_apply))

    final = solver._final_loss_math(model_fn)
    init_output = model_fn(data)
    results["final_pass"] = time_program(
        rep(lambda eps: final(params_with(eps), data, init_output)[0]))

    pgd = solver.build_pgd_step_fn(model_fn, (True,) * 4, (1.0,) * 4)
    dummy = jnp.zeros_like(data)

    def pgd_once(eps):
        new_params, d = pgd(params_with(eps), data, init_output, dummy)
        return d + sum(jnp.sum(leaf) for leaf in
                       jax.tree_util.tree_leaves(new_params)) * 1e-12

    results["pgd_step"] = time_program(rep(pgd_once))

    for k, v in results.items():
        print(f"{k:>20}: {v:8.2f} ms")


if __name__ == "__main__":
    main()
