"""Fully-fused adversarial training step (single chip or data-parallel mesh).

This is the production training path the reference README describes in
prose (README.md:177-214: ``total_loss = sup_loss + w * adv_consistency``)
— but compiled as ONE XLA program per step: reference forward, random
transform init, the n_iter PGD inner loop (through the frozen net), the
final consistency pass, the supervised loss, model gradients, and the
optimizer update all fuse into a single device program.  Nothing returns to
the host between batches.

Scale-out: pass a ``Mesh`` — the batch dim is sharded over the ``data``
axis, model/optimizer state is replicated, and XLA inserts the psum grad
reductions over ICI (no hand-written collectives).  The step is GSPMD
(jit + NamedSharding), so BatchNorm statistics are computed globally
across shards — numerically equivalent to the single-device step up to
f32 reduction order.

For 3D volumes that exceed one chip's HBM, pass a 2-D
``Mesh(('data', 'space'))`` (see ``parallel.spatial.make_spatial_mesh``):
the image's leading spatial axis (D for NCDHW, H for NCHW) is additionally
sharded over ``space`` and the SPMD partitioner inserts the halo exchanges
for the stencils, and every bilinear warp is traced as an explicit
shard_map (``parallel.spatial.sharded_grid_sample``: all-gather the source
over ICI, run the Pallas sampler per shard) — a bare pallas_call has no
SPMD partitioning rule, and XLA's own TPU gather is the pathology the
kernels exist to avoid.  The batch must then be a dict with exactly
``image``/``label`` (place it with ``parallel.spatial.shard_batch_spatial``).

The rare-path behaviors (anatomy-preserving graduated retries, rejection
sampling) are host-side control flow and intentionally NOT in this fused
step — use ``ComposeAdversarialTransformSolver.adversarial_training`` for
those workloads (SURVEY.md section 5.3).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from advchain_tpu.losses import cross_entropy
# note: the ops package re-exports the grid_sample FUNCTION under the same
# name, which shadows the submodule on attribute-style imports
from advchain_tpu.ops.grid_sample import spatial_sampling as _spatial_sampling

__all__ = ["TrainState", "make_adversarial_train_step",
           "make_supervised_train_step"]


def _mesh_shardings(mesh: Mesh, axis_name: str, transforms=None):
    """(replicated, batch, traced_fn_wrapper) shardings for a train step.

    1-D mesh: batch dim 0 over ``axis_name`` (prefix spec, any batch keys).
    2-D ('data', 'space') mesh with |space| > 1: the image's leading
    spatial axis (dim 2 of NC*S) and the hard label's (dim 1 of N*S) are
    additionally sharded over 'space' — the batch must then be exactly
    {'image', 'label'}.  Spatial programs trace every bilinear grid_sample
    through ``parallel.spatial.sharded_grid_sample`` (an explicit
    shard_map: exchange the source over ICI, run the Pallas sampler per
    shard) — a bare pallas_call has no SPMD partitioning rule, and the XLA
    sampler's gather is the exact pathology the kernels exist to avoid.

    When ``transforms`` is given, the chain's static displacement bound
    (``parallel.spatial.chain_displacement_bound``) rides the sampling
    context: warps whose halo fits inside one shard exchange neighbour
    bands instead of all-gathering the whole volume.
    """
    repl = NamedSharding(mesh, P())
    spatial = ("space" in mesh.axis_names
               and mesh.shape["space"] > 1)
    if not spatial:
        return repl, NamedSharding(mesh, P(axis_name)), (lambda f: f)
    batch_sh = {
        "image": NamedSharding(mesh, P(axis_name, None, "space")),
        "label": NamedSharding(mesh, P(axis_name, "space")),
    }
    max_disp = None
    if transforms is not None:
        from advchain_tpu.parallel.spatial import chain_displacement_bound
        max_disp = chain_displacement_bound(transforms)

    def trace_with_sharded_sampler(fn):
        def wrapper(*args, **kwargs):  # runs at trace time under jit
            with _spatial_sampling(mesh, max_disp=max_disp):
                return fn(*args, **kwargs)
        return wrapper

    return repl, batch_sh, trace_with_sharded_sampler


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, model, optimizer):
        return cls(params=model.params, batch_stats=model.batch_stats,
                   opt_state=optimizer.init(model.params),
                   step=jnp.zeros((), jnp.int32))


def _frozen_apply(model, params, batch_stats, dropout_rng):
    """The inner-loop fixed network: current params (stop-gradient at call
    sites), batch-stats BN, fixed dropout rng.  Honors the model's
    ``compute_dtype`` (bf16 speed mode): casts in, returns f32 logits."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def net(x):
        return model._cast_out(model.module.apply(
            model._cast_in(variables), model._cast_in(x), train=True,
            rngs={"dropout": dropout_rng}, mutable=False))

    return net


def make_adversarial_train_step(
        model, solver, optimizer,
        n_iter: int = 1,
        step_sizes=None,
        optimize_flags=None,
        power_iteration=False,
        consistency_weight: float = 1.0,
        supervised_loss_fn: Optional[Callable] = None,
        mesh: Optional[Mesh] = None,
        axis_name: str = "data",
        donate_state: bool = True):
    """Build ``train_step(state, batch, rng) -> (state, metrics)``.

    ``model``: SegmentationModel (module + init state); ``solver``: a
    ComposeAdversarialTransformSolver carrying the transform chain and the
    divergence config; ``optimizer``: an optax transform.  ``batch`` is a
    dict with ``image`` (N, C, *spatial) and ``label`` (N, *spatial) int or
    (N, C, *spatial) soft.
    """
    transforms = tuple(solver.chain_of_transforms)
    solver._apply_power_iteration_setting(power_iteration)
    flags = tuple(solver._normalize_flags(optimize_flags, n_iter))
    steps = tuple(solver._normalize_step_sizes(step_sizes))
    if supervised_loss_fn is None:
        supervised_loss_fn = cross_entropy

    def train_step(state: TrainState, batch, rng):
        image = batch["image"]
        label = batch["label"]
        k = jax.random.fold_in(rng, state.step)
        k_drop, k_init = jax.random.split(k)

        frozen_params = jax.lax.stop_gradient(state.params)
        frozen = _frozen_apply(model, frozen_params, state.batch_stats,
                               k_drop)
        init_output = jax.lax.stop_gradient(frozen(image))

        # random transform init (functional; per-step keys)
        keys = jax.random.split(k_init, len(transforms))
        t_params = tuple(t.init_params(kk)
                         for t, kk in zip(transforms, keys))
        t_params = tuple(t.prepare_train(p) if f else p
                         for t, p, f in zip(transforms, t_params, flags))

        # inner PGD loop, statically unrolled (n_iter is small; each
        # iteration is the solver's fused step body)
        if n_iter > 0:
            pgd = solver.build_pgd_step_fn(frozen, flags, steps)
            dummy_mask = jnp.zeros_like(image)
            for _ in range(n_iter):
                t_params, _ = pgd(t_params, image, init_output, dummy_mask)
            t_params = tuple(t.project(p) if f else p
                             for t, p, f in zip(transforms, t_params, flags))
        t_params = jax.lax.stop_gradient(t_params)

        def loss_fn(params):
            logits, new_bs = model.apply_train(params, state.batch_stats,
                                               image, k_drop)
            sup = supervised_loss_fn(logits, label)
            net = _frozen_apply(model, params, state.batch_stats, k_drop)
            # the final consistency pass is the solver's own math (chain
            # apply + mask roundtrip + divergence, with shared precomputed
            # deformation fields) — single source of truth
            cons, _adv_data, _adv_out, _warped = solver._final_loss_math(
                net)(t_params, image, init_output)
            total = sup + consistency_weight * cons
            return total, (new_bs, sup, cons)

        (total, (new_bs, sup, cons)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        metrics = {"total_loss": total, "supervised_loss": sup,
                   "consistency_loss": cons}
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step,
                       donate_argnums=(0,) if donate_state else ())
    repl, shard, wrap = _mesh_shardings(mesh, axis_name,
                                        transforms=transforms)
    return jax.jit(
        wrap(train_step),
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else ())


def make_supervised_train_step(model, optimizer,
                               supervised_loss_fn: Optional[Callable] = None,
                               mesh: Optional[Mesh] = None,
                               axis_name: str = "data",
                               donate_state: bool = True):
    """Plain supervised baseline step (no adversarial augmentation)."""
    if supervised_loss_fn is None:
        supervised_loss_fn = cross_entropy

    def train_step(state: TrainState, batch, rng):
        image = batch["image"]
        label = batch["label"]
        k_drop = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, new_bs = model.apply_train(params, state.batch_stats,
                                               image, k_drop)
            return supervised_loss_fn(logits, label), new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"total_loss": loss}

    if mesh is None:
        return jax.jit(train_step,
                       donate_argnums=(0,) if donate_state else ())
    repl, shard, wrap = _mesh_shardings(mesh, axis_name)
    return jax.jit(
        wrap(train_step),
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else ())
