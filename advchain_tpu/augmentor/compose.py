"""ComposeAdversarialTransformSolver — chain transforms, optimize them
adversarially (PGD / power iteration), return the consistency loss.

Parity with reference advchain/augmentor/adv_compose_solver.py with a
TPU-native execution model:

* the per-iteration PGD step (chain-apply -> frozen-net forward -> geometric
  warp-back + ones-mask roundtrip -> divergence -> grad w.r.t. transform
  params -> per-transform ascent update) is compiled as ONE jitted XLA
  program and cached per (model, shapes, flags) — the common path never
  leaves the device;
* rare-path control flow (the anatomy/volume-preserving graduated retry,
  adv_compose_solver.py:376-401, and rejection sampling of random geometric
  inits, :493-500) stays host-side around the jitted step, exactly
  mirroring the reference's behavioral fallbacks;
* NaN/Inf guard (adv_compose_solver.py:345-346): a non-finite divergence
  skips the parameter update for that iteration (jnp.where on the device).

Model contract: ``model`` is a jit-traceable callable ``model(x) -> logits``
whose semantics over one ``adversarial_training`` call must be those of a
*fixed* network — BatchNorm in batch-statistics mode with running stats
frozen, dropout masks fixed (the reference achieves this with
``_disable_tracking_bn_stats`` + Fixable dropout replay,
common/utils.py:114-173; in JAX simply close over params/batch-stats and a
fixed dropout rng).  If the object exposes ``begin_episode(key)`` the solver
calls it once per ``adversarial_training``/``get_adv_data`` call so wrapper
classes can redraw their fixed dropout mask per episode.

Known divergence from the reference (documented): the reference's
``step_sizes`` list is effectively broken — its loop index is never
incremented so all transforms use ``step_sizes[0]``
(adv_compose_solver.py:349-364); here the *documented* API (per-transform
step sizes, README.md:205) is honored.
"""

from __future__ import annotations

import collections
import logging
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from advchain_tpu.losses import calc_segmentation_consistency

logger = logging.getLogger(__name__)


def np_asarray_list(x):
    import numpy as _np
    return [float(v) for v in _np.asarray(x)]


def _binarize_nonzero(mask):
    """mask[mask != 0] = 1 (reference adv_compose_solver.py:268,325)."""
    return jnp.where(mask != 0, jnp.ones_like(mask), mask)


class ComposeAdversarialTransformSolver:
    """Apply and adversarially optimize a chain of transforms
    (reference adv_compose_solver.py:11)."""

    def __init__(self, chain_of_transforms=None,
                 divergence_types: Sequence[str] = ("mse", "contour"),
                 divergence_weights: Sequence[float] = (1.0, 0.5),
                 use_gpu: bool = True, debug: bool = False,
                 if_norm_image: bool = False,
                 min_intensity: Optional[float] = None,
                 max_intensity: Optional[float] = None,
                 is_gt: bool = False):
        self.chain_of_transforms = list(chain_of_transforms or [])
        self.use_gpu = use_gpu  # accepted for API parity; placement is JAX's
        self.debug = debug
        self.divergence_weights = list(divergence_weights)
        self.divergence_types = list(divergence_types)
        self.require_bi_loss = self.if_contains_geo_transform()
        self.if_norm_image = if_norm_image
        self.min_intensity = min_intensity
        self.max_intensity = max_intensity
        self.is_gt = is_gt
        self.class_weights = None
        self._step_cache = collections.OrderedDict()
        # strong refs keeping id()-keyed model objects alive for as long as
        # their cache entries exist (an id reused after GC could otherwise
        # alias a stale executable); the LRU bound keeps both dicts small
        self._cache_pins = {}
        self._episode_counter = 0
        self._warned_hook_cache = False

    _STEP_CACHE_MAX = 32

    def _cache_get(self, key):
        value = self._step_cache.get(key)
        if value is not None:
            self._step_cache.move_to_end(key)
        return value

    def _cache_put(self, key, value, pin=None):
        self._step_cache[key] = value
        self._step_cache.move_to_end(key)
        if pin is not None:
            self._cache_pins[key] = pin
        while len(self._step_cache) > self._STEP_CACHE_MAX:
            old, _ = self._step_cache.popitem(last=False)
            self._cache_pins.pop(old, None)
        return value

    def clear_cache(self):
        """Drop all cached episode/step executables (forces retrace)."""
        self._step_cache.clear()
        self._cache_pins.clear()

    def _chain_cache_key(self):
        """Per-transform identity component for every program cache: the
        jitted closures capture the transform OBJECTS (their configs —
        epsilon, vector_size, padding, cp spacing — shape the traced
        program), so a chain reassigned with same-typed but
        differently-configured transforms must not reuse a stale program
        (reference chains are plain reassignable attributes,
        adv_compose_solver.py:16-41).  Callers must pin the transforms
        tuple via _cache_put(pin=...) to keep the id()s alive."""
        return tuple(id(t) for t in self.chain_of_transforms)

    def _next_episode_seed(self) -> int:
        self._episode_counter += 1
        return self._episode_counter

    # ------------------------------------------------------------ main API
    def adversarial_training(self, data, model, optimize_flags=None,
                             init_output=None, lazy_load: bool = False,
                             power_iteration=False, n_iter: int = 1,
                             step_sizes=None, anatomy_mask_images=None,
                             anatomy_reg_weight: float = 50,
                             volume_preserve_tolerance: float = 5e-4):
        """Optimize the chain to maximize prediction inconsistency, then
        return the adversarial consistency loss
        (reference adv_compose_solver.py:43-146)."""
        optimize_flags = self._normalize_flags(optimize_flags, n_iter)
        self._apply_power_iteration_setting(power_iteration)
        step_sizes = self._normalize_step_sizes(step_sizes)

        if anatomy_mask_images is None:
            # FAST PATH: the whole episode (reference fwd, random init or
            # warm start, PGD loop, projection, final loss) is one cached
            # device program -> a single dispatch.  Reference lazy
            # semantics: init ONLY missing params, keep caller-provided
            # ones — the per-transform presence mask is static (part of
            # the program key) and the missing inits ride the episode
            # program itself (no extra eager dispatches).
            if lazy_load:
                present = tuple(t.param is not None
                                for t in self.chain_of_transforms)
            else:
                present = (False,) * len(self.chain_of_transforms)
            fn = self._get_episode_fn(model, optimize_flags, step_sizes,
                                      n_iter, present, data.shape,
                                      want_pseudo=False)
            seed = self._next_episode_seed()
            params_in = tuple(t.param if pr else None for t, pr in
                              zip(self.chain_of_transforms, present))
            (params, dist, adv_data, adv_output, warped_back_adv_output,
             init_output, inner_dists, _pseudo) = fn(
                seed, data, params_in, init_output,
                self._model_variables(model))
            self.pseudo_label = None  # only get_adv_data computes it
            for t, p in zip(self.chain_of_transforms, params):
                t.param = p
                t.is_training = False
            if self.debug:
                for i, d in enumerate(np_asarray_list(inner_dists)):
                    print(f"[inner loop], step {i + 1}: dist {d}")
        else:
            if hasattr(model, "begin_episode"):
                model.begin_episode()
            use_anatomy = abs(anatomy_reg_weight) > 1e-32
            has_geo = self.if_contains_geo_transform()
            if not lazy_load:
                # FUSED FIRST ATTEMPT: init (+ rejection sampling), the
                # n_iter anatomy-penalized PGD loop, projection, volume
                # check, and final pass as ONE dispatch; the host ladder
                # below only runs on a failed volume check (rare)
                fn = self._get_anatomy_episode_fn(
                    model, optimize_flags, step_sizes, n_iter, data.shape,
                    tuple(anatomy_mask_images.shape), anatomy_reg_weight,
                    float(volume_preserve_tolerance), use_anatomy)
                (params, dist, adv_data, adv_output,
                 warped_back_adv_output, init_output, inner_dists,
                 stats) = fn(self._next_episode_seed(), data,
                             init_output, anatomy_mask_images,
                             self._model_variables(model),
                             self._episode_dropout_key(model))
                for t, p in zip(self.chain_of_transforms, params):
                    t.param = p
                    t.is_training = False
                if self.debug:
                    for i, d in enumerate(np_asarray_list(inner_dists)):
                        print(f"[inner loop], step {i + 1}: dist {d}")
                import numpy as _np
                mis, max_tries = _np.asarray(stats)  # one host transfer
                if max_tries > 10:
                    logger.warning(
                        "random initialization: fail to find a good "
                        "initialized geo transformation in the given "
                        "range; reduce the search space or increase the "
                        "tolerance factor")
                ok = (n_iter < 1 or not has_geo or not use_anatomy
                      or float(mis) <= volume_preserve_tolerance)
                if ok:
                    self.init_output = init_output
                    self.warped_back_adv_output = warped_back_adv_output
                    self.origin_data = data
                    self.adv_data = adv_data
                    self.adv_predict = adv_output
                    if self.debug:
                        print("[outer loop] loss", float(dist))
                    return dist
                # volume check failed: hand over to the graduated retry
                # ladder, continuing from the written-back params
                self.optimizing_transform(
                    data=data, model=model, init_output=init_output,
                    n_iter=n_iter, optimize_flags=optimize_flags,
                    step_sizes=step_sizes,
                    anatomy_mask_images=anatomy_mask_images,
                    anatomy_reg_weight=anatomy_reg_weight,
                    volume_preserve_tolerance=volume_preserve_tolerance,
                    _resume_from_first_decision=True)
            else:
                if init_output is None:
                    init_output = self.get_init_output(data=data,
                                                       model=model)
                self.init_random_transformation(
                    lazy_load, anatomy_mask_images=anatomy_mask_images,
                    volume_preserve_tolerance=volume_preserve_tolerance)
                if n_iter >= 1:
                    self.optimizing_transform(
                        data=data, model=model, init_output=init_output,
                        n_iter=n_iter, optimize_flags=optimize_flags,
                        step_sizes=step_sizes,
                        anatomy_mask_images=anatomy_mask_images,
                        anatomy_reg_weight=anatomy_reg_weight,
                        volume_preserve_tolerance=volume_preserve_tolerance)

            for tr in self.chain_of_transforms:
                tr.eval()
            final_fn = self._get_final_loss_fn(model, data.shape)
            dist, adv_data, adv_output, warped_back_adv_output = final_fn(
                tuple(t.param for t in self.chain_of_transforms),
                jax.lax.stop_gradient(data), init_output)

        self.init_output = init_output
        self.warped_back_adv_output = warped_back_adv_output
        self.origin_data = data
        self.adv_data = adv_data
        self.adv_predict = adv_output
        if self.debug:
            print("[outer loop] loss", float(dist))
        return dist

    # ----------------------------------------------------- chain apply ops
    def forward(self, data, chain_of_transforms=None, interp=None,
                padding_mode=None):
        """Apply the chain (reference adv_compose_solver.py:148-176)."""
        data = jax.lax.stop_gradient(data)
        t_data = data
        self.diffs = []
        chain = (self.chain_of_transforms if chain_of_transforms is None
                 else chain_of_transforms)
        for transform in chain:
            t_data = transform.forward(t_data, interp=interp,
                                       padding_mode=padding_mode)
            self.diffs.append(transform.diff)
        if self.if_norm_image:
            lo = (jnp.min(data) if self.min_intensity is None
                  else self.min_intensity)
            hi = (jnp.max(data) if self.max_intensity is None
                  else self.max_intensity)
            t_data = jnp.clip(t_data, lo, hi)
        return t_data

    def predict_forward(self, data, chain_of_transforms=None, interp=None,
                        padding_mode=None):
        self.diffs = []
        chain = (self.chain_of_transforms if chain_of_transforms is None
                 else chain_of_transforms)
        for transform in chain:
            data = transform.predict_forward(data, interp=interp,
                                             padding_mode=padding_mode)
            self.diffs.append(transform.diff)
        return data

    def backward(self, data, chain_of_transforms=None, interp=None,
                 padding_mode=None):
        chain = (self.chain_of_transforms if chain_of_transforms is None
                 else chain_of_transforms)
        for transform in reversed(chain):
            data = transform.backward(data, interp=interp,
                                      padding_mode=padding_mode)
        return data

    def predict_backward(self, data, chain_of_transforms=None, interp=None,
                         padding_mode=None):
        chain = (self.chain_of_transforms if chain_of_transforms is None
                 else chain_of_transforms)
        for transform in reversed(chain):
            data = transform.predict_backward(data, interp=interp,
                                              padding_mode=padding_mode)
        return data

    # -------------------------------------------------------------- losses
    def loss_fn(self, pred, reference, mask=None):
        return calc_segmentation_consistency(
            output=pred, reference=reference,
            divergence_types=self.divergence_types,
            divergence_weights=self.divergence_weights, scales=[0],
            mask=mask, class_weights=self.class_weights, is_gt=self.is_gt)

    def calc_adv_consistency_loss(self, data, model, init_output,
                                  chain_of_transforms=None):
        """Final consistency loss with the optimized (frozen) chain
        (reference adv_compose_solver.py:236-279)."""
        if chain_of_transforms is None:
            chain_of_transforms = self.chain_of_transforms
        for tr in chain_of_transforms:
            tr.eval()
        adv_data = self.forward(data, chain_of_transforms)
        # reference forces model.train() (+ _fix_dropout) for this pass
        # (adv_compose_solver.py:256-259): batch statistics, fixed dropout
        old_state = getattr(model, "training", None)
        if hasattr(model, "train"):
            model.train()
        try:
            adv_output = self.get_net_output(
                model, jax.lax.stop_gradient(adv_data))
        finally:
            if old_state is not None and hasattr(model, "train"):
                model.train(old_state)
        if self.if_contains_geo_transform(chain_of_transforms):
            masks = jnp.ones_like(init_output)
            forward_mask = self.predict_forward(masks, chain_of_transforms)
            fb_mask = self.predict_backward(forward_mask, chain_of_transforms)
            warped_back_adv_output = self.predict_backward(
                adv_output, chain_of_transforms)
            fb_mask = _binarize_nonzero(fb_mask)
            dist = self.loss_fn(pred=warped_back_adv_output,
                                reference=jax.lax.stop_gradient(init_output),
                                mask=fb_mask)
        else:
            warped_back_adv_output = adv_output
            dist = self.loss_fn(pred=adv_output,
                                reference=jax.lax.stop_gradient(init_output))
        return dist, adv_data, adv_output, warped_back_adv_output

    def compute_anatomy_misoverlapping_loss(self, anatomy_mask_images):
        """Volume-preservation penalty: MSE between the binarized
        roundtripped anatomy mask and the original
        (reference adv_compose_solver.py:281-287).

        Fused: the whole eval-mode roundtrip (precompute deformations once,
        forward-warp, backward-warp, binarize, MSE) is one cached device
        program — the retry loops in optimizing_transform and
        init_random_transformation call this once per decision instead of
        dispatching 2x chain-length eager warps."""
        params = tuple(t.param for t in self.chain_of_transforms)
        if any(p is None for p in params):
            # not yet initialized: fall back to the stateful path (inits
            # lazily, reference forward() auto-init semantics)
            recovered = self.predict_backward(
                self.predict_forward(anatomy_mask_images))
            recovered = jnp.where(recovered >= 0.5, 1.0, 0.0)
            score = jnp.mean((recovered - anatomy_mask_images) ** 2)
        else:
            fn = self._get_misoverlap_fn(tuple(anatomy_mask_images.shape))
            score = fn(params, anatomy_mask_images)
        if self.debug:
            print("anatomy preserving error:", float(score))
        return score

    def _get_misoverlap_fn(self, mask_shape):
        transforms = tuple(self.chain_of_transforms)
        key = ("misoverlap", mask_shape, self._chain_cache_key())
        if self._cache_get(key) is None:

            def misoverlap(params, mask):
                eval_flags = (False,) * len(transforms)
                auxs = self._precompute_chain(transforms, params, eval_flags)
                fwd = self._predict_forward_pure(transforms, params, mask,
                                                 eval_flags, auxs)
                rec = self._predict_backward_pure(transforms, params, fwd,
                                                  eval_flags, auxs)
                rec = jnp.where(rec >= 0.5, 1.0, 0.0)
                return jnp.mean((rec - mask) ** 2)

            self._cache_put(key, jax.jit(misoverlap), pin=transforms)
        return self._cache_get(key)

    # ------------------------------------------------- jitted PGD machinery
    def _functional_chain_state(self):
        params = tuple(t.param for t in self.chain_of_transforms)
        train_flags = tuple(bool(t.is_training)
                            for t in self.chain_of_transforms)
        return params, train_flags

    def _precompute_chain(self, transforms, params, train_flags):
        """Per-evaluation shared state (deformation fields / matrices /
        bias fields) computed ONCE and reused by the data, prediction, and
        mask applications inside a single traced loss — the morph
        exponentiation is by far the most expensive subgraph and would
        otherwise be recomputed up to 5x per loss."""
        return tuple(t.precompute(p, training=tf)
                     for t, p, tf in zip(transforms, params, train_flags))

    def _chain_apply_pure(self, transforms, params, data, train_flags,
                          auxs=None):
        x = data
        if auxs is None:
            auxs = self._precompute_chain(transforms, params, train_flags)
        for t, p, tf, aux in zip(transforms, params, train_flags, auxs):
            x = t.apply_precomputed(aux, p, x, training=tf)
        if self.if_norm_image:
            lo = (jnp.min(data) if self.min_intensity is None
                  else self.min_intensity)
            hi = (jnp.max(data) if self.max_intensity is None
                  else self.max_intensity)
            x = jnp.clip(x, lo, hi)
        return x

    def _predict_forward_pure(self, transforms, params, data, train_flags,
                              auxs=None):
        if auxs is None:
            auxs = self._precompute_chain(transforms, params, train_flags)
        for t, p, tf, aux in zip(transforms, params, train_flags, auxs):
            if t.is_geometric():
                data = t.apply_precomputed(aux, p, data, training=tf)
        return data

    def _predict_backward_pure(self, transforms, params, data, train_flags,
                               auxs=None):
        if auxs is None:
            auxs = self._precompute_chain(transforms, params, train_flags)
        for t, p, tf, aux in reversed(list(zip(transforms, params,
                                               train_flags, auxs))):
            if t.is_geometric():
                data = t.inverse_precomputed(aux, p, data, training=tf)
        return data

    def _build_pgd_step(self, model, optimize_flags, step_sizes,
                        use_anatomy: bool, anatomy_reg_weight: float):
        """One fused PGD iteration as a jitted device program."""
        return jax.jit(self.build_pgd_step_fn(
            model, optimize_flags, step_sizes, use_anatomy,
            anatomy_reg_weight))

    def build_pgd_step_fn(self, model, optimize_flags, step_sizes,
                          use_anatomy: bool = False,
                          anatomy_reg_weight: float = 50.0):
        """The raw (un-jitted) PGD iteration — importable into larger
        traced programs (the fully-fused adversarial train step in
        advchain_tpu.parallel.train).  ``model`` may be any traceable
        callable ``model(x) -> logits``, including a closure over the
        current training step's parameters."""
        transforms = tuple(self.chain_of_transforms)
        has_geo = self.if_contains_geo_transform()
        flags = tuple(bool(f) for f in optimize_flags)
        steps = tuple(float(s) for s in step_sizes)
        get_output = self.get_net_output

        def pgd_step(params, data, init_output, anatomy_mask):
            train_flags = flags  # flagged transforms are in training mode

            def dist_fn(opt_params):
                full = []
                it = iter(opt_params)
                for p, f in zip(params, flags):
                    full.append(next(it) if f else p)
                full = tuple(full)
                auxs = self._precompute_chain(transforms, full, train_flags)
                aug = self._chain_apply_pure(transforms, full, data,
                                             train_flags, auxs)
                perturbed = get_output(model, aug)
                if has_geo:
                    # the validity mask is C identical channels; warp ONE
                    # channel and let the losses broadcast it.  The mask
                    # (and anatomy) channels ride the SAME backward chain
                    # as the prediction — one warp instead of 2-3 (the
                    # kernels' cost is dominated by the per-tile band
                    # sweep, which extra channels share)
                    ones = jnp.ones(init_output.shape[:1] + (1,)
                                    + init_output.shape[2:],
                                    init_output.dtype)
                    fwd_in = (jnp.concatenate([ones, anatomy_mask], axis=1)
                              if use_anatomy else ones)
                    fwd = self._predict_forward_pure(transforms, full,
                                                     fwd_in, train_flags,
                                                     auxs)
                    c = perturbed.shape[1]
                    both = self._predict_backward_pure(
                        transforms, full,
                        jnp.concatenate([perturbed, fwd], axis=1),
                        train_flags, auxs)
                    warped_back = both[:, :c]
                    fb_mask = _binarize_nonzero(both[:, c:c + 1])
                    dist = self.loss_fn(pred=warped_back,
                                        reference=init_output, mask=fb_mask)
                    if use_anatomy:
                        rec = both[:, c + 1:]
                        rec = jnp.where(rec >= 0.5, 1.0, 0.0)
                        reg = anatomy_reg_weight * jnp.mean(
                            (rec - anatomy_mask) ** 2)
                        dist = dist + reg
                else:
                    dist = self.loss_fn(
                        pred=perturbed,
                        reference=jax.lax.stop_gradient(init_output))
                return dist

            opt_params = tuple(p for p, f in zip(params, flags) if f)
            dist, grads = jax.value_and_grad(dist_fn)(opt_params)
            ok = jnp.isfinite(dist)
            new_params = []
            git = iter(grads)
            sit = iter(steps)
            for t, p, f in zip(transforms, params, flags):
                if f:
                    g = next(git)
                    s = next(sit)
                    updated = t.update(p, g, s)
                    new_params.append(jnp.where(ok, updated, p))
                else:
                    next(sit, None)
                    new_params.append(p)
            return tuple(new_params), dist

        return pgd_step

    def _get_init_all_fn(self):
        """Fused random init of every transform's params: ONE device program
        instead of a dozen small dispatches (each host->device dispatch costs
        real latency on remote/tunneled TPU runtimes)."""
        key = ("init_all", self._chain_cache_key())
        if self._cache_get(key) is None:
            transforms = tuple(self.chain_of_transforms)

            def init_all(base_key):
                keys = jax.random.split(base_key, len(transforms))
                return tuple(t.init_params(k)
                             for t, k in zip(transforms, keys))

            self._cache_put(key, jax.jit(init_all), pin=transforms)
        return self._cache_get(key)

    def _get_project_all_fn(self, optimize_flags):
        """Fused projection (rescale_parameters) for flagged transforms."""
        key = ("project_all", tuple(optimize_flags),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            transforms = tuple(self.chain_of_transforms)
            flags = tuple(optimize_flags)

            def project_all(params):
                return tuple(t.project(p) if f else p
                             for t, p, f in zip(transforms, params, flags))

            self._cache_put(key, jax.jit(project_all), pin=transforms)
        return self._cache_get(key)

    def _model_call(self, model, x, dropout_key=None, variables=None,
                    train=None):
        """Route a frozen-network forward.  When the model exposes Flax
        variables they are passed as TRACED arguments (``variables``) so the
        cached episode executable follows weight updates — a closure would
        bake the weights in as constants.  ``dropout_key`` likewise.

        ``train`` forces the BN mode; None follows the model's torch-style
        mode flag (model.train()/model.eval()).  The FINAL consistency pass
        passes train=True to mirror the reference's forced model.train()
        there (adv_compose_solver.py:256-259)."""
        if train is None:
            train = bool(getattr(model, "training",
                                 getattr(model, "use_batch_stats_in_solver",
                                         True)))
        # honor a user-overridden get_net_output hook (reference
        # README.md:287-288): route through it instead of the direct apply.
        # Note: inside a cached episode program the hook's weights are baked
        # as constants (keyed by id(model) via _model_cache_key).
        if self._hook_overridden():
            return self.get_net_output(model, x)
        if variables is not None and hasattr(model, "module"):
            rngs = ({"dropout": dropout_key}
                    if dropout_key is not None else None)
            if getattr(model, "compute_dtype", None) is not None:
                variables = model._cast_in(variables)
                x = model._cast_in(x)
            out = model.module.apply(
                variables, x, train=train, rngs=rngs, mutable=False)
            return (out.astype(jnp.float32)
                    if getattr(model, "compute_dtype", None) is not None
                    else out)
        if dropout_key is not None and hasattr(model, "apply_fixed"):
            return model.apply_fixed(x, dropout_key, train=train)
        if hasattr(model, "apply_fixed"):
            return model.apply_fixed(x, model._episode_rng, train=train)
        return self.get_net_output(model, x)

    def _hook_overridden(self) -> bool:
        """True when the user customized ``get_net_output`` — either by
        subclassing OR by instance-level reassignment
        (``solver.get_net_output = fn``, the torch idiom the reference FAQ
        suggests for multi-branch outputs)."""
        if "get_net_output" in self.__dict__:
            return True
        return (type(self).get_net_output
                is not ComposeAdversarialTransformSolver.get_net_output)

    def _model_cache_key(self, model):
        """Stable identity for the program cache: the Flax module for
        wrappers (weights are traced arguments, so params updates reuse the
        executable); object id for plain callables and overridden
        get_net_output hooks (their weights are baked as constants —
        rebuild the callable and you pay a retrace).  The torch-style mode
        flag is part of the key: train/eval compile different programs."""
        overridden = self._hook_overridden()
        mode = bool(getattr(model, "training",
                            getattr(model, "use_batch_stats_in_solver",
                                    True)))
        dtype = getattr(model, "compute_dtype", None)
        dtype = None if dtype is None else str(dtype)
        if hasattr(model, "module") and not overridden:
            return ("module", id(model.module), mode, dtype)
        if overridden and not self._warned_hook_cache:
            self._warned_hook_cache = True
            logger.warning(
                "get_net_output is overridden: cached episode programs bake "
                "the hook's model weights in as constants (keyed by object "
                "id).  If you update the model's weights, call "
                "solver.clear_cache() so new programs see them.")
        return ("callable", id(model), mode, overridden, dtype)

    @staticmethod
    def _model_variables(model):
        if hasattr(model, "_variables"):
            return model._variables()
        return None

    @staticmethod
    def _episode_dropout_key(model):
        """The wrapper's episode-fixed dropout rng, passed as a TRACED
        argument so cached programs follow begin_episode() redraws."""
        return getattr(model, "_episode_rng", None)

    def _final_loss_math(self, model_fn):
        """Raw final consistency pass (calc_adv_consistency_loss's math):
        chain apply (eval mode) -> net -> mask roundtrip -> divergence."""
        transforms = tuple(self.chain_of_transforms)
        has_geo = self.if_contains_geo_transform()

        def final(params, data, init_output):
            eval_flags = (False,) * len(transforms)
            auxs = self._precompute_chain(transforms, params, eval_flags)
            adv_data = self._chain_apply_pure(transforms, params, data,
                                              eval_flags, auxs)
            adv_output = model_fn(jax.lax.stop_gradient(adv_data))
            if has_geo:
                ones = jnp.ones(init_output.shape[:1] + (1,)
                                + init_output.shape[2:], init_output.dtype)
                fwd = self._predict_forward_pure(transforms, params, ones,
                                                 eval_flags, auxs)
                # mask channel rides the prediction's backward chain: one
                # warp pass instead of two
                c = adv_output.shape[1]
                both = self._predict_backward_pure(
                    transforms, params,
                    jnp.concatenate([adv_output, fwd], axis=1), eval_flags,
                    auxs)
                warped = both[:, :c]
                fb_mask = _binarize_nonzero(both[:, c:])
                dist = self.loss_fn(
                    pred=warped,
                    reference=jax.lax.stop_gradient(init_output),
                    mask=fb_mask)
            else:
                warped = adv_output
                dist = self.loss_fn(
                    pred=adv_output,
                    reference=jax.lax.stop_gradient(init_output))
            return dist, adv_data, adv_output, warped

        return final

    def _get_final_loss_fn(self, model, data_shape):
        key = ("final", self._model_cache_key(model), tuple(data_shape),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            # reference forces model.train() for the final consistency pass
            # (adv_compose_solver.py:256-259): batch statistics, fixed
            # dropout.  Model variables and the episode dropout key are
            # TRACED arguments — the cached executable follows weight
            # updates between calls (a closure would bake them in).
            def final_fn(params, data, init_output, model_vars, dropout_key):
                raw = self._final_loss_math(
                    lambda x: self._model_call(model, x, dropout_key,
                                               model_vars, train=True))
                return raw(params, data, init_output)

            self._cache_put(key, jax.jit(final_fn),
                            pin=(model, tuple(self.chain_of_transforms)))
        fn = self._cache_get(key)

        def bound(params, data, init_output):
            return fn(params, data, init_output,
                      self._model_variables(model),
                      self._episode_dropout_key(model))

        return bound

    def _get_episode_fn(self, model, optimize_flags, step_sizes, n_iter,
                        present, data_shape, want_pseudo: bool = True):
        """The ENTIRE adversarial_training common path as ONE cached device
        program: reference forward, random transform init (or warm start),
        the n_iter PGD inner loop, projection, and the final consistency
        pass.  On remote/tunneled TPU runtimes every eager dispatch costs
        20-90 ms; this brings an episode down to a single dispatch.

        ``present``: per-transform bool tuple — True entries warm-start
        from the caller's params, False entries draw random inits inside
        the program (reference lazy_load semantics, adv_compose_solver.py
        :479-500, with zero extra dispatches).

        ``want_pseudo``: only get_adv_data consumes the pseudo-label warp
        (reference :461-462) — adversarial_training passes False so its
        episode program skips those geometric warps (~2% of the headline
        episode)."""
        present = tuple(bool(p) for p in present)
        key = ("episode", self._model_cache_key(model),
               tuple(optimize_flags),
               tuple(step_sizes), int(n_iter), present,
               tuple(data_shape), bool(want_pseudo),
               tuple(t.power_iteration for t in self.chain_of_transforms),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            transforms = tuple(self.chain_of_transforms)
            flags = tuple(bool(f) for f in optimize_flags)
            steps = tuple(float(s) for s in step_sizes)

            def episode(seed, data, params_in, init_output_in,
                        model_vars):
                data = jax.lax.stop_gradient(data)
                base = jax.random.PRNGKey(seed)
                k_drop, k_init = jax.random.split(base)
                model_fn = lambda x: self._model_call(model, x, k_drop,
                                                      model_vars)
                # final pass: forced batch statistics (reference
                # model.train() + _fix_dropout, adv_compose_solver.py:256)
                model_fn_final = lambda x: self._model_call(
                    model, x, k_drop, model_vars, train=True)
                if init_output_in is None:
                    init_output = jax.lax.stop_gradient(model_fn(data))
                else:
                    init_output = jax.lax.stop_gradient(init_output_in)
                keys = jax.random.split(k_init, len(transforms))
                params = tuple(
                    pi if pr else t.init_params(kk)
                    for t, pi, pr, kk in zip(transforms, params_in,
                                             present, keys))
                params = tuple(t.prepare_train(p) if f else p
                               for t, p, f in zip(transforms, params, flags))
                dists = []
                if n_iter > 0:
                    pgd = self.build_pgd_step_fn(model_fn, flags, steps)
                    dummy = jnp.zeros_like(data)
                    for _ in range(n_iter):
                        params, d = pgd(params, data, init_output, dummy)
                        dists.append(d)
                    params = tuple(t.project(p) if f else p
                                   for t, p, f in
                                   zip(transforms, params, flags))
                params = jax.lax.stop_gradient(params)
                final = self._final_loss_math(model_fn_final)
                dist, adv_data, adv_output, warped = final(
                    params, data, init_output)
                # pseudo-labels for get_adv_data: init predictions pushed
                # through the (geometric) chain (reference :461-462)
                if want_pseudo:
                    eval_flags = (False,) * len(transforms)
                    auxs = self._precompute_chain(transforms, params,
                                                  eval_flags)
                    pseudo_label = self._predict_forward_pure(
                        transforms, params, init_output, eval_flags, auxs)
                else:
                    pseudo_label = init_output
                return (params, dist, adv_data, adv_output, warped,
                        init_output, jnp.stack(dists) if dists else
                        jnp.zeros((0,)), pseudo_label)

            self._cache_put(key, jax.jit(episode),
                            pin=(model, transforms))
        return self._cache_get(key)

    def _get_anatomy_init_fn(self, mask_shape, tol: float):
        """Fused anatomy-constrained random init (reference
        adv_compose_solver.py:479-500): draw every transform's params, then
        for each geometric transform re-draw ITS params while the full
        chain's volume-preserve misoverlap exceeds ``tol`` (<=10 tries,
        lax.while_loop) — ONE device program instead of ~6 eager
        dispatches (each ~20-30 ms tunnel latency; the constrained solve
        is dispatch-bound without this).  Returns (params, mis, tries) —
        ``tries`` per-transform so the host can emit the reference's
        give-up warning."""
        transforms = tuple(self.chain_of_transforms)
        key = ("anatomy_init", tuple(mask_shape), float(tol),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            def init(base_key, mask):
                params, mis, tries = self._traced_anatomy_init(
                    transforms, base_key, mask, tol)
                # pack the host-inspected scalars into ONE tiny array:
                # each separate device->host read costs a ~15-25 ms
                # tunnel round trip
                stats = jnp.stack([mis, jnp.max(tries).astype(mis.dtype)])
                return params, stats

            self._cache_put(key, jax.jit(init), pin=transforms)
        return self._cache_get(key)

    def _traced_mis(self, transforms, params, mask):
        """Traced volume-preserve misoverlap score (mask roundtrip MSE)."""
        eval_flags = (False,) * len(transforms)
        auxs = self._precompute_chain(transforms, params, eval_flags)
        fwd = self._predict_forward_pure(transforms, params, mask,
                                         eval_flags, auxs)
        rec = self._predict_backward_pure(transforms, params, fwd,
                                          eval_flags, auxs)
        rec = jnp.where(rec >= 0.5, 1.0, 0.0)
        return jnp.mean((rec - mask) ** 2)

    def _traced_anatomy_init(self, transforms, base_key, mask, tol):
        """Traced init + per-geometric-transform rejection sampling (see
        _get_anatomy_init_fn).

        DIVERGENCE (reference adv_compose_solver.py:487-500): the
        reference rejection-samples transform i while LATER transforms
        still hold their previous episode's params (init_parameters runs
        lazily inside the loop), so the accept/reject score mixes stale
        state.  Here ALL transforms draw fresh params first and each
        geometric transform is re-drawn against the fully fresh chain —
        the score the loop thresholds is the one the episode will actually
        run with, which makes the accepted inits honest; the reference's
        ordering is an artifact of its stateful lazy init, not a semantic
        choice."""
        keys = jax.random.split(base_key, len(transforms) + 1)
        params = tuple(t.init_params(k) for t, k in zip(transforms, keys))
        loop_key = keys[-1]
        mis = self._traced_mis(transforms, params, mask)
        tries = []
        for i, t in enumerate(transforms):
            if not t.is_geometric():
                tries.append(jnp.zeros((), jnp.int32))
                continue

            def cond(carry):
                _, _, m, n = carry
                return (m > tol) & (n <= 10)

            def body(carry, i=i, t=t):
                k, ps, _, n = carry
                k, sub = jax.random.split(k)
                ps = ps[:i] + (t.init_params(sub),) + ps[i + 1:]
                return k, ps, self._traced_mis(transforms, ps, mask), n + 1

            loop_key, params, mis, n_i = jax.lax.while_loop(
                cond, body,
                (loop_key, params, mis, jnp.zeros((), jnp.int32)))
            tries.append(n_i)
        return params, mis, jnp.stack(tries)

    def _get_anatomy_episode_fn(self, model, optimize_flags, step_sizes,
                                n_iter, data_shape, mask_shape,
                                anatomy_reg_weight, tol, use_anatomy):
        """The anatomy-constrained solve's FIRST ATTEMPT as one device
        program: reference forward, rejection-sampled init, the n_iter
        anatomy-penalized PGD loop, projection, the volume-preserve score,
        and the final consistency pass.  The host inspects the returned
        ``mis``: within tolerance (the common case — 5/5 in the bench) the
        solve is DONE in ~2 dispatches; otherwise the stateful graduated
        retry ladder (reference adv_compose_solver.py:376-401) takes over
        from the written-back params."""
        key = ("anatomy_episode", self._model_cache_key(model),
               tuple(optimize_flags), tuple(step_sizes), int(n_iter),
               tuple(data_shape), tuple(mask_shape),
               float(anatomy_reg_weight), float(tol), bool(use_anatomy),
               tuple(t.power_iteration for t in self.chain_of_transforms),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            transforms = tuple(self.chain_of_transforms)
            flags = tuple(bool(f) for f in optimize_flags)
            steps = tuple(float(s) for s in step_sizes)

            def episode(seed, data, init_output_in, anatomy, model_vars,
                        dropout_key):
                data = jax.lax.stop_gradient(data)
                base = jax.random.PRNGKey(seed)
                k_drop, k_init = jax.random.split(base)
                if dropout_key is not None:
                    # wrapper models redraw their fixed episode mask via
                    # begin_episode(); honor it so a retry-ladder
                    # continuation sees the same dropout
                    k_drop = dropout_key
                model_fn = lambda x: self._model_call(model, x, k_drop,
                                                      model_vars)
                model_fn_final = lambda x: self._model_call(
                    model, x, k_drop, model_vars, train=True)
                if init_output_in is None:
                    init_output = jax.lax.stop_gradient(model_fn(data))
                else:
                    init_output = jax.lax.stop_gradient(init_output_in)
                params, _, tries = self._traced_anatomy_init(
                    transforms, k_init, anatomy, tol)
                params = tuple(t.prepare_train(p) if f else p
                               for t, p, f in zip(transforms, params, flags))
                dists = []
                if n_iter > 0:
                    pgd = self.build_pgd_step_fn(
                        model_fn, flags, steps, use_anatomy=use_anatomy,
                        anatomy_reg_weight=anatomy_reg_weight)
                    for _ in range(n_iter):
                        params, d = pgd(params, data, init_output, anatomy)
                        dists.append(d)
                    params = tuple(t.project(p) if f else p
                                   for t, p, f in
                                   zip(transforms, params, flags))
                params = jax.lax.stop_gradient(params)
                mis = self._traced_mis(transforms, params, anatomy)
                final = self._final_loss_math(model_fn_final)
                dist, adv_data, adv_output, warped = final(
                    params, data, init_output)
                # mis + max tries packed: ONE host transfer for the
                # volume-check decision (tunnel round trips ~15-25 ms)
                stats = jnp.stack([mis, jnp.max(tries).astype(mis.dtype)])
                return (params, dist, adv_data, adv_output, warped,
                        init_output, jnp.stack(dists) if dists else
                        jnp.zeros((0,)), stats)

            self._cache_put(key, jax.jit(episode),
                            pin=(model, transforms))
        return self._cache_get(key)

    def _get_pgd_multi(self, model, optimize_flags, step_sizes, use_anatomy,
                       anatomy_reg_weight, data_shape, n_steps: int):
        """``n_steps`` PGD iterations fused as ONE device program (a
        Python-unrolled loop over the shared step fn).  The host-driven
        per-step dispatch in optimizing_transform costs ~20-30 ms tunnel
        latency EACH on remote TPU runtimes; the anatomy-constrained solve
        (BASELINE config #3) is dispatch-bound without this.  Returns
        (params, dists[n_steps])."""
        key = ("pgd_multi", int(n_steps), self._model_cache_key(model),
               tuple(optimize_flags), tuple(step_sizes),
               bool(use_anatomy), float(anatomy_reg_weight),
               tuple(data_shape),
               tuple(t.power_iteration for t in self.chain_of_transforms),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            step = self.build_pgd_step_fn(model, optimize_flags, step_sizes,
                                          use_anatomy, anatomy_reg_weight)

            def multi(params, data, init_output, anatomy_mask):
                dists = []
                for _ in range(n_steps):
                    params, d = step(params, data, init_output, anatomy_mask)
                    dists.append(d)
                return params, jnp.stack(dists)

            self._cache_put(key, jax.jit(multi),
                            pin=(model, tuple(self.chain_of_transforms)))
        return self._cache_get(key)

    def _get_pgd_step(self, model, optimize_flags, step_sizes, use_anatomy,
                      anatomy_reg_weight, data_shape):
        key = (self._model_cache_key(model), tuple(optimize_flags),
               tuple(step_sizes),
               bool(use_anatomy), float(anatomy_reg_weight),
               tuple(data_shape),
               tuple(t.power_iteration for t in self.chain_of_transforms),
               self._chain_cache_key())
        if self._cache_get(key) is None:
            self._cache_put(key, self._build_pgd_step(
                model, optimize_flags, step_sizes, use_anatomy,
                anatomy_reg_weight),
                pin=(model, tuple(self.chain_of_transforms)))
        return self._cache_get(key)

    def compute_transform_grads(self, data, model, init_output=None,
                                optimize_flags=None):
        """The JAX equivalent of the reference manual loop's
        ``dist.backward()`` (README.md:177-214 recipe; grads land on
        ``.param.grad`` there, adv_noise.py:51-64): computes the
        consistency-loss gradient w.r.t. every (flagged) transform's
        current params in ONE jitted program and stashes it as
        ``transform.grad``, so ``transform.optimize_parameters(step)``
        then works with no arguments, as in the reference.

        Returns (dist, grads) — grads is a tuple aligned with the chain
        (None for unflagged transforms)."""
        if optimize_flags is None:
            optimize_flags = [True] * len(self.chain_of_transforms)
        flags = tuple(bool(f) for f in optimize_flags)
        for t, f in zip(self.chain_of_transforms, flags):
            if f:
                t.train()
        if init_output is None:
            init_output = self.get_init_output(data=data, model=model)
        key = ("transform_grads", self._model_cache_key(model), flags,
               tuple(data.shape), self._chain_cache_key())
        if self._cache_get(key) is None:
            transforms = tuple(self.chain_of_transforms)

            def grads_fn(params, data_, init_output_, model_vars,
                         dropout_key):
                def dist_fn(opt_params):
                    full = []
                    it = iter(opt_params)
                    for p, f in zip(params, flags):
                        full.append(next(it) if f else p)
                    full = tuple(full)
                    train_flags = flags
                    auxs = self._precompute_chain(transforms, full,
                                                  train_flags)
                    aug = self._chain_apply_pure(transforms, full, data_,
                                                 train_flags, auxs)
                    # model vars + dropout key are traced arguments: the
                    # manual-loop recipe (README.md:177-214) trains the
                    # model BETWEEN calls, so a closure would silently
                    # return gradients w.r.t. stale weights
                    perturbed = self._model_call(model, aug, dropout_key,
                                                 model_vars)
                    if self.if_contains_geo_transform():
                        ones = jnp.ones(
                            init_output_.shape[:1] + (1,)
                            + init_output_.shape[2:], init_output_.dtype)
                        fwd = self._predict_forward_pure(
                            transforms, full, ones, train_flags, auxs)
                        c = perturbed.shape[1]
                        both = self._predict_backward_pure(
                            transforms, full,
                            jnp.concatenate([perturbed, fwd], axis=1),
                            train_flags, auxs)
                        warped = both[:, :c]
                        fb_mask = _binarize_nonzero(both[:, c:c + 1])
                        return self.loss_fn(pred=warped,
                                            reference=init_output_,
                                            mask=fb_mask)
                    return self.loss_fn(
                        pred=perturbed,
                        reference=jax.lax.stop_gradient(init_output_))

                opt_params = tuple(p for p, f in zip(params, flags) if f)
                return jax.value_and_grad(dist_fn)(opt_params)

            self._cache_put(key, jax.jit(grads_fn),
                            pin=(model, tuple(self.chain_of_transforms)))
        params = tuple(t.param for t in self.chain_of_transforms)
        dist, gs = self._cache_get(key)(
            params, jax.lax.stop_gradient(data), init_output,
            self._model_variables(model), self._episode_dropout_key(model))
        git = iter(gs)
        out = []
        for t, f in zip(self.chain_of_transforms, flags):
            g = next(git) if f else None
            t.grad = g
            out.append(g)
        return dist, tuple(out)

    def optimizing_transform(self, model, data, init_output, optimize_flags,
                             n_iter: int = 1, step_sizes=None,
                             anatomy_mask_images=None,
                             anatomy_reg_weight: float = 50,
                             volume_preserve_tolerance: float = 5e-4,
                             _resume_from_first_decision: bool = False):
        """Inner PGD loop; host drives the jitted step and handles the
        volume-preserving graduated fallback
        (reference adv_compose_solver.py:289-405).

        ``_resume_from_first_decision``: internal — the fused anatomy
        episode already ran the first n_iter steps and measured a failed
        volume check; enter the ladder AT the first decision point with
        the current (written-back) transform params."""
        if step_sizes is None:
            step_sizes = [1.0] * len(self.chain_of_transforms)
        data = jax.lax.stop_gradient(data)
        use_anatomy = anatomy_mask_images is not None and \
            abs(anatomy_reg_weight) > 1e-32
        anatomy_arg = (anatomy_mask_images if use_anatomy
                       else jnp.zeros_like(data))

        self.make_learnable_transformation(optimize_flags)
        params = list(t.param for t in self.chain_of_transforms)
        one_time_iter = n_iter
        i_iter = n_iter if _resume_from_first_decision else 0
        stop_flag = n_iter <= 0
        while not stop_flag:
            # run every step up to the next decision point as ONE fused
            # dispatch (per-step dispatches cost ~20-30 ms tunnel latency
            # each; the constrained solve is dispatch-bound otherwise)
            burst = n_iter - i_iter
            if burst > 0:
                multi_fn = self._get_pgd_multi(model, optimize_flags,
                                               step_sizes, use_anatomy,
                                               anatomy_reg_weight,
                                               data.shape, burst)
                params_t, dists = multi_fn(tuple(params), data, init_output,
                                           anatomy_arg)
                params = list(params_t)
                if self.debug:
                    for j, dv in enumerate(np_asarray_list(dists)):
                        print(f"[inner loop], step {i_iter + j + 1}: "
                              f"dist {dv}")
            i_iter = n_iter
            # decision point (reference i_iter == n_iter, :369-375): write
            # back, project (one fused program), freeze, volume check
            params = list(self._get_project_all_fn(optimize_flags)(
                tuple(params)))
            for flag, t, p in zip(optimize_flags,
                                  self.chain_of_transforms, params):
                t.param = jax.lax.stop_gradient(p)
                if flag:
                    t.eval()
            if self.if_contains_geo_transform() and use_anatomy:
                mis = float(self.compute_anatomy_misoverlapping_loss(
                    anatomy_mask_images))
                if abs(mis) <= volume_preserve_tolerance:
                    stop_flag = True
                elif i_iter >= 3 * one_time_iter:
                    stop_flag = True
                    logger.warning(
                        "optimization time is 3X longer than expected, "
                        "use random initialized one instead; consider "
                        "narrowing the affine search space or a smaller "
                        "step size")
                    self.init_random_transformation(
                        anatomy_mask_images=anatomy_mask_images,
                        volume_preserve_tolerance=volume_preserve_tolerance)
                    # keep the fallback's random params — the final
                    # write-back below must not restore the rejected
                    # optimized ones (reference :385-387 keeps these)
                    params = [t.param for t in self.chain_of_transforms]
                else:
                    if i_iter == 2 * one_time_iter:
                        self.init_random_transformation(
                            anatomy_mask_images=anatomy_mask_images,
                            volume_preserve_tolerance=volume_preserve_tolerance)
                        n_iter += one_time_iter
                        logger.warning(
                            "volume not preserved; continuing search "
                            "with a new initialization")
                    else:
                        n_iter += 1
                        logger.warning(
                            "volume not preserved; continuing search "
                            "with one more step")
                    self.make_learnable_transformation(optimize_flags)
                    params = [t.param for t in self.chain_of_transforms]
            else:
                stop_flag = True
        # final write-back (no-op if loop wrote back already)
        for t, p in zip(self.chain_of_transforms, params):
            t.param = jax.lax.stop_gradient(p)
        return self.chain_of_transforms

    # ----------------------------------------------------------- utilities
    def rescale_intensity(self, data, new_min=0, new_max=1, eps=1e-20):
        """Per-sample min-max rescale (reference adv_compose_solver.py:407)."""
        n = data.shape[0]
        flat = data.reshape(n, -1)
        old_max = jnp.max(flat, axis=1, keepdims=True)
        old_min = jnp.min(flat, axis=1, keepdims=True)
        new = (flat - old_min + eps) / (old_max - old_min + eps) \
            * (new_max - new_min) + new_min
        return new.reshape(data.shape)

    def get_net_output(self, model, data):
        return model(data)

    def get_init_output(self, model, data):
        return jax.lax.stop_gradient(self.get_net_output(model, data))

    def get_adv_data(self, data, model, init_output=None, n_iter: int = 0,
                     optimize_flags=None, step_sizes=None,
                     anatomy_mask_images=None, anatomy_reg_weight: float = 50,
                     volume_preserve_tolerance: float = 5e-4):
        """Return (augmented_data, augmented_label) pseudo-label pairs
        (reference adv_compose_solver.py:435-463)."""
        if optimize_flags is None:
            optimize_flags = [True] * len(self.chain_of_transforms)
        if step_sizes is None:
            step_sizes = [1.0] * len(self.chain_of_transforms)
        if anatomy_mask_images is None:
            # fused fast path: one device program (fresh random init, PGD,
            # final apply, pseudo-label warp)
            flags = self._normalize_flags(optimize_flags,
                                          n_iter if n_iter > 0 else 0)
            steps = self._normalize_step_sizes(step_sizes)
            absent = (False,) * len(self.chain_of_transforms)
            fn = self._get_episode_fn(model, flags, steps, n_iter,
                                      absent, data_shape=data.shape)
            (params, _dist, adv_data, _o, _w, init_out, _d,
             pseudo_label) = fn(self._next_episode_seed(), data,
                                (None,) * len(self.chain_of_transforms),
                                init_output, self._model_variables(model))
            for t, p in zip(self.chain_of_transforms, params):
                t.param = p
                t.is_training = False
            return adv_data, pseudo_label
        if hasattr(model, "begin_episode"):
            model.begin_episode()
        if init_output is None:
            init_output = self.get_init_output(model, data)
        self.init_random_transformation(
            lazy_load=False, anatomy_mask_images=anatomy_mask_images,
            volume_preserve_tolerance=volume_preserve_tolerance)
        origin_data = jax.lax.stop_gradient(data)
        if n_iter > 0:
            self.optimizing_transform(
                data=data, model=model, init_output=init_output,
                n_iter=n_iter, optimize_flags=optimize_flags,
                step_sizes=step_sizes,
                anatomy_mask_images=anatomy_mask_images,
                anatomy_reg_weight=anatomy_reg_weight,
                volume_preserve_tolerance=volume_preserve_tolerance)
        augmented_data = self.forward(origin_data)
        augmented_label = self.predict_forward(init_output)
        return augmented_data, augmented_label

    def if_contains_geo_transform(self, chain_of_transforms=None):
        chain = (self.chain_of_transforms if chain_of_transforms is None
                 else chain_of_transforms)
        return sum(t.is_geometric() for t in chain) > 0

    def init_random_transformation(self, lazy_load: bool = False,
                                   anatomy_mask_images=None,
                                   volume_preserve_tolerance: float = 5e-4):
        """Random init; geometric transforms rejection-sample under the
        anatomy constraint, <=10 tries (reference :479-500)."""
        if anatomy_mask_images is None and self.chain_of_transforms:
            # fast path: one fused device program for all inits
            missing = [t for t in self.chain_of_transforms if t.param is None]
            if lazy_load and not missing:
                return
            base_key = self.chain_of_transforms[0]._next_key()
            params = self._get_init_all_fn()(base_key)
            for t, p in zip(self.chain_of_transforms, params):
                if not lazy_load or t.param is None:
                    t.param = p
            return
        if (anatomy_mask_images is not None and self.chain_of_transforms
                and not lazy_load):
            # fused anatomy path: init + per-geometric rejection sampling
            # as ONE device program (the stateful loop below costs ~6
            # eager dispatches; kept for lazy_load warm starts)
            base_key = self.chain_of_transforms[0]._next_key()
            fn = self._get_anatomy_init_fn(
                tuple(anatomy_mask_images.shape),
                float(volume_preserve_tolerance))
            params, stats = fn(base_key, anatomy_mask_images)
            for t, p in zip(self.chain_of_transforms, params):
                t.param = p
            import numpy as _np
            mis, max_tries = _np.asarray(stats)  # one host transfer
            if mis > volume_preserve_tolerance and max_tries > 10:
                logger.warning(
                    "random initialization: fail to find a good "
                    "initialized geo transformation in the given "
                    "range; reduce the search space or increase the "
                    "tolerance factor")
            return
        for transform in self.chain_of_transforms:
            if lazy_load:
                if transform.param is None:
                    transform.init_parameters()
            else:
                transform.init_parameters()
            if transform.is_geometric() == 1 and anatomy_mask_images is not None:
                i_iter = 0
                while float(self.compute_anatomy_misoverlapping_loss(
                        anatomy_mask_images)) > volume_preserve_tolerance:
                    transform.init_parameters()
                    i_iter += 1
                    if i_iter > 10:
                        logger.warning(
                            "random initialization: fail to find a good "
                            "initialized geo transformation in the given "
                            "range; reduce the search space or increase the "
                            "tolerance factor")
                        break

    def reset_transformation(self, anatomy_mask_images=None,
                             volume_preserve_tolerance: float = 5e-4):
        self.init_random_transformation(
            lazy_load=False, anatomy_mask_images=anatomy_mask_images,
            volume_preserve_tolerance=volume_preserve_tolerance)

    def set_transformation(self, parameter_list):
        for i, param in enumerate(parameter_list):
            self.chain_of_transforms[i].set_parameters(param)

    def get_transformation_parameters(self):
        return [t.get_parameters() for t in self.chain_of_transforms]

    def train(self):
        for transform in self.chain_of_transforms:
            transform.train()

    def eval(self):
        for transform in self.chain_of_transforms:
            transform.eval()

    def make_learnable_transformation(self, optimize_flags,
                                      chain_of_transforms=None):
        chain = (self.chain_of_transforms if chain_of_transforms is None
                 else chain_of_transforms)
        for flag, transform in zip(optimize_flags, chain):
            if flag:
                transform.train()

    # ------------------------------------------------------------ internals
    def _normalize_flags(self, optimize_flags, n_iter):
        if optimize_flags is not None:
            assert len(self.chain_of_transforms) == len(optimize_flags), (
                f"must specify each transform is learnable or not, expect "
                f"{len(self.chain_of_transforms)} flags, "
                f"but got {optimize_flags}")
            return list(optimize_flags)
        if n_iter == 0:
            return [False] * len(self.chain_of_transforms)
        if n_iter > 0:
            return [True] * len(self.chain_of_transforms)
        raise NotImplementedError("n_iter must be >= 0")

    def _apply_power_iteration_setting(self, power_iteration):
        if isinstance(power_iteration, bool):
            powers = [power_iteration] * len(self.chain_of_transforms)
        elif isinstance(power_iteration, list):
            assert len(self.chain_of_transforms) == len(power_iteration), \
                "must specify each transform optimization mode"
            powers = power_iteration
        elif isinstance(power_iteration, str):
            assert power_iteration == "smart", \
                f"unknown power_iteration mode {power_iteration!r}"
            powers = [t.get_name() == "noise"
                      for t in self.chain_of_transforms]
        else:
            raise NotImplementedError(
                f"power_iteration must be bool/list/'smart', "
                f"got {power_iteration!r}")
        for t, p in zip(self.chain_of_transforms, powers):
            t.power_iteration = p

    def _normalize_step_sizes(self, step_sizes):
        if step_sizes is None:
            return [1.0] * len(self.chain_of_transforms)
        if isinstance(step_sizes, (int, float)):
            return [float(step_sizes)] * len(self.chain_of_transforms)
        if isinstance(step_sizes, list):
            assert len(step_sizes) == len(self.chain_of_transforms), \
                "specify step size for each transformation"
            return [float(s) for s in step_sizes]
        raise ValueError(
            "please use scalar or a list of scalars to set step size")
