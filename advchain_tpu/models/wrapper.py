"""SegmentationModel — binds a Flax module to params/batch-stats and
implements the solver's fixed-network contract.

Reference semantics being reproduced (SURVEY.md section 2 rows 8-9):
``_disable_tracking_bn_stats`` makes BatchNorm use *batch* statistics while
leaving running stats untouched (common/utils.py:114-147), and Fixable
dropout replays the same mask across the PGD inner loop
(common/layers.py:5-63).  Here: ``__call__`` runs ``train=True`` with
``mutable=False`` (batch stats used, never written) and a dropout rng that
stays constant until ``begin_episode`` draws a new one — the solver calls
that once per ``adversarial_training`` invocation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class SegmentationModel:
    """Callable ``model(x) -> logits`` for the compose solver, plus
    training/inference entry points for user loops."""

    def __init__(self, module, params, batch_stats=None, rng=None,
                 use_batch_stats_in_solver: bool = True,
                 compute_dtype=None):
        self.module = module
        self.params = params
        self.batch_stats = batch_stats or {}
        self._base_rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._episode_rng = self._base_rng
        # torch-style module mode (reference model.train()/model.eval()):
        # training=True -> solver forwards use BATCH statistics without
        # write-back (the _disable_tracking_bn_stats train-mode semantics,
        # reference common/utils.py:114-147); training=False -> running
        # averages (the notebooks' model.eval() usage).  The solver's FINAL
        # consistency pass forces batch statistics regardless, mirroring the
        # reference's model.train() there (adv_compose_solver.py:256-259).
        self.training = bool(use_batch_stats_in_solver)
        self._adaptive_bn = False
        # opt-in speed mode: cast params + activations to e.g. bfloat16 for
        # the network forward/backward (halves HBM traffic on the UNet, the
        # episode's floor cost); outputs are returned in float32.  Off by
        # default — the <1e-3 reference-parity guarantee holds only in f32.
        self.compute_dtype = compute_dtype
        # jit once per (train-mode, structure); params/rng are traced args so
        # episodes and updated weights reuse the same executable
        self._jit_apply = {}
        for mode in (False, True):
            self._jit_apply[mode] = jax.jit(
                lambda v, x, rng, _m=mode: self._cast_out(self.module.apply(
                    self._cast_in(v), self._cast_in(x), train=_m,
                    rngs={"dropout": rng}, mutable=False)))
        self._jit_predict = jax.jit(
            lambda v, x: self._cast_out(self.module.apply(
                self._cast_in(v), self._cast_in(x), train=False,
                mutable=False)))

    # -------------------------------------------------------- construction
    @classmethod
    def create(cls, module, input_shape, rng=None, train: bool = False,
               compute_dtype=None):
        """Initialize parameters from a sample input shape (NCHW/NCDHW)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_params, k_drop, k_rest = jax.random.split(rng, 3)
        variables = module.init({"params": k_params, "dropout": k_drop},
                                jnp.zeros(input_shape, jnp.float32),
                                train=False)
        return cls(module, variables["params"],
                   variables.get("batch_stats"), rng=k_rest,
                   compute_dtype=compute_dtype)

    def _variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def _cast_in(self, tree):
        if self.compute_dtype is None:
            return tree
        dt = self.compute_dtype
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt) if hasattr(a, "dtype")
            and a.dtype == jnp.float32 else a, tree)

    def _cast_out(self, y):
        return y.astype(jnp.float32) if self.compute_dtype is not None else y

    # ----------------------------------------------------- torch-style mode
    @property
    def use_batch_stats_in_solver(self):
        """Back-compat alias for ``training``."""
        return self.training

    @use_batch_stats_in_solver.setter
    def use_batch_stats_in_solver(self, value):
        self.training = bool(value)

    def train(self, mode: bool = True):
        """Reference model.train(): solver forwards use batch statistics."""
        self.training = bool(mode)
        return self

    def eval(self):
        """Reference model.eval(): solver forwards use running averages."""
        self.training = False
        return self

    # ------------------------------------------------------ solver contract
    def begin_episode(self, key=None):
        """Redraw the fixed dropout mask for a new adversarial episode."""
        if key is None:
            self._base_rng, key = jax.random.split(self._base_rng)
        self._episode_rng = key

    def __call__(self, x):
        """Frozen-network forward: BN batch statistics (not written back),
        dropout active with the episode-fixed rng.

        When called inside an outer jit trace (the solver's fused PGD step),
        fall through to the plain apply so the op inlines into the caller's
        program instead of nesting jits."""
        if isinstance(x, jax.core.Tracer):
            return self._cast_out(self.module.apply(
                self._cast_in(self._variables()), self._cast_in(x),
                train=self.training,
                rngs={"dropout": self._episode_rng}, mutable=False))
        if self._adaptive_bn:
            return self._adaptive_apply(x)
        return self._jit_apply[self.training](self._variables(), x,
                                              self._episode_rng)

    def apply_fixed(self, x, dropout_rng, train=None):
        """Pure fixed-network forward with an explicit dropout rng — used by
        the solver's fused episode program so the key is a traced argument
        (a closure-captured key would be baked into the cached executable
        as a constant and never change across episodes).  ``train`` forces a
        BN mode; None follows the module mode (torch semantics)."""
        train = self.training if train is None else bool(train)
        return self._cast_out(self.module.apply(
            self._cast_in(self._variables()), self._cast_in(x),
            train=train, rngs={"dropout": dropout_rng}, mutable=False))

    # --------------------------------------------------------- user loops
    def predict(self, x):
        """Inference: running-average BN, no dropout."""
        if isinstance(x, jax.core.Tracer):
            return self.module.apply(self._variables(), x, train=False,
                                     mutable=False)
        return self._jit_predict(self._variables(), x)

    def apply_train(self, params, batch_stats, x, dropout_rng):
        """Pure training-mode apply returning (logits, new_batch_stats);
        use inside jitted train steps.  Honors ``compute_dtype`` (the
        bf16 speed mode): params/activations cast down for the network
        body, logits AND the mutated batch statistics cast back to f32
        (master state stays full-precision across steps)."""
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = self.module.apply(
            self._cast_in(variables), self._cast_in(x), train=True,
            rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
        new_bs = mutated.get("batch_stats", batch_stats)
        if self.compute_dtype is not None:
            new_bs = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, "dtype") and a.dtype == self.compute_dtype
                else a, new_bs)
        return self._cast_out(out), new_bs

    # ----------------------------------------- reference model utilities
    def adaptive_bn(self, if_enable: bool = False):
        """Reference UNet.adaptive_bn (models/unet.py:117-122): when
        enabled, frozen-network forwards ALSO update the BN running
        statistics from the incoming batch (torch: module.train() +
        track_running_stats=True) — the BN-recalibration domain-adaptation
        recipe.  Here: eager ``__call__`` writes updated batch_stats back
        onto the wrapper while still returning batch-stat-normalized
        outputs."""
        self._adaptive_bn = bool(if_enable)

    def _adaptive_apply(self, x):
        out, mutated = self.module.apply(
            self._variables(), x, train=True,
            rngs={"dropout": self._episode_rng}, mutable=["batch_stats"])
        self.batch_stats = mutated.get("batch_stats", self.batch_stats)
        return out

    def fix_conv_params_mask(self):
        """Optax-style mask (True = trainable) freezing every conv
        kernel/bias and training everything else (BN affines) — reference
        UNet.fix_conv_params (models/unet.py:132-147).  A Flax module is a
        'conv' iff it owns a ``kernel`` leaf (the isinstance(nn.Conv2d)
        analogue).  Use with ``optax.masked``."""
        conv_parents = set()
        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        for path, _ in flat:
            names = [getattr(k, "key", str(k)) for k in path]
            if names[-1] == "kernel":
                conv_parents.add(tuple(names[:-1]))

        def mask(path, v):
            names = tuple(getattr(k, "key", str(k)) for k in path[:-1])
            return names not in conv_parents
        return jax.tree_util.tree_map_with_path(mask, self.params)

    def activate_conv_params_mask(self):
        """All-trainable mask (reference activate_conv_params,
        models/unet.py:148-155)."""
        return jax.tree_util.tree_map(lambda _: True, self.params)

    def lr_group_masks(self, head_keys=("outc",)):
        """(body_mask, head_mask) partition for the reference's lr groups:
        get_1x_lr_params_NOscale yields every body parameter,
        get_10x_lr_params the classification head (models/unet.py:183-218).
        """
        def is_head(path):
            top = getattr(path[0], "key", str(path[0]))
            return any(top == k or top.startswith(k) for k in head_keys)
        body = jax.tree_util.tree_map_with_path(
            lambda p, v: not is_head(p), self.params)
        head = jax.tree_util.tree_map_with_path(
            lambda p, v: is_head(p), self.params)
        return body, head

    def optim_parameters(self, learning_rate: float, optimizer_factory=None,
                         head_keys=("outc",)):
        """Reference UNet.optim_parameters (models/unet.py:219-222): body
        at ``learning_rate``, classification head at 10x.  Returns an optax
        GradientTransformation (default factory: optax.sgd)."""
        import optax
        if optimizer_factory is None:
            optimizer_factory = optax.sgd
        body, head = self.lr_group_masks(head_keys)
        return optax.chain(
            optax.masked(optimizer_factory(learning_rate), body),
            optax.masked(optimizer_factory(10.0 * learning_rate), head),
        )

    def init_bn(self):
        """Reset all BN running stats to (0, 1) — reference UNet.init_bn
        (models/unet.py:124-130)."""
        def reset(path, v):
            name = path[-1].key if path else ""
            if name == "mean":
                return jnp.zeros_like(v)
            if name == "var":
                return jnp.ones_like(v)
            return v
        self.batch_stats = jax.tree_util.tree_map_with_path(
            reset, self.batch_stats)

    def fix_params_mask(self, trainable_substrings=("outc",)):
        """Optax-style mask pytree: True = trainable.  The JAX analogue of
        reference fix_params / fix_conv_params (models/unet.py:132-168):
        use with ``optax.masked(optimizer, mask)``."""
        def mask(path, v):
            keys = "/".join(getattr(k, "key", str(k)) for k in path)
            return any(s in keys for s in trainable_substrings)
        return jax.tree_util.tree_map_with_path(mask, self.params)

    def replace(self, params=None, batch_stats=None):
        m = SegmentationModel(self.module,
                              params if params is not None else self.params,
                              batch_stats if batch_stats is not None
                              else self.batch_stats,
                              rng=self._base_rng)
        m._episode_rng = self._episode_rng
        return m
