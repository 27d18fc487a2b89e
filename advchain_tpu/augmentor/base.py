"""Transform contract: a functional core (pure methods over explicit params,
used inside jitted solver steps) plus a thin stateful wrapper that mirrors
the reference's object API (advchain/augmentor/adv_transformation_base.py).

Functional core (everything the jitted PGD loop touches):
    init_params(key)                 -> params              (random draw)
    apply(params, x, training)       -> x'                  (image forward)
    inverse(params, x, training)     -> x                   (image backward)
    predict_forward(params, p, ...)  -> p'                  (prediction fwd)
    predict_backward(params, p, ...) -> p                   (prediction bwd)
    update(params, grad, step_size)  -> params'             (PGD / PI rule)
    project(params)                  -> params'              (epsilon-ball)
    prepare_train(params)            -> params'              (pre-loop renorm)

Stateful wrapper (reference-parity names): init_parameters / forward /
backward / predict_forward / predict_backward / optimize_parameters /
rescale_parameters / train / eval / set_parameters / get_parameters /
set_step_size / get_step_size / get_name / is_geometric.
"""

from __future__ import annotations

import itertools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from advchain_tpu.ops import norms

_seed_counter = itertools.count(0)


class AdvTransformBase:
    """Base adversarial transform (reference adv_transformation_base.py:5)."""

    def __init__(self, spatial_dims: int = 2, config_dict: Optional[dict] = None,
                 power_iteration: bool = False, ignore_values=None,
                 debug: bool = False, seed: Optional[int] = None,
                 use_gpu: bool = True, device: Any = None):
        # use_gpu/device accepted for reference API compatibility; placement
        # is JAX's job (single-program, device meshes) so they are ignored.
        assert spatial_dims in (2, 3), "only support 2D/3D"
        self.spatial_dims = spatial_dims
        self.config_dict = dict(config_dict or {})
        data_dim = len(self.config_dict["data_size"])
        assert data_dim == spatial_dims + 2, (
            f"check data size in the config file, should be "
            f"{spatial_dims + 2}D, but got {data_dim}D")
        self.power_iteration = power_iteration
        self.ignore_values = ignore_values
        self.debug = debug
        self.param = None
        self.diff = None
        self.is_training = False
        self.step_size = 1.0
        if seed is None:
            seed = next(_seed_counter)
        self._key = jax.random.PRNGKey(seed)
        self.init_config(self.config_dict)

    # ---------------------------------------------------------------- rng
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------ functional core
    def init_params(self, key):
        raise NotImplementedError

    def precompute(self, params, training: bool = False):
        """Compute shared per-evaluation state (deformation fields, affine
        matrices, bias fields) ONCE so data/prediction/mask applications of
        the same transform reuse it inside a single traced loss."""
        return None

    def apply_precomputed(self, aux, params, data, training: bool = False,
                          interp=None, padding_mode=None):
        return self.apply(params, data, training=training, interp=interp,
                          padding_mode=padding_mode)

    def inverse_precomputed(self, aux, params, data, training: bool = False,
                            interp=None, padding_mode=None):
        return self.inverse(params, data, training=training, interp=interp,
                            padding_mode=padding_mode)

    def apply(self, params, data, training: bool = False, interp=None,
              padding_mode=None):
        raise NotImplementedError

    def inverse(self, params, data, training: bool = False, interp=None,
                padding_mode=None):
        """Warp data back to original coordinates (identity for photometric)."""
        return data

    def predict_forward_fn(self, params, pred, training: bool = False,
                           interp=None, padding_mode=None):
        """Transform a prediction (identity unless geometric)."""
        return pred

    def predict_backward_fn(self, params, pred, training: bool = False,
                            interp=None, padding_mode=None):
        return pred

    def update(self, params, grad, step_size):
        raise NotImplementedError

    def project(self, params):
        """Default: l2 renorm of each batch row into the epsilon ball
        (reference adv_transformation_base.py:185-189)."""
        return norms.renorm_l2(params, self.epsilon)

    def prepare_train(self, params):
        """Applied when the transform enters training (reference train());
        power-iteration variants renormalise here."""
        return params

    # ----------------------------------------------- stateful reference API
    def init_parameters(self):
        self.param = self.init_params(self._next_key())
        return self.param

    def set_parameters(self, param):
        self.param = jax.lax.stop_gradient(jnp.asarray(param))

    def get_parameters(self):
        return self.param

    def set_step_size(self, step_size=1.0):
        self.step_size = step_size

    def get_step_size(self):
        return self.step_size

    def train(self):
        if self.param is None:
            self.init_parameters()
        self.param = self.prepare_train(self.param)
        self.is_training = True

    def eval(self):
        if self.is_training:
            self.param = jax.lax.stop_gradient(self.param)
            self.is_training = False

    def forward(self, data, interp=None, padding_mode=None, **kwargs):
        if self.param is None:
            self.init_parameters()
        out = self.apply(self.param, data, training=self.is_training,
                         interp=interp, padding_mode=padding_mode)
        self.diff = self._record_diff(data, out)
        return out

    def backward(self, data, interp=None, padding_mode=None, **kwargs):
        return self.inverse(self.param, data, training=self.is_training,
                            interp=interp, padding_mode=padding_mode)

    def predict_forward(self, data, interp=None, padding_mode=None, **kwargs):
        if self.param is None:  # reference forward() auto-inits
            self.init_parameters()
        return self.predict_forward_fn(self.param, data,
                                       training=self.is_training,
                                       interp=interp,
                                       padding_mode=padding_mode)

    def predict_backward(self, data, interp=None, padding_mode=None, **kwargs):
        return self.predict_backward_fn(self.param, data,
                                        training=self.is_training,
                                        interp=interp,
                                        padding_mode=padding_mode)

    def optimize_parameters(self, step_size=None, grad=None):
        """Gradient-ascent step.  In the JAX design gradients are computed by
        the solver (jax.grad over the chain) and passed in; `self.grad` is
        also honoured when stashed by the solver."""
        if step_size is None:
            step_size = self.step_size
        if grad is None:
            grad = getattr(self, "grad", None)
        if grad is None:
            raise ValueError(
                "optimize_parameters needs a gradient: pass grad= or let the "
                "solver stash transform.grad")
        self.param = jax.lax.stop_gradient(
            self.update(self.param, grad, step_size))
        return self.param

    def rescale_parameters(self):
        self.param = self.project(self.param)
        return self.param

    def _record_diff(self, data, out):
        return out - data

    def _stash(self, name, value):
        """Record a debug/vis artifact (bias field, affine matrix, ...) on the
        instance — but only outside jit: stashing a traced value would leak a
        tracer out of the jitted PGD step."""
        if not isinstance(value, jax.core.Tracer):
            setattr(self, name, value)

    # ------------------------------------------------------------- helpers
    def unit_normalize(self, d, p_type: str = "l2"):
        return norms.unit_normalize(d, p_type)

    def rescale_intensity(self, data, new_min=0.0, new_max=1.0, eps=1e-20):
        return norms.rescale_intensity(data, new_min, new_max, eps)

    def init_config(self, config_dict):
        raise NotImplementedError

    def get_name(self) -> str:
        raise NotImplementedError

    def is_geometric(self) -> int:
        return 0


def mask_ignore_values(data, transformed, ignore_values):
    """Freeze pixels whose clean value equals `ignore_values` (background
    padding), reference adv_noise.py:85-88 / adv_bias.py:176-184."""
    mask = jnp.abs(data - ignore_values) < 1e-8
    return jnp.where(mask, jnp.asarray(ignore_values, transformed.dtype),
                     transformed)
