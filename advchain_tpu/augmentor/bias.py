"""AdvBias — multiplicative smooth B-spline bias field.

Parity with reference advchain/augmentor/adv_bias.py: a coarse control-point
grid is upsampled by a B-spline kernel (transposed conv with stride =
control-point spacing), cropped, resized to full resolution, mapped through
``exp`` (log space) or ``1 + field``, clipped to ``[1-eps, 1+eps]`` and
multiplied onto the image.  The control points are the latent adversarial
parameters.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor.base import AdvTransformBase, mask_ignore_values
from advchain_tpu.ops.bspline import (make_bspline_field_spec,
                                      evaluate_bspline_field, clip_bias)


class AdvBias(AdvTransformBase):
    """config_dict keys (reference adv_bias.py:84-102): epsilon,
    control_point_spacing, downscale, data_size, interpolation_order,
    init_mode ('random'|'gaussian'|'identity'), space ('log'|'linear')."""

    def __init__(self, spatial_dims: int = 2, config_dict=None,
                 power_iteration: bool = False, ignore_values=None,
                 debug: bool = False, seed=None, **kw):
        if config_dict is None:
            config_dict = {
                "epsilon": 0.3,
                "control_point_spacing": [64, 64],
                "downscale": 2,
                "data_size": [2, 1, 128, 128],
                "interpolation_order": 3,
                "init_mode": "random",
                "space": "log",
            }
        super().__init__(spatial_dims=spatial_dims, config_dict=config_dict,
                         power_iteration=power_iteration,
                         ignore_values=ignore_values, debug=debug, seed=seed,
                         **kw)

    def init_config(self, config_dict):
        self.epsilon = config_dict["epsilon"]
        self.magnitude = self.epsilon
        assert 0 <= self.magnitude < 1, "please set magnitude within [0,1)"
        self.xi = 1e-6
        self.data_size = tuple(int(s) for s in config_dict["data_size"])
        self.downscale = int(config_dict["downscale"])
        assert self.downscale <= min(self.data_size[2:]), \
            "downscale factor is too large"
        self.interpolation_order = int(config_dict["interpolation_order"])
        self.space = config_dict["space"]
        self.use_log = self.space == "log"
        self.init_mode = config_dict["init_mode"]
        self.batch_size = self.data_size[0]
        # static geometry (control-point grid / strides / crops / kernel)
        self.spec = make_bspline_field_spec(
            image_size=self.data_size[2:],
            control_point_spacing=config_dict["control_point_spacing"],
            downscale=self.downscale, order=self.interpolation_order)
        self.cp_grid = (self.batch_size, 1) + self.spec.cp_grid
        # projection bounds: finite only for 'random' init in the reference
        # (adv_bias.py:237-250)
        self.low, self.high = -math.inf, math.inf
        if self.init_mode == "random":
            if self.use_log:
                self.low = math.log(1.0 - self.magnitude)
                self.high = math.log(1.0 + self.magnitude)
            else:
                self.low = -self.magnitude
                self.high = self.magnitude

    # functional core ------------------------------------------------------
    def init_params(self, key):
        if self.init_mode == "gaussian":
            return 0.5 * jax.random.normal(key, self.cp_grid, jnp.float32)
        if self.init_mode == "random":
            u = jax.random.uniform(key, self.cp_grid, jnp.float32)
            return u * (self.high - self.low) + self.low
        if self.init_mode == "identity":
            return jnp.zeros(self.cp_grid, jnp.float32)
        raise NotImplementedError(f"init_mode {self.init_mode!r}")

    def compute_smoothed_bias(self, cpoint):
        """Control points -> full-resolution bias field (N,1,*image_size)."""
        return evaluate_bspline_field(cpoint, self.spec,
                                      log_space=self.use_log)

    def apply(self, params, data, training: bool = False, interp=None,
              padding_mode=None):
        scale = self.xi if (self.power_iteration and training) else 1.0
        field = self.compute_smoothed_bias(scale * params)
        field = clip_bias(field, self.magnitude)
        self._stash("bias_field", field)  # parity with reference debug use
        out = field * data
        if self.ignore_values is not None and \
                isinstance(self.ignore_values, (int, float)) and \
                not isinstance(self.ignore_values, bool):
            out = mask_ignore_values(data, out, float(self.ignore_values))
        return out

    def precompute(self, params, training: bool = False):
        scale = self.xi if (self.power_iteration and training) else 1.0
        field = self.compute_smoothed_bias(scale * params)
        field = clip_bias(field, self.magnitude)
        self._stash("bias_field", field)
        return field

    def apply_precomputed(self, aux, params, data, training: bool = False,
                          interp=None, padding_mode=None):
        out = aux * data
        if self.ignore_values is not None and \
                isinstance(self.ignore_values, (int, float)) and \
                not isinstance(self.ignore_values, bool):
            from advchain_tpu.augmentor.base import mask_ignore_values
            out = mask_ignore_values(data, out, float(self.ignore_values))
        return out

    def update(self, params, grad, step_size):
        g = self.unit_normalize(grad, "l2")
        if self.power_iteration:
            return g
        return params + step_size * g

    def project(self, params):
        return jnp.clip(params, self.low, self.high)

    def prepare_train(self, params):
        if self.power_iteration:
            return self.unit_normalize(params)
        return params

    def _record_diff(self, data, out):
        # debug artifact (reference stashes the field as .diff); not
        # populated when apply() ran under an outer jit trace (_stash skips
        # tracers so no tracer leaks onto the instance)
        return getattr(self, "bias_field", None)

    def get_name(self):
        return "bias"
