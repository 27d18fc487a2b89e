"""AdvMorph — adversarial diffeomorphic deformation (demons-style).

Parity with reference advchain/augmentor/adv_morph.py: the latent is a coarse
velocity field (N, d, *vector_size) in [-1, 1] (unit-normalised).  Forward:
scale by epsilon (xi=0.5 during power-iteration training), Gaussian-smooth
(sigma=1, kernel auto-grown to 9), upsample to image resolution
(align_corners=False), exponentiate by scaling-and-squaring (8 steps; the 3D
path adds adaptive step growth while ||duv/2^n|| > 0.5), compose with the
base grid, smooth the resulting offsets once more, clamp to [-1, 1], then
warp the image (align_corners=True).  The approximate inverse exponentiates
the NEGATED velocity.  PGD update is unit-l2-normalised gradient ascent;
projection re-normalises onto the unit sphere (adv_morph.py:501-522).

Unlike AdvAffine, per-call ``padding_mode`` IS honored here (reference
adv_morph.py:538-539 has the non-inverted condition).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor.base import AdvTransformBase
from advchain_tpu.augmentor.affine import sample_with_padding
from advchain_tpu.ops.conv import gaussian_smooth
from advchain_tpu.ops.integrate import base_grid, exponentiate_flow
from advchain_tpu.ops.resize import interpolate


class AdvMorph(AdvTransformBase):
    """config_dict keys (reference adv_morph.py:247-258): epsilon, data_size,
    vector_size, forward_interp, backward_interp."""

    def __init__(self, spatial_dims: int = 2, config_dict=None,
                 image_padding_mode="zeros", power_iteration: bool = False,
                 debug: bool = False, seed=None, **kw):
        if config_dict is None:
            config_dict = {
                "epsilon": 1.5,
                "data_size": [10, 1, 8, 8],
                "vector_size": [4, 4],
                "forward_interp": "bilinear",
                "backward_interp": "bilinear",
            }
        self.forward_interp = "bilinear"
        self.backward_interp = "bilinear"
        # remat policy for the scaling-and-squaring chain under autodiff:
        # 'on' recomputes the chain in the backward pass (FLOPs for HBM),
        # 'off' stores the intermediate grids, 'auto' remats only when the
        # stored intermediates are big enough to threaten HBM.  Init-time
        # env default (ADVCHAIN_MORPH_REMAT) — a trace-time read would
        # alias jit caches across settings.
        self.remat = kw.pop("remat", None)
        if self.remat is None:
            self.remat = os.environ.get("ADVCHAIN_MORPH_REMAT", "auto")
        # explicit falsy values (remat=False) must error, not silently fall
        # back to the env default
        assert self.remat in ("auto", "on", "off"), self.remat
        super().__init__(spatial_dims=spatial_dims, config_dict=config_dict,
                         power_iteration=power_iteration, debug=debug,
                         seed=seed, **kw)
        # fixed hyper-parameters (reference ctor, adv_morph.py:234-242)
        self.align_corners = True
        self.sigma = 1
        self.gaussian_ks = 5
        self.smooth_iter = 1
        self.num_steps = 8
        self.integration_type = "ss"
        self.image_padding_mode = image_padding_mode

    def init_config(self, config_dict):
        self.epsilon = config_dict["epsilon"]
        self.xi = 0.5
        self.data_size = tuple(int(s) for s in config_dict["data_size"])
        self.vector_size = tuple(int(s) for s in config_dict["vector_size"])
        self.batch_size = self.data_size[0]
        self.image_spatial = self.data_size[2:]
        if "forward_interp" in config_dict:
            self.forward_interp = config_dict["forward_interp"]
        if "backward_interp" in config_dict:
            self.backward_interp = config_dict["backward_interp"]

    # functional core ------------------------------------------------------
    def init_params(self, key):
        shape = (self.batch_size, self.spatial_dims) + self.vector_size
        v = 2.0 * jax.random.uniform(key, shape, dtype=jnp.float32) - 1.0
        return self.unit_normalize(v)

    def _remat_demons(self) -> bool:
        """Whether to rematerialize the scaling-and-squaring chain under
        autodiff.  'auto': only when the stored intermediates (one full
        flow field per composition step, several fields per loss) are big
        enough to threaten HBM; small/2D workloads keep them resident and
        skip the backward-pass recompute."""
        if self.remat != "auto":
            return self.remat == "on"
        flow_bytes = 4 * self.batch_size * self.spatial_dims
        for s in self.image_spatial:
            flow_bytes *= s
        # ~2x num_steps stored fields per differentiated compose; remat
        # once that footprint passes ~1 GiB of a 16 GiB v5e HBM
        return 2 * self.num_steps * flow_bytes > (1 << 30)

    def demons_compose(self, duv, smooth: bool = True):
        """Velocity -> full deformation grid in [-1, 1]
        (reference DemonsCompose, adv_morph.py:454-491).

        Optionally rematerialized under autodiff (see ``_remat_demons``):
        the chain's intermediate grids are recomputed in the backward pass
        instead of stored — without this, large 3D volume episodes exceed
        HBM."""
        if self._remat_demons():
            return jax.checkpoint(
                lambda v: self._demons_compose_impl(v, smooth))(duv)
        return self._demons_compose_impl(duv, smooth)

    def _demons_compose_impl(self, duv, smooth: bool = True):
        grid = base_grid(duv.shape[0], self.image_spatial, dtype=duv.dtype)
        interp_mode = "bilinear" if self.spatial_dims == 2 else "trilinear"
        duv = gaussian_smooth(duv, sigma=self.sigma,
                              kernel_size=self.gaussian_ks,
                              iters=self.smooth_iter)
        duv = interpolate(duv, size=self.image_spatial, mode=interp_mode,
                          align_corners=False)
        offsets = exponentiate_flow(duv, nb_steps=self.num_steps,
                                    method=self.integration_type,
                                    adaptive=(self.spatial_dims == 3))
        # reference adv_morph.py:473-483 computes
        # compose_flow(base_grid, offsets + grid) via grid_sample — but
        # flow1 is the IDENTITY grid, and bi/trilinear interpolation of a
        # linear function returns the sample position exactly while
        # border padding clamps out-of-range coordinates to the boundary
        # (= +-1 under align_corners=True).  The closed form
        # clip(offsets + grid, -1, 1) equals it to the lerp's own f32
        # rounding (~1e-7, the same noise floor as torch's kernel; this
        # is the chain's LAST composition so nothing amplifies it) and
        # its gradient (1 inside the box, 0 outside) matches the sampled
        # form's — while sparing two full band compositions + their VJPs
        # per precompute.
        composed = jnp.clip(offsets + grid, -1.0, 1.0)
        if smooth:
            smoothed = gaussian_smooth(composed - grid, sigma=self.sigma,
                                       kernel_size=self.gaussian_ks, iters=1)
            composed = smoothed + grid
        return jnp.clip(composed, -1.0, 1.0)

    def get_deformation_displacement_field(self, duv):
        """Returns (deformation grid NC*spatial, displacement channel-last)
        (reference adv_morph.py:339-347)."""
        dxy = self.demons_compose(duv, smooth=True)
        grid = base_grid(dxy.shape[0], self.image_spatial, dtype=dxy.dtype)
        disp = jnp.moveaxis(dxy - grid, 1, -1)
        return dxy, disp

    def _duv(self, params, training: bool, negate: bool = False):
        scale = self.xi if (self.power_iteration and training) else self.epsilon
        if negate:
            scale = -scale
        return scale * params

    def transform(self, data, deformation_dxy, interp=None, padding_mode=None):
        if padding_mode is None:
            padding_mode = self.image_padding_mode
        if interp is None:
            interp = self.forward_interp
        grid = jnp.moveaxis(deformation_dxy, 1, -1)
        return sample_with_padding(data, grid, interp, padding_mode)

    def apply(self, params, data, training: bool = False, interp=None,
              padding_mode=None):
        if interp is None:
            interp = self.forward_interp
        dxy, disp = self.get_deformation_displacement_field(
            self._duv(params, training))
        # demons_compose already clamps the grid to [-1, 1]
        self._stash("displacement", disp)
        return self.transform(data, dxy, interp=interp,
                              padding_mode=padding_mode)

    def inverse(self, params, data, training: bool = False, interp=None,
                padding_mode=None):
        if interp is None:
            interp = self.backward_interp
        dxy, _ = self.get_deformation_displacement_field(
            self._duv(params, training, negate=True))
        return self.transform(data, dxy, interp=interp,
                              padding_mode=padding_mode)

    def predict_forward_fn(self, params, pred, training: bool = False,
                           interp=None, padding_mode=None):
        return self.apply(params, pred, training=training, interp=interp,
                          padding_mode=padding_mode)

    def predict_backward_fn(self, params, pred, training: bool = False,
                            interp=None, padding_mode=None):
        return self.inverse(params, pred, training=training, interp=interp,
                            padding_mode=padding_mode)

    def update(self, params, grad, step_size):
        g = self.unit_normalize(grad)
        if self.power_iteration:
            return g
        return params + step_size * g

    def project(self, params):
        return self.unit_normalize(params)

    def prepare_train(self, params):
        if self.power_iteration:
            return self.unit_normalize(params)
        return params

    def precompute(self, params, training: bool = False):
        dxy_f, disp = self.get_deformation_displacement_field(
            self._duv(params, training))
        dxy_b, _ = self.get_deformation_displacement_field(
            self._duv(params, training, negate=True))
        self._stash("displacement", disp)
        return (dxy_f, dxy_b)

    def apply_precomputed(self, aux, params, data, training: bool = False,
                          interp=None, padding_mode=None):
        return self.transform(data, aux[0],
                              interp=interp or self.forward_interp,
                              padding_mode=padding_mode)

    def inverse_precomputed(self, aux, params, data, training: bool = False,
                            interp=None, padding_mode=None):
        return self.transform(data, aux[1],
                              interp=interp or self.backward_interp,
                              padding_mode=padding_mode)

    def get_name(self):
        return "morph"

    def is_geometric(self):
        return 1
