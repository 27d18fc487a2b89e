"""AdvAffine — batched adversarial affine warps with exact inverses.

Parity with reference advchain/augmentor/adv_affine.py: the latent is 5
scalars/sample in 2D (rot, scale_x, scale_y, shift_x, shift_y) or 9 in 3D
(rot_x/y/z, scale_x/y/z, shift_x/y/z), squashed through Hardtanh and scaled
by per-config ranges into an affine matrix (2D: rotation entries multiplied
by the scales, adv_affine.py:219-226; 3D: T @ (R_euler_zyx @ S),
adv_affine.py:240-269).  Forward warps with affine_grid + grid_sample
(align_corners=True); backward warps with the exact homogeneous-matrix
inverse.  The PGD update uses the *sign* of the gradient (FGSM-style,
adv_affine.py:182-198).

Padding-mode note (replicated effective behavior): the reference's
``transform()`` has an inverted condition (adv_affine.py:293-294) which makes
the constructor's ``image_padding_mode`` always win over per-call arguments;
we reproduce that observable behavior.  Besides torch's zeros/border/
reflection, ``"lowest"`` (pad with the per-sample minimum) and any float
value are supported via shift -> zeros-sample -> unshift
(adv_affine.py:299-310).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor.base import AdvTransformBase
from advchain_tpu.ops.affine import affine_grid, invert_affine_matrix
from advchain_tpu.ops.grid_sample import grid_sample


def hardtanh(x):
    return jnp.clip(x, -1.0, 1.0)


def sample_with_padding(data, grid, interp: str, padding_mode,
                        tile_order: str = "rows"):
    """grid_sample with the reference's extended padding modes.

    ``padding_mode``: 'zeros' | 'border' | 'reflection' | 'lowest' | float.
    'lowest' shifts each sample so its min is 0, samples with zeros padding,
    then shifts back (reference adv_affine.py:299-310, adv_morph.py:542-554).
    ``tile_order`` is the 2D Pallas perf hint: affine warps pass 'blocks'
    (rotations degenerate row-major tile bands); morph keeps 'rows'.
    """
    if padding_mode == "lowest":
        n = data.shape[0]
        mins = jnp.min(data.reshape(n, -1), axis=1)
        mins = jax.lax.stop_gradient(mins).reshape((n,) + (1,) * (data.ndim - 1))
        out = grid_sample(data - mins, grid, mode=interp,
                          padding_mode="zeros", align_corners=True,
                          tile_order=tile_order)
        return out + mins
    if isinstance(padding_mode, (int, float)) and not isinstance(padding_mode, bool):
        pv = jnp.asarray(padding_mode, data.dtype)
        out = grid_sample(data - pv, grid, mode=interp,
                          padding_mode="zeros", align_corners=True,
                          tile_order=tile_order)
        return out + pv
    return grid_sample(data, grid, mode=interp, padding_mode=padding_mode,
                       align_corners=True, tile_order=tile_order)


class AdvAffine(AdvTransformBase):
    """config_dict keys (reference adv_affine.py:20-31, 38-62):
    2D: rot, scale_x, scale_y, shift_x, shift_y;
    3D: rot_x/y/z, scale_x/y/z, shift_x/y/z;
    plus data_size, forward_interp, backward_interp."""

    def __init__(self, spatial_dims: int = 2, config_dict=None,
                 image_padding_mode="zeros", power_iteration: bool = False,
                 debug: bool = False, seed=None, **kw):
        if config_dict is None:
            config_dict = {
                "rot": 30.0 / 180.0,
                "scale_x": 0.2, "scale_y": 0.2,
                "shift_x": 0.1, "shift_y": 0.1,
                "data_size": [1, 1, 8, 8],
                "forward_interp": "bilinear",
                "backward_interp": "bilinear",
            }
        self.forward_interp = "bilinear"
        self.backward_interp = "bilinear"
        super().__init__(spatial_dims=spatial_dims, config_dict=config_dict,
                         power_iteration=power_iteration, debug=debug,
                         seed=seed, **kw)
        self.image_padding_mode = image_padding_mode

    def init_config(self, config_dict):
        self.translation_x = config_dict["shift_x"]
        self.translation_y = config_dict["shift_y"]
        self.scale_x = config_dict["scale_x"]
        self.scale_y = config_dict["scale_y"]
        if self.spatial_dims == 2:
            self.rot_ratio = config_dict["rot"]
        else:
            self.rot_x = config_dict["rot_x"]
            self.rot_y = config_dict["rot_y"]
            self.rot_z = config_dict["rot_z"]
            self.scale_z = config_dict["scale_z"]
            self.translation_z = config_dict["shift_z"]
        self.xi = 1e-6
        self.data_size = tuple(int(s) for s in config_dict["data_size"])
        self.batch_size = self.data_size[0]
        if "forward_interp" in config_dict:
            self.forward_interp = config_dict["forward_interp"]
        if "backward_interp" in config_dict:
            self.backward_interp = config_dict["backward_interp"]

    # functional core ------------------------------------------------------
    def init_params(self, key):
        num_params = 5 if self.spatial_dims == 2 else 9
        u = jax.random.uniform(key, (self.batch_size, num_params),
                               dtype=jnp.float32)
        return 2.0 * u - 1.0  # Hardtanh is identity on [-1, 1]

    def gen_batch_affine_matrix(self, affine_tensors):
        """Latent (N, 5|9) -> affine matrices (N, d, d+1)
        (reference adv_affine.py:210-273)."""
        t = hardtanh(affine_tensors)
        if self.spatial_dims == 2:
            rot, sx, sy, tx, ty = (t[:, 0], t[:, 1], t[:, 2], t[:, 3], t[:, 4])
            ang = rot * self.rot_ratio * math.pi
            cx = (1.0 + sx * self.scale_x)
            cy = (1.0 + sy * self.scale_y)
            row0 = jnp.stack([cx * jnp.cos(ang), cy * (-jnp.sin(ang)),
                              tx * self.translation_x], axis=-1)
            row1 = jnp.stack([cx * jnp.sin(ang), cy * jnp.cos(ang),
                              ty * self.translation_y], axis=-1)
            return jnp.stack([row0, row1], axis=1)
        rx, ry, rz = t[:, 0], t[:, 1], t[:, 2]
        sx, sy, sz = t[:, 3], t[:, 4], t[:, 5]
        tx, ty, tz = t[:, 6], t[:, 7], t[:, 8]
        n = t.shape[0]
        O = jnp.zeros(n, t.dtype)
        I = jnp.ones(n, t.dtype)
        T = jnp.stack([
            jnp.stack([I, O, O, tx * self.translation_x], -1),
            jnp.stack([O, I, O, ty * self.translation_y], -1),
            jnp.stack([O, O, I, tz * self.translation_z], -1),
            jnp.stack([O, O, O, I], -1)], axis=1)
        S = jnp.stack([
            jnp.stack([1.0 + sx * self.scale_x, O, O, O], -1),
            jnp.stack([O, 1.0 + sy * self.scale_y, O, O], -1),
            jnp.stack([O, O, 1.0 + sz * self.scale_z, O], -1),
            jnp.stack([O, O, O, I], -1)], axis=1)
        # Euler z-y'-x'' intrinsic rotation (reference adv_affine.py:252-261)
        phi = rx * self.rot_x * math.pi
        theta = ry * self.rot_y * math.pi
        psi = rz * self.rot_z * math.pi
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
        R = jnp.stack([
            jnp.stack([cth * cpsi,
                       -cphi * spsi + sphi * sth * cpsi,
                       sphi * spsi + cphi * sth * cpsi, O], -1),
            jnp.stack([cth * spsi,
                       cphi * cpsi + sphi * sth * spsi,
                       -sphi * cpsi + cphi * sth * spsi, O], -1),
            jnp.stack([-sth, sphi * cth, cphi * cth, O], -1),
            jnp.stack([O, O, O, I], -1)], axis=1)
        M = jnp.einsum("nij,njk->nik", T,
                       jnp.einsum("nij,njk->nik", R, S,
                                  precision=jax.lax.Precision.HIGHEST),
                       precision=jax.lax.Precision.HIGHEST)
        return M[:, :3, :4]

    def _matrix(self, params, training: bool):
        if self.power_iteration and training:
            return self.gen_batch_affine_matrix(self.xi * params)
        return self.gen_batch_affine_matrix(params)

    def precompute(self, params, training: bool = False):
        m = self._matrix(params, training)
        return (m, invert_affine_matrix(m))

    def apply_precomputed(self, aux, params, data, training: bool = False,
                          interp=None, padding_mode=None):
        self._stash("affine_matrix", aux[0])
        return self.transform(data, aux[0],
                              interp=interp or self.forward_interp)

    def inverse_precomputed(self, aux, params, data, training: bool = False,
                            interp=None, padding_mode=None):
        return self.transform(data, aux[1],
                              interp=interp or self.backward_interp)

    def transform(self, data, affine_matrix, interp=None):
        if interp is None:
            interp = self.forward_interp
        grid = affine_grid(affine_matrix, data.shape, align_corners=True)
        # ctor padding mode always wins (reference effective behavior,
        # adv_affine.py:293-294)
        return sample_with_padding(data, grid, interp, self.image_padding_mode,
                                   tile_order="blocks")

    def apply(self, params, data, training: bool = False, interp=None,
              padding_mode=None):
        if interp is None:
            interp = self.forward_interp
        m = self._matrix(params, training)
        self._stash("affine_matrix", m)
        return self.transform(data, m, interp=interp)

    def inverse(self, params, data, training: bool = False, interp=None,
                padding_mode=None):
        if interp is None:
            interp = self.backward_interp
        m = self._matrix(params, training)
        inv = invert_affine_matrix(m)
        return self.transform(data, inv, interp=interp)

    def predict_forward_fn(self, params, pred, training: bool = False,
                           interp=None, padding_mode=None):
        return self.apply(params, pred, training=training, interp=interp,
                          padding_mode=padding_mode)

    def predict_backward_fn(self, params, pred, training: bool = False,
                            interp=None, padding_mode=None):
        return self.inverse(params, pred, training=training, interp=interp,
                            padding_mode=padding_mode)

    def update(self, params, grad, step_size):
        g = jnp.sign(grad)
        if self.power_iteration:
            return g
        return params + step_size * g

    def project(self, params):
        # scales are constrained inside gen_batch_affine_matrix (Hardtanh);
        # no extra projection (reference adv_affine.py:200-202)
        return params

    def prepare_train(self, params):
        if self.power_iteration:
            return jnp.sign(params)
        return params

    def get_inverse_matrix(self, affine_matrix):
        return invert_affine_matrix(affine_matrix)

    def _record_diff(self, data, out):
        # reference records data - transformed (adv_affine.py:144)
        return data - out

    def get_name(self):
        return "affine"

    def is_geometric(self):
        return 1
