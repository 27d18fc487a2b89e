"""Parity + property tests for the four adversarial transforms.

Oracles are written in torch from the reference's documented math (SURVEY.md
section 2; reference file:line cited per test) — NOT imported from the
reference — so any deviation in our JAX implementation shows up against
torch's numerics, the reference's actual substrate.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor import AdvAffine, AdvMorph, AdvNoise, AdvBias

TOL = 1e-4


# --------------------------------------------------------------------- noise
def test_noise_forward_backward_roundtrip():
    tr = AdvNoise(config_dict={"epsilon": 0.1, "xi": 1e-6,
                               "data_size": [4, 1, 16, 16]}, seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 1, 16, 16), jnp.float32)
    tr.init_parameters()
    y = tr.forward(x)
    # param is l2-unit per batch row, scaled by epsilon
    p = np.asarray(tr.param)
    np.testing.assert_allclose(
        np.linalg.norm(p.reshape(4, -1), axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y - x), 0.1 * p, atol=1e-6)
    # photometric: backward is identity (reference adv_noise.py:96-106)
    np.testing.assert_allclose(np.asarray(tr.backward(y)), np.asarray(y))


# ---------------------------------------------------------------------- bias
def test_bias_field_range_and_identity_backward():
    tr = AdvBias(config_dict={
        "epsilon": 0.3, "control_point_spacing": [32, 32], "downscale": 2,
        "data_size": [2, 1, 64, 64], "interpolation_order": 3,
        "init_mode": "random", "space": "log"}, seed=0)
    x = jnp.ones((2, 1, 64, 64), jnp.float32)
    tr.init_parameters()
    y = tr.forward(x)
    field = np.asarray(tr.bias_field)
    assert field.min() >= 1 - 0.3 - 1e-5 and field.max() <= 1 + 0.3 + 1e-5
    np.testing.assert_allclose(np.asarray(tr.backward(y)), np.asarray(y))


# -------------------------------------------------------------------- affine
def _affine_matrix_oracle_2d(params, cfg):
    """Reference matrix math (adv_affine.py:219-226) in numpy."""
    t = np.clip(params, -1, 1)
    rot, sx, sy, tx, ty = t[:, 0], t[:, 1], t[:, 2], t[:, 3], t[:, 4]
    ang = rot * cfg["rot"] * math.pi
    cx = 1 + sx * cfg["scale_x"]
    cy = 1 + sy * cfg["scale_y"]
    m = np.zeros((t.shape[0], 2, 3), np.float32)
    m[:, 0, 0] = cx * np.cos(ang)
    m[:, 0, 1] = cy * (-np.sin(ang))
    m[:, 0, 2] = tx * cfg["shift_x"]
    m[:, 1, 0] = cx * np.sin(ang)
    m[:, 1, 1] = cy * np.cos(ang)
    m[:, 1, 2] = ty * cfg["shift_y"]
    return m


def test_affine_2d_matrix_and_forward_parity(rng):
    cfg = {"rot": 0.25, "scale_x": 0.2, "scale_y": 0.2,
           "shift_x": 0.1, "shift_y": 0.1,
           "data_size": [3, 2, 24, 20],
           "forward_interp": "bilinear", "backward_interp": "bilinear"}
    tr = AdvAffine(spatial_dims=2, config_dict=cfg, seed=1)
    tr.init_parameters()
    params = np.asarray(tr.param)

    m_ours = np.asarray(tr.gen_batch_affine_matrix(tr.param))
    m_ref = _affine_matrix_oracle_2d(params, cfg)
    np.testing.assert_allclose(m_ours, m_ref, atol=1e-5)

    x = rng.randn(3, 2, 24, 20).astype(np.float32)
    y_ours = np.asarray(tr.forward(jnp.asarray(x)))
    grid = F.affine_grid(torch.from_numpy(m_ref), (3, 2, 24, 20),
                         align_corners=True)
    y_ref = F.grid_sample(torch.from_numpy(x), grid, mode="bilinear",
                          align_corners=True, padding_mode="zeros").numpy()
    np.testing.assert_allclose(y_ours, y_ref, atol=TOL)


def test_affine_2d_roundtrip_and_mask():
    """forward âˆ˜ backward approximately identity away from borders
    (reference __main__ smoke test, adv_affine.py:335-383)."""
    cfg = {"rot": 0.1, "scale_x": 0.05, "scale_y": 0.05,
           "shift_x": 0.05, "shift_y": 0.05, "data_size": [1, 1, 64, 64]}
    tr = AdvAffine(spatial_dims=2, config_dict=cfg, seed=3)
    x = np.zeros((1, 1, 64, 64), np.float32)
    x[:, :, 20:44, 20:44] = 1.0
    xj = jnp.asarray(x)
    tr.init_parameters()
    y = tr.forward(xj)
    rec = tr.backward(y)
    mask = np.asarray(tr.backward(tr.forward(jnp.ones_like(xj)))) > 0.999
    err = (np.asarray(rec) - x) * mask
    assert np.abs(err).mean() < 0.02


def test_affine_3d_forward_parity(rng):
    cfg = {"rot_x": 0.1, "rot_y": 0.05, "rot_z": 0.2,
           "scale_x": 0.1, "scale_y": 0.1, "scale_z": 0.1,
           "shift_x": 0.1, "shift_y": 0.05, "shift_z": 0.05,
           "data_size": [2, 1, 10, 12, 14]}
    tr = AdvAffine(spatial_dims=3, config_dict=cfg, seed=2)
    tr.init_parameters()
    t = np.clip(np.asarray(tr.param), -1, 1)

    # oracle: T @ (R @ S), Euler z-y'-x'' (adv_affine.py:240-269)
    n = t.shape[0]
    phi = t[:, 0] * cfg["rot_x"] * math.pi
    theta = t[:, 1] * cfg["rot_y"] * math.pi
    psi = t[:, 2] * cfg["rot_z"] * math.pi
    m_ref = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        T = np.eye(4); T[0, 3] = t[i, 6] * cfg["shift_x"]
        T[1, 3] = t[i, 7] * cfg["shift_y"]; T[2, 3] = t[i, 8] * cfg["shift_z"]
        S = np.diag([1 + t[i, 3] * cfg["scale_x"],
                     1 + t[i, 4] * cfg["scale_y"],
                     1 + t[i, 5] * cfg["scale_z"], 1.0])
        cp, sp = np.cos(phi[i]), np.sin(phi[i])
        ct, st = np.cos(theta[i]), np.sin(theta[i])
        cs, ss = np.cos(psi[i]), np.sin(psi[i])
        R = np.array([
            [ct * cs, -cp * ss + sp * st * cs, sp * ss + cp * st * cs, 0],
            [ct * ss, cp * cs + sp * st * ss, -sp * cs + cp * st * ss, 0],
            [-st, sp * ct, cp * ct, 0],
            [0, 0, 0, 1]])
        m_ref[i] = (T @ R @ S)[:3, :4]
    np.testing.assert_allclose(np.asarray(tr.gen_batch_affine_matrix(tr.param)),
                               m_ref, atol=1e-5)

    x = rng.randn(2, 1, 10, 12, 14).astype(np.float32)
    y_ours = np.asarray(tr.forward(jnp.asarray(x)))
    grid = F.affine_grid(torch.from_numpy(m_ref), (2, 1, 10, 12, 14),
                         align_corners=True)
    y_ref = F.grid_sample(torch.from_numpy(x), grid, mode="bilinear",
                          align_corners=True, padding_mode="zeros").numpy()
    np.testing.assert_allclose(y_ours, y_ref, atol=TOL)


def test_affine_lowest_and_float_padding(rng):
    """'lowest' = shift-to-zero-min then zeros padding then unshift
    (adv_affine.py:299-310)."""
    cfg = {"rot": 0.2, "scale_x": 0.1, "scale_y": 0.1,
           "shift_x": 0.3, "shift_y": 0.3, "data_size": [2, 1, 16, 16]}
    x = rng.rand(2, 1, 16, 16).astype(np.float32) + 2.0  # min ~2

    tr = AdvAffine(spatial_dims=2, config_dict=cfg, seed=5,
                   image_padding_mode="lowest")
    tr.init_parameters()
    y = np.asarray(tr.forward(jnp.asarray(x)))
    m = np.asarray(tr.affine_matrix)
    mins = x.reshape(2, -1).min(axis=1).reshape(2, 1, 1, 1)
    grid = F.affine_grid(torch.from_numpy(m), (2, 1, 16, 16),
                         align_corners=True)
    ref = F.grid_sample(torch.from_numpy(x - mins), grid, mode="bilinear",
                        align_corners=True, padding_mode="zeros").numpy() + mins
    np.testing.assert_allclose(y, ref, atol=TOL)

    tr2 = AdvAffine(spatial_dims=2, config_dict=cfg, seed=5,
                    image_padding_mode=1.5)
    tr2.init_parameters()
    y2 = np.asarray(tr2.forward(jnp.asarray(x)))
    ref2 = F.grid_sample(torch.from_numpy(x - 1.5), grid, mode="bilinear",
                         align_corners=True, padding_mode="zeros").numpy() + 1.5
    np.testing.assert_allclose(y2, ref2, atol=TOL)


def test_affine_update_is_sign_ascent():
    cfg = {"rot": 0.2, "scale_x": 0.1, "scale_y": 0.1,
           "shift_x": 0.1, "shift_y": 0.1, "data_size": [2, 1, 8, 8]}
    tr = AdvAffine(spatial_dims=2, config_dict=cfg, seed=0)
    p = jnp.zeros((2, 5))
    g = jnp.asarray(np.random.RandomState(0).randn(2, 5).astype(np.float32))
    out = np.asarray(tr.update(p, g, 0.5))
    np.testing.assert_allclose(out, 0.5 * np.sign(np.asarray(g)), atol=1e-7)


# --------------------------------------------------------------------- morph
def _morph_forward_oracle(params, x, epsilon, image_spatial):
    """Reference demons pipeline (adv_morph.py:285-311,454-491) in torch,
    including the integrate_by_add in-place quirk (offset = phi - phi0)."""
    duv = torch.from_numpy(epsilon * params)
    # dense 9x9 gaussian (sigma=1), joint normalisation (adv_morph.py:391-452)
    ks = 9
    xs = torch.arange(ks).float()
    xg = xs.repeat(ks).view(ks, ks)
    grid2 = torch.stack([xg, xg.t()], -1)
    kern = torch.exp(-((grid2 - (ks - 1) / 2.0) ** 2).sum(-1) / 2.0)
    kern = (kern / kern.sum()).view(1, 1, ks, ks).repeat(2, 1, 1, 1)

    def smooth(v):
        return F.conv2d(v, kern, padding=ks // 2, groups=2)

    duv = smooth(duv)
    duv = F.interpolate(duv, size=image_spatial, mode="bilinear",
                        align_corners=False)
    h, w = image_spatial
    ys, xs2 = torch.meshgrid(torch.linspace(-1, 1, h),
                             torch.linspace(-1, 1, w), indexing="ij")
    base = torch.stack([xs2, ys]).unsqueeze(0).repeat(duv.shape[0], 1, 1, 1)

    def compose(f1, f2):
        return F.grid_sample(f1, f2.permute(0, 2, 3, 1),
                             padding_mode="border", align_corners=True)

    phi0 = base + duv / 2.0 ** 8
    phi = phi0
    for _ in range(8):
        phi = compose(phi, phi)
    offsets = phi - phi0
    composed = compose(base, offsets + base)
    composed = smooth(composed - base) + base
    dxy = torch.clamp(composed, -1, 1)
    out = F.grid_sample(torch.from_numpy(x), dxy.permute(0, 2, 3, 1),
                        mode="bilinear", align_corners=True,
                        padding_mode="zeros")
    return out.numpy()


def test_morph_2d_forward_parity(rng):
    cfg = {"epsilon": 1.5, "data_size": [2, 1, 32, 32], "vector_size": [8, 8]}
    tr = AdvMorph(spatial_dims=2, config_dict=cfg, seed=7)
    tr.init_parameters()
    # smooth image: float error in the deformation grid (~6e-5 after 8 nested
    # grid-samples, identical torch-vs-torch) is amplified by the image
    # gradient, so parity on white noise is bounded by ~grad*6e-5, not 1e-4
    ii, jj = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    x = np.stack([np.sin(ii / 5.0 + k) * np.cos(jj / 4.0 - k)
                  for k in range(2)]).reshape(2, 1, 32, 32).astype(np.float32)
    y_ours = np.asarray(tr.forward(jnp.asarray(x)))
    y_ref = _morph_forward_oracle(np.asarray(tr.param), x, 1.5, (32, 32))
    np.testing.assert_allclose(y_ours, y_ref, atol=3e-4)


def test_morph_2d_roundtrip():
    cfg = {"epsilon": 1.0, "data_size": [1, 1, 64, 64],
           "vector_size": [8, 8]}
    tr = AdvMorph(spatial_dims=2, config_dict=cfg, seed=9)
    # smooth test image: the inverse is only approximate (exp of -v), and
    # bilinear resampling is lossy on sharp edges, so parity-style bounds
    # only hold away from high-frequency content
    ii, jj = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    x = (np.sin(ii / 9.0) * np.cos(jj / 7.0)).reshape(1, 1, 64, 64)
    x = x.astype(np.float32)
    tr.init_parameters()
    y = tr.forward(jnp.asarray(x))
    fwd_delta = np.abs(np.asarray(y) - x).mean()
    rec = np.asarray(tr.backward(y))
    err = np.abs(rec - x).mean()
    # the roundtrip must recover most of the deformation
    assert err < 0.35 * fwd_delta, (err, fwd_delta)


def test_morph_diffeomorphic_jacobian():
    """Jacobian determinant of the displacement stays positive (diffeo)."""
    from advchain_tpu.ops import jacobian_determinant_2d
    cfg = {"epsilon": 1.5, "data_size": [2, 1, 48, 48], "vector_size": [6, 6]}
    tr = AdvMorph(spatial_dims=2, config_dict=cfg, seed=11)
    tr.init_parameters()
    dxy, disp = tr.get_deformation_displacement_field(1.5 * tr.param)
    grid_offsets = jnp.moveaxis(disp, -1, 1)
    det = np.asarray(jacobian_determinant_2d(grid_offsets))
    assert det.min() > 0, f"negative jacobian determinant: {det.min()}"


def test_morph_3d_runs_and_inverts():
    cfg = {"epsilon": 1.0, "data_size": [1, 1, 16, 16, 16],
           "vector_size": [4, 4, 4]}
    tr = AdvMorph(spatial_dims=3, config_dict=cfg, seed=13)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 1, 16, 16, 16),
                    jnp.float32)
    tr.init_parameters()
    y = tr.forward(x)
    assert y.shape == x.shape
    rec = np.asarray(tr.backward(y))
    assert np.abs(rec - np.asarray(x)).mean() < 0.2


def test_morph_update_and_project_unit_norm():
    cfg = {"epsilon": 1.0, "data_size": [2, 1, 16, 16], "vector_size": [4, 4]}
    tr = AdvMorph(spatial_dims=2, config_dict=cfg, seed=0)
    g = jnp.asarray(np.random.RandomState(2).randn(2, 2, 4, 4),
                    jnp.float32)
    p = jnp.zeros((2, 2, 4, 4))
    out = np.asarray(tr.update(p, g, 2.0))
    gn = np.asarray(g).reshape(2, -1)
    gn = gn / (np.linalg.norm(gn, axis=1, keepdims=True) + 1e-20)
    np.testing.assert_allclose(out.reshape(2, -1), 2.0 * gn, atol=1e-6)
    proj = np.asarray(tr.project(jnp.asarray(out)))
    np.testing.assert_allclose(
        np.linalg.norm(proj.reshape(2, -1), axis=1), 1.0, atol=1e-5)


# ---------------------------------------------------- gradient flows through
def test_grad_flows_through_geometric_chain():
    """jax.grad of a loss w.r.t. affine+morph params is finite and nonzero —
    the PGD loop depends on grads through the samplers."""
    acfg = {"rot": 0.2, "scale_x": 0.1, "scale_y": 0.1,
            "shift_x": 0.1, "shift_y": 0.1, "data_size": [2, 1, 24, 24]}
    mcfg = {"epsilon": 1.0, "data_size": [2, 1, 24, 24], "vector_size": [6, 6]}
    aff = AdvAffine(spatial_dims=2, config_dict=acfg, seed=1)
    mor = AdvMorph(spatial_dims=2, config_dict=mcfg, seed=2)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 1, 24, 24), jnp.float32)
    pa = aff.init_params(jax.random.PRNGKey(0))
    pm = mor.init_params(jax.random.PRNGKey(1))

    def loss(pa, pm):
        y = aff.apply(pa, x)
        y = mor.apply(pm, y)
        return jnp.sum(y ** 2)

    ga, gm = jax.grad(loss, argnums=(0, 1))(pa, pm)
    assert np.isfinite(np.asarray(ga)).all() and np.abs(ga).sum() > 0
    assert np.isfinite(np.asarray(gm)).all() and np.abs(gm).sum() > 0


def test_morph_remat_policy_and_equivalence():
    """'auto' keeps small workloads resident (no backward recompute) and
    remats only HBM-threatening ones; gradients are identical either way."""
    import jax
    from advchain_tpu.augmentor.morph import AdvMorph

    small = AdvMorph(config_dict={"epsilon": 1.5, "data_size": [4, 1, 32, 32],
                                  "vector_size": [4, 4]})
    assert small._remat_demons() is False
    big = AdvMorph(spatial_dims=3, config_dict={
        "epsilon": 1.5, "data_size": [2, 1, 96, 192, 192],
        "vector_size": [8, 12, 12]})
    assert big._remat_demons() is True
    forced = AdvMorph(config_dict={"epsilon": 1.5,
                                   "data_size": [4, 1, 32, 32],
                                   "vector_size": [4, 4]}, remat="on")
    assert forced._remat_demons() is True

    x = jnp.asarray(np.random.RandomState(0).rand(4, 1, 32, 32),
                    jnp.float32)
    k = jax.random.PRNGKey(3)
    p = small.init_params(k)

    def loss(t, params):
        return jnp.sum(t.apply(params, x) ** 2)

    g_res = np.asarray(jax.grad(lambda q: loss(small, q))(p))
    g_rem = np.asarray(jax.grad(lambda q: loss(forced, q))(p))
    # remat re-derives the chain in backward; XLA fuses the two programs
    # differently and ulp shifts amplify through 8 nested samplers —
    # agreement is at trace-numerics level, not bitwise
    rel_l2 = np.linalg.norm(g_rem - g_res) / np.linalg.norm(g_res)
    assert rel_l2 < 1e-3, rel_l2
    np.testing.assert_allclose(g_rem, g_res, rtol=2e-2, atol=1e-4)
