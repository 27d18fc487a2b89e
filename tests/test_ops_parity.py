"""Golden parity tests: advchain_tpu.ops vs torch.nn.functional (CPU oracle).

The reference framework is pure PyTorch; its numerics ARE torch's numerics,
so matching torch on randomized inputs to <=1e-3 (usually <=1e-5) is the
parity bar (BASELINE.md north star: <1e-3 max deviation).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from advchain_tpu import ops

TOL = 1e-4


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_2d(rng, padding_mode, align_corners, mode):
    x = _rand(rng, 3, 2, 17, 23)
    grid = (rng.rand(3, 9, 11, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    ours = np.asarray(ops.grid_sample_2d(jnp.asarray(x), jnp.asarray(grid),
                                         mode=mode, padding_mode=padding_mode,
                                         align_corners=align_corners))
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                           mode=mode, padding_mode=padding_mode,
                           align_corners=align_corners).numpy()
    if mode == "nearest":
        # ties at .5 pixel boundaries can legally round either way; compare
        # on agreement fraction instead of exact equality
        agree = np.mean(np.isclose(ours, theirs, atol=TOL))
        assert agree > 0.99, f"nearest agreement {agree}"
    else:
        np.testing.assert_allclose(ours, theirs, atol=TOL)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
def test_grid_sample_3d(rng, padding_mode):
    x = _rand(rng, 2, 2, 7, 9, 11)
    grid = (rng.rand(2, 4, 5, 6, 3).astype(np.float32) * 2.4 - 1.2)
    ours = np.asarray(ops.grid_sample_3d(jnp.asarray(x), jnp.asarray(grid),
                                         padding_mode=padding_mode))
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                           mode="bilinear", padding_mode=padding_mode,
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


@pytest.mark.parametrize("radius", [1, 2, 4, 8])
def test_stencil_warp_2d_matches_torch(rng, radius):
    """stencil_warp_2d (compose_flow's sub-``radius``-px fast path,
    ops/grid_sample.py) must be exactly bilinear-with-border: torch oracle
    on grids whose displacement stays within the radius, values + both
    gradients (reference semantics: adv_morph.py:179-202)."""
    import jax
    from advchain_tpu.ops.grid_sample import stencil_warp_2d
    from advchain_tpu.ops.integrate import base_grid

    n, c, h, w = 2, 3, 19, 27
    x = _rand(rng, n, c, h, w)
    upx = (rng.rand(n, 2, h, w).astype(np.float32) * 2 - 1) * (radius - 0.03)
    scale = np.asarray([2.0 / (w - 1), 2.0 / (h - 1)],
                       np.float32).reshape(1, 2, 1, 1)
    flow = np.asarray(base_grid(n, (h, w))) + upx * scale
    grid = np.moveaxis(flow, 1, -1)

    ours = np.asarray(stencil_warp_2d(jnp.asarray(x), jnp.asarray(grid),
                                      radius))
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                           mode="bilinear", padding_mode="border",
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)

    g_ours = np.asarray(jax.grad(lambda g: jnp.sum(
        stencil_warp_2d(jnp.asarray(x), g, radius) ** 2))(jnp.asarray(grid)))
    gt = torch.from_numpy(grid).requires_grad_(True)
    (F.grid_sample(torch.from_numpy(x), gt, mode="bilinear",
                   padding_mode="border",
                   align_corners=True) ** 2).sum().backward()
    np.testing.assert_allclose(g_ours, gt.grad.numpy(), atol=1e-3)


def test_stencil_warp_2d_bf16_input_keeps_f32_coords(rng):
    """Coordinate/weight math must run in f32 even for bf16 images: bf16
    pixel coordinates err by up to ~h*2^-9 px, breaking the radius bound
    and dropping weight mass (advisor round-3).  The bf16 result must match
    the f32 result to bf16 output-rounding only (~4e-3 relative)."""
    from advchain_tpu.ops.grid_sample import stencil_warp_2d
    from advchain_tpu.ops.integrate import base_grid

    n, c, h, w = 1, 2, 192, 160
    x = _rand(rng, n, c, h, w)
    upx = (rng.rand(n, 2, h, w).astype(np.float32) * 2 - 1) * 0.9
    scale = np.asarray([2.0 / (w - 1), 2.0 / (h - 1)],
                       np.float32).reshape(1, 2, 1, 1)
    grid = np.moveaxis(np.asarray(base_grid(n, (h, w))) + upx * scale, 1, -1)

    f32 = np.asarray(stencil_warp_2d(jnp.asarray(x), jnp.asarray(grid), 1))
    out_bf16 = stencil_warp_2d(jnp.asarray(x, jnp.bfloat16),
                               jnp.asarray(grid), 1)
    assert out_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_bf16, np.float32), f32,
                               atol=2e-2)


def test_stencil_warp_3d_matches_torch(rng):
    """3D analogue: trilinear border warp for sub-voxel displacements."""
    from advchain_tpu.ops.grid_sample import stencil_warp_3d
    from advchain_tpu.ops.integrate import base_grid

    n, c, d, h, w = 2, 2, 6, 13, 17
    x = _rand(rng, n, c, d, h, w)
    upx = (rng.rand(n, 3, d, h, w).astype(np.float32) * 2 - 1) * 0.97
    scale = np.asarray([2.0 / (w - 1), 2.0 / (h - 1), 2.0 / (d - 1)],
                       np.float32).reshape(1, 3, 1, 1, 1)
    flow = np.asarray(base_grid(n, (d, h, w))) + upx * scale
    grid = np.moveaxis(flow, 1, -1)

    ours = np.asarray(stencil_warp_3d(jnp.asarray(x), jnp.asarray(grid), 1))
    theirs = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                           mode="bilinear", padding_mode="border",
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_compose_flow_stencil_dispatch_equivalence(rng, monkeypatch):
    """compose_flow's lax.cond dispatch is a pure perf fork: pinned-off
    (ADVCHAIN_STENCIL=0) and default paths agree to f32-compounding noise
    through a full 8-step scaling-and-squaring exponentiation."""
    from advchain_tpu.ops import integrate

    duv2 = jnp.asarray(0.08 * rng.randn(2, 2, 21, 23).astype(np.float32))
    duv3 = jnp.asarray(0.05 * rng.randn(2, 3, 6, 13, 17).astype(np.float32))
    on2 = integrate.exponentiate_flow(duv2, nb_steps=8, method="ss")
    on3 = integrate.exponentiate_flow(duv3, nb_steps=8, method="ss",
                                      adaptive=True)
    monkeypatch.setenv("ADVCHAIN_STENCIL", "0")
    off2 = integrate.exponentiate_flow(duv2, nb_steps=8, method="ss")
    off3 = integrate.exponentiate_flow(duv3, nb_steps=8, method="ss",
                                       adaptive=True)
    assert float(jnp.max(jnp.abs(on2 - off2))) < 1e-4
    assert float(jnp.max(jnp.abs(on3 - off3))) < 1e-4


def test_ss_radius_ladder_equivalence(rng, monkeypatch):
    """The per-step stencil-radius ladder (default 2D: last steps at R=4,
    R=8) is a pure perf fork too: a displacement big enough that the old
    single R=2 tier pushed the last steps onto the sampler path must give
    the same result through the wide stencil tiers, and an
    over-the-ladder displacement must still fall back cleanly."""
    from advchain_tpu.ops import integrate

    # |duv| ~ 6 px at 41x43: steps 6-7 exceed R=2 but fit the 4/8 ladder
    duv = jnp.asarray(0.30 * rng.rand(1, 2, 41, 43).astype(np.float32))
    with monkeypatch.context() as m:
        m.setenv("ADVCHAIN_SS_LADDER", "4,8")
        on = integrate.exponentiate_flow(duv, nb_steps=8, method="ss")
        big = integrate.exponentiate_flow(duv * 8, nb_steps=8, method="ss")
    with monkeypatch.context() as m:
        m.setenv("ADVCHAIN_STENCIL", "0")
        off = integrate.exponentiate_flow(duv, nb_steps=8, method="ss")
        big_off = integrate.exponentiate_flow(duv * 8, nb_steps=8,
                                              method="ss")
    assert float(jnp.max(jnp.abs(on - off))) < 1e-4
    assert float(jnp.max(jnp.abs(big - big_off))) < 1e-4


def test_grid_sample_grad_wrt_grid(rng):
    """The adversarial chain differentiates through the sampler w.r.t. the
    grid; check grads vs torch autograd."""
    import jax
    x = _rand(rng, 1, 1, 12, 12)
    grid = (rng.rand(1, 5, 5, 2).astype(np.float32) * 1.6 - 0.8)

    def f(g):
        return jnp.sum(ops.grid_sample_2d(jnp.asarray(x), g) ** 2)

    g_ours = np.asarray(jax.grad(f)(jnp.asarray(grid)))

    xt = torch.from_numpy(x)
    gt = torch.from_numpy(grid).requires_grad_(True)
    (F.grid_sample(xt, gt, align_corners=True) ** 2).sum().backward()
    np.testing.assert_allclose(g_ours, gt.grad.numpy(), atol=1e-3)


@pytest.mark.parametrize("align_corners", [True, False])
def test_affine_grid_2d(rng, align_corners):
    theta = _rand(rng, 4, 2, 3)
    ours = np.asarray(ops.affine_grid_2d(jnp.asarray(theta), (4, 1, 10, 14),
                                         align_corners=align_corners))
    theirs = F.affine_grid(torch.from_numpy(theta), (4, 1, 10, 14),
                           align_corners=align_corners).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_affine_grid_3d(rng):
    theta = _rand(rng, 2, 3, 4)
    ours = np.asarray(ops.affine_grid_3d(jnp.asarray(theta), (2, 1, 5, 6, 7)))
    theirs = F.affine_grid(torch.from_numpy(theta), (2, 1, 5, 6, 7),
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_invert_affine_matrix(rng):
    theta = _rand(rng, 3, 2, 3) * 0.2 + np.array(
        [[1, 0, 0], [0, 1, 0]], np.float32)
    inv = np.asarray(ops.invert_affine_matrix(jnp.asarray(theta)))
    for i in range(3):
        m = np.eye(3, dtype=np.float32)
        m[:2] = theta[i]
        mi = np.linalg.inv(m)[:2]
        np.testing.assert_allclose(inv[i], mi, atol=1e-4)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(7, 9), (20, 28), (13, 5)])
def test_interpolate_2d(rng, align_corners, size):
    x = _rand(rng, 2, 3, 10, 14)
    ours = np.asarray(ops.interpolate(jnp.asarray(x), size=size,
                                      mode="bilinear",
                                      align_corners=align_corners))
    theirs = F.interpolate(torch.from_numpy(x), size=size, mode="bilinear",
                           align_corners=align_corners).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_interpolate_3d(rng):
    x = _rand(rng, 1, 2, 6, 8, 5)
    ours = np.asarray(ops.interpolate(jnp.asarray(x), size=(12, 16, 10),
                                      mode="trilinear", align_corners=False))
    theirs = F.interpolate(torch.from_numpy(x), size=(12, 16, 10),
                           mode="trilinear", align_corners=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_interpolate_nearest(rng):
    x = _rand(rng, 2, 1, 8, 6)
    ours = np.asarray(ops.interpolate(jnp.asarray(x), size=(16, 15),
                                      mode="nearest"))
    theirs = F.interpolate(torch.from_numpy(x), size=(16, 15),
                           mode="nearest").numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


@pytest.mark.parametrize("stride,padding,k", [(3, 2, 5), ((4, 2), (3, 1), 6)])
def test_conv_transpose_2d(rng, stride, padding, k):
    x = _rand(rng, 2, 1, 6, 7)
    w = _rand(rng, 1, 1, k, k)
    ours = np.asarray(ops.conv_transpose(jnp.asarray(x), jnp.asarray(w),
                                         stride=stride, padding=padding))
    theirs = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                stride=stride, padding=padding).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_conv_transpose_3d(rng):
    x = _rand(rng, 1, 1, 4, 5, 6)
    w = _rand(rng, 1, 1, 5, 5, 5)
    ours = np.asarray(ops.conv_transpose(jnp.asarray(x), jnp.asarray(w),
                                         stride=4, padding=2))
    theirs = F.conv_transpose3d(torch.from_numpy(x), torch.from_numpy(w),
                                stride=4, padding=2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_gaussian_smooth_2d_matches_reference_dense_kernel(rng):
    """Reference builds a dense k x k kernel (adv_morph.py:391-452); check the
    separable implementation equals torch depthwise conv with that kernel."""
    sigma, ks = 1.0, 5
    eff = 2 * int(4 * sigma + 0.5) + 1  # reference growth rule -> 9
    xs = torch.arange(eff).float()
    xg = xs.repeat(eff).view(eff, eff)
    yg = xg.t()
    grid = torch.stack([xg, yg], dim=-1)
    mean = (eff - 1) / 2.0
    kern = torch.exp(-((grid - mean) ** 2).sum(-1) / (2 * sigma ** 2))
    kern = kern / kern.sum()
    x = torch.from_numpy(_rand(rng, 2, 2, 16, 16))
    theirs = F.conv2d(x, kern.view(1, 1, eff, eff).repeat(2, 1, 1, 1),
                      padding=eff // 2, groups=2).numpy()
    ours = np.asarray(ops.gaussian_smooth(jnp.asarray(x.numpy()),
                                          sigma=sigma, kernel_size=ks))
    np.testing.assert_allclose(ours, theirs, atol=TOL)


def test_bspline_kernel_2d_parity():
    """vs the reference's iterative F.conv2d construction."""
    for spacing, order in [((4, 4), 3), ((8, 6), 3), ((3, 3), 2)]:
        kernel_ones = torch.ones(1, 1, *spacing)
        kernel = kernel_ones
        pad = np.array(spacing)
        for i in range(1, order + 1):
            kernel = F.conv2d(kernel, kernel_ones,
                              padding=(i * pad).tolist()) / (spacing[0] * spacing[1])
        theirs = kernel[0, 0].numpy()
        ours = ops.bspline_kernel(spacing, order=order, spatial_dims=2)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bspline_kernel_3d_parity():
    spacing, order = (4, 4, 4), 2
    kernel_ones = torch.ones(1, 1, *spacing)
    kernel = kernel_ones
    pad = np.array(spacing) - 1
    for i in range(1, order + 1):
        kernel = F.conv3d(kernel, kernel_ones, padding=pad.tolist()) / \
            (spacing[0] * spacing[1] * spacing[2])
    theirs = kernel[0, 0].numpy()
    ours = ops.bspline_kernel(spacing, order=order, spatial_dims=3)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_unit_normalize(rng):
    d = _rand(rng, 4, 2, 5, 5)
    ours = np.asarray(ops.unit_normalize(jnp.asarray(d), "l2"))
    flat = d.reshape(4, -1)
    theirs = (flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-20)
              ).reshape(d.shape)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # l2 norm of each row is 1
    assert np.allclose(np.linalg.norm(ours.reshape(4, -1), axis=1), 1.0,
                       atol=1e-5)


def test_renorm_l2(rng):
    p = _rand(rng, 4, 3, 3) * 5
    out = np.asarray(ops.renorm_l2(jnp.asarray(p), 0.3))
    theirs = torch.from_numpy(p).renorm(p=2, dim=0, maxnorm=0.3).numpy()
    np.testing.assert_allclose(out, theirs, atol=1e-5)


def test_base_grid_matches_reference(rng):
    """Check 2D base grid vs the reference meshgrid construction."""
    h, w = 7, 9
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    ours = np.asarray(ops.base_grid(2, (h, w)))
    np.testing.assert_allclose(ours[0, 0], xs, atol=1e-6)  # x varies along W
    np.testing.assert_allclose(ours[0, 1], ys, atol=1e-6)
