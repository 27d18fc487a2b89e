"""Benchmarks vs the PyTorch reference (BASELINE.md configs #1-#5).

Default run (the driver contract) prints ONE JSON line for the headline
metric (config #2): adversarial chain training episode throughput —
192x192 images, 4-transform chain (noise -> bias -> affine -> morph),
1-step PGD maximizing ['mse','contour'] consistency against the trained
UNet_16 checkpoint, i.e. one full ``adversarial_training`` call.

``python bench.py --full`` additionally measures configs #1 (random-chain
augmentation throughput), #3 (anatomy-constrained solve), #4 (3D volumes),
and #5 (fused adversarial train step, batch 128) and writes one JSON line
per config to BENCH_full.json.

Timing methodology:
* ``jax.block_until_ready`` is a NO-OP under the tunneled TPU runtime; the
  only honest sync is a device->host transfer (``float(...)``) — every
  measured section ends with one.
* The torch-CPU baseline (the reference's only runnable target; it
  publishes no numbers — BASELINE.md) is RECORDED below with methodology,
  not re-measured per run: a shared-host CPU measurement is the noisiest
  part of the pipeline and the recorded value is the per-rep MAX (most
  favorable to the reference).  Re-measure with
  ADVCHAIN_BENCH_MEASURE_TORCH=1.
* The TPU number is the MEDIAN of 7 reps after 2 warm reps; the persistent
  compilation cache (.jax_cache) makes the compile cost a one-time event.
* Batch sweep (2026-08-19, f32): 16 -> 36.7, 32 -> 41.8, 64 -> 43.3,
  128 -> 45.5 img/s; bfloat16 compute adds only ~1% (the episode is
  sampler-bound, not matmul-bound), so the headline stays f32 (full
  reference parity).  BATCH=128 is the recorded operating point.
* Morph remat policy 'auto' (keep scaling-and-squaring intermediates
  resident below the ~1 GiB HBM bar) lifted the headline 45.5 -> 51.1
  img/s and 3D 0.211 -> 0.247 vol/s (2026-08-19).
* Blocked (16x32) output-tile ordering for affine warps (rotations
  degenerate the row-major tile's source band; kernels/gather_matmul.py)
  lifted the headline to 58.5 img/s steady-state (2026-08-19; an
  in-session peak of 69.3 never reproduced under the cold-process
  protocol and is retired).
* Channel-packed streamed 3D sampler (share the one-hot compare across
  channels; kernels/gather_matmul.py) lifted the 3D episode
  0.247 -> 1.132 vol/s (2026-08-20).
* Round 5: transposed (Wp, PT) one-hot (natural MXU operand layouts in
  every gather kernel) + the demons/morph closed-form final composition
  lifted the headline 180 -> 208.4 img/s; the experimental R=4/R=8
  scaling-and-squaring stencil ladder measured 158 img/s and is now
  default-OFF (ADVCHAIN_SS_LADDER keeps it reproducible) (2026-08-21).
"""

import json
import os
import sys
import time
import types

import numpy as np

BATCH = 128
SHAPE = (192, 192)
N_ITER = 1
WARM_REPS = 2
REPS = 7

# torch-CPU reference throughput (img/s) for the SAME workload (config #2,
# batch 4 — CPU-friendly; throughput normalized per image), measured on
# this container 2026-08-19 with torch.set_num_threads(os.cpu_count()),
# per-rep MAX of 3 reps after 1 warmup.  Prior driver-session measurement
# was 0.704 img/s; the HIGHER (reference-favorable) number is recorded.
# Re-measure with ADVCHAIN_BENCH_MEASURE_TORCH=1.
RECORDED_TORCH_CPU_IMGS_PER_SEC = 0.996

# torch-CPU reference numbers for the remaining BASELINE.md configs,
# measured 2026-08-19 via ``python bench.py --measure-torch`` (same
# favorable-to-reference protocol: per-rep MAX throughput / MIN latency).
# Config #3 is per-solve at batch 1 — the reference's "lowest" padding
# crashes for batch > 1 (adv_affine.py:301-302: the (N,1) per-sample min
# only broadcasts against (H,W) at N=1; the prostate notebook runs batch 1)
# — while the TPU number is batch 4, so the honest per-image comparison
# divides ours by 4.  Config #5 (fused train step) has no reference
# analogue: the reference ships no training loop (SURVEY.md §4).
RECORDED_TORCH_RANDOM_CHAIN_IMGS_PER_SEC = 15.137
RECORDED_TORCH_CONSTRAINED_SOLVE_SECONDS = 3.75  # batch 1, 3-step
RECORDED_TORCH_3D_VOLUMES_PER_SEC = 0.0347
# Config #5: reference-style FULL training iteration on torch-CPU
# (adversarial_training + supervised cross_entropy_2D + Adam step — the
# README.md:177-214 recipe; the reference ships no train loop of its own,
# SURVEY.md §4) at CPU-friendly batch 4, normalized per image.  Measured
# 2026-08-20 via ``python bench.py --measure-torch`` (per-rep MAX of 3).
RECORDED_TORCH_TRAIN_STEP_IMGS_PER_SEC = 0.5214

CKPT = "/root/reference/example/saved_checkpoints/cardiac_seg_unet_16.pth"

# v5e per-chip peaks for roofline/MFU accounting
V5E_PEAK_BF16_FLOPS = 197e12  # MXU peak (f32 inputs run as bf16 passes)
V5E_PEAK_HBM_GBPS = 819.0


def _cost_analysis(jitted, *args):
    """(flops, bytes_accessed) for ONE dispatch of ``jitted`` via XLA's
    HLO cost analysis (AOT: lower -> compile -> cost_analysis; the compile
    hits the persistent cache).

    Accounting note: Pallas custom calls report their HBM operand/result
    buffer sizes but ZERO interior flops — so ``flops`` is a lower bound
    on sampler-heavy programs (it counts the convs/matmuls/elementwise XLA
    sees) while ``bytes`` tracks true HBM traffic closely (the kernels
    stream each buffer ~once; re-reads inside band windows add slack the
    analysis cannot see, so bytes is a mild lower bound too)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0) or 0.0), \
            float(cost.get("bytes accessed", 0.0) or 0.0)
    except Exception as e:  # cost analysis must never kill the bench
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)
        return None, None


def _attach_roofline(line, flops, nbytes, seconds_per_call):
    """Add machine-readable roofline fields to a bench JSON line."""
    if flops is None or not seconds_per_call:
        return line
    gbps = nbytes / seconds_per_call / 1e9
    line["flops_per_call"] = flops
    line["bytes_per_call"] = nbytes
    line["achieved_gbps"] = round(gbps, 1)
    line["achieved_tflops"] = round(flops / seconds_per_call / 1e12, 2)
    line["mfu_pct"] = round(
        100.0 * flops / seconds_per_call / V5E_PEAK_BF16_FLOPS, 2)
    line["hbm_util_pct"] = round(100.0 * gbps / V5E_PEAK_HBM_GBPS, 1)
    return line


def make_image(batch, shape):
    ii, jj = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                         indexing="ij")
    img = (np.exp(-(((ii - 96) / 30.0) ** 2 + ((jj - 96) / 24.0) ** 2))
           + 0.3 * np.exp(-(((ii - 60) / 15.0) ** 2
                            + ((jj - 120) / 12.0) ** 2)))
    r = np.random.RandomState(0)
    x = np.broadcast_to(img, (batch, 1) + shape).copy()
    return (x + 0.05 * r.rand(batch, 1, *shape)).astype(np.float32)


def make_volume(batch, shape3d):
    d, h, w = shape3d
    ii, jj, kk = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    img = np.exp(-(((ii - d / 2) / (d / 3)) ** 2
                   + ((jj - h / 2) / (h / 4)) ** 2
                   + ((kk - w / 2) / (w / 4)) ** 2))
    r = np.random.RandomState(0)
    x = np.broadcast_to(img, (batch, 1) + shape3d).copy()
    return (x + 0.05 * r.rand(batch, 1, *shape3d)).astype(np.float32)


def chain_configs(batch, shape):
    size = [batch, 1, *shape]
    return {
        "noise": {"epsilon": 1.0, "xi": 1e-6, "data_size": size},
        "bias": {"epsilon": 0.3, "control_point_spacing": [48, 48],
                 "downscale": 2, "data_size": size,
                 "interpolation_order": 3, "init_mode": "random",
                 "space": "log"},
        "affine": {"rot": 30.0 / 180.0, "scale_x": 0.2, "scale_y": 0.2,
                   "shift_x": 0.1, "shift_y": 0.1, "data_size": size},
        "morph": {"epsilon": 1.5, "data_size": size,
                  "vector_size": [shape[0] // 16, shape[1] // 16]},
    }


def _setup_jax():
    import jax
    try:  # persistent compilation cache: the driver's bench run reuses it
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return jax


def _build_chain(cfg):
    from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph,
                                        AdvNoise)
    return [
        AdvNoise(config_dict=cfg["noise"]),
        AdvBias(config_dict=cfg["bias"]),
        AdvAffine(config_dict=cfg["affine"]),
        AdvMorph(config_dict=cfg["morph"]),
    ]


def _median_throughput(once, units):
    """2 warm reps then median-of-REPS throughput; once() must end with a
    device->host transfer."""
    for _ in range(WARM_REPS):
        once()
    vals = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        once()
        vals.append(units / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2]


# ------------------------------------------------------------- config #2
def bench_headline(batch=BATCH, with_roofline=False, compute_dtype=None):
    _setup_jax()
    import jax.numpy as jnp
    from advchain_tpu.augmentor import ComposeAdversarialTransformSolver
    from advchain_tpu.models import get_unet_model

    cfg = chain_configs(batch, SHAPE)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_build_chain(cfg),
        divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5])
    model = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16",
                           compute_dtype=compute_dtype)
    data = jnp.asarray(make_image(batch, SHAPE))

    def once():
        d = solver.adversarial_training(
            data=data, model=model, n_iter=N_ITER,
            power_iteration="smart", step_sizes=1.0)
        return float(d)  # honest sync: device->host scalar

    v = _median_throughput(once, batch)
    if not with_roofline:
        return v
    # cost-analyze the fused episode program (the ONLY dispatch per call)
    solver._apply_power_iteration_setting("smart")
    flags = solver._normalize_flags(None, N_ITER)
    steps = solver._normalize_step_sizes(1.0)
    ntf = len(solver.chain_of_transforms)
    ep = solver._get_episode_fn(model, flags, steps, N_ITER,
                                (False,) * ntf, data.shape)
    flops, nbytes = _cost_analysis(ep, 1, data, (None,) * ntf, None,
                                   solver._model_variables(model))
    return v, flops, nbytes


# ------------------------------------------------------------- config #1
def bench_random_chain(batch=BATCH, episodes_per_dispatch=4):
    """Random-init chain applied to a batch: fused (init + 4-transform
    forward) device programs.

    ``episodes_per_dispatch`` chains K independent episodes (fresh param
    draws each) into ONE dispatch — the per-call host->device dispatch
    through the tunnel left the device only ~68% busy at K=1 (round-4
    trace), which is exactly how a production input pipeline would run
    (augment several batches per launch).  All K outputs are returned
    device-resident, so XLA must compute every episode."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from advchain_tpu.augmentor import ComposeAdversarialTransformSolver

    cfg = chain_configs(batch, SHAPE)
    chain = _build_chain(cfg)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    transforms = tuple(chain)
    init_all = solver._get_init_all_fn()
    k_eps = int(episodes_per_dispatch)

    @jax.jit
    def episodes(seed, data):
        eval_flags = (False,) * len(transforms)
        base = jax.random.PRNGKey(seed)
        outs = []
        for e in range(k_eps):
            params = init_all(jax.random.fold_in(base, e))
            outs.append(solver._chain_apply_pure(transforms, params, data,
                                                 eval_flags))
        return jnp.stack(outs)

    data = jnp.asarray(make_image(batch, SHAPE))
    counter = iter(range(10 ** 9))

    def once():
        out = episodes(next(counter), data)
        return float(out.ravel()[0])

    v = _median_throughput(once, batch * k_eps)
    flops, nbytes = _cost_analysis(episodes, next(counter), data)
    if flops is not None:
        flops, nbytes = flops / k_eps, nbytes / k_eps  # per-episode
    return v, flops, nbytes


# ------------------------------------------------------------- config #3
def bench_constrained_solve(batch=4, n_iter=3):
    """Prostate-style anatomy-preserving multi-step solve with the 'lowest'
    custom padding; reports median wall-clock per solve and the
    volume-preserve success rate."""
    _setup_jax()
    import jax.numpy as jnp
    from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph,
                                        AdvNoise,
                                        ComposeAdversarialTransformSolver)
    from advchain_tpu.models import get_unet_model

    cfg = chain_configs(batch, SHAPE)
    chain = [
        AdvNoise(config_dict=cfg["noise"]),
        AdvBias(config_dict=cfg["bias"]),
        AdvAffine(config_dict=cfg["affine"], image_padding_mode="lowest"),
        AdvMorph(config_dict=cfg["morph"], image_padding_mode="lowest"),
    ]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5])
    model = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16")
    data = jnp.asarray(make_image(batch, SHAPE))
    ii, jj = np.meshgrid(np.arange(SHAPE[0]), np.arange(SHAPE[1]),
                         indexing="ij")
    mask = ((((ii - 96) / 40.0) ** 2 + ((jj - 96) / 34.0) ** 2) < 1.0)
    anatomy = jnp.asarray(
        np.broadcast_to(mask, (batch, 1) + SHAPE).astype(np.float32))

    tol = 5e-4
    times, successes = [], 0
    n_solves = 5

    def solve():
        # adversarial_training draws a fresh rejection-sampled init itself
        # (lazy_load=False) — the torch-reference baseline's solve is the
        # same single call, so no separate reset_transformation here
        d = solver.adversarial_training(
            data=data, model=model, n_iter=n_iter,
            anatomy_mask_images=anatomy, anatomy_reg_weight=50,
            volume_preserve_tolerance=tol, step_sizes=1.0)
        return float(d)

    solve()  # warm/compile
    for _ in range(n_solves):
        t0 = time.perf_counter()
        solve()
        times.append(time.perf_counter() - t0)
        mis = float(solver.compute_anatomy_misoverlapping_loss(anatomy))
        successes += mis <= tol
    times.sort()
    return times[len(times) // 2], successes / n_solves


# ------------------------------------------------------------- config #4
def bench_3d(batch=2, shape3d=(12, 192, 192)):
    """Cardiac 3D beta workload: trilinear affine+morph+3D bias chain and
    the reference's pseudo Conv3d model, 1-step PGD."""
    _setup_jax()
    import jax
    import jax.numpy as jnp
    from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph,
                                        AdvNoise,
                                        ComposeAdversarialTransformSolver)
    from advchain_tpu.models import PseudoConv3dModel, SegmentationModel

    size = [batch, 1, *shape3d]
    chain = [
        AdvNoise(spatial_dims=3,
                 config_dict={"epsilon": 1.0, "xi": 1e-6, "data_size": size}),
        AdvBias(spatial_dims=3,
                config_dict={"epsilon": 0.3,
                             "control_point_spacing":
                                 [max(s // 2, 2) for s in shape3d],
                             "downscale": 4, "data_size": size,
                             "interpolation_order": 3,
                             "init_mode": "random", "space": "log"}),
        AdvAffine(spatial_dims=3,
                  config_dict={"rot_x": 10.0 / 180, "rot_y": 10.0 / 180,
                               "rot_z": 10.0 / 180, "scale_x": 0.1,
                               "scale_y": 0.1, "scale_z": 0.1,
                               "shift_x": 0.1, "shift_y": 0.1,
                               "shift_z": 0.1, "data_size": size}),
        AdvMorph(spatial_dims=3,
                 config_dict={"epsilon": 1.5, "data_size": size,
                              "vector_size": [max(shape3d[0] // 2, 2),
                                              shape3d[1] // 16,
                                              shape3d[2] // 16]}),
    ]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    model = SegmentationModel.create(PseudoConv3dModel(num_classes=4),
                                     tuple(size),
                                     rng=jax.random.PRNGKey(0))
    data = jnp.asarray(make_volume(batch, shape3d))

    def once():
        d = solver.adversarial_training(data=data, model=model,
                                        n_iter=N_ITER, step_sizes=1.0)
        return float(d)

    v = _median_throughput(once, batch)
    flags = solver._normalize_flags(None, N_ITER)
    steps = solver._normalize_step_sizes(1.0)
    ntf = len(solver.chain_of_transforms)
    ep = solver._get_episode_fn(model, flags, steps, N_ITER,
                                (False,) * ntf, data.shape)
    flops, nbytes = _cost_analysis(ep, 1, data, (None,) * ntf, None,
                                   solver._model_variables(model))
    return v, flops, nbytes


# ------------------------------------------------------------- config #5
def bench_fused_train_step(batch=128, compute_dtype=None):
    """Full adversarial TRAINING step (PGD inner loop + supervised +
    consistency losses + grads + adam update) fused as one program."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import optax
    from advchain_tpu.augmentor import ComposeAdversarialTransformSolver
    from advchain_tpu.models import UNet, SegmentationModel
    from advchain_tpu.parallel import TrainState, make_adversarial_train_step

    cfg = chain_configs(batch, SHAPE)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_build_chain(cfg),
        divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5])
    model = SegmentationModel.create(UNet(num_classes=4, feature_scale=4),
                                     (batch, 1, *SHAPE),
                                     rng=jax.random.PRNGKey(0),
                                     compute_dtype=compute_dtype)
    opt = optax.adam(1e-4)
    step = make_adversarial_train_step(model, solver, opt, n_iter=N_ITER,
                                       power_iteration="smart",
                                       donate_state=False)
    state = TrainState.create(model, opt)
    r = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(make_image(batch, SHAPE)),
        "label": jnp.asarray(r.randint(0, 4, (batch,) + SHAPE)),
    }
    rng = jax.random.PRNGKey(1)
    holder = {"state": state}

    def once():
        s, metrics = step(holder["state"], batch_data, rng)
        holder["state"] = s
        return float(metrics["total_loss"])

    v = _median_throughput(once, batch)
    flops, nbytes = _cost_analysis(step, holder["state"], batch_data, rng)
    return v, flops, nbytes


# ------------------------------------------------------- torch baselines
def _import_torch_reference():
    if "SimpleITK" not in sys.modules:
        sys.modules["SimpleITK"] = types.ModuleType("SimpleITK")
    if not hasattr(np, "Inf"):
        np.Inf = np.inf  # reference uses np.Inf (removed in numpy 2.0)
    sys.path.insert(0, "/root/reference")


def bench_torch_reference():
    """Run the reference implementation itself on CPU (config #2 workload,
    batch 4; per-rep MAX throughput — most favorable to the reference)."""
    _import_torch_reference()
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        from advchain.augmentor.adv_affine import AdvAffine
        from advchain.augmentor.adv_bias import AdvBias
        from advchain.augmentor.adv_morph import AdvMorph
        from advchain.augmentor.adv_noise import AdvNoise
        from advchain.augmentor.adv_compose_solver import \
            ComposeAdversarialTransformSolver
        from advchain.models.unet import UNet

        b = 4  # CPU-friendly batch; normalize per-image
        cfg = chain_configs(b, SHAPE)
        dev = torch.device("cpu")
        chain = [
            AdvNoise(config_dict=cfg["noise"], use_gpu=False, device=dev),
            AdvBias(config_dict=cfg["bias"], use_gpu=False, device=dev),
            AdvAffine(config_dict=cfg["affine"], use_gpu=False, device=dev),
            AdvMorph(config_dict=cfg["morph"], use_gpu=False, device=dev),
        ]
        solver = ComposeAdversarialTransformSolver(
            chain_of_transforms=chain,
            divergence_types=["mse", "contour"],
            divergence_weights=[1.0, 0.5], use_gpu=False)
        model = UNet(input_channel=1, num_classes=4, feature_scale=4)
        model.load_state_dict(torch.load(CKPT, map_location="cpu"))
        model.to(dev)
        data = torch.from_numpy(make_image(b, SHAPE))

        def once():
            solver.adversarial_training(
                data=data, model=model, n_iter=N_ITER,
                power_iteration="smart", step_sizes=1.0)

        once()  # warm caches
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            best = max(best, b / (time.perf_counter() - t0))
        return best
    finally:
        sys.path.pop(0)


def _torch_chain(cfg, padding_mode=None):
    import torch
    from advchain.augmentor.adv_affine import AdvAffine
    from advchain.augmentor.adv_bias import AdvBias
    from advchain.augmentor.adv_morph import AdvMorph
    from advchain.augmentor.adv_noise import AdvNoise
    dev = torch.device("cpu")
    kw = {"use_gpu": False, "device": dev}
    geo_kw = dict(kw)
    if padding_mode is not None:
        geo_kw["image_padding_mode"] = padding_mode
    return [
        AdvNoise(config_dict=cfg["noise"], **kw),
        AdvBias(config_dict=cfg["bias"], **kw),
        AdvAffine(config_dict=cfg["affine"], **geo_kw),
        AdvMorph(config_dict=cfg["morph"], **geo_kw),
    ]


def bench_torch_random_chain(batch=4):
    """Reference random-init chain apply (config #1 workload; per-rep MAX
    img/s — most favorable to the reference)."""
    _import_torch_reference()
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        from advchain.augmentor.adv_compose_solver import \
            ComposeAdversarialTransformSolver
        solver = ComposeAdversarialTransformSolver(
            chain_of_transforms=_torch_chain(chain_configs(batch, SHAPE)),
            divergence_types=["mse"], divergence_weights=[1.0],
            use_gpu=False)
        data = torch.from_numpy(make_image(batch, SHAPE))

        def once():
            solver.init_random_transformation()
            solver.forward(data.clone())

        once()
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            best = max(best, batch / (time.perf_counter() - t0))
        return best
    finally:
        sys.path.pop(0)


def bench_torch_constrained(batch=1, n_iter=3):
    """Reference anatomy-preserving constrained solve (config #3 workload,
    'lowest' padding).  Returns MIN s/solve of 3 (favorable to the
    reference).  batch=1: the reference's 'lowest' padding crashes for
    batch > 1 (adv_affine.py:301-302 — the per-sample min is (N, 1) and
    broadcasts against (H, W); the prostate notebook runs batch 1), so the
    reference baseline is per-solve at its only working batch."""
    _import_torch_reference()
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        from advchain.augmentor.adv_compose_solver import \
            ComposeAdversarialTransformSolver
        from advchain.models.unet import UNet
        solver = ComposeAdversarialTransformSolver(
            chain_of_transforms=_torch_chain(chain_configs(batch, SHAPE),
                                             padding_mode="lowest"),
            divergence_types=["mse", "contour"],
            divergence_weights=[1.0, 0.5], use_gpu=False)
        model = UNet(input_channel=1, num_classes=4, feature_scale=4)
        model.load_state_dict(torch.load(CKPT, map_location="cpu"))
        data = torch.from_numpy(make_image(batch, SHAPE))
        ii, jj = np.meshgrid(np.arange(SHAPE[0]), np.arange(SHAPE[1]),
                             indexing="ij")
        m = ((((ii - 96) / 40.0) ** 2 + ((jj - 96) / 34.0) ** 2) < 1.0)
        anatomy = torch.from_numpy(
            np.broadcast_to(m, (batch, 1) + SHAPE).astype(np.float32).copy())

        def solve():
            solver.adversarial_training(
                data=data, model=model, n_iter=n_iter,
                anatomy_mask_images=anatomy, anatomy_reg_weight=50,
                volume_preserve_tolerance=5e-4, step_sizes=1.0)

        solve()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            solve()
            times.append(time.perf_counter() - t0)
        return min(times)
    finally:
        sys.path.pop(0)


def bench_torch_3d(batch=2, shape3d=(12, 192, 192)):
    """Reference 3D beta episode (config #4 workload) with the notebook's
    pseudo Conv3d model (cardiac notebook cell 26).  Per-rep MAX vol/s of
    2 reps (favorable to the reference; CPU 3D episodes are slow)."""
    _import_torch_reference()
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        from advchain.augmentor.adv_affine import AdvAffine
        from advchain.augmentor.adv_bias import AdvBias
        from advchain.augmentor.adv_morph import AdvMorph
        from advchain.augmentor.adv_noise import AdvNoise
        from advchain.augmentor.adv_compose_solver import \
            ComposeAdversarialTransformSolver
        from advchain.common.layers import Fixable3DDropout

        size = [batch, 1, *shape3d]
        dev = torch.device("cpu")
        kw = {"use_gpu": False, "device": dev}
        chain = [
            AdvNoise(spatial_dims=3,
                     config_dict={"epsilon": 1.0, "xi": 1e-6,
                                  "data_size": size}, **kw),
            AdvBias(spatial_dims=3,
                    config_dict={"epsilon": 0.3,
                                 "control_point_spacing":
                                     [max(s // 2, 2) for s in shape3d],
                                 "downscale": 4, "data_size": size,
                                 "interpolation_order": 3,
                                 "init_mode": "random", "space": "log"},
                    **kw),
            AdvAffine(spatial_dims=3,
                      config_dict={"rot_x": 10.0 / 180, "rot_y": 10.0 / 180,
                                   "rot_z": 10.0 / 180, "scale_x": 0.1,
                                   "scale_y": 0.1, "scale_z": 0.1,
                                   "shift_x": 0.1, "shift_y": 0.1,
                                   "shift_z": 0.1, "data_size": size}, **kw),
            AdvMorph(spatial_dims=3,
                     config_dict={"epsilon": 1.5, "data_size": size,
                                  "vector_size":
                                      [max(shape3d[0] // 2, 2),
                                       shape3d[1] // 16,
                                       shape3d[2] // 16]}, **kw),
        ]
        solver = ComposeAdversarialTransformSolver(
            chain_of_transforms=chain, divergence_types=["mse"],
            divergence_weights=[1.0], use_gpu=False)
        model = torch.nn.Sequential(
            torch.nn.Conv3d(1, 8, 3, padding=1),
            torch.nn.BatchNorm3d(8),
            torch.nn.ReLU(),
            Fixable3DDropout(p=0.1),
            torch.nn.Conv3d(8, 4, 3, padding=1),
        )
        data = torch.from_numpy(make_volume(batch, shape3d))

        def once():
            solver.adversarial_training(data=data, model=model,
                                        n_iter=N_ITER, step_sizes=1.0)

        once()
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            once()
            best = max(best, batch / (time.perf_counter() - t0))
        return best
    finally:
        sys.path.pop(0)


def bench_torch_train_step(batch=4):
    """Reference-style FULL training iteration on torch-CPU (config #5
    baseline): adversarial_training (4-transform chain, n_iter=1, 'smart'
    PI) + net.zero_grad + supervised cross_entropy_2D + total-loss
    backward + Adam step — the README.md:177-214 recipe with a fixed
    chain.  Per-rep MAX img/s of 3 reps (favorable to the reference)."""
    _import_torch_reference()
    try:
        import torch
        torch.set_num_threads(os.cpu_count() or 8)
        from advchain.augmentor.adv_compose_solver import \
            ComposeAdversarialTransformSolver
        from advchain.common.loss import cross_entropy_2D
        from advchain.models.unet import UNet

        cfg = chain_configs(batch, SHAPE)
        solver = ComposeAdversarialTransformSolver(
            chain_of_transforms=_torch_chain(cfg),
            divergence_types=["mse", "contour"],
            divergence_weights=[1.0, 0.5], use_gpu=False)
        model = UNet(input_channel=1, num_classes=4, feature_scale=4)
        model.load_state_dict(torch.load(CKPT, map_location="cpu"))
        opt = torch.optim.Adam(model.parameters(), lr=1e-4)
        data = torch.from_numpy(make_image(batch, SHAPE))
        r = np.random.RandomState(0)
        target = torch.from_numpy(
            r.randint(0, 4, (batch,) + SHAPE).astype(np.int64))

        def once():
            model.zero_grad()
            reg = solver.adversarial_training(
                data=data, model=model, n_iter=N_ITER,
                power_iteration="smart", step_sizes=1.0)
            model.zero_grad()
            output = model(data)
            loss = cross_entropy_2D(output, target)
            total = loss + 1.0 * reg
            total.backward()
            opt.step()

        once()  # warm caches
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            once()
            best = max(best, batch / (time.perf_counter() - t0))
        return best
    finally:
        sys.path.pop(0)


def run_tpu_tests():
    """Run the on-device kernel-parity suite (ADVCHAIN_TEST_TPU=1) and
    record the result as TPU_TESTS.json — a per-round artifact so the one
    suite that can catch device-only regressions (MXU bf16 rounding,
    Mosaic layout changes) leaves evidence (round-3 verdict item 5)."""
    import re
    import subprocess
    env = dict(os.environ, ADVCHAIN_TEST_TPU="1")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_tpu_parity.py",
         "-q", "--no-header"],
        cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
        capture_output=True, text=True, timeout=3600)
    seconds = time.perf_counter() - t0
    tail = (proc.stdout or "").strip().splitlines()[-10:]
    summary = "\n".join(tail)
    passed = failed = skipped = 0
    for n, word in re.findall(r"(\d+) (passed|failed|skipped|error)",
                              summary):
        if word == "passed":
            passed = int(n)
        elif word in ("failed", "error"):
            failed += int(n)
        elif word == "skipped":
            skipped = int(n)
    result = {"passed": passed, "failed": failed, "skipped": skipped,
              "seconds": round(seconds, 1), "returncode": proc.returncode,
              "summary_tail": tail[-1] if tail else ""}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "TPU_TESTS.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return proc.returncode


def _headline_json():
    imgs_per_sec, flops, nbytes = bench_headline(with_roofline=True)
    baseline = RECORDED_TORCH_CPU_IMGS_PER_SEC
    if os.environ.get("ADVCHAIN_BENCH_MEASURE_TORCH") == "1" \
            or baseline is None:
        try:
            baseline = bench_torch_reference()
        except Exception as e:  # baseline failure must not kill the bench
            print(f"# torch reference baseline failed: {e}", file=sys.stderr)
            baseline = None
    vs = (imgs_per_sec / baseline) if baseline else float("nan")
    line = {
        "metric": "adv_chain_train_images_per_sec_192px_4tf_pgd1",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }
    return _attach_roofline(line, flops, nbytes, BATCH / imgs_per_sec)


def main():
    if "--tpu-tests" in sys.argv:
        sys.exit(run_tpu_tests())
    if "--measure-torch" in sys.argv:
        # one-time torch-CPU reference measurements (recorded as constants;
        # see the docstring for methodology)
        print(json.dumps({"torch_random_chain_imgs_per_sec":
                          round(bench_torch_random_chain(), 3)}))
        print(json.dumps({"torch_constrained_solve_seconds":
                          round(bench_torch_constrained(), 2)}))
        print(json.dumps({"torch_3d_volumes_per_sec":
                          round(bench_torch_3d(), 4)}))
        print(json.dumps({"torch_train_step_imgs_per_sec":
                          round(bench_torch_train_step(), 4)}))
        return
    headline = _headline_json()
    print(json.dumps(headline))
    if "--full" not in sys.argv:
        return
    lines = [headline]
    v1, f1, b1 = bench_random_chain()
    lines.append(_attach_roofline(
        {"metric": "random_chain_images_per_sec_192px_4tf",
         "value": round(v1, 2), "unit": "images/sec/chip",
         "vs_baseline":
             round(v1 / RECORDED_TORCH_RANDOM_CHAIN_IMGS_PER_SEC, 2)},
        f1, b1, BATCH / v1))
    t3, sr3 = bench_constrained_solve()
    # reference solves 1 image in RECORDED..._SECONDS; we solve 4 per call —
    # compare per-image solve latency.  (No roofline line: a constrained
    # solve is several programs + host retry control flow, not one
    # dispatch.)
    lines.append({"metric": "anatomy_constrained_solve_seconds",
                  "value": round(t3, 3), "unit": "s/solve (batch 4, 3-step)",
                  "vs_baseline":
                      round(RECORDED_TORCH_CONSTRAINED_SOLVE_SECONDS
                            / (t3 / 4), 2),
                  "success_rate": sr3})
    v4, f4, b4 = bench_3d()
    lines.append(_attach_roofline(
        {"metric": "adv_chain_3d_volumes_per_sec_12x192x192",
         "value": round(v4, 3), "unit": "volumes/sec/chip",
         "vs_baseline": round(v4 / RECORDED_TORCH_3D_VOLUMES_PER_SEC, 2)},
        f4, b4, 2 / v4))
    v5, f5, b5 = bench_fused_train_step()
    # baseline: reference-style full train iteration on torch-CPU
    # (bench_torch_train_step; the reference ships no train loop, so the
    # README recipe is the reference-side equivalent)
    lines.append(_attach_roofline(
        {"metric": "fused_adv_train_step_images_per_sec_b128",
         "value": round(v5, 2), "unit": "images/sec/chip",
         "vs_baseline":
             round(v5 / RECORDED_TORCH_TRAIN_STEP_IMGS_PER_SEC, 2)},
        f5, b5, BATCH / v5))
    # bf16 speed mode (network compute in bfloat16, chain stays f32;
    # episode-level quality bound: tests/test_models.py::
    # test_bf16_episode_quality_bound — dist within ~5%, adv_data
    # bulk-close).  vs_baseline compares against the same torch-CPU f32
    # reference as the f32 rows.
    import jax.numpy as _jnp
    v2b = bench_headline(compute_dtype=_jnp.bfloat16)
    lines.append({"metric": "adv_chain_train_images_per_sec_192px_bf16",
                  "value": round(v2b, 2), "unit": "images/sec/chip",
                  "vs_baseline":
                      round(v2b / RECORDED_TORCH_CPU_IMGS_PER_SEC, 2)})
    v5b, _, _ = bench_fused_train_step(compute_dtype=_jnp.bfloat16)
    lines.append({"metric": "fused_adv_train_step_images_per_sec_b128_bf16",
                  "value": round(v5b, 2), "unit": "images/sec/chip",
                  "vs_baseline":
                      round(v5b / RECORDED_TORCH_TRAIN_STEP_IMGS_PER_SEC,
                            2)})
    with open("/root/repo/BENCH_full.json", "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    for line in lines[1:]:
        print(json.dumps(line))


if __name__ == "__main__":
    main()
