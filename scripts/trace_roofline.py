"""On-device roofline validation via jax.profiler device traces.

bench.py's roofline fields (`achieved_gbps`, `hbm_util_pct`) divide XLA's
HLO-estimated bytes by WALL time per call — an estimate over a denominator
that includes host/dispatch/tunnel gaps, with a documented accounting
caveat (PARITY.md): the lax.cond stencil dispatch counts both branches and
Pallas custom calls report only operand bytes.  This script validates
those numbers with a measured device trace (the axon tunnel forwards TPU
device events):

* per-HLO-op MEASURED device time (`device_duration_ps` hardware event),
* per-op `bytes_accessed` as the on-device compiler accounts them for the
  ops that actually EXECUTED (so only the taken cond branch is counted),
* device busy time per call = union of device-event intervals, separating
  true kernel time from dispatch/tunnel gaps.

Outputs per config: measured_gbps (= executed bytes / device busy time),
busy vs wall time, and the top ops by measured time with each one's
sustained GB/s — the attribution tool for bandwidth-gap analysis.

Usage:
  python scripts/trace_roofline.py [headline] [3d] [random_chain] [--update]

Writes TRACE_ROOFLINE.json at the repo root; --update also copies
measured_gbps / device_busy_ms / measured_hbm_util_pct onto the matching
BENCH_full.json lines.
"""

import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT,
                                                            ".jax_cache"))

from bench import (BATCH, SHAPE, CKPT, N_ITER, V5E_PEAK_HBM_GBPS,
                   chain_configs, make_image, make_volume, _build_chain)

TRACE_CALLS = 3


# ------------------------------------------------------- config builders
def build_headline():
    from advchain_tpu.augmentor import ComposeAdversarialTransformSolver
    from advchain_tpu.models import get_unet_model

    cfg = chain_configs(BATCH, SHAPE)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_build_chain(cfg),
        divergence_types=["mse", "contour"], divergence_weights=[1.0, 0.5])
    model = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16")
    data = jnp.asarray(make_image(BATCH, SHAPE))

    def once():
        d = solver.adversarial_training(
            data=data, model=model, n_iter=N_ITER,
            power_iteration="smart", step_sizes=1.0)
        return float(d)

    return once, "adv_chain_train_images_per_sec_192px_4tf_pgd1"


def build_3d(batch=2, shape3d=(12, 192, 192)):
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
                                     tuple(size), rng=jax.random.PRNGKey(0))
    data = jnp.asarray(make_volume(batch, shape3d))

    def once():
        d = solver.adversarial_training(data=data, model=model,
                                        n_iter=N_ITER, step_sizes=1.0)
        return float(d)

    return once, "adv_chain_3d_volumes_per_sec_12x192x192"


def build_random_chain():
    from advchain_tpu.augmentor import ComposeAdversarialTransformSolver

    cfg = chain_configs(BATCH, SHAPE)
    chain = _build_chain(cfg)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0])
    transforms = tuple(chain)
    init_all = solver._get_init_all_fn()

    @jax.jit
    def episode(seed, data):
        params = init_all(jax.random.PRNGKey(seed))
        eval_flags = (False,) * len(transforms)
        return solver._chain_apply_pure(transforms, params, data,
                                        eval_flags)

    data = jnp.asarray(make_image(BATCH, SHAPE))
    counter = iter(range(10 ** 9))

    def once():
        return float(episode(next(counter), data).ravel()[0])

    return once, "random_chain_images_per_sec_192px_4tf"


def build_train_step():
    """Config #5: the fully-fused adversarial train step (VERDICT r4 weak
    #6 — previously estimate-only in BENCH_full)."""
    import numpy as np
    import optax
    from advchain_tpu.augmentor import ComposeAdversarialTransformSolver
    from advchain_tpu.models import UNet, SegmentationModel
    from advchain_tpu.parallel import TrainState, make_adversarial_train_step

    cfg = chain_configs(BATCH, SHAPE)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=_build_chain(cfg),
        divergence_types=["mse", "contour"], divergence_weights=[1.0, 0.5])
    model = SegmentationModel.create(UNet(num_classes=4, feature_scale=4),
                                     (BATCH, 1, *SHAPE),
                                     rng=jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    step = make_adversarial_train_step(model, solver, opt, n_iter=N_ITER,
                                       power_iteration="smart",
                                       donate_state=False)
    state = TrainState.create(model, opt)
    r = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(make_image(BATCH, SHAPE)),
        "label": jnp.asarray(r.randint(0, 4, (BATCH,) + SHAPE)),
    }
    rng = jax.random.PRNGKey(1)
    holder = {"state": state}

    def once():
        s, metrics = step(holder["state"], batch_data, rng)
        holder["state"] = s
        return float(metrics["total_loss"])

    return once, "fused_adv_train_step_images_per_sec_b128"


BUILDERS = {"headline": build_headline, "3d": build_3d,
            "random_chain": build_random_chain,
            "train_step": build_train_step}


# ------------------------------------------------------------ trace math
def capture(once, calls=TRACE_CALLS):
    """Warm, then trace ``calls`` invocations; returns (trace_dict, wall_s
    per call)."""
    once()
    once()
    tmp = tempfile.mkdtemp(prefix="advchain_trace_")
    try:
        jax.profiler.start_trace(tmp)
        t0 = time.perf_counter()
        for _ in range(calls):
            once()
        wall = (time.perf_counter() - t0) / calls
        jax.profiler.stop_trace()
        paths = glob.glob(os.path.join(tmp, "plugins/profile/*/"
                                       "*.trace.json.gz"))
        assert paths, f"no trace written under {tmp}"
        with gzip.open(paths[0]) as f:
            return json.load(f), wall
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def device_events(trace):
    """Complete events on the TPU device pid(s)."""
    dev_pids = {e["pid"] for e in trace["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    return [e for e in trace["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in dev_pids
            and "device_duration_ps" in e.get("args", {})]


_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "c64": 8, "f32": 4, "s32": 4,
                "u32": 4, "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1,
                "u8": 1, "pred": 1}
_SHAPE_RE = None


def _long_name_bytes(long_name):
    """Sum operand+result buffer sizes parsed from an HLO long_name —
    exactly the accounting HLO cost analysis applies to custom calls,
    whose trace events report bytes_accessed=0 (the profiler cannot see
    inside a Pallas kernel; operands+result is the canonical lower
    bound)."""
    global _SHAPE_RE
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(
            r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")
    total = 0
    for dt, dims in _SHAPE_RE.findall(long_name):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _is_program_wrapper(e):
    """Outer per-dispatch event spanning the whole module (named jit_*,
    category '?'): excluded from op-active union and byte sums."""
    return e["args"].get("hlo_category", "?") == "?"


def _event_bytes(e):
    b = int(e["args"].get("bytes_accessed", 0))
    if b == 0 and e["args"].get("hlo_category") == "custom-call":
        return _long_name_bytes(e["args"].get("long_name", ""))
    return b


def leaf_only(events):
    """Drop events that contain other events (per tid): a `conditional`
    parent's bytes_accessed counts BOTH branches (HloCostAnalysis
    semantics), while its nested children — which tile ~100% of its span —
    carry the bytes of the branch that actually EXECUTED.  Summing parents
    and children would double count; leaves alone are the executed-only
    accounting.  Also drops `*-start` halves of DMA pairs (same bytes
    re-reported on `*-done`)."""
    out = []
    by_tid = {}
    for e in events:
        by_tid.setdefault(e["tid"], []).append(e)
    for tid_events in by_tid.values():
        tid_events.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, event, has_child_flag_list)
        for e in tid_events:
            while stack and stack[-1][0] <= e["ts"] + 1e-9:
                end, ev, has_child = stack.pop()
                if not has_child[0]:
                    out.append(ev)
            if stack:
                stack[-1][2][0] = True
            stack.append((e["ts"] + e["dur"], e, [False]))
        while stack:
            end, ev, has_child = stack.pop()
            if not has_child[0]:
                out.append(ev)
    return [e for e in out
            if not e["args"].get("hlo_category", "").endswith("-start")]


def busy_union_us(events):
    """Union length of [ts, ts+dur) intervals (events overlap across tids:
    compute vs DMA streams)."""
    iv = sorted((e["ts"], e["ts"] + e["dur"]) for e in events)
    total, cur_s, cur_e = 0.0, None, None
    for s, e in iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def analyze(name, once, top=25):
    trace, wall = capture(once)
    evs = device_events(trace)
    assert evs, "no device events captured — tunnel trace unavailable?"
    nonwrap = [e for e in evs if not _is_program_wrapper(e)]
    leaf = leaf_only(nonwrap)
    span_us = busy_union_us(evs)          # whole-program device span
    active_us = busy_union_us(nonwrap)    # op-active (excl. bubbles)
    total_bytes = sum(_event_bytes(e) for e in leaf)
    per_op = {}
    for e in leaf:
        k = e["name"]
        d = per_op.setdefault(k, {"us": 0.0, "bytes": 0, "n": 0,
                                  "category":
                                      e["args"].get("hlo_category", "?")})
        d["us"] += e["dur"]
        d["bytes"] += _event_bytes(e)
        d["n"] += 1
    rows = sorted(per_op.items(), key=lambda kv: -kv[1]["us"])[:top]
    per_cat = {}
    for e in leaf:
        cat = e["args"].get("hlo_category", "?")
        # split custom calls by kernel family for attribution
        if cat == "custom-call":
            base = e["name"].split(".")[0]
            cat = f"custom:{base}"
        d = per_cat.setdefault(cat, {"us": 0.0, "bytes": 0})
        d["us"] += e["dur"]
        d["bytes"] += _event_bytes(e)
    cats = sorted(per_cat.items(), key=lambda kv: -kv[1]["us"])
    span_s = span_us / 1e6 / TRACE_CALLS
    active_s = active_us / 1e6 / TRACE_CALLS
    bytes_call = total_bytes / TRACE_CALLS
    measured_gbps = bytes_call / span_s / 1e9
    result = {
        "config": name,
        "wall_ms_per_call": round(wall * 1e3, 1),
        "device_span_ms_per_call": round(span_s * 1e3, 1),
        "op_active_ms_per_call": round(active_s * 1e3, 1),
        "bubble_frac_of_span": round(1 - active_s / span_s, 3),
        "span_frac_of_wall": round(span_s / wall, 3),
        "executed_bytes_per_call": bytes_call,
        "measured_gbps": round(measured_gbps, 1),
        "measured_hbm_util_pct": round(100 * measured_gbps
                                       / V5E_PEAK_HBM_GBPS, 1),
        "by_category": [
            {"category": k,
             "ms_per_call": round(v["us"] / 1e3 / TRACE_CALLS, 2),
             "gbytes_per_call": round(v["bytes"] / TRACE_CALLS / 1e9, 2)}
            for k, v in cats],
        "top_ops": [
            {"op": k, "category": v["category"], "calls": v["n"],
             "ms_per_call": round(v["us"] / 1e3 / TRACE_CALLS, 2),
             "gbytes_per_call": round(v["bytes"] / TRACE_CALLS / 1e9, 2),
             "gbps": round(v["bytes"] / 1e9 / (v["us"] / 1e6), 1)
             if v["us"] else None}
            for k, v in rows],
    }
    print(f"\n== {name}: wall {result['wall_ms_per_call']} ms, device span "
          f"{result['device_span_ms_per_call']} ms "
          f"({result['span_frac_of_wall']:.0%} of wall), op-active "
          f"{result['op_active_ms_per_call']} ms "
          f"(bubbles {result['bubble_frac_of_span']:.1%}), measured "
          f"{result['measured_gbps']} GB/s "
          f"({result['measured_hbm_util_pct']}% of roofline)")
    for r in result["by_category"][:12]:
        print(f"  cat {r['ms_per_call']:8.2f} ms  "
              f"{r['gbytes_per_call']:7.2f} GB  {r['category']}")
    for r in result["top_ops"][:12]:
        print(f"  {r['ms_per_call']:8.2f} ms  {r['gbps'] or 0:7.1f} GB/s "
              f" x{r['calls']:<4} {r['category'][:18]:<18} {r['op'][:70]}")
    return result


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    configs = args or ["headline", "3d"]
    out_path = os.path.join(ROOT, "TRACE_ROOFLINE.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for c in configs:
        once, metric = BUILDERS[c]()
        r = analyze(c, once)
        r["metric"] = metric
        results[c] = r
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out_path}")
    if "--update" in sys.argv:
        bench_path = os.path.join(ROOT, "BENCH_full.json")
        lines = [json.loads(l) for l in open(bench_path)]
        by_metric = {r["metric"]: r for r in results.values()}
        for line in lines:
            r = by_metric.get(line["metric"])
            if r:
                line["measured_gbps"] = r["measured_gbps"]
                line["measured_hbm_util_pct"] = r["measured_hbm_util_pct"]
                line["device_span_ms"] = r["device_span_ms_per_call"]
        with open(bench_path, "w") as f:
            for line in lines:
                f.write(json.dumps(line) + "\n")
        print(f"updated {bench_path}")


if __name__ == "__main__":
    main()
