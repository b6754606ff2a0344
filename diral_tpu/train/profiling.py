"""Per-op training-loop profiler: where one slot's device time goes.

Runs a warm chunk of the jitted training loop under ``jax.profiler.trace``
and aggregates the device-plane XLA op durations from the captured xplane
proto.  This is the profile-driven-optimization harness behind the
RESULTS.md trace tables (rounds 2/3); surfaced as
``python -m diral_tpu profile <config>`` and ``scripts/profile_slot.py``.

Caveat on reading the numbers: parent events (whiles, the outer jit) and
async DMA windows (copy-start/slice-start) OVERLAP leaf compute, so the
per-op table attributes attention, not wall time; the honest wall
denominator is the outer ``jit_*`` entry and the measured slots/s.
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import os
import re
import sys
import tempfile
import time

import jax


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_xplane(trace_dir: str):
    # baked into the image's tensorflow wheel
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


# Op-name -> readable category.  The fused-kernel names XLA emits are long
# ("fusion.1234"), so categorize by substrings of the HLO op name.
_CATEGORY_PATTERNS = [
    (r"pallas|custom-call", "pallas/custom-call"),
    (r"^copy", "copy/layout"),
    (r"convert", "convert"),
    (r"all-reduce|all-gather|reduce-scatter|collective", "collective"),
    (r"dynamic-update-slice", "dyn-update-slice"),
    (r"dynamic-slice", "dyn-slice"),
    (r"gather", "gather"),
    (r"scatter", "scatter"),
    (r"sort|top-k", "sort/top_k"),
    (r"dot|conv", "matmul"),
    (r"rng|threefry", "rng"),
    (r"reduce", "reduce"),
    (r"fusion", "fusion(elementwise)"),
    (r"while", "while-overhead"),
]


def _categorize(name: str) -> str:
    low = name.lower()
    for pat, cat in _CATEGORY_PATTERNS:
        if re.search(pat, low):
            return cat
    return "other"


def aggregate_device_ops(xspace):
    """Sum event durations (ms) by op name on the device plane's XLA-op
    lines.  Parents and async windows overlap leaves -- see module note."""
    by_name = collections.Counter()
    occurrences = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name and not ("XLA" in line.name or "Ops" in line.name
                                  or "TensorFlow" in line.name):
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                by_name[name] += ev.duration_ps / 1e9  # -> ms
                occurrences[name] += 1
    return by_name, occurrences


def profile_training(config_path: str, envs: int = 16, slots: int = 100,
                     top: int = 25, dtype: str = "float32",
                     trace_dir: str | None = None) -> dict:
    """Measure steady-state slots/s, trace one chunk, print the per-op
    attribution table (stderr) and return the summary dict."""
    from diral_tpu.config import load_config
    from diral_tpu.train.loop import make_train_functions
    from diral_tpu.train.runner import make_chunk_runner

    cfg = load_config(config_path)
    cfg = dataclasses.replace(
        cfg,
        save_positions=False,
        engine=dataclasses.replace(cfg.engine, num_envs=envs),
        agent=dataclasses.replace(
            cfg.agent, network=dataclasses.replace(
                cfg.agent.network, compute_dtype=dtype)),
    )
    I = cfg.episode_interval
    slots = (slots // I) * I or I

    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    run_chunk, _ = make_chunk_runner(slot_step)

    t0 = (cfg.agent.batch_size + 100 + I - 1) // I * I
    t = time.perf_counter()
    carry, logs = run_chunk(carry, t0, slots)
    float(logs["sum_reward"].sum())
    _log(f"compile+first: {time.perf_counter() - t:.1f}s")

    rates = []
    for i in range(1, 4):  # median of 3: the tunnel stalls single transfers
        t = time.perf_counter()
        carry, logs = run_chunk(carry, t0 + i * slots, slots)
        float(logs["sum_reward"].sum())
        rates.append(slots / (time.perf_counter() - t))
    rate = sorted(rates)[1]
    _log(f"train rate: {rate:,.1f} slots/s ({envs} envs, "
         f"{cfg.env.num_users}v/{cfg.env.num_channels}r, {dtype})")

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="diral_prof_")
    with jax.profiler.trace(trace_dir):
        carry, logs = run_chunk(carry, t0 + 10 * slots, slots)
        float(logs["sum_reward"].sum())

    by_name, occ = aggregate_device_ops(_load_xplane(trace_dir))
    total = sum(by_name.values())
    if total == 0:
        _log("no device-plane XLA op events in the trace (CPU backend "
             "traces carry no per-op device lines); rate above still valid")
        return {"config": config_path, "envs": envs, "dtype": dtype,
                "slots_per_sec": round(rate, 1), "categories": {},
                "top_ops": []}
    by_cat = collections.Counter()
    for name, ms in by_name.items():
        by_cat[_categorize(name)] += ms

    _log(f"\nsummed op attention: {total:.1f} ms over {slots} slots "
         f"(parents/async overlap leaves; wall = slots/s above)")
    _log(f"{'category':24s} {'ms':>9s} {'share':>7s}")
    for cat, ms in by_cat.most_common():
        _log(f"{cat:24s} {ms:9.2f} {ms / total:6.1%}")
    _log(f"\ntop {top} ops:")
    _log(f"{'op':58s} {'ms':>8s} {'n':>6s} {'share':>7s}")
    for name, ms in by_name.most_common(top):
        _log(f"{name[:58]:58s} {ms:8.2f} {occ[name]:6d} {ms / total:6.1%}")

    return {
        "config": config_path, "envs": envs, "dtype": dtype,
        "slots_per_sec": round(rate, 1),
        "categories": {k: round(v, 2) for k, v in by_cat.most_common()},
        "top_ops": [
            {"op": n, "ms": round(ms, 2), "n": occ[n]}
            for n, ms in by_name.most_common(top)
        ],
    }
