"""Per-op profile of the training loop: where one slot's time goes.

Runs a warm chunk of the jitted training loop under ``jax.profiler.trace``
and aggregates the device-plane XLA op durations from the captured xplane
proto (parsed with the xprof protobuf bindings baked into the image).
This is the round-2/round-3 profile-driven-optimization harness: the
RESULTS.md trace tables regenerate from its output.

Usage:
    python scripts/profile_slot.py configs/scale_100v_50r.yaml \
        [--envs 16] [--slots 100] [--top 25] [--dtype float32]

Prints a table of (op category, total ms, share) plus the slot rate, on
stderr; one JSON summary line on stdout (consumed by scripts/render_results).
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def log(*a):
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
# ("fusion.1234"), so categorize by the hlo op metadata when present.
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
    """Sum event durations by op name on the device plane's XLA-op lines."""
    by_name = collections.Counter()
    occurrences = collections.Counter()
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA op activity lines; skip step/framework lines
            if line.name and not ("XLA" in line.name or "Ops" in line.name
                                  or "TensorFlow" in line.name):
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                by_name[name] += ev.duration_ps / 1e9  # -> ms
                occurrences[name] += 1
    return by_name, occurrences


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="configs/scale_100v_50r.yaml")
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--slots", type=int, default=100)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    from diral_tpu.config import load_config
    from diral_tpu.train.loop import make_train_functions
    from diral_tpu.train.runner import make_chunk_runner

    cfg = load_config(args.config)
    cfg = dataclasses.replace(
        cfg,
        save_positions=False,
        engine=dataclasses.replace(cfg.engine, num_envs=args.envs),
        agent=dataclasses.replace(
            cfg.agent, network=dataclasses.replace(
                cfg.agent.network, compute_dtype=args.dtype)),
    )
    I = cfg.episode_interval
    slots = (args.slots // I) * I or I

    init_carry, slot_step, _ = make_train_functions(cfg)
    carry = jax.jit(init_carry)(jax.random.PRNGKey(0))
    run_chunk, _ = make_chunk_runner(slot_step)

    t0 = (cfg.agent.batch_size + 100 + I - 1) // I * I
    t = time.perf_counter()
    carry, logs = run_chunk(carry, t0, slots)
    float(logs["sum_reward"].sum())
    log(f"compile+first: {time.perf_counter() - t:.1f}s")

    # settle + timed (median of 3; axon tunnel stalls single transfers)
    rates = []
    for i in range(1, 4):
        t = time.perf_counter()
        carry, logs = run_chunk(carry, t0 + i * slots, slots)
        float(logs["sum_reward"].sum())
        rates.append(slots / (time.perf_counter() - t))
    rate = sorted(rates)[1]
    log(f"train rate: {rate:,.1f} slots/s ({args.envs} envs, "
        f"{cfg.env.num_users}v/{cfg.env.num_channels}r, {args.dtype})")

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="diral_prof_")
    with jax.profiler.trace(trace_dir):
        carry, logs = run_chunk(carry, t0 + 10 * slots, slots)
        float(logs["sum_reward"].sum())

    xspace = _load_xplane(trace_dir)
    by_name, occ = aggregate_device_ops(xspace)
    total = sum(by_name.values())
    by_cat = collections.Counter()
    for name, ms in by_name.items():
        by_cat[_categorize(name)] += ms

    log(f"\ndevice time: {total:.1f} ms over {slots} slots "
        f"({total / slots * 1e3:.0f} us/slot)")
    log(f"{'category':24s} {'ms':>9s} {'share':>7s}")
    for cat, ms in by_cat.most_common():
        log(f"{cat:24s} {ms:9.2f} {ms / total:6.1%}")
    log(f"\ntop {args.top} ops:")
    log(f"{'op':58s} {'ms':>8s} {'n':>6s} {'share':>7s}")
    for name, ms in by_name.most_common(args.top):
        log(f"{name[:58]:58s} {ms:8.2f} {occ[name]:6d} {ms / total:6.1%}")

    print(json.dumps({
        "config": args.config, "envs": args.envs, "dtype": args.dtype,
        "slots_per_sec": round(rate, 1),
        "device_ms_per_slot": round(total / slots, 3),
        "categories": {k: round(v, 2) for k, v in by_cat.most_common()},
        "top_ops": [
            {"op": n, "ms": round(ms, 2), "n": occ[n]}
            for n, ms in by_name.most_common(args.top)
        ],
    }))


if __name__ == "__main__":
    main()
