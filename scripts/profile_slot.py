"""Per-op profile of the training loop (thin shim).

The implementation lives in diral_tpu/train/profiling.py and is also
surfaced as ``python -m diral_tpu profile <config>``.

Usage:
    python scripts/profile_slot.py configs/scale_100v_50r.yaml \
        [--envs 16] [--slots 100] [--top 25] [--dtype float32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="configs/scale_100v_50r.yaml")
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--slots", type=int, default=100)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    from diral_tpu.train.profiling import profile_training

    print(json.dumps(profile_training(
        args.config, envs=args.envs, slots=args.slots, top=args.top,
        dtype=args.dtype, trace_dir=args.trace_dir)))


if __name__ == "__main__":
    main()
