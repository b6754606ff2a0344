"""Regenerate RESULTS.md tables from the results/*.json artifacts.

Every published comparison table in RESULTS.md sits between
``<!-- begin:table-NAME -->`` / ``<!-- end:table-NAME -->`` markers and is
REWRITTEN by this script from the corresponding artifact produced by
``scripts/full_run.py`` / ``scripts/ref_sweep.py`` -- so the published
numbers cannot drift from the measurements (the round-2 README/bench
2x headline mismatch was exactly that failure mode).

Usage:
    python scripts/render_results.py            # rewrite RESULTS.md in place
    python scripts/render_results.py --check    # exit 1 if anything differs
    make results                                # same as the first form
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS_MD = os.path.join(ROOT, "RESULTS.md")


def _load(name: str):
    with open(os.path.join(ROOT, "results", name)) as f:
        return json.load(f)


def _vs_sps_table(artifact: str) -> str:
    """The DRQN-vs-SPS comparison table of a full_run.py artifact."""
    d = _load(artifact)["compare_vs_sps"]
    q, s = d["drqn"], d["sps"]
    rows = [
        ("mean PRR", f"**{q['mean_prr']:.3f}**", f"{s['mean_prr']:.3f}",
         f"**{d['prr_improvement']:+.1%}**"),
        ("collisions (C − sum_r)", f"**{q['mean_collisions_ref']:.2f}**",
         f"{s['mean_collisions_ref']:.2f}",
         f"{q['mean_collisions_ref'] / s['mean_collisions_ref'] - 1:+.0%}"),
        ("colliding users/slot", f"**{q['mean_colliding_users']:.2f}**",
         f"{s['mean_colliding_users']:.2f}",
         f"{q['mean_colliding_users'] / s['mean_colliding_users'] - 1:+.0%}"),
        ("mean sum reward", f"**{q['mean_sum_reward']:+.2f}**",
         f"{s['mean_sum_reward']:+.2f}",
         f"{q['mean_sum_reward'] - s['mean_sum_reward']:+.2f}"),
    ]
    out = ["| metric | trained DRQN | SPS | delta |", "|---|---|---|---|"]
    out += [f"| {a} | {b} | {c} | {d_} |" for a, b, c, d_ in rows]
    return "\n".join(out)


def _toy_deciles_table() -> str:
    header = ("| slots (×25k) | " +
              " | ".join(str(i) for i in range(1, 11)) + " |")
    sep = "|---" * 11 + "|"
    rows = []
    for seed, artifact in ((0, "toy_full_250k.json"), (1, "toy_full_s1.json"),
                           (2, "toy_full_s2.json")):
        dec = _load(artifact)["reward_curve_deciles"]
        rows.append(f"| seed {seed} | " +
                    " | ".join(f"{v:.2f}" for v in dec) + " |")
    return "\n".join([header, sep] + rows)


def _ref_sweep_table() -> str:
    rows = _load("ref_sweep.json")
    out = ["| config | γ | bins | final sum_r | DRQN PRR | SPS PRR | ΔPRR | slots/s |",
           "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        name = r["config"].replace("r2_", "").replace("_mg_o_index", "")
        star = "*" if r["drqn_prr"] >= 0.999 else ""
        out.append(
            f"| {name} | {r['gamma']} | {r['num_bins']} "
            f"| {r['final_mean_sum_reward']:+.2f} | {r['drqn_prr']:.3f}{star} "
            f"| {r['sps_prr']:.3f} | {r['prr_improvement']:+.1%}{star} "
            f"| {r['slots_per_sec']:.0f} |")
    return "\n".join(out)


def _seed_sweep_table() -> str:
    d = _load("seed_sweep_8.json")
    out = ["| seed | final sum_r | DRQN PRR | SPS PRR | ΔPRR |",
           "|---|---|---|---|---|"]
    for r in d["rows"]:
        out.append(
            f"| {r['seed']} | {r['final_mean_sum_reward']:+.2f} "
            f"| {r['drqn_prr']:.3f} | {r['sps_prr']:.3f} "
            f"| {r['prr_improvement']:+.1%} |")
    return "\n".join(out)


def _serve_seeds_table() -> str:
    """Online serve-compare seed distribution (round 4)."""
    d = _load("serve_compare_seeds3.json")
    out = ["| seed | DRQN tail PRR | SPS tail PRR | Δ (points) |",
           "|---|---|---|---|"]
    for r in d["rows"]:
        out.append(
            f"| {r['seed']} | {r['drqn']['mean_prr_tail']:.3f} "
            f"| {r['sps']['mean_prr_tail']:.3f} "
            f"| {100 * r['prr_improvement']:+.1f} |")
    out.append(
        f"| **mean ± std (n={len(d['rows'])})** | | | "
        f"**{100 * d['prr_improvement_mean']:+.1f} ± "
        f"{100 * d['prr_improvement_std']:.1f}** "
        f"({d['n_below_sps']}/{len(d['rows'])} below SPS) |")
    return "\n".join(out)


def _campaign_table(artifact: str) -> str:
    """Per-seed PRR distribution of a scripts/seed_campaign.py artifact
    (round-4: the flagship configs get distributions, not single seeds)."""
    d = _load(artifact)
    out = ["| seed | final decile sum_r | DRQN PRR | SPS PRR | ΔPRR | slots/s |",
           "|---|---|---|---|---|---|"]
    for r in d["rows"]:
        out.append(
            f"| {r['seed']} | {r['final_decile_sum_reward']:+.2f} "
            f"| {r['drqn_prr']:.3f} | {r['sps_prr']:.3f} "
            f"| {r['prr_improvement']:+.1%} | {r['slots_per_sec']:.0f} |")
    out.append(
        f"| **mean ± std (n={d['seeds']})** | | | | "
        f"**{d['prr_improvement_mean']:+.1%} ± "
        f"{d['prr_improvement_std']:.1%}** "
        f"(min {d['prr_improvement_min']:+.1%}, "
        f"max {d['prr_improvement_max']:+.1%}; "
        f"{d['n_below_sps']}/{d['seeds']} below SPS) | |")
    return "\n".join(out)


TABLES = {
    "congested-vs-sps": lambda: _vs_sps_table("congested_full_150k.json"),
    "toy-deciles": _toy_deciles_table,
    "ref-sweep": _ref_sweep_table,
    "seed-sweep": _seed_sweep_table,
    "dynamic-vs-sps": lambda: _vs_sps_table("dynamic_full_150k.json"),
    "scale-vs-sps": lambda: _vs_sps_table("scale_full_100k.json"),
    "congested-seeds": lambda: _campaign_table("congested_seeds5.json"),
    "dynamic-seeds": lambda: _campaign_table("dynamic_seeds5.json"),
    "scale-seeds": lambda: _campaign_table("scale_seeds5.json"),
    "serve-seeds": _serve_seeds_table,
}

_BLOCK = re.compile(
    r"(<!-- begin:table-([a-z0-9-]+) -->)\n.*?(<!-- end:table-\2 -->)",
    re.DOTALL,
)


def render(text: str) -> str:
    seen = set()

    def sub(m):
        name = m.group(2)
        if name not in TABLES:
            raise KeyError(f"RESULTS.md references unknown table {name!r}")
        seen.add(name)
        return m.group(1) + "\n" + TABLES[name]() + "\n" + m.group(3)

    out = _BLOCK.sub(sub, text)
    missing = set(TABLES) - seen
    if missing:
        raise KeyError(f"RESULTS.md is missing markers for: {sorted(missing)}")
    return out


def main():
    check = "--check" in sys.argv
    with open(RESULTS_MD) as f:
        text = f.read()
    new = render(text)
    if check:
        if new != text:
            print("RESULTS.md tables are stale; run `make results`",
                  file=sys.stderr)
            return 1
        print("RESULTS.md tables match results/*.json")
        return 0
    if new != text:
        with open(RESULTS_MD, "w") as f:
            f.write(new)
        print("RESULTS.md tables regenerated")
    else:
        print("RESULTS.md tables already current")
    return 0


if __name__ == "__main__":
    sys.exit(main())
