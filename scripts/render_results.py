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


def _throughput_table() -> str:
    """Driver-capture-owned throughput rows (round-5 VERDICT #8: no
    hand-typed headline numbers).  Source: results/bench_latest.json,
    written by every ``python bench.py`` run; best-ever tracks the best
    driver-capture medians across rounds."""
    d = _load("bench_latest.json")
    c, b = d["capture"], d["best_ever"]

    def m(v):
        return f"{v / 1e6:,.1f}M"

    rows = [
        ("env engine, toy 4ue/3r, 8192 envs (step + state assembly)",
         f"**{m(c['value'])} env-steps/s** (median, spread "
         f"{c['spread']:.2f}x, min {m(c['value_min'])})",
         f"{m(b['value'])}"),
        ("env engine, scale 100v/50r, 2048 envs (fused channel kernel)",
         f"**{c['scale_env_steps_per_sec']:,.0f} env-steps/s** "
         f"({c['scale_env_steps_per_sec'] * 100:,.0f} agent-steps/s)",
         f"{b['scale_env_steps_per_sec']:,.0f}"),
        ("training loop, toy, 256 envs, float32 (inference+env+replay+train)",
         f"**{c['train_slots_per_sec']:,.0f} slots/s** "
         f"({c['train_slots_per_sec'] * 256:,.0f} env-slots/s)",
         f"{b['train_slots_per_sec']:,.0f}"),
        ("training loop, toy, 256 envs, bfloat16",
         f"**{c['train_slots_per_sec_bf16']:,.0f} slots/s**",
         f"{b['train_slots_per_sec_bf16']:,.0f}"),
    ]
    out = ["| measurement | latest driver capture | best driver capture |",
           "|---|---|---|"]
    out += [f"| {a} | {v} | {bb} |" for a, v, bb in rows]
    return "\n".join(out)


def _ps_campaign_table() -> str:
    """In-process PS-DQN / PS-DRQN results (round-5 VERDICT #4)."""
    d = _load("ps_campaign.json")
    out = ["| algo | seed | final decile sum_r | PRR | SPS PRR | ΔPRR "
           "| slots/s |",
           "|---|---|---|---|---|---|---|"]
    for r in d["runs"]:
        comp = r["compare_vs_sps"]
        own = comp[r["algo"].replace("-", "_")]
        out.append(
            f"| {r['algo']} | {r['seed']} | {r['final_decile_sum_r']:+.2f} "
            f"| {own['mean_prr']:.3f} | {comp['sps']['mean_prr']:.3f} "
            f"| {comp['prr_improvement']:+.1%} | {r['slots_per_sec']:.0f} |")
    return "\n".join(out)


def _ppo_seeds_table() -> str:
    """PPO seed distribution + greedy PRR-vs-SPS (round-5 VERDICT #5)."""
    d = _load("ppo_seeds.json")
    out = ["| seed | sum_r first/last 100 ep | PPO PRR | SPS PRR | ΔPRR "
           "| slots/s |",
           "|---|---|---|---|---|---|"]
    deltas = []
    for r in d["runs"]:
        comp = r["compare_vs_sps"]
        deltas.append(comp["prr_improvement"])
        out.append(
            f"| {r['seed']} | {r['sum_r_first100']:+.2f} → "
            f"{r['sum_r_last100']:+.2f} | {comp['ppo']['mean_prr']:.3f} "
            f"| {comp['sps']['mean_prr']:.3f} "
            f"| {comp['prr_improvement']:+.1%} | {r['slots_per_sec']:.0f} |")
    n = len(deltas)
    mean = sum(deltas) / n
    std = (sum((x - mean) ** 2 for x in deltas) / n) ** 0.5
    below = sum(1 for x in deltas if x < 0)
    out.append(f"| **mean ± std (n={n})** | | | | **{mean:+.1%} ± {std:.1%}**"
               f" ({below}/{n} below SPS) | |")
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
    "throughput": _throughput_table,
}

# Registered once their campaign artifacts exist (scripts/ps_campaign.py,
# scripts/ppo_campaign.py write them; see round-5 items #4/#5).
if os.path.exists(os.path.join(ROOT, "results", "ps_campaign.json")):
    TABLES["ps-campaign"] = _ps_campaign_table
if os.path.exists(os.path.join(ROOT, "results", "ppo_seeds.json")):
    TABLES["ppo-seeds"] = _ppo_seeds_table

# README.md carries a compact copy of the throughput table, regenerated
# from the same artifact.
README_TABLES = {
    "readme-throughput": _throughput_table,
}

_BLOCK = re.compile(
    r"(<!-- begin:table-([a-z0-9-]+) -->)\n.*?(<!-- end:table-\2 -->)",
    re.DOTALL,
)


def render(text: str, tables, where: str) -> str:
    seen = set()

    def sub(m):
        name = m.group(2)
        if name not in tables:
            raise KeyError(f"{where} references unknown table {name!r}")
        seen.add(name)
        return m.group(1) + "\n" + tables[name]() + "\n" + m.group(3)

    out = _BLOCK.sub(sub, text)
    missing = set(tables) - seen
    if missing:
        raise KeyError(f"{where} is missing markers for: {sorted(missing)}")
    return out


def main():
    check = "--check" in sys.argv
    rc = 0
    for path, tables in ((RESULTS_MD, TABLES),
                         (os.path.join(ROOT, "README.md"), README_TABLES)):
        name = os.path.basename(path)
        with open(path) as f:
            text = f.read()
        new = render(text, tables, name)
        if check:
            if new != text:
                print(f"{name} tables are stale; run `make results`",
                      file=sys.stderr)
                rc = 1
            else:
                print(f"{name} tables match results/*.json")
        elif new != text:
            with open(path, "w") as f:
                f.write(new)
            print(f"{name} tables regenerated")
        else:
            print(f"{name} tables already current")
    return rc


if __name__ == "__main__":
    sys.exit(main())
