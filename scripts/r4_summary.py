"""Aggregate round-4 quality artifacts into the PERFORMANCE.md tables.

Reads the per-run quality summaries the r4 chains publish into results/
(seed sweep q_s0/q_s1/q_s2, projector-init ablation q_proj, 164M scale-up
q_big, plus round-3's q_r3b as a fourth sample of the same recipe) and
emits:
  - seed mean +/- range per system (the spr-variance error bars VERDICT r3
    next #1a asked for)
  - projector-init and trunk-scale deltas vs the seed band
  - a ready-to-paste markdown table
  - results/r4_quality_aggregate.json (docs-lockstep source of truth)

Usage: python scripts/r4_summary.py [--results results] [--out ...]
"""
from __future__ import annotations

import argparse
import json
import os

SYSTEMS = ("bm25", "den", "spr", "emb", "tok", "den_spr", "emb_tok",
           "den_bm25_lin", "den_spr_bm25_lin")
METRICS = ("NDCG@10", "Recall@100", "NDCG@1", "MRR@10")


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results")
    ap.add_argument("--out", default="results/r4_quality_aggregate.json")
    args = ap.parse_args()

    runs = {}
    for name in ("q_s0", "q_s1", "q_s2", "q_proj", "q_proj_s1", "q_big",
                 "q_r3b"):
        p = os.path.join(args.results, f"{name}_quality_summary.json")
        if os.path.exists(p):
            runs[name] = load(p)
    if not runs:
        raise SystemExit("no quality summaries found in " + args.results)

    def grab(run, sys_name, metric):
        m = run.get("metrics", {}).get(sys_name, {})
        return m.get(metric)

    # Seed band: q_s0/1/2 are seeds 0/1/2 of the identical recipe; q_r3b is
    # the same recipe from round 3 (independent trunk regeneration) — a
    # fourth sample of run-to-run variance.
    seed_names = [n for n in ("q_s0", "q_s1", "q_s2", "q_r3b") if n in runs]
    agg = {"seed_runs": seed_names, "systems": {}}
    for s in SYSTEMS:
        row = {}
        for met in METRICS:
            vals = [grab(runs[n], s, met) for n in seed_names]
            vals = [v for v in vals if v is not None]
            if not vals:
                continue
            row[met] = {
                "mean": round(sum(vals) / len(vals), 4),
                "min": round(min(vals), 4),
                "max": round(max(vals), 4),
                "per_run": {n: grab(runs[n], s, met) for n in seed_names},
            }
        if row:
            agg["systems"][s] = row

    for abl in ("q_proj", "q_proj_s1", "q_big"):
        if abl not in runs:
            continue
        agg[abl] = {
            s: {met: grab(runs[abl], s, met) for met in METRICS
                if grab(runs[abl], s, met) is not None}
            for s in SYSTEMS if runs[abl].get("metrics", {}).get(s)}
        agg[abl]["params_m"] = runs[abl].get("params_m")

    # MRL sweep + spectrum (q_mrl_r4 stage): fold into the aggregate so the
    # PERFORMANCE.md table cites one artifact for the whole quality story.
    mrl_path = os.path.join(args.results, "q_mrl_r4_quality_summary.json")
    if os.path.exists(mrl_path):
        mrl = load(mrl_path)
        if mrl.get("mrl_sweep"):
            agg["mrl"] = {
                "sweep": {d: {"NDCG@10": m.get("NDCG@10"),
                              "Recall@100": m.get("Recall@100")}
                          for d, m in mrl["mrl_sweep"].items()},
                "spectrum": mrl.get("spectrum", {}),
                "den_full": grab(mrl, "den", "NDCG@10"),
            }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(agg, f, indent=2)

    # markdown table: rows = systems, cols = seed mean [min..max] + ablations
    def fmt(v):
        return "-" if v is None else f"{v:.3f}"

    lines = ["| System | NDCG@10 seeds mean [min..max] | R@100 mean | "
             "proj-init s0 | proj-init s1 | 164M |", "|---|---|---|---|---|---|"]
    for s in SYSTEMS:
        if s not in agg["systems"]:
            continue
        nd = agg["systems"][s].get("NDCG@10", {})
        rc = agg["systems"][s].get("Recall@100", {})
        proj = (agg.get("q_proj", {}).get(s) or {}).get("NDCG@10")
        proj1 = (agg.get("q_proj_s1", {}).get(s) or {}).get("NDCG@10")
        big = (agg.get("q_big", {}).get(s) or {}).get("NDCG@10")
        lines.append(
            f"| {s} | {fmt(nd.get('mean'))} "
            f"[{fmt(nd.get('min'))}..{fmt(nd.get('max'))}] "
            f"| {fmt(rc.get('mean'))} | {fmt(proj)} | {fmt(proj1)} | {fmt(big)} |")
    print("\n".join(lines))
    if "mrl" in agg:
        print("\n| MRL dim | NDCG@10 | Recall@100 |\n|---|---|---|")
        for d, m in agg["mrl"]["sweep"].items():
            print(f"| {d} | {fmt(m['NDCG@10'])} | {fmt(m['Recall@100'])} |")
        sp = agg["mrl"]["spectrum"]
        if sp:
            print(f"spectrum: PR={sp.get('participation_ratio', 0):.1f} "
                  f"rank90={sp.get('rank90')} rank99={sp.get('rank99')}")
    print(f"\nwrote {args.out} ({len(seed_names)} seed runs)")


if __name__ == "__main__":
    main()
