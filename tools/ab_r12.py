#!/usr/bin/env python
"""Round-12 bench-regression adjudication (VERDICT r11 item 1).

Interleaved fresh-JVM A/B of the FROZEN r11 close tree (worktree at
1254540, .scale/r11tree) vs the UNCHANGED r10 close tree (worktree at
ce435a8, .scale/r10tree) for the three worst CPU-class regressors from
BENCH_r11 plus the q01 control — the exact playbook that closed the r9
minhash flag (PERF.md r10 entry). Both sides are frozen worktrees, NOT
the live repo, so round-12 edits in progress cannot contaminate either
side (a live-HEAD first attempt lost 5 children to a mid-edit import).

Every sample is a fresh JVM (tools/fresh_bench.py --child) so no
session-level JIT/cache state leaks between trees; within each round
the tree order alternates (round 0: HEAD first, round 1: r10 first,
...) so slow host drift lands on both trees equally.

Output: per-query median-of-medians per tree, the HEAD/r10 ratio, and
the control-normalized ratio (the protocol's adjudication metric).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10 = os.path.join(REPO, ".scale", "r10tree")
R11 = os.path.join(REPO, ".scale", "r11tree")

QUERIES = [
    "q_st_envelope_by_nation",   # +44% normalized in BENCH_r11
    "q_cosine_topk",             # +38%
    "q_text_stats",              # +34%
    "q01_pricing_summary",       # CPU control (frozen)
]
ROUNDS = 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_child(tree: str, query: str) -> dict | None:
    script = os.path.join(tree, "tools", "fresh_bench.py")
    p = subprocess.run(
        [sys.executable, script, "--child", query, "--sf-dir", SF_DIR],
        capture_output=True, text=True, cwd=tree,
    )
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
    try:
        return json.loads(line)
    except (json.JSONDecodeError, IndexError):
        print(f"CHILD FAILED {tree} {query}\n{p.stderr[-1500:]}",
              file=sys.stderr)
        return None


def main() -> None:
    series: dict[tuple[str, str], list[float]] = {
        (t, q): [] for t in ("head", "r10") for q in QUERIES
    }
    trees = {"head": R11, "r10": R10}
    for rnd in range(ROUNDS):
        order = ["head", "r10"] if rnd % 2 == 0 else ["r10", "head"]
        for q in QUERIES:
            for t in order:
                rec = run_child(trees[t], q)
                if rec:
                    series[(t, q)].append(rec["median"])
                    print(f"round {rnd} {t:4s} {q}: {rec['median']}s "
                          f"samples {rec['samples']}", flush=True)

    out: dict[str, dict] = {}
    ctrl = {
        t: statistics.median(series[(t, "q01_pricing_summary")])
        for t in ("head", "r10")
        if series[(t, "q01_pricing_summary")]
    }
    for q in QUERIES:
        row: dict = {}
        for t in ("head", "r10"):
            vals = series[(t, q)]
            if vals:
                row[t] = {
                    "median_of_medians": round(statistics.median(vals), 4),
                    "per_jvm_medians": vals,
                }
        if "head" in row and "r10" in row:
            h = row["head"]["median_of_medians"]
            r = row["r10"]["median_of_medians"]
            row["head_over_r10"] = round(h / r, 3)
            if q != "q01_pricing_summary" and len(ctrl) == 2:
                row["normalized_head"] = round(h / ctrl["head"], 3)
                row["normalized_r10"] = round(r / ctrl["r10"], 3)
                row["normalized_ratio"] = round(
                    (h / ctrl["head"]) / (r / ctrl["r10"]), 3)
        out[q] = row
    result = {"rounds": ROUNDS, "sf_dir": SF_DIR, "r10_commit": "ce435a8", "head_commit": "1254540 (r11 close)",
              "queries": out}
    print(json.dumps(result, indent=1))
    path = os.path.join(REPO, ".scale", "ab_r12.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
