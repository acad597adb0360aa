#!/usr/bin/env python
"""Per-query regression evidence with variance (VERDICT r2 #8) and
outlier rejection (VERDICT r4 #7): run the full bench N times in fresh
subprocesses (cold JVM each run — the same condition the driver measures
under), drop runs whose HEADLINE deviates more than 3× MAD from the
run median (co-tenant interference polluted half the r4 medians), and
write BENCH/REGRESSION_r6.md with median / min / spread columns plus
deltas vs the previous round medians (parsed from BENCH/REGRESSION_r5.md).
ALL raw runs — including rejected ones — are kept in
BENCH/regression_runs_r6.json so the rejection is auditable.

Usage: python scripts/regression_bench.py [n_runs=5]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREV_ROUND, THIS_ROUND = "r5", "r6"
MAD_K = 3.0  # reject runs with |headline - median| > MAD_K * MAD


def _prev_medians() -> dict[str, float]:
    """Previous round's per-query medians from the committed table."""
    path = os.path.join(REPO, "BENCH", f"REGRESSION_{PREV_ROUND}.md")
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


def reject_outliers(values: list[float], k: float = MAD_K) -> list[int]:
    """Indexes of KEPT runs under the 3×MAD headline rule. MAD of zero
    (identical headlines) or fewer than 3 runs keeps everything."""
    if len(values) < 3:
        return list(range(len(values)))
    med = statistics.median(values)
    mad = statistics.median([abs(v - med) for v in values])
    if mad == 0:
        return list(range(len(values)))
    return [i for i, v in enumerate(values) if abs(v - med) <= k * mad]


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    prev = _prev_medians()  # parse BEFORE the multi-minute run loop: a
    # missing/renamed prev table should fail fast, not after 30 min
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

    kept = reject_outliers(values)
    rejected = sorted(set(range(n_runs)) - set(kept))
    with open(os.path.join(REPO, "BENCH", f"regression_runs_{THIS_ROUND}.json"), "w") as f:
        json.dump(
            {
                "headlines": values,
                "kept_run_indexes": kept,
                "rejected_run_indexes": rejected,
                "mad_k": MAD_K,
                "runs": runs,
            },
            f, indent=1,
        )
    if rejected:
        print(
            f"outlier rejection: dropped runs {rejected} "
            f"(headlines {[values[i] for i in rejected]}) by the 3xMAD rule"
        )
    k_runs = [runs[i] for i in kept]
    k_values = [values[i] for i in kept]

    # intersection across kept runs: if any run printed the slimmed
    # queries map (bench.py tail-buffer fallback), only common keys compare
    names = [k for k in k_runs[0] if all(k in r for r in k_runs)]
    dropped = sorted(set(k_runs[0]) - set(names))
    if dropped:
        print(f"WARN: {len(dropped)} queries missing from some runs: {dropped}")
    lines = [
        f"# BENCH regression table — round 6 vs round 5",
        "",
        f"Protocol: {n_runs} full bench runs, each a FRESH JVM (cold start,",
        "like the driver); within each run every query is already a",
        "median-of-3 (bench.py). Runs whose headline deviates more than",
        f"3×MAD from the run median are rejected before aggregation",
        f"(kept {len(kept)}/{n_runs}; raw runs incl. rejected in",
        f"BENCH/regression_runs_{THIS_ROUND}.json — VERDICT r4 #7).",
        "Columns: per-kept-run medians aggregated as median / min /",
        "spread(=max−min). The r5 column is the committed 8-run median",
        f"from BENCH/REGRESSION_{PREV_ROUND}.md.",
        "",
        "| query | r5 median | r6 median | r6 min | r6 spread | delta (median vs r5) |",
        "|---|---|---|---|---|---|",
    ]
    for name in names:
        xs = [r[name] for r in k_runs]
        med, mn, spread = statistics.median(xs), min(xs), max(xs) - min(xs)
        pv = prev.get(name)
        delta = f"{(med - pv) / pv * 100:+.0f}%" if pv else "new"
        pvs = f"{pv}" if pv else "—"
        lines.append(
            f"| {name} | {pvs} | {med:.3f} | {mn:.3f} | {spread:.3f} | {delta} |"
        )
    lines += [
        "",
        f"Headline extract throughput over the {len(kept)} kept runs: "
        f"median {statistics.median(k_values):.1f} docs/sec, "
        f"best {max(k_values):.1f}, spread {max(k_values) - min(k_values):.1f} "
        "(r5 builder median: 1971; r4: 1632).",
        "",
        "Round-6 changes in the measured set (the optimization round):",
        "single-row-group fixture scans spread to cluster parallelism",
        "(par/2 = physical cores) before heavy map-side work; per-side",
        "cosine norms (once per row, not per pair) across every embedding",
        "query; ivf centroid assignment via combinable max(struct) agg",
        "instead of a row_number window; top_terms one-exchange",
        "restructure; sliding-window starts as a flat array literal;",
        "light/heavy size-class corpus file layout (each extract branch",
        "now prunes the other's files); text-only hOCR parse + emitter",
        "hot-loop + orjson in the extraction kernels.",
    ]
    out_path = os.path.join(REPO, "BENCH", f"REGRESSION_{THIS_ROUND}.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
