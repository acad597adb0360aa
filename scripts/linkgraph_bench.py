#!/usr/bin/env python
"""Scaling evidence for the iterative link-graph operators.

Same two-level protocol as scaling_bench.py / curation_bench.py: the
identical job at local[4] and local[16] (16 physical cores; never 8 vs
32 — SMT pollutes the ratio), each level its own JVM, 1 warm-up + 3
timed runs, MIN estimator with medians disclosed. Input is a
deterministic synthetic skewed host graph (seeded numpy; byte-stable
across runs; see build_graph for why it is NOT a pure zipf draw).

Two jobs, the two iterative plan shapes. Both reduce duplicate links
to one (src, dst) row before iterating, so the work unit is the
DISTINCT pair, not the raw link — the metric is pair-iterations/sec
with raw edge count disclosed alongside:

* **pagerank**: 8 damped power iterations. Per iteration the pinned
  normalized pair relation never moves; only the slim (node, rank)
  relation shuffles (co-partitioned shuffle-hash join — never a |V|
  broadcast) + one combinable dst-sum + a scalar dangling-mass
  collect fused into the rank-materializing action.
* **harmonic**: HyperBall at p=8 (256-byte sketches), ≤6 rounds. Per
  round the pair relation ships one sketch per pair — the known
  HyperBall O(|E|·2^p) shuffle cost — into a streaming elementwise-max
  merge. Rounds actually run are bounded by ball saturation, so the
  metric uses max_iters as the upper bound and discloses seconds.

Unlike the extraction pipeline (CPU-bound in the page kernels, raw
4→16 pass), one PageRank iteration is pure scatter-gather: hash-probe
7.7M pairs, partial-sum, ship ~|V| rows, second probe — bytes moved
per FLOP is huge, so on ONE box the 16-thread level saturates the
shared DRAM bus long before it runs out of cores (measured: per-core
throughput at 16 threads is ~0.56x the 4-thread level, flat across a
4x input-size sweep — a bandwidth wall, not a fixed serial cost). A
real N→4N-executor cluster multiplies memory channels with cores, so
the box ratio understates cluster scaling. The script therefore also
runs the same scatter-gather shape with NO Spark (numpy bincount
gather+scatter over the identical pair arrays, multiprocessing, fixed
total work) at both levels and reports that machine ceiling next to
the raw ratio — the same calibration protocol scaling_bench.py uses
for the extraction kernel.

Env knobs: LINKGRAPH_BENCH_EDGES (default 8000000 pagerank; a quarter
for harmonic), LINKGRAPH_BENCH_LEVELS (default "1,4,16"; efficiency
is reported per adjacent pair). Writes BENCH/linkgraph_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_graph(n_edges: int) -> str:
    """Seeded host digraph parquet shaped like a crawl host graph:
    ~85% of links land on near-distinct (src, dst) pairs (uniform over
    an |E|/8 host space) and ~15% concentrate on zipf hubs —
    mega-outdegree link farms (zipf 1.6 sources) and mega-indegree
    popular hosts (zipf 1.3 destinations). Both iterative operators
    collapse duplicate links to one (src, dst) row up front, so the
    distinct-pair count is the work the iterations actually do: a
    pure-zipf draw collapses ~12x (13.8M raw -> 1.1M pairs, measured
    r5) and overstates throughput by the same factor. This mix keeps
    distinct ~= raw while preserving the skew that stresses the
    partitioners."""
    root = f"/tmp/linkgraph_bench_v2_{n_edges}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(42)
    n_hosts = max(1000, n_edges // 8)
    src = rng.randint(0, n_hosts, n_edges)
    dst = rng.randint(0, n_hosts, n_edges)
    hot_src = rng.rand(n_edges) < 0.15
    hot_dst = rng.rand(n_edges) < 0.15
    src[hot_src] = rng.zipf(1.6, int(hot_src.sum())) % n_hosts
    dst[hot_dst] = rng.zipf(1.3, int(hot_dst.sum())) % n_hosts
    keep = src != dst
    src, dst = src[keep], dst[keep]
    tbl = pa.table(
        {
            "eid": pa.array(range(len(src)), pa.int64()),
            "src": pa.array([f"h{x}.net" for x in src]),
            "dst": pa.array([f"h{x}.net" for x in dst]),
        }
    )
    pq.write_table(tbl, os.path.join(root, "edges.parquet"))
    with open(marker, "w") as f:
        f.write(str(len(src)))
    return root


_CAL = None  # (sid, did, n_vertices) — module global so fork shares it


def _cal_iter(bounds):
    """One worker's slice of a synthetic PageRank iteration: gather
    ranks by source id, scatter-add into destination bins — the same
    bytes-per-op profile as the Spark hash-join + partial-aggregate."""
    import numpy as np

    lo, hi, reps = bounds
    sid, did, nv = _CAL
    rank = np.full(nv, 1.0 / nv)
    acc = 0.0
    for _ in range(reps):
        acc += float(
            np.bincount(
                did[lo:hi], weights=rank[sid[lo:hi]], minlength=nv
            ).sum()
        )
    return acc


def calibrate_machine(root: str, lo_n: int, hi_n: int) -> dict:
    """No-Spark bandwidth ceiling: fixed total work (the full pair set,
    8 gather/scatter sweeps) split across N procs, N = each level's
    core count. Per-proc working set (rank + bin arrays + streamed id
    slices) deliberately exceeds L3 share so the probe hits DRAM the
    way the real iteration does."""
    import multiprocessing as mp
    import time

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    global _CAL
    tbl = pq.read_table(
        os.path.join(root, "edges.parquet"), columns=["src", "dst"]
    )
    df = tbl.to_pandas()
    codes, uniq = pd.factorize(pd.concat([df["src"], df["dst"]]))
    n = len(df)
    _CAL = (
        codes[:n].astype(np.int64),
        codes[n:].astype(np.int64),
        len(uniq),
    )
    reps = 32
    rates = {}
    for procs in (lo_n, hi_n):
        bounds = np.linspace(0, n, procs + 1).astype(int)
        args = [
            (int(a), int(b), reps)
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        # pre-forked pool + one warm-up map: fork/startup stays OUT of
        # the timed window (at 16 procs it otherwise dominates)
        with mp.Pool(procs) as pool:
            pool.map(_cal_iter, args, chunksize=1)
            best = None
            for _ in range(3):
                t0 = time.time()
                pool.map(_cal_iter, args, chunksize=1)
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
        rates[procs] = n * reps / best
    _CAL = None
    return {
        f"kernel_pair_iters_per_sec_{lo_n}p": round(rates[lo_n], 1),
        f"kernel_pair_iters_per_sec_{hi_n}p": round(rates[hi_n], 1),
        "machine_efficiency": round(
            (rates[hi_n] / rates[lo_n]) / (hi_n / lo_n), 3
        ),
    }


CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from pypdfocr_spark.session import get_spark
from pypdfocr_spark import linkgraph

cores = int(sys.argv[1]); root = sys.argv[2]
job = sys.argv[3]; n_edges = int(sys.argv[4])

ITERS = 8       # pagerank power iterations
ROUNDS = 6      # harmonic max rounds (ball saturation may stop earlier)

spark = get_spark(f"linkgraph-scaling-{{cores}}", master=f"local[{{cores}}]")
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
edges = (
    spark.read.parquet(root + "/edges.parquet")
    .where(F.col("eid") < n_edges)          # parquet-pushed, keeps splits
    .drop("eid")
    .repartition(cores * 4)
    .persist()
)
real_edges = edges.count()
n_pairs = (
    edges.where(F.col("src") != F.col("dst")).distinct().count()
)

def run_once():
    if job == "pagerank":
        r = linkgraph.pagerank(edges, iterations=ITERS)
        n = r.count()
    else:
        h = linkgraph.harmonic_centrality(edges, p=8, max_iters=ROUNDS)
        n = h.count()
    # both jobs return a projection of an internal persisted relation;
    # clear the whole cache (then re-pin the input) so runs don't
    # accumulate cached rank/sketch RDDs
    spark.catalog.clearCache()
    edges.persist(); edges.count()
    return n

times, n = [], 0
for i in range(4):
    t0 = time.monotonic()
    n = run_once()
    dt = time.monotonic() - t0
    if i:
        times.append(dt)
med = statistics.median(times); best = min(times)
work = n_pairs * (ITERS if job == "pagerank" else ROUNDS)
print(json.dumps({{"cores": cores, "job": job, "n_nodes": n,
                   "n_edges": real_edges, "n_pairs": n_pairs,
                   "runs_sec": [round(t, 3) for t in times],
                   "median_sec": round(med, 3), "best_sec": round(best, 3),
                   "pair_iters_per_sec": round(work / best, 2),
                   "pair_iters_per_sec_median": round(work / med, 2)}}))
"""


def run_level(cores: int, root: str, job: str, n_edges: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), root, job, str(n_edges)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_edges = int(os.environ.get("LINKGRAPH_BENCH_EDGES", "8000000"))
    levels = [
        int(x)
        for x in os.environ.get(
            "LINKGRAPH_BENCH_LEVELS", "1,4,16"
        ).split(",")
    ]
    root = build_graph(n_edges)
    out = {"n_edges_pagerank": n_edges, "n_edges_harmonic": n_edges // 4,
           "jobs": {}}
    for job, ne in (("pagerank", n_edges), ("harmonic", n_edges // 4)):
        results = [run_level(c, root, job, ne) for c in levels]
        effs = {}
        for lo, hi in zip(results, results[1:]):
            effs[f"{lo['cores']}->{hi['cores']}"] = round(
                (hi["pair_iters_per_sec"] / lo["pair_iters_per_sec"])
                / (hi["cores"] / lo["cores"]),
                3,
            )
        out["jobs"][job] = {
            "levels": results,
            "scaling_efficiency": effs,
        }
        print(json.dumps(out["jobs"][job]))
    out["machine_ceiling"] = {}
    for lo, hi in zip(levels, levels[1:]):
        cal = calibrate_machine(root, lo, hi)
        key = f"{lo}->{hi}"
        out["machine_ceiling"][key] = cal
        for job in out["jobs"]:
            raw = out["jobs"][job]["scaling_efficiency"].get(key)
            if raw is not None and cal["machine_efficiency"] > 0:
                out["jobs"][job].setdefault(
                    "scaling_efficiency_normalized", {}
                )[key] = round(raw / cal["machine_efficiency"], 3)
    out["estimator"] = "min of 3 (median disclosed)"
    path = os.path.join(REPO, "BENCH", "linkgraph_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
