#!/usr/bin/env python
"""Headline benchmark: runs the flagship extraction pipeline plus the
headline operator queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "docs_per_sec_extract", "value": N, "unit": "sec"?, ...}

The headline metric is end-to-end extraction throughput (docs/sec over
the non-excluded corpus), matching BASELINE.json's north-star metric.
Corpus materialization (a test-fixture step, not a pipeline stage) is
timed separately and excluded from the per-query numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pypdfocr_spark import pipeline  # noqa: E402
from pypdfocr_spark.config import ExtractConfig  # noqa: E402
from pypdfocr_spark.session import get_spark  # noqa: E402

HEADLINE_QUERIES = [
    "extract_text",
    "route_first_match",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_topk",
    "embedding_ivf_topk",
    "embedding_neardup_lsh",
    "lang_id",
    "quality_score",
    "token_count",
    "fingerprint",
    "sessionize_events",
    "tumbling_events",
    "lineage_rollup",
    "mktsegment_revenue",
    "top_orders_3way",
    "url_canonicalize",
    "host_stats",
    "stratified_sample",
    "repetition_stats",
    "decontaminate",
    "pii_counts",
    "line_dedup",
    "gopher_filter",
    "asof_join",
    "sliding_events",
    "normalized_dedup",
    "length_quantiles",
    "dup_ngram_frac",
    "top_terms",
    "chunk_windows",
    "shard_assign",
    "corpus_curate",
    "curation_report",
    "url_filter",
    "domain_cap",
    "pack_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("pypdfocr-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    tag = os.path.basename(os.path.normpath(sf_dir))
    corpus_path = f"/tmp/pypdfocr_spark_corpus_{tag}"
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        shutil.rmtree(corpus_path, ignore_errors=True)
        pipeline.materialize_corpus(spark, sf_dir, corpus_path)
    corpus_build_sec = time.monotonic() - t0

    # headline: end-to-end extraction throughput — 1 warm-up (python
    # worker spawn, code paths) + median of 3 timed runs
    import statistics

    corpus_df = spark.read.parquet(corpus_path)
    job = pipeline.extract(corpus_df, ExtractConfig())
    n_docs = job.count()
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        n_docs = job.count()
        runs.append(time.monotonic() - t0)
    extract_sec = statistics.median(runs)
    docs_per_sec = n_docs / extract_sec

    # per-query: median of 3 timed runs (the box shows co-tenant noise;
    # a single run made the r1→r2 tumbling_events comparison unreadable
    # — VERDICT r2 #8), plus the spread so the regression table can say
    # "noise" with data
    queries = entrymod.queries()
    timings: dict[str, float] = {"extract_pipeline": round(extract_sec, 3)}
    spreads: dict[str, float] = {
        "extract_pipeline": round(max(runs) - min(runs), 3)
    }
    for name in HEADLINE_QUERIES:
        if name == "extract_text":
            continue  # already measured as extract_pipeline
        q = []
        for _ in range(3):
            t0 = time.monotonic()
            queries[name](spark, sf_dir).count()
            q.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(q), 3)
        spreads[name] = round(max(q) - min(q), 3)

    # The r3 driver record came back ``parsed: null`` because the printed
    # line carried two full per-query maps + long protocol strings and the
    # driver's tail buffer truncated its front (VERDICT r3 "missing" #1).
    # Keep the printed line SHORT — headline + queries map (driver spec) +
    # numeric scaling/submit evidence — and park everything verbose in
    # BENCH/bench_detail_<sf>.json.
    out = {
        "metric": "docs_per_sec_extract",
        "value": round(docs_per_sec, 2),
        "unit": "docs/sec",
        "queries": timings,
        "sf": tag,
        "cpus": int(cpus),
    }
    detail = {
        "n_docs_extracted": n_docs,
        "corpus_build_sec": round(corpus_build_sec, 3),
        "query_spread": spreads,  # max−min over the 3 runs, per query
        "extract_runs": [round(r, 3) for r in runs],
    }
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    # fold in the latest two-level scaling evidence if present
    scaling_path = os.path.join(bench_dir, "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        out["scaling_efficiency"] = s.get("scaling_efficiency")
        out["scaling_levels"] = s.get("scaling_levels") or [
            s.get("low", {}).get("cores"), s.get("high", {}).get("cores")
        ]
        detail["scaling_protocol"] = s.get("protocol")
        out["machine_ceiling"] = s.get(
            "machine_ceiling_1_4",
            s.get("machine_calibration", {}).get("machine_efficiency"),
        )
        if "pair_4_16" in s:  # second N→4N pair, r2-comparable protocol
            out["scaling_4_16_raw"] = s["pair_4_16"].get("raw_min")
            out["scaling_4_16_normalized"] = s["pair_4_16"].get("normalized")
    # fold in the spark-submit --py-files launch evidence if present
    # (scripts/submit_bench.py; the north rule's prescribed launch shape)
    submit_path = os.path.join(bench_dir, "submit.json")
    if os.path.exists(submit_path):
        with open(submit_path) as f:
            sub = json.load(f)
        out["submit_efficiency"] = sub.get("efficiency_median_of_pairs")
        out["submit_levels"] = sub.get("levels")
        out["submit_resume_new_rows"] = sub.get("resume_new_rows")
        detail["submit_mechanism"] = sub.get("mechanism")
    try:
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, f"bench_detail_{tag}.json"), "w") as f:
            json.dump({**out, **detail}, f, indent=1)
    except OSError:
        pass  # detail file is best-effort; the printed line is the record
    line = json.dumps(out)
    if len(line) > 3500:  # stay inside the driver's tail buffer
        # deterministic subset — alphabetical, NOT top-N-by-time: a
        # timing-dependent subset would differ run to run, breaking any
        # consumer (regression_bench) that joins queries across runs
        slim = dict(out)
        keep = ["extract_pipeline"] + sorted(k for k in timings if k != "extract_pipeline")[:20]
        slim["queries"] = {k: timings[k] for k in keep if k in timings}
        line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    main()
