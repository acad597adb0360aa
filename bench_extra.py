#!/usr/bin/env python
"""Per-query isolation benchmark (optimization guide §1.4) — NOT the
driver-timed bench (bench.py is frozen; this file exists so optimization
rounds can time individual queries without the end-to-end harness).

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [query ...]

* times each declared query twice per rep: ``.count()`` (the frozen
  bench's methodology, so numbers are comparable to BENCH_r*.json) and a
  ``noop``-sink write (computes every column — isolates the computation
  from count-only pruning);
* ``BENCH_EXTRA_PLANS=<dir>`` additionally writes ``<query>_<suffix>.txt``
  files with the ``explain("formatted")`` output
  (``BENCH_EXTRA_SUFFIX``, default ``plan``);
* ``BENCH_EXTRA_REPS`` (default 3) timed reps after 1 warm-up;
* prints one JSON line per query and a final summary JSON line.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from pypdfocr_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    plans_dir = os.environ.get("BENCH_EXTRA_PLANS")
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "plan")
    wanted = sys.argv[1:]

    spark = get_spark("pypdfocr-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    if wanted:
        missing = [n for n in wanted if n not in queries]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        queries = {n: queries[n] for n in wanted}

    summary: dict[str, dict] = {}
    for name, fn in queries.items():
        df = fn(spark, sf_dir)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        counts, noops = [], []
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, sf_dir).count()
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: count rep{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            counts.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name}: noop rep{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noops.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec = {
            "count_median": round(statistics.median(counts), 3),
            "count_min": min(counts),
            "noop_median": round(statistics.median(noops), 3),
            "noop_min": min(noops),
            "counts": counts,
            "noops": noops,
        }
        summary[name] = rec
        print(json.dumps({"query": name, "sf": os.path.basename(os.path.normpath(sf_dir)), **rec}), flush=True)
    print(json.dumps({"summary": {n: r["count_median"] for n, r in summary.items()},
                      "sf": os.path.basename(os.path.normpath(sf_dir)), "cpus": int(cpus)}))


if __name__ == "__main__":
    main()
