#!/usr/bin/env python
"""Scaling evidence for the WARC→text front door (webtext.warc_extract).

Same two-level protocol as scaling_bench.py: the identical job at
local[4] and local[16] (16 physical cores on this box; never 8 vs 32 —
SMT pollutes the ratio), each level in its own JVM, 1 warm-up + 5 timed
runs, MIN estimator (co-tenant noise strictly inflates times), median
disclosed alongside. Input: a deterministic synthetic archive set — N
``.warc.gz`` files with per-record gzip members (the Common Crawl
layout), K HTML pages each, page text derived from md5(doc id) so the
corpus is byte-stable across runs and machines. The job is the real
source path: binaryFile scan → fused warc_extract → count.

Env knobs: WEBTEXT_BENCH_ARCHIVES (default 128), WEBTEXT_BENCH_PAGES
(default 200), WEBTEXT_BENCH_LEVELS (default "4,16").

Writes BENCH/webtext_scaling.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def page_html(arc: int, page: int) -> bytes:
    """A ~3.5 KB deterministic page: boilerplate chrome around six real
    paragraphs and one link-dense block — enough structure that the
    boilerplate classifier does real work per page."""
    def words(tag: str, n: int) -> str:
        out = []
        k = 0
        while len(out) < n:
            h = hashlib.md5(f"{arc}:{page}:{tag}:{k}".encode()).hexdigest()
            out.extend(h[i : i + 6] for i in range(0, 30, 6))
            k += 1
        return " ".join(out[:n])

    paras = "\n".join(
        f"<p>{words(f'p{i}', 60)}.</p>" for i in range(6)
    )
    links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in words("nav", 12).split()
    )
    return (
        "<!DOCTYPE html>\n"
        f'<html lang="en"><head><meta charset="utf-8">'
        f"<title>doc {arc}-{page}</title>"
        f'<meta name="description" content="{words("meta", 8)}">'
        "<style>body{margin:0}</style><script>var q=1;</script></head>"
        f"<body><header><h1>{words('hdr', 6)}</h1></header>"
        f"<nav>{links}</nav><article>{paras}</article>"
        f"<div>{links} {links}</div>"
        f"<footer><p>{words('ftr', 20)}</p></footer></body></html>"
    ).encode()


def build_archives(n_archives: int, n_pages: int) -> str:
    from pypdfocr_spark import webtext

    root = f"/tmp/webtext_bench_{n_archives}x{n_pages}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    for a in range(n_archives):
        recs = [
            {
                "type": "response",
                "uri": f"https://bench.example/{a}/{p}",
                "date": "2020-01-02T03:04:05Z",
                "block": webtext.encode_http_response(page_html(a, p)),
            }
            for p in range(n_pages)
        ]
        buf = webtext.encode_warc(recs, gzip_members=True)
        with open(os.path.join(root, f"arc-{a:05d}.warc.gz"), "wb") as f:
            f.write(buf)
    with open(marker, "w") as f:
        f.write("ok")
    return root


CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from pypdfocr_spark.session import get_spark
from pypdfocr_spark import webtext

cores = int(sys.argv[1])
root = sys.argv[2]
spark = get_spark(f"webtext-scaling-{{cores}}", master=f"local[{{cores}}]")
# one binaryFile per task at every level: archives are the parallelism
# unit (binaryFile never splits; stop small files from coalescing so
# both levels see identical task granularity)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
spark.conf.set("spark.sql.files.openCostInBytes", str(1024 * 1024))
spark.sparkContext.setLogLevel("ERROR")
src = webtext.read_warc_archives(spark, root + "/*.warc.gz")

times, n = [], 0
for i in range(6):
    t0 = time.monotonic()
    n = webtext.warc_extract(src).where("ok").count()
    dt = time.monotonic() - t0
    if i:
        times.append(dt)
med = statistics.median(times)
best = min(times)
print(json.dumps({{"cores": cores, "n_pages": n,
                   "runs_sec": [round(t, 3) for t in times],
                   "median_sec": round(med, 3), "best_sec": round(best, 3),
                   "pages_per_sec": round(n / best, 2),
                   "pages_per_sec_median": round(n / med, 2)}}))
"""


def run_level(cores: int, root: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), root],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_arc = int(os.environ.get("WEBTEXT_BENCH_ARCHIVES", "128"))
    n_pages = int(os.environ.get("WEBTEXT_BENCH_PAGES", "200"))
    levels = [
        int(x)
        for x in os.environ.get("WEBTEXT_BENCH_LEVELS", "4,16").split(",")
    ]
    root = build_archives(n_arc, n_pages)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for f in os.listdir(root)
        if f.endswith(".warc.gz")
    )
    results = [run_level(c, root) for c in levels]
    lo, hi = results[0], results[-1]
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / (
        hi["cores"] / lo["cores"]
    )
    out = {
        "job": "binaryFile scan -> fused warc_extract -> count",
        "n_archives": n_arc,
        "pages_per_archive": n_pages,
        "archive_bytes_total": total_bytes,
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "estimator": "min of 5 (median disclosed)",
    }
    path = os.path.join(REPO, "BENCH", "webtext_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
