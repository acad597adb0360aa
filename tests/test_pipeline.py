"""Spark pipeline integration tests: byte-identity vs the pure-Python
oracle, skew path equivalence, lineage accounting, resume semantics.

This is the rebuild analog of the reference's end-to-end golden tests
(test/test_pypdfocr.py:51-83): run the real pipeline over a corpus,
assert the extracted text — here byte-identical per url, which is
strictly stronger than the reference's keyword-tolerant check.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pypdfocr_spark import corpus as ck
from pypdfocr_spark import lineage, pipeline
from pypdfocr_spark.config import DEFAULT_ROUTE, DEFAULT_TARGETS, ExtractConfig

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def oracle_rows():
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pylist()
    rows = [
        ck.build_corpus_row(r["doc_id"], r["text"], r["lang"], r["source"]) for r in tbl
    ]
    return ck.oracle_extract(rows, DEFAULT_TARGETS, DEFAULT_ROUTE)


@pytest.fixture(scope="module")
def extracted(spark):
    df = pipeline.extract_from_documents(spark, SF_SMOKE, ExtractConfig())
    return {r["url"]: r.asDict() for r in df.collect()}


def test_byte_identity_per_url(oracle_rows, extracted):
    """Every url's extracted_text is byte-identical to the single-machine
    oracle — including the heavy docs that took the exploded page path."""
    assert len(extracted) == len(oracle_rows)
    for o in oracle_rows:
        s = extracted[o["url"]]
        assert s["extracted_text"] == o["extracted_text"], o["url"]
        assert s["extracted_norm"] == o["extracted_norm"], o["url"]
        assert s["route"] == o["route"], o["url"]
        assert s["n_pages"] == o["n_pages"], o["url"]
        assert s["status"] == o["status"], o["url"]


def test_heavy_docs_took_page_path(oracle_rows, extracted):
    heavy = [o for o in oracle_rows if o["n_pages"] > 50]
    assert heavy, "corpus must contain a skew tail"
    for o in heavy:
        assert extracted[o["url"]]["extracted_text"] == o["extracted_text"]


def test_source_filter_excludes_own_outputs(spark):
    df = pipeline.build_corpus_df(spark, SF_SMOKE)
    total = df.count()
    kept = pipeline.source_filter(df).count()
    assert total == 500 and kept == 400  # 20% _ocr.pdf/_test.pdf


def test_lineage_accounts_every_doc(spark, tmp_path):
    cfg = ExtractConfig()
    out = pipeline.extract_from_documents(spark, SF_SMOKE, cfg)
    stats = lineage.commit(out, str(tmp_path), run_id="r1")
    assert stats["run_id"] == "r1"
    lin = spark.read.parquet(f"{tmp_path}/lineage")
    agg = lin.agg(F.sum("doc_count").alias("n"), F.sum("byte_count").alias("b")).first()
    assert agg["n"] == 400
    assert agg["b"] > 0
    assert lin.where(F.col("run_id") != "r1").count() == 0


def test_resume_skips_committed(spark, tmp_path):
    cfg = ExtractConfig()
    corpus_df = pipeline.source_filter(pipeline.build_corpus_df(spark, SF_SMOKE))
    # commit the first half (by url hash), then resume over the full input
    first_half = corpus_df.where(F.xxhash64("url") % 2 == 0)
    lineage.commit(pipeline.extract(first_half, cfg), str(tmp_path), run_id="half")
    remaining = lineage.resume_filter(corpus_df, str(tmp_path))
    committed_n = first_half.count()
    assert remaining.count() == 400 - committed_n
    # nothing already committed reappears
    done = {r["url"] for r in spark.read.parquet(f"{tmp_path}/extracted").select("url").collect()}
    todo = {r["url"] for r in remaining.select("url").collect()}
    assert not (done & todo)


def test_resume_noop_without_snapshot(spark, tmp_path):
    corpus_df = pipeline.source_filter(pipeline.build_corpus_df(spark, SF_SMOKE))
    assert lineage.resume_filter(corpus_df, str(tmp_path / "nope")).count() == 400


def test_jvm_reassembly_parity(spark):
    """The JVM heavy-path reassembly (default) must be row-identical to
    the original applyInPandas reassembly — over the real corpus (heavy
    tail included) AND the failure fixtures (decode_error, unsupported,
    mixed-page statuses), with wall_ms excluded (a timing column)."""
    import dataclasses
    import datetime

    from pypdfocr_spark.kernels import codec
    from pypdfocr_spark.schema import CORPUS_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    pad = 300_000
    good_page = {"dpi": 300, "w_px": 2550, "h_px": 3300,
                 "words": [{"t": "spark window", "b": [10, 10, 80, 40], "l": 0}]}
    plain_page = {"dpi": 300, "w_px": 2550, "h_px": 3300,
                  "words": [{"t": "nothing-here", "b": [10, 10, 80, 40], "l": 0}]}
    fixtures = [
        ("https://a.example/corrupt.pdf", ts,
         codec.MAGIC + b'{"dpi":300,"words":[]}\n{garbage' + b"x" * pad, "", "en"),
        ("https://a.example/blob.bin", ts, b"\x00\x01" + b"y" * pad, "", "en"),
        # routed via a page match on a late page (page-order reduction)
        ("https://a.example/late-route.pdf", ts,
         codec.encode_doc([plain_page] * 200 + [good_page]), "", "en"),
        # no page match → filename fallback ('table' ∈ targets['storage'])
        ("https://a.example/table-report.pdf", ts,
         codec.encode_doc([plain_page] * 200), "", "en"),
    ]
    fixture_df = spark.createDataFrame(
        [(u, t, p, x, l, len(p)) for (u, t, p, x, l) in fixtures], CORPUS_SCHEMA
    )
    corpus_df = pipeline.build_corpus_df(spark, SF_SMOKE).unionByName(fixture_df)
    cfg_jvm = ExtractConfig()
    cfg_py = dataclasses.replace(cfg_jvm, python_reassembly=True)
    cols = [c for c in pipeline.extract(corpus_df, cfg_jvm).columns if c != "wall_ms"]
    got_jvm = sorted(map(tuple, pipeline.extract(corpus_df, cfg_jvm).select(cols).collect()))
    got_py = sorted(map(tuple, pipeline.extract(corpus_df, cfg_py).select(cols).collect()))
    assert got_jvm == got_py
    by_url = {r[0]: r for r in got_jvm}
    assert by_url["https://a.example/late-route.pdf"][cols.index("route")] == "spark_docs"
    assert by_url["https://a.example/table-report.pdf"][cols.index("route")] == "storage"


def test_heavy_path_failures_reach_status_and_lineage(spark):
    """A failing HEAVY document must surface a non-ok status (and thus a
    lineage failure), not be silently committed as ok — per-page statuses
    ride the salted shuffle and reassemble to the first non-ok status."""
    import datetime

    from pypdfocr_spark.kernels import codec
    from pypdfocr_spark.schema import CORPUS_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    pad = 300_000  # > heavy_payload_bytes → heavy branch
    good_page = {"dpi": 300, "w_px": 2550, "h_px": 3300,
                 "words": [{"t": "hello", "b": [10, 10, 80, 40], "l": 0}]}
    rows = [
        # corrupt SYNPDF: valid magic, garbage page JSON on page 2
        ("https://a.example/corrupt.pdf", ts,
         codec.MAGIC + b'{"dpi":300,"words":[]}\n{garbage' + b"x" * pad, "", "en"),
        # non-HTML garbage payload → unsupported
        ("https://a.example/blob.bin", ts, b"\x00\x01" + b"y" * pad, "", "en"),
        # huge HTML → ok via boilerplate strip
        ("https://a.example/big.html", ts,
         b"<html><body><p>" + b"word " * (pad // 5) + b"</p></body></html>", "", "en"),
        # valid multi-page SYNPDF padded heavy via many pages
        ("https://a.example/good.pdf", ts,
         codec.encode_doc([good_page] * 400), "", "en"),
    ]
    corpus_df = spark.createDataFrame(
        [(u, t, p, x, l, len(p)) for (u, t, p, x, l) in rows], CORPUS_SCHEMA
    )
    out = {r["url"]: r.asDict() for r in pipeline.extract(corpus_df, ExtractConfig()).collect()}
    assert out["https://a.example/corrupt.pdf"]["status"] == "decode_error"
    assert out["https://a.example/corrupt.pdf"]["extracted_text"] == ""
    assert out["https://a.example/corrupt.pdf"]["n_pages"] == 0
    assert out["https://a.example/blob.bin"]["status"] == "unsupported"
    assert out["https://a.example/big.html"]["status"] == "ok"
    assert "word" in out["https://a.example/big.html"]["extracted_text"]
    assert out["https://a.example/good.pdf"]["status"] == "ok"
    assert out["https://a.example/good.pdf"]["n_pages"] == 400

    extracted = pipeline.extract(corpus_df, ExtractConfig())
    lin = lineage.lineage_rows(extracted, run_id="t").collect()
    failed = {u for r in lin for u in r["failures"]}
    assert "https://a.example/corrupt.pdf" in failed
    assert "https://a.example/blob.bin" in failed
    assert "https://a.example/good.pdf" not in failed


def test_materialize_corpus_size_class_file_layout(spark, tmp_path):
    """r6 layout: light and heavy rows land in DISJOINT files (each
    file's n_bytes range sits entirely on one side of the threshold, so
    the branches' pushed filters prune at file level), and the reader
    returns exactly the same row set as the direct corpus build."""
    import pyarrow.parquet as pq
    import glob as _glob

    from pypdfocr_spark.config import HEAVY_PAYLOAD_BYTES

    path = str(tmp_path / "corpus")
    out = pipeline.materialize_corpus(spark, "/root/testdata/sf0.001", path)
    direct = pipeline.build_corpus_df(spark, "/root/testdata/sf0.001")
    assert sorted(r["url"] for r in out.select("url").collect()) == sorted(
        r["url"] for r in direct.select("url").collect()
    )
    mixed = []
    for f in _glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                if c.path_in_schema == "n_bytes":
                    lo, hi = c.statistics.min, c.statistics.max
                    if lo <= HEAVY_PAYLOAD_BYTES < hi:
                        mixed.append((f, lo, hi))
    assert mixed == [], f"files mixing size classes: {mixed}"
