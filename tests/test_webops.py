"""Web-corpus ops (webops.py): URL canonicalization, host rollup,
deterministic stratified sampling, repetition stats."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from pypdfocr_spark import webops


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "doc_id INT, url STRING")
    rows = webops.canonicalize_url_df(df).orderBy("doc_id").collect()
    return [r["canon_url"] for r in rows]


def test_canonicalize_url_rules(spark):
    got = _canon(spark, [
        "HTTPS://Example.COM/Path/Doc.html#frag",        # case + fragment
        "https://example.com:443/a",                     # default port
        "http://example.com:80/a",                       # default port (http)
        "http://example.com:8080/a",                     # NON-default port kept
        "https://example.com/p?utm_source=x&fbclid=1",   # all-tracking query
        "https://example.com/p?a=1&utm_medium=m&b=2",    # mixed query
        "https://example.com/dir/",                      # trailing slash
        "https://example.com/",                          # root slash KEPT
        "https://example.com/my doc.pdf",                # space
    ])
    assert got == [
        "https://example.com/Path/Doc.html",
        "https://example.com/a",
        "http://example.com/a",
        "http://example.com:8080/a",
        "https://example.com/p",
        "https://example.com/p?a=1&b=2",
        "https://example.com/dir",
        "https://example.com/",
        "https://example.com/my%20doc.pdf",
    ]


def test_host_stats_rollup(spark):
    df = spark.createDataFrame(
        [("https://a.com/x", 10), ("https://a.com/y", 20), ("https://a.com/x", 5),
         ("https://b.org/z", 7)],
        "canon_url STRING, n_chars INT",
    )
    rows = {r["host"]: r for r in webops.host_stats_df(df).collect()}
    assert rows["a.com"]["n_docs"] == 3 and rows["a.com"]["n_urls"] == 2
    assert rows["a.com"]["total_chars"] == 35 and rows["b.org"]["n_docs"] == 1


def test_stratified_sample_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(400)], "doc_id INT, lang STRING"
    )
    a = {r["doc_id"] for r in webops.stratified_sample_df(df).collect()}
    b = {r["doc_id"] for r in webops.stratified_sample_df(df.repartition(7)).collect()}
    assert a == b  # partition-layout independent (resume-safe)
    en = sum(1 for i in a if i % 2 == 0) / 200
    zh = sum(1 for i in a if i % 2 == 1) / 200
    assert en == pytest.approx(0.5, abs=0.15)   # '80000000' ≈ 1/2
    assert zh == pytest.approx(0.25, abs=0.12)  # '40000000' ≈ 1/4


def test_repetition_stats_values_and_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w")], "doc_id INT, text STRING"
    )
    out = webops.repetition_stats_df(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["distinct_ratio"] == pytest.approx(2 / 5)
    assert rows[1]["top_token_frac"] == pytest.approx(3 / 5)
    assert rows[2]["distinct_ratio"] == 1.0 and rows[2]["top_token_frac"] == pytest.approx(1 / 4)
    # the 100-TB claim: expression-only, ZERO shuffle in the plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_grouped_quantiles_exact(spark):
    from pypdfocr_spark import webops

    # group g: values 10,20,30,40 -> n=4; p25=rank1=10, p50=rank2=20, p75=rank3=30
    # group h: single value -> all quantiles equal it
    df = spark.createDataFrame(
        [(1, "g", 40), (2, "g", 10), (3, "g", 30), (4, "g", 20), (5, "h", 7)],
        ["doc_id", "lang", "n_chars"],
    )
    rows = {r["lang"]: r for r in webops.grouped_quantiles_df(df).collect()}
    assert rows["g"]["n_docs"] == 4
    assert (rows["g"]["p25"], rows["g"]["p50"], rows["g"]["p75"]) == (10, 20, 30)
    assert (rows["h"]["p25"], rows["h"]["p50"], rows["h"]["p75"]) == (7, 7, 7)


def test_dup_ngram_frac(spark):
    from pypdfocr_spark import webops

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # "a b" x3, "b a" x2 -> all 5 grams dup
            (2, "w x y z"),          # 3 grams, all unique
            (3, "solo"),             # <2 tokens -> zero grams, kept at 0
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in webops.dup_ngram_frac_df(df, n=2).collect()}
    assert rows[1]["n_grams"] == 5 and rows[1]["dup_gram_chars"] == 5 * 3
    assert rows[1]["dup_gram_frac"] == 1.0  # every occurrence is a dup; bounded [0,1]
    assert rows[2]["dup_gram_chars"] == 0 and rows[2]["dup_gram_frac"] == 0.0
    assert rows[3]["n_grams"] == 0 and rows[3]["dup_gram_frac"] == 0.0
