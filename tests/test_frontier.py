"""Frontier scheduler (frontier.py): per-host slots/ETAs, canonical
dedup, priority ordering, robots-delay join, per-host caps, waves."""

import pytest

from pypdfocr_spark import frontier


def test_frontier_schedule_basic(spark):
    cands = spark.createDataFrame(
        [
            ("https://a.com/1", 5.0),
            ("https://A.com/1#frag", 9.0),   # canonical dup of /1
            ("https://a.com/2", 9.0),
            ("https://a.com/3", 1.0),
            ("https://b.org/x", 0.0),
        ],
        "url STRING, score DOUBLE",
    )
    meta = spark.createDataFrame(
        [("a.com", 2.5), ("b.org", None)],
        "host STRING, crawl_delay DOUBLE",
    )
    out = frontier.frontier_schedule(
        cands, host_meta=meta, priority_col="score", default_delay=1.0
    )
    rows = {r["canon_url"]: r for r in out.collect()}
    # dup collapsed, max priority kept -> /1 ties /2 at 9.0, url tiebreak
    assert len(rows) == 4
    a = sorted(
        (r for r in rows.values() if r["host"] == "a.com"),
        key=lambda r: r["slot"],
    )
    assert [r["canon_url"] for r in a] == [
        "https://a.com/1", "https://a.com/2", "https://a.com/3",
    ]
    assert [r["slot"] for r in a] == [0, 1, 2]
    assert [r["eta_sec"] for r in a] == [0.0, 2.5, 5.0]   # robots delay
    assert rows["https://b.org/x"]["eta_sec"] == 0.0      # null delay -> default
    # dup keeps min raw url deterministically
    assert rows["https://a.com/1"]["url"] == "https://A.com/1#frag"


def test_frontier_priors_cap_waves(spark):
    cands = spark.createDataFrame(
        [(f"https://h{i % 2}.net/p{j}",) for i in range(2) for j in range(5)],
        "url STRING",
    )
    priors = spark.createDataFrame(
        [("h0.net", 0.7), ("h1.net", 0.2)], "host STRING, prior DOUBLE"
    )
    out = frontier.frontier_schedule(
        cands,
        host_priors=priors,
        default_delay=2.0,
        max_per_host=3,
        wave_sec=3.0,
    ).collect()
    assert len(out) == 6                                  # cap applied
    by = {(r["host"], r["slot"]): r for r in out}
    assert all(r["slot"] < 3 for r in out)
    assert by[("h0.net", 0)]["prior"] == 0.7
    assert by[("h1.net", 2)]["prior"] == 0.2
    assert by[("h1.net", 2)]["eta_sec"] == 4.0
    assert by[("h1.net", 2)]["wave"] == 1                 # floor(4/3)
    assert by[("h0.net", 0)]["wave"] == 0
    # without priors the prior column is absent
    plain = frontier.frontier_schedule(cands)
    assert "prior" not in plain.columns and "wave" not in plain.columns


def test_frontier_args(spark):
    df = spark.createDataFrame([("https://a.com/x",)], "url STRING")
    with pytest.raises(ValueError):
        frontier.frontier_schedule(df, default_delay=-1)
    with pytest.raises(ValueError):
        frontier.frontier_schedule(df, max_per_host=0)
    with pytest.raises(ValueError):
        frontier.frontier_schedule(df, wave_sec=0)
