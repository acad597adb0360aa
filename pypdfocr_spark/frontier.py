"""Crawl-frontier scheduling: turn a candidate URL set (sitemap seeds,
extracted outlinks) into a politeness-aware fetch plan — the step
between link discovery and the WARC front door. Composes the round's
pieces: `robots.robots_filter` upstream decides WHAT may be fetched;
`robots.robots_meta` supplies per-host crawl delays; host priors
(`linkgraph.pagerank` / `harmonic_centrality` / anchor counts) decide
the order WITHIN each host's budget.

Semantics (one fetch connection per host, the classic frontier model):
a host's k-th scheduled URL (0-based, priority order) fetches at
``eta_sec = k * delay(host)``. ``eta_sec`` is scheduling metadata for
the fetcher fleet, not a promise of wall-clock alignment across hosts.

Scale shape: one window shuffle keyed by host assigns slots (per-host
frontier slices are crawl-bounded, thousands not billions — a window
partition is safe where a global sort would not be); the two joins
(per-host delay, per-host prior) are slim host-keyed relations,
broadcast-eligible. Everything is JVM-side expressions — zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import webops


def frontier_schedule(
    candidates: DataFrame,
    host_meta: "DataFrame | None" = None,
    host_priors: "DataFrame | None" = None,
    url_col: str = "url",
    priority_col: "str | None" = None,
    default_delay: float = 1.0,
    max_per_host: "int | None" = None,
    wave_sec: "float | None" = None,
) -> DataFrame:
    """Schedule candidate URLs into per-host fetch slots.

    * ``host_meta``: (host, crawl_delay) — `robots.robots_meta` output;
      null/missing delay falls back to ``default_delay``.
    * ``host_priors``: (host, prior double) — e.g. PageRank of the
      host; higher prior = earlier within the host AND carried out for
      cross-host ordering by the fetcher.
    * ``priority_col``: per-URL priority column on ``candidates``
      (e.g. anchor count); tie-breaks inside a host before the
      deterministic canon-URL tiebreak.
    * ``max_per_host``: per-host frontier cap (domain-budget analog of
      `webops.domain_cap` — drop the tail, keep the head).
    * ``wave_sec``: also emit ``wave = floor(eta_sec / wave_sec)`` so
      the fetcher fleet can bucket work into synchronized rounds.

    Returns (url, canon_url, host, slot, eta_sec[, wave][, prior]) with
    exact-duplicate canonical URLs collapsed (min url keeps the row, so
    the result is deterministic under relayout).
    """
    if default_delay < 0:
        raise ValueError("default_delay must be >= 0")
    canon = webops.canonicalize_url(F.col(url_col))
    prio = (
        F.col(priority_col).cast("double")
        if priority_col
        else F.lit(0.0)
    )
    base = (
        candidates.select(
            F.col(url_col).alias("url"),
            canon.alias("canon_url"),
            prio.alias("_prio"),
        )
        .where(F.col("canon_url") != "")
        .groupBy("canon_url")
        .agg(
            F.min("url").alias("url"),
            F.max("_prio").alias("_prio"),
        )
        .withColumn("host", webops.host_of(F.col("canon_url")))
        .where(F.col("host") != "")
    )
    if host_priors is not None:
        # host-level prior: constant within a host, carried out for the
        # fetcher's cross-host ordering
        base = base.join(
            host_priors.select("host", F.col("prior").cast("double")),
            "host",
            "left",
        ).withColumn("prior", F.coalesce(F.col("prior"), F.lit(0.0)))
    w = Window.partitionBy("host").orderBy(
        F.col("_prio").desc(), F.col("canon_url")
    )
    out = base.withColumn("slot", F.row_number().over(w) - F.lit(1))
    if max_per_host is not None:
        if max_per_host < 1:
            raise ValueError("max_per_host must be >= 1")
        out = out.where(F.col("slot") < max_per_host)
    if host_meta is not None:
        out = out.join(
            host_meta.select("host", F.col("crawl_delay").cast("double")),
            "host",
            "left",
        )
    else:
        out = out.withColumn("crawl_delay", F.lit(None).cast("double"))
    out = out.withColumn(
        "eta_sec",
        F.col("slot")
        * F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
    ).drop("_prio", "crawl_delay")
    if wave_sec is not None:
        if wave_sec <= 0:
            raise ValueError("wave_sec must be > 0")
        out = out.withColumn(
            "wave", F.floor(F.col("eta_sec") / F.lit(float(wave_sec)))
        )
    return out
