"""Web link graph: outlink extraction, host-level graph construction,
and PageRank — the Common-Crawl-style webgraph ranking step a crawl
curation pipeline runs to score hosts (quality priors, crawl-frontier
ordering, domain weighting for training-data sampling).

Three layers, each independently usable:

* :func:`outlinks_table` — per-page ``<a href>`` extraction from raw
  HTML bytes (one mapInPandas stage, the only Python in the module):
  charset sniff, ``<base href>`` resolution, relative→absolute via
  ``urllib.parse.urljoin``, http(s)-only, anchor text and
  ``rel=nofollow`` carried. Python does only the parsing; URL
  canonicalization and host extraction stay JVM-side
  (``webops.canonicalize_url`` / ``host_of``), so the hot path after
  the parse is whole-stage codegen.
* :func:`host_graph` — (src_host, dst_host, n_links) aggregation over
  the outlinks: canonicalize → host → one map-side-combinable hash
  aggregation. Self-loops dropped by default (intra-host nav links
  dominate raw counts and carry no ranking signal).
* :func:`pagerank` — classic damped PageRank with dangling-mass
  redistribution (Page et al. 1999; the power-iteration formulation):

      r'(v) = (1-d)/N + d * ( sum_{u->v} r(u) * w(u,v)/W(u) + D/N )

  where ``D`` is the total rank mass sitting on dangling nodes (no
  out-edges) that iteration. Total mass is conserved at 1 every
  iteration (pytest-pinned), so ranks are comparable across graphs.

Scale shape of :func:`pagerank` (the part that must survive 10^12
edges): the edge relation is normalized ONCE (``frac = w/W(u)``),
hash-partitioned by ``src`` and persisted — every subsequent iteration
shuffles only the slim (node, rank) relation into that layout, joins,
and runs one map-side-combinable sum per ``dst``. Per iteration that is
ONE small shuffle (ranks, |V| rows) plus one aggregation shuffle
(|E|→|V| after partial aggs); the |E|-row edge table never moves again.
The dangling mass and the node count are single scalars collected per
iteration — driver-side by design, like the k-means centroid loop
(`similarity.py` kmeans_centroids): they are O(1) values, not data.
Lineage is cut with ``localCheckpoint`` every ``checkpoint_interval``
iterations so the plan does not grow with the iteration count.

Floating-point note: per-``dst`` sums run in shuffle arrival order, so
ranks are deterministic only up to double rounding (~1e-15 per term);
tests compare against a numpy replica at 1e-9 and pin exact rational
fixtures (two-node cycle = [1/2, 1/2]) where order cannot matter.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser
from typing import TYPE_CHECKING
from urllib.parse import urljoin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from . import webops
from .webtext import sniff_charset

if TYPE_CHECKING:
    import pandas as pd


class _LinkParser(HTMLParser):
    """Collect ``<a href>`` links with anchor text and rel flags.
    Follows the same stdlib-HTMLParser tolerance model as
    ``webtext._BlockParser``; honors the FIRST ``<base href>`` (HTML
    spec: subsequent base elements are ignored)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.base: "str | None" = None
        self.links: "list[tuple[str, str, bool]]" = []  # href, anchor, nofollow
        self._href: "str | None" = None
        self._nofollow = False
        self._anchor: "list[str]" = []

    def _close_anchor(self) -> None:
        if self._href is not None:
            text = re.sub(r"\s+", " ", "".join(self._anchor)).strip()
            self.links.append((self._href, text, self._nofollow))
        self._href = None
        self._nofollow = False
        self._anchor = []

    def handle_starttag(self, tag, attrs):
        if tag == "base" and self.base is None:
            href = dict(attrs).get("href")
            if href:
                self.base = href
        elif tag == "a":
            self._close_anchor()  # malformed nesting: flush the open one
            d = dict(attrs)
            self._href = d.get("href")
            rel = (d.get("rel") or "").lower().split()
            self._nofollow = "nofollow" in rel

    def handle_endtag(self, tag):
        if tag == "a":
            self._close_anchor()

    def handle_data(self, data):
        if self._href is not None:
            self._anchor.append(data)

    def close(self):
        super().close()
        self._close_anchor()


_SKIP_SCHEMES = ("mailto:", "javascript:", "tel:", "data:", "about:")


def extract_outlinks(
    payload: bytes, base_url: str, http_charset: "str | None" = None
) -> "list[tuple[str, str, bool]]":
    """(absolute_url, anchor_text, nofollow) for every followable
    ``<a href>`` in the page. Fragment-only links and non-web schemes
    are dropped; relative links resolve against ``<base href>`` when
    present, else the page URL. Fragments are stripped here (cheap and
    unconditional); full canonicalization is the caller's JVM-side step.
    """
    charset = http_charset or sniff_charset(bytes(payload))
    try:
        html = bytes(payload).decode(charset, errors="replace")
    except LookupError:
        html = bytes(payload).decode("utf-8", errors="replace")
    p = _LinkParser()
    p.feed(html)
    p.close()
    base = urljoin(base_url, p.base) if p.base else base_url
    out = []
    for href, anchor, nofollow in p.links:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if any(low.startswith(s) for s in _SKIP_SCHEMES):
            continue
        try:
            absu = urljoin(base, href)
        except ValueError:
            continue
        if not absu.startswith(("http://", "https://")):
            continue
        absu = absu.split("#", 1)[0]
        if absu:
            out.append((absu, anchor, nofollow))
    return out


OUTLINKS_SCHEMA = StructType(
    [
        StructField("src_url", StringType()),
        StructField("dst_url", StringType()),
        StructField("anchor_text", StringType()),
        StructField("nofollow", BooleanType()),
    ]
)


def outlinks_table(
    df: DataFrame, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """Explode pages into outlink rows — one Arrow stage, variable
    fan-out handled naturally by mapInPandas (no JVM-side explode of a
    Python-built array column, so link-heavy pages never materialize a
    giant intermediate row). Parse failures contribute zero rows rather
    than killing the task (malformed page ≠ dead task, the
    ``warc_extract`` convention)."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        cols = [f.name for f in OUTLINKS_SCHEMA]
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    for absu, anchor, nofollow in extract_outlinks(
                        bytes(payload), url
                    ):
                        rows.append((url, absu, anchor, nofollow))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, OUTLINKS_SCHEMA)


def host_graph(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    drop_self: bool = True,
    follow_only: bool = True,
) -> DataFrame:
    """Host-level link graph: canonicalize both endpoints, extract
    hosts, aggregate to (src, dst, n_links). One hash aggregation —
    map-side partials collapse the page-level fan-out before the
    shuffle, so the shuffled volume is O(|host pairs|), not O(|links|).
    ``follow_only`` drops rel=nofollow edges when the column is present
    (the webgraph convention — nofollow is an explicit no-endorsement
    signal)."""
    if follow_only and "nofollow" in links.columns:
        links = links.where(~F.col("nofollow"))
    g = links.select(
        webops.host_of(webops.canonicalize_url(F.col(src_col))).alias("src"),
        webops.host_of(webops.canonicalize_url(F.col(dst_col))).alias("dst"),
    ).where((F.col("src") != "") & (F.col("dst") != ""))
    if drop_self:
        g = g.where(F.col("src") != F.col("dst"))
    return g.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_links"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: "str | None" = None,
    num_partitions: "int | None" = None,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Damped PageRank with dangling-mass redistribution over an edge
    DataFrame; returns (node, rank) with sum(rank) == 1. Duplicate
    edges act as weight (or pass ``weight_col``). See the module
    docstring for the per-iteration scale shape.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = edges.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    ).where(F.col("w") > 0)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(p, "node")
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    outw = e.groupBy("src").agg(F.sum("w").alias("w_total"))
    # normalized once: frac = w(u,v)/W(u); partitioned by src and pinned
    # so the |E|-row side never reshuffles across iterations
    edges_norm = (
        e.groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("w_total")).alias("frac"))
        .repartition(p, "src")
        .persist()
    )
    edges_norm.count()
    danglers = (
        nodes.join(
            outw.select(F.col("src").alias("node")), "node", "left_anti"
        )
        .repartition(p, "node")
        .persist()
    )
    danglers.count()

    d = float(damping)
    teleport = (1.0 - d) / n_nodes
    ranks = nodes.select(
        "node", F.lit(1.0 / n_nodes).alias("rank")
    ).persist()
    ranks.count()

    for it in range(iterations):
        row = (
            ranks.join(danglers, "node", "left_semi")
            .agg(F.sum("rank").alias("m"))
            .collect()[0]
        )
        dangling_mass = float(row["m"] or 0.0)
        contribs = (
            ranks.withColumnRenamed("node", "src")
            .join(edges_norm, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("contrib"))
        )
        new_ranks = (
            nodes.join(
                contribs.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(dangling_mass / n_nodes)
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_interval == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks

    edges_norm.unpersist()
    danglers.unpersist()
    nodes.unpersist()
    return ranks
