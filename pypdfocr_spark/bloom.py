"""Bloom-filter deduplication — the Dolma "BFF" pattern, Spark-native.

The use case a join can't serve at crawl scale: dedupe TODAY's crawl
against EVERY PREVIOUS dump without shuffling 10^12 historical keys.
A Bloom filter compresses the historical key set into a fixed bitmap
(GBs for hundreds of billions of keys at ~1% FPP) that broadcasts to
every executor; the probe is then a MAP-ONLY pass over the new crawl —
zero shuffle, versus an anti-join that would shuffle both corpora.

Semantics (standard Bloom): **no false negatives** — every key that was
fed to :func:`bloom_build` probes ``maybe_seen=True`` — and a tunable
false-positive rate, which here means a small, quantified recall loss
(fresh documents wrongly dropped as dupes), the same trade Dolma's BFF
and CCNet's hash-prefix dedup make.

Engineering shape:

* hashing happens JVM-side (``F.xxhash64`` — whole-stage codegen; two
  independent 64-bit streams via a salt column) so Python never touches
  document text;
* per-partition bitmaps are built with vectorized numpy bit-sets over
  Arrow batches and OR-merged with ``treeReduce`` (depth 2: P partition
  bitmaps merge through sqrt(P) combiners, never P×bitmap bytes through
  the driver) — one of the rare legitimate RDD uses (per-partition
  imperative state);
* the probe broadcasts the bitmap once per executor
  (``SparkContext.broadcast``) and answers membership per Arrow batch
  with two gathers and an AND-reduce.

Derived-index positions use Kirsch–Mitzenmacher double hashing
(g_i = h1 + i·h2 mod m, h2 forced odd, m a power of two), which
preserves the standard FPP bound with only two base hashes.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType

# salt for the second hash stream: xxhash64 has a fixed seed in Spark, so
# independence comes from appending a constant column to the hashed tuple
_H2_SALT = 0x9E3779B9


def bloom_params(n_keys: int, fpp: float = 0.01) -> "tuple[int, int]":
    """Standard sizing: bits m = -n·ln p / ln²2 rounded UP to a power of
    two (the index mask needs it), hashes k = round(m/n·ln 2), clamped to
    [1, 16]. Returns ``(num_bits, num_hashes)``."""
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    n = max(1, int(n_keys))
    m_ideal = -n * math.log(fpp) / (math.log(2) ** 2)
    num_bits = 1 << max(6, math.ceil(math.log2(m_ideal)))
    k = max(1, min(16, round(num_bits / n * math.log(2))))
    return num_bits, k


def _hash_cols(key_col: str):
    h1 = F.xxhash64(F.col(key_col))
    h2 = F.xxhash64(F.col(key_col), F.lit(_H2_SALT))
    return h1.alias("_bf_h1"), h2.alias("_bf_h2")


def _positions(h1: np.ndarray, h2: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(rows, k) bit positions. uint64 wrap-around arithmetic is exactly
    the mod-2^64 the scheme wants; the mask is mod-m for power-of-two m."""
    u1 = np.ascontiguousarray(h1, dtype=np.int64).view(np.uint64)
    u2 = np.ascontiguousarray(h2, dtype=np.int64).view(np.uint64) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return (u1[:, None] + i[None, :] * u2[:, None]) & np.uint64(num_bits - 1)


def bloom_build(
    df: DataFrame,
    key_col: str = "text",
    num_bits: int = 1 << 22,
    num_hashes: int = 7,
) -> bytes:
    """Build the filter over ``df[key_col]`` and return the packed bitmap
    (``num_bits/8`` bytes). Deterministic: the bitmap is a pure OR-fold of
    per-key bit sets, so any partitioning, ordering, or retry yields the
    IDENTICAL bytes. Driver never sees more than ~sqrt(P)+1 bitmaps at
    once (treeReduce)."""
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    nb, nh = num_bits, num_hashes

    schema = StructType([StructField("bitmap", BinaryType())])

    def build(batches):
        import pandas as pd

        bits = np.zeros(nb >> 3, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = _positions(pdf["_bf_h1"].to_numpy(), pdf["_bf_h2"].to_numpy(), nb, nh)
            flat = pos.reshape(-1)
            np.bitwise_or.at(bits, (flat >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8)))
        yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    maps = df.select(*_hash_cols(key_col)).mapInPandas(build, schema)
    merged = (
        maps.rdd.map(lambda r: np.frombuffer(r["bitmap"], dtype=np.uint8))
        .treeReduce(np.bitwise_or, depth=2)
    )
    return merged.tobytes()


def bloom_probe_df(
    df: DataFrame,
    bloom: bytes,
    key_col: str = "text",
    num_hashes: int = 7,
) -> DataFrame:
    """Append ``maybe_seen`` (boolean): true iff all ``num_hashes`` bit
    positions of the key are set in ``bloom``. Map-only: JVM hash columns
    → one Arrow stage gathering against the executor-broadcast bitmap —
    no shuffle at any corpus size."""
    num_bits = len(bloom) << 3
    if num_bits & (num_bits - 1):
        raise ValueError("bitmap length must be a power-of-two bit count")
    nh = num_hashes
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    out_schema = StructType(df.schema.fields + [StructField("maybe_seen", BooleanType())])

    def probe(batches):
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        nb = len(bits) << 3
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = _positions(pdf["_bf_h1"].to_numpy(), pdf["_bf_h2"].to_numpy(), nb, nh)
            hit = (bits[(pos >> np.uint64(3)).astype(np.int64)]
                   >> (pos & np.uint64(7)).astype(np.uint8)) & 1
            res = pdf.drop(columns=["_bf_h1", "_bf_h2"])
            res["maybe_seen"] = hit.all(axis=1)
            yield res

    return df.withColumns(
        {"_bf_h1": F.xxhash64(F.col(key_col)),
         "_bf_h2": F.xxhash64(F.col(key_col), F.lit(_H2_SALT))}
    ).mapInPandas(probe, out_schema)


def bloom_dedup(
    corpus: DataFrame,
    reference: DataFrame,
    key_col: str = "text",
    fpp: float = 0.01,
    n_reference_keys: "int | None" = None,
    return_flags: bool = False,
) -> DataFrame:
    """Cross-corpus dedup: drop every ``corpus`` row whose ``key_col``
    (maybe) appears in ``reference`` — dump-N-against-dumps-1..N-1, the
    CCNet/Dolma incremental-crawl pattern. Guarantees: every TRUE
    duplicate is dropped (no false negatives); at most ~``fpp`` of fresh
    rows are lost to false positives.

    ``n_reference_keys`` sizes the filter; when omitted it is counted
    with one extra job (at production scale pass the known dump size).
    ``return_flags=True`` keeps all rows with the ``maybe_seen`` column
    instead of filtering."""
    n = n_reference_keys if n_reference_keys is not None else reference.count()
    num_bits, num_hashes = bloom_params(n, fpp)
    bitmap = bloom_build(reference, key_col, num_bits, num_hashes)
    probed = bloom_probe_df(corpus, bitmap, key_col, num_hashes)
    if return_flags:
        return probed
    return probed.where(~F.col("maybe_seen")).drop("maybe_seen")


def paragraph_keys(
    df: DataFrame, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """One row per paragraph — the build-side input for paragraph-mode
    dedup (``bloom_build(paragraph_keys(reference), key_col="key")``)."""
    return df.select(
        F.explode(F.split(F.col(text_col), _sep_regex(sep))).alias("key")
    )


def _sep_regex(sep: str) -> str:
    import re as _re

    return _re.escape(sep)


def bloom_paragraph_filter(
    df: DataFrame,
    bloom: bytes,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_hashes: int = 7,
    min_chars: int = 1,
) -> DataFrame:
    """Paragraph-mode cross-corpus dedup (the Dolma BFF unit of work):
    drop every paragraph of ``df[text_col]`` that (maybe) appears in the
    reference filter, keeping the rest of the document intact and in
    order. Paragraphs shorter than ``min_chars`` are never dropped
    (empty lines and stub separators would otherwise be annihilated
    corpus-wide by one reference occurrence).

    MAP-ONLY at any corpus size: the paragraph split and both hash
    streams are computed per-paragraph INSIDE a JVM ``transform`` (no
    explode, no reassembly shuffle), and one Arrow stage probes the
    broadcast bitmap and rejoins the survivors."""
    num_bits = len(bloom) << 3
    if num_bits & (num_bits - 1):
        raise ValueError("bitmap length must be a power-of-two bit count")
    nh = num_hashes
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField as SF,
    )

    out_schema = StructType(
        [
            SF("doc_id", LongType()),
            SF("text", StringType()),
            SF("n_paragraphs", IntegerType()),
            SF("n_dropped", IntegerType()),
        ]
    )

    parts = F.split(F.col(text_col), _sep_regex(sep))
    prepared = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        parts.alias("_parts"),
        F.transform(parts, lambda p: F.xxhash64(p)).alias("_h1s"),
        F.transform(parts, lambda p: F.xxhash64(p, F.lit(_H2_SALT))).alias("_h2s"),
    )

    def run(batches):
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        nb = len(bits) << 3
        for pdf in batches:
            ids, texts, nparts, ndrop = [], [], [], []
            for did, ps, h1s, h2s in zip(
                pdf["doc_id"], pdf["_parts"], pdf["_h1s"], pdf["_h2s"]
            ):
                if ps is None or len(ps) == 0:
                    ids.append(int(did)); texts.append("")
                    nparts.append(0); ndrop.append(0)
                    continue
                pos = _positions(
                    np.asarray(h1s, dtype=np.int64),
                    np.asarray(h2s, dtype=np.int64),
                    nb, nh,
                )
                seen = ((bits[(pos >> np.uint64(3)).astype(np.int64)]
                         >> (pos & np.uint64(7)).astype(np.uint8)) & 1).all(axis=1)
                kept = [p for p, s in zip(ps, seen)
                        if not s or len(p) < min_chars]
                ids.append(int(did))
                texts.append(sep.join(kept))
                nparts.append(len(ps))
                ndrop.append(len(ps) - len(kept))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "text": texts,
                 "n_paragraphs": pd.Series(nparts, dtype="int32"),
                 "n_dropped": pd.Series(ndrop, dtype="int32")}
            )

    return prepared.mapInPandas(run, out_schema)


def bloom_paragraph_dedup(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    fpp: float = 0.01,
    n_reference_keys: "int | None" = None,
    min_chars: int = 1,
) -> DataFrame:
    """Composite: build the filter over the REFERENCE corpus's paragraphs,
    then strip matching paragraphs from ``corpus`` — dump-over-dump
    paragraph dedup with one reference scan and one map-only corpus pass."""
    keys = paragraph_keys(reference, text_col, sep)
    n = n_reference_keys if n_reference_keys is not None else keys.count()
    num_bits, num_hashes = bloom_params(n, fpp)
    bitmap = bloom_build(keys, "key", num_bits, num_hashes)
    return bloom_paragraph_filter(
        corpus, bitmap, id_col, text_col, sep, num_hashes, min_chars
    )
