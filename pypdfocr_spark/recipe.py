"""The end-to-end corpus-curation recipe — the composition a training-data
pipeline actually runs over a crawl, assembled from this package's
individually-oracled operators:

    language gate (textops.lang_id_df)
      ∧ quality gate (textops.gopher_filter_df)
      ∧ duplicate gate (dedup.normalized_exact_dedup keepers)
      ∧ decontamination gate (dedup.decontaminate vs the eval set)
      → per-document survival verdict

The output covers the FULL corpus (one row per doc with each gate's
boolean and the conjunction), so drop rates per gate fall out of one
aggregation — the operational report every curation run needs.

Plan shape (mode="fused", the default and the 100-TB shape): language,
quality, and the dedup canon hash are expression columns over ONE corpus
scan; the keeper flag is a min-over-window on that frame (one shuffle on
norm_hash); only decontamination — an aggregation over exploded shingles,
inherently a separate pass — joins back equi-on-id (AQE: broadcast below
threshold, skew-split above). mode="composed" is the original
operator-by-operator join chain, kept as the semantic cross-check.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import bloom, classifier, dedup, textfix, textops


def curate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_tokens: int = 30,
    min_overlap: int = 3,
    mode: str = "fused",
) -> DataFrame:
    """Per-document curation verdict over ``corpus``; ``benchmark`` is
    the eval set decontamination screens against. See module doc.

    ``mode="fused"`` (default, the 100-TB shape — VERDICT r3 #5): the two
    map-only gates (language, quality) and the dedup canon hash are
    inlined as expression columns over ONE corpus scan; the keeper flag
    is a min-over-window on that same frame, and only the inherently
    aggregating decontamination pass joins back — one scan + one window
    shuffle + one equi-join instead of four scans + four joins.
    ``mode="composed"`` is the original operator-by-operator composition,
    kept as the cross-check that the fusion preserves semantics
    (tests/test_webops.py pins fused ≡ composed; the DuckDB oracle hash
    covers both since they are row-identical).
    """
    if mode not in ("fused", "composed"):
        raise ValueError(f"mode must be 'fused' or 'composed', got {mode!r}")
    if mode == "fused":
        return _curate_fused(
            corpus, benchmark, id_col, text_col, lang, min_tokens, min_overlap
        )
    lid = textops.lang_id_df(corpus, id_col, text_col).select(
        F.col(id_col), (F.col("pred_lang") == lang).alias("passed_lang")
    )
    gf = textops.gopher_filter_df(
        corpus, id_col, text_col, min_tokens=min_tokens
    ).select(F.col(id_col), F.col("keep").alias("passed_quality"))
    nd = dedup.normalized_exact_dedup(corpus, id_col, text_col).select(
        F.col(id_col), F.col("is_keeper")
    )
    dc = dedup.decontaminate(
        corpus, benchmark, id_col, text_col, k=2, min_overlap=min_overlap
    ).select(F.col(id_col), F.col("contaminated"))
    out = (
        lid.join(gf, id_col)
        .join(nd, id_col)
        .join(dc, id_col)
    )
    return out.select(
        F.col(id_col),
        "passed_lang",
        "passed_quality",
        "is_keeper",
        "contaminated",
        (
            F.col("passed_lang")
            & F.col("passed_quality")
            & F.col("is_keeper")
            & ~F.col("contaminated")
        ).alias("survived"),
    )


def _curate_fused(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    lang: str,
    min_tokens: int,
    min_overlap: int,
) -> DataFrame:
    """The single-scan plan behind :func:`curate` (mode="fused"). The
    expressions are the SAME ones the standalone operators use
    (textops.lang_pred_expr / textops.gopher_exprs / dedup.canonical_text),
    so the fusion cannot drift from the oracled operators."""
    from pyspark.sql.window import Window

    pred, _ = textops.lang_pred_expr(text_col)
    keep = textops.gopher_exprs(text_col, min_tokens=min_tokens)["keep"]
    canon = dedup.canonical_text(F.col(text_col))
    norm = F.when(canon == "", F.col(text_col)).otherwise(canon)
    base = corpus.select(
        F.col(id_col),
        (pred == lang).alias("passed_lang"),
        keep.alias("passed_quality"),
        F.md5(norm).alias("norm_hash"),
    )
    is_keeper = F.col(id_col) == F.min(id_col).over(Window.partitionBy("norm_hash"))
    verdict = base.withColumn("is_keeper", is_keeper).drop("norm_hash")
    dc = dedup.decontaminate(
        corpus, benchmark, id_col, text_col, k=2, min_overlap=min_overlap
    ).select(F.col(id_col), F.col("contaminated"))
    return verdict.join(dc, id_col).select(
        F.col(id_col),
        "passed_lang",
        "passed_quality",
        "is_keeper",
        "contaminated",
        (
            F.col("passed_lang")
            & F.col("passed_quality")
            & F.col("is_keeper")
            & ~F.col("contaminated")
        ).alias("survived"),
    )


WEB_GATE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("maybe_seen", BooleanType()),
        StructField("quality_prob", DoubleType()),
    ]
)


def web_gate(
    df: DataFrame,
    model: "classifier.QualityModel",
    bloom_bitmap: "bytes | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 7,
    fix: bool = True,
    return_flags: bool = False,
) -> DataFrame:
    """The fused per-document web gate — encoding repair, cross-corpus
    Bloom dedup probe, and model-based quality scoring as the curation
    front door actually runs them, in the minimum number of Python
    crossings.

    The chained composition (``textfix.fix_text_df`` →
    ``bloom.bloom_probe_df`` → ``classifier.classifier_score_df``) is
    three Arrow stages per task — three concurrently-pipelined Python
    workers per core at 100 TB. Here the chain is restructured to TWO:

        Arrow 1: fix_text (inherently Python — regex/unicodedata)
        JVM:     xxhash64 Bloom keys + murmur3 feature buckets over the
                 REPAIRED text (hashing must see NFC bytes)
        Arrow 2: Bloom bit-gather AND weight-gather score in one pass
                 against the two executor broadcasts

    The probe and the score read disjoint broadcasts and produce
    independent columns, so fusing them cannot change semantics —
    tests/test_classifier.py pins fused ≡ chained row-for-row. Still
    map-only end to end: zero Exchange at any corpus size (plan-asserted).

    ``bloom_bitmap=None`` skips the dedup probe (``maybe_seen`` all
    false). ``fix=False`` skips repair for pre-normalized corpora (one
    Arrow stage total). ``return_flags=True`` keeps every row with its
    ``maybe_seen``/``quality_prob`` columns; the default emits only the
    survivors (fresh AND ``quality_prob >= threshold``).
    """
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    if fix:
        base = textfix.fix_text_df(base).select("doc_id", "text")
    cols = {
        "_fx": classifier.hashed_feature_col("text", model.num_buckets, model.bigrams)
    }
    if bloom_bitmap is not None:
        num_bits = len(bloom_bitmap) << 3
        if num_bits & (num_bits - 1):
            raise ValueError("bitmap length must be a power-of-two bit count")
        cols["_bf_h1"] = F.xxhash64(F.col("text"))
        cols["_bf_h2"] = F.xxhash64(F.col("text"), F.lit(bloom._H2_SALT))
    prepared = base.withColumns(cols)

    sc = df.sparkSession.sparkContext
    w_bc = sc.broadcast(model.weights.tobytes())
    b_bc = sc.broadcast(bloom_bitmap) if bloom_bitmap is not None else None
    bias = float(model.bias)
    nh = num_hashes

    def run(batches):
        import pandas as pd

        w = np.frombuffer(w_bc.value, dtype=np.float64)
        bits = (
            np.frombuffer(b_bc.value, dtype=np.uint8) if b_bc is not None else None
        )
        nb = (len(bits) << 3) if bits is not None else 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if bits is not None:
                pos = bloom._positions(
                    pdf["_bf_h1"].to_numpy(), pdf["_bf_h2"].to_numpy(), nb, nh
                )
                seen = (
                    (
                        bits[(pos >> np.uint64(3)).astype(np.int64)]
                        >> (pos & np.uint64(7)).astype(np.uint8)
                    )
                    & 1
                ).all(axis=1)
            else:
                seen = np.zeros(len(pdf), dtype=bool)
            probs = np.empty(len(pdf), dtype=np.float64)
            for i, buckets in enumerate(pdf["_fx"]):
                idx = np.asarray(buckets, dtype=np.int64)
                z = bias if len(idx) == 0 else bias + w[idx].sum() / len(idx)
                probs[i] = 1.0 / (1.0 + np.exp(-z))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "text": pdf["text"],
                    "maybe_seen": seen,
                    "quality_prob": probs,
                }
            )

    out = prepared.mapInPandas(run, WEB_GATE_SCHEMA)
    if return_flags:
        return out
    return out.where(
        (~F.col("maybe_seen")) & (F.col("quality_prob") >= threshold)
    ).drop("maybe_seen")


def curation_report(verdicts: DataFrame) -> DataFrame:
    """The operational one-row report over :func:`curate`'s output:
    corpus size, per-gate pass counts, and the survivor count — what a
    curation run logs and alerts on. One map-side-combinable aggregation;
    at 100 TB this is a free second action on the verdict frame (or the
    same scan, if the caller persists it)."""
    b = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    return verdicts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        b("passed_lang").alias("n_passed_lang"),
        b("passed_quality").alias("n_passed_quality"),
        b("is_keeper").alias("n_keepers"),
        b("contaminated").alias("n_contaminated"),
        b("survived").alias("n_survived"),
    )
