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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textops


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
