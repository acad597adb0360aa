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

Plan shape: the two map-only signal frames (language, quality) and the
two shuffle ops (dedup keeper window, decontamination count) all key on
doc_id and join back equi-on-id. At 100 TB the map-only signals should be
inlined as expression columns over one scan (they are pure expressions —
the joins here exist to reuse the oracled operators verbatim); the
dedup/decontaminate shuffles are inherent. All four joins are same-key
equi-joins AQE plans (broadcast below threshold, skew-split above).
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
) -> DataFrame:
    """Per-document curation verdict over ``corpus``; ``benchmark`` is
    the eval set decontamination screens against. See module doc."""
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
