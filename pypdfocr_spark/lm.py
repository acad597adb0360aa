"""n-gram language-model perplexity — the CCNet quality signal.

CCNet (Wenzek et al. 2020) buckets crawl documents into head/middle/tail
quality tiers by the perplexity of a language model trained on a clean
reference corpus (they use KenLM; the signal is the mechanism, not the
toolkit). The Spark-native equivalent here is a word-bigram LM with
add-alpha smoothing:

* **Training** is two combinable aggregations over the reference corpus
  — unigram and bigram count tables. No driver-side state: the model IS
  a pair of DataFrames, so a Wikipedia-scale reference (~10^8 bigram
  types) stays distributed and the tables persist as parquet.
* **Scoring** is explode → two LEFT joins against the count tables →
  one agg. The count tables are usually broadcastable; when the
  reference is huge, AQE falls back to shuffled joins and the hot
  stopword-bigram keys skew only the probe side (AQE skew-split
  handles it). No Python anywhere — the whole path is JVM expressions.
* **Bucketing** reduces per-doc perplexity to head/middle/tail by
  corpus quantile thresholds — CCNet's tiering, used to stratify
  training-data sampling.

Determinism note: ``log2``/``pow`` keep the scoring in float64 libm
territory, so parity tests compare with tolerance (1e-9), not by hash —
the reason this op is pytest-verified rather than oracled (the 50-query
driver battery stays hash-exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigrams(text_col: str) -> Column:
    """Per-row array<struct<w1,w2>> of adjacent word pairs (whitespace
    tokens, the textops convention)."""
    words = F.split(F.col(text_col), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.struct(
            F.element_at(words, i).alias("w1"),
            F.element_at(words, i + 1).alias("w2"),
        ),
    )
    # sequence(1, 0) DESCENDS in Spark — guard docs with <2 tokens
    return F.when(F.size(words) >= 2, pairs).otherwise(
        F.expr("array()").cast("array<struct<w1:string,w2:string>>")
    )


def lm_train(ref_df: DataFrame, text_col: str = "text") -> "dict[str, object]":
    """Train the bigram LM on a reference corpus: ``{"unigrams": DF(w,
    c), "bigrams": DF(w1, w2, c), "vocab_size": int}``. Two shuffles,
    both map-side combinable. vocab_size (distinct unigrams) is the one
    scalar the smoothing formula needs driver-side."""
    words = ref_df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.col("w") != "")
    unigrams = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    bigrams = (
        ref_df.select(F.explode(_bigrams(text_col)).alias("bg"))
        .select("bg.w1", "bg.w2")
        .where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return {
        "unigrams": unigrams,
        "bigrams": bigrams,
        "vocab_size": unigrams.count(),
    }


def perplexity_df(
    df: DataFrame,
    lm: "dict[str, object]",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document bigram perplexity under the trained LM with
    add-alpha smoothing: p(w2|w1) = (c(w1,w2)+α) / (c(w1)+α·V); ppl =
    2^(−mean log2 p). Unseen contexts degrade gracefully to 1/V. Docs
    with fewer than two tokens have no bigrams → ppl null (CCNet leaves
    them unscored). Output: (id, n_bigrams, ppl)."""
    V = float(lm["vocab_size"])
    uni = lm["unigrams"].select(
        F.col("w").alias("_u_w"), F.col("c").alias("_u_c")
    )
    big = lm["bigrams"].select(
        F.col("w1").alias("_b_w1"),
        F.col("w2").alias("_b_w2"),
        F.col("c").alias("_b_c"),
    )
    exploded = df.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("bg")
    ).select(id_col, "bg.w1", "bg.w2")
    scored = (
        exploded.join(
            big,
            (F.col("w1") == F.col("_b_w1")) & (F.col("w2") == F.col("_b_w2")),
            "left",
        )
        .join(uni, F.col("w1") == F.col("_u_w"), "left")
        .select(
            F.col(id_col),
            F.log2(
                (F.coalesce(F.col("_b_c"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("_u_c"), F.lit(0)) + F.lit(alpha * V))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.pow(F.lit(2.0), -F.avg("lp")).alias("ppl"),
    )
    # docs too short to score come back with null ppl, not dropped
    return (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("ppl"),
        )
    )


def perplexity_buckets(
    ppl_df: DataFrame,
    fractions: "tuple[float, float]" = (1 / 3, 2 / 3),
) -> DataFrame:
    """CCNet's head/middle/tail tiering: corpus-level perplexity
    quantile thresholds (exact ``percentile`` over the scored docs — use
    ``approx_percentile`` at 10^12 docs, noted, the thresholds feed a
    sampling policy, not a hash-exact contract), head = lowest
    perplexity (most reference-like). Unscored docs get bucket null."""
    lo, hi = ppl_df.where(F.col("ppl").isNotNull()).select(
        F.expr(f"percentile(ppl, {fractions[0]})"),
        F.expr(f"percentile(ppl, {fractions[1]})"),
    ).first()
    return ppl_df.withColumn(
        "bucket",
        F.when(F.col("ppl").isNull(), F.lit(None).cast("string"))
        .when(F.col("ppl") <= F.lit(lo), "head")
        .when(F.col("ppl") <= F.lit(hi), "middle")
        .otherwise("tail"),
    )
