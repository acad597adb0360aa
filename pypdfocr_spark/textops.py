"""Text-analysis operators (brief: language-ID, quality scoring, token
counting, document fingerprinting) over the ``documents`` table.

All built-in expressions (whole-stage codegen; no Python) with formulas
mirrored 1:1 by the DuckDB oracle SQL — the same marker sets / stopword
lists live in kernels.textstats for the pure-Python form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kernels.textstats import LANG_MARKERS, STOPWORDS


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def _marker_hits(text_col: str, markers: frozenset) -> Column:
    arr = F.array(*[F.lit(m) for m in sorted(markers)])
    return F.size(F.filter(_tokens(text_col), lambda t: F.array_contains(arr, F.lower(t))))


def lang_id_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID: score per language = count of marker
    tokens; argmax with score>0, ties → lexicographically first language
    (matches kernels.textstats.lang_id)."""
    scored = df.select(
        F.col(id_col),
        *[
            _marker_hits(text_col, LANG_MARKERS[lang]).alias(f"score_{lang}")
            for lang in sorted(LANG_MARKERS)
        ],
    )
    pred = F.lit("unk")
    best = F.lit(0)
    # iterate langs in sorted order; strictly-greater keeps the first max
    for lang in sorted(LANG_MARKERS):
        cond = F.col(f"score_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return scored.select(F.col(id_col), pred.alias("pred_lang"), best.alias("score"))


def token_count_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate: ceil(chars/4)
    per token, the common ~4-chars-per-token heuristic — both as pure
    expressions."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int")
        ).alias("n_subwords"),
    )


def quality_score_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality features."""
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in sorted(STOPWORDS)])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_stop / n_tokens).alias("stopword_ratio"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens
        ).alias("mean_token_len"),
    )


def fingerprint_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive bag fingerprint: md5 of the space-joined sorted
    distinct token set (kernels.textstats.bag_fingerprint)."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fingerprint"),
    )
