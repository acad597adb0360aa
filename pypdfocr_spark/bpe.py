"""Byte-pair-encoding tokenizer: distributed training and encoding.

The training-data pipeline's real token counter — `textops.token_count_df`
estimates, THIS tokenizes. The split follows how production BPE trainers
actually work (and how Spark wants it):

* **Corpus → word-type table** is the distributed part: pre-tokenize with
  the GPT-2 regex (shared with textops), explode, one combinable
  ``groupBy(word).count()`` shuffle. 100 TB of text reduces to a few
  million (word, count) types.
* **The merge loop** runs driver-side over that type table — classic
  Sennrich et al. 2016: repeatedly merge the most frequent adjacent
  symbol pair. O(types × merges) local work on a table that fits in
  driver memory by construction (``max_word_types`` caps it by count,
  the standard trainer practice); a 100× corpus changes the counts, not
  the table size.
* **Encoding** broadcasts the merge ranks and applies them in one
  mapInPandas stage with a per-batch word cache — no shuffle, and the
  Zipf distribution means the cache hits almost always.

Determinism everywhere: count ties break lexicographically, so the same
corpus yields the same vocabulary on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .textops import PRETOKEN_RE


def word_type_counts(
    df: DataFrame, text_col: str = "text", max_word_types: int = 100_000
) -> "list[tuple[str, int]]":
    """The distributed half of training: corpus → (word, count) types,
    capped to the ``max_word_types`` most frequent (ties broken by word
    so the cap is layout-invariant). One explode + one combinable
    groupBy; the collect is bounded by the cap, never by corpus size."""
    counts = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '{PRETOKEN_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .count()
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_word_types)
    )
    return [(r["word"], r["count"]) for r in counts.collect()]


def bpe_merges_from_types(
    types: "list[tuple[str, int]]", num_merges: int
) -> "list[tuple[str, str]]":
    """The driver-side merge loop (Sennrich et al. 2016, algorithm 1):
    start from characters, repeatedly merge the globally most frequent
    adjacent pair (count ties → lexicographically smallest pair).
    Incremental pair-count maintenance keeps it O(types·len) per merge
    in the worst case but near-constant in practice."""
    words: "list[list[str]]" = [list(w) for w, _ in types]
    freqs = [c for _, c in types]

    def all_pairs() -> "dict[tuple[str, str], int]":
        pairs: "dict[tuple[str, str], int]" = {}
        for syms, c in zip(words, freqs):
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        return pairs

    pairs = all_pairs()
    merges: "list[tuple[str, str]]" = []
    for _ in range(num_merges):
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 1:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i, syms in enumerate(words):
            if len(syms) < 2:
                continue
            c = freqs[i]
            j = 0
            while j < len(syms) - 1:
                if syms[j] == best[0] and syms[j + 1] == best[1]:
                    # update neighbor pair counts around the merge site
                    if j > 0:
                        pairs[(syms[j - 1], syms[j])] -= c
                        pairs[(syms[j - 1], joined)] = (
                            pairs.get((syms[j - 1], joined), 0) + c
                        )
                    if j + 2 < len(syms):
                        pairs[(syms[j + 1], syms[j + 2])] -= c
                        pairs[(joined, syms[j + 2])] = (
                            pairs.get((joined, syms[j + 2]), 0) + c
                        )
                    syms[j : j + 2] = [joined]
                else:
                    j += 1
        del pairs[best]
        pairs = {p: c for p, c in pairs.items() if c > 0}
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 100_000,
) -> "list[tuple[str, str]]":
    """End-to-end training: distributed type counts → local merge loop.
    Returns the ordered merge list (rank = position) — the entire model;
    persist it as two columns and :func:`bpe_encode_df` any corpus."""
    return bpe_merges_from_types(
        word_type_counts(df, text_col, max_word_types), num_merges
    )


def encode_word(word: str, ranks: "dict[tuple[str, str], int]") -> "list[str]":
    """Apply merges to one pre-token: repeatedly merge the
    lowest-ranked adjacent pair until none applies — the canonical
    GPT-2 ``bpe()`` procedure."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("tokens", ArrayType(StringType())),
    ]
)


def bpe_encode_df(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_tokens: bool = False,
) -> DataFrame:
    """Tokenize a corpus under a trained merge list: one mapInPandas
    stage, merge ranks in the broadcast closure (a vocab is ~100k pairs
    ≈ a few MB — broadcast territory), per-batch word→tokens cache (the
    Zipf head makes the hit rate ~1). ``keep_tokens=False`` returns only
    the count column — at 100 TB the token ARRAYS are bigger than the
    corpus, so materialize them only when asked."""
    import re as _re

    from typing import Iterator

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    pretoken = _re.compile(PRETOKEN_RE)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        cache: "dict[str, list[str]]" = {}
        for pdf in batches:
            ids, counts, toks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                out: "list[str]" = []
                for w in pretoken.findall(text or ""):
                    enc = cache.get(w)
                    if enc is None:
                        enc = cache[w] = encode_word(w, ranks)
                    out.extend(enc)
                ids.append(int(did))
                counts.append(len(out))
                toks.append(out if keep_tokens else None)
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": counts, "tokens": toks}
            )

    out = df.mapInPandas(run, BPE_SCHEMA)
    return out if keep_tokens else out.drop("tokens")
