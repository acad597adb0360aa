"""BPE tokenizer: distributed type counts, merge-loop exactness vs a
naive reference, deterministic ties, and the broadcast encode path."""

import re
from collections import Counter

import pytest

from pypdfocr_spark import bpe
from pypdfocr_spark.textops import PRETOKEN_RE


def naive_merges(types, num_merges):
    """Reference trainer: full pair recount every iteration (Sennrich
    algorithm 1 verbatim, no incremental bookkeeping)."""
    words = [list(w) for w, _ in types]
    freqs = [c for _, c in types]
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in zip(words, freqs):
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for syms in words:
            j = 0
            while j < len(syms) - 1:
                if (syms[j], syms[j + 1]) == best:
                    syms[j : j + 2] = [syms[j] + syms[j + 1]]
                else:
                    j += 1
    return merges


DOCS = [
    (1, "the lowest tower in the lower town"),
    (2, "newest widest lowest news at the tower"),
    (3, "she sells sea shells by the sea shore 123 456"),
    (4, "the the the towering towers tower over townships"),
    (5, "aaaa aaaa aaaa baaab overlapping pairs aaaa"),
    (6, "punctuation, pairs; and. digits 1234 12 12!"),
]


def test_merge_loop_matches_naive_reference():
    """The incremental pair-count maintenance (the O(1)-ish trainer) and
    the recount-from-scratch reference produce the IDENTICAL merge
    sequence — including overlap sites ('aaaa') and count ties (broken
    lexicographically)."""
    text = " ".join(t for _, t in DOCS)
    types = sorted(Counter(re.findall(PRETOKEN_RE, text)).items())
    for n in (5, 25, 120):
        got = bpe.bpe_merges_from_types(list(types), n)
        want = naive_merges(list(types), n)
        assert got == want, n
    # exhaustion: more merges requested than pairs exist → stops early
    tiny = [("ab", 3)]
    assert bpe.bpe_merges_from_types(tiny, 50) == [("a", "b")]


def test_encode_word_canonical_order():
    """encode_word applies the LOWEST-RANKED pair first (GPT-2 bpe()),
    not left-to-right: with ranks {(e,s):0,(s,t):1,(es,t):2}, 'est'
    must become ['est'] via es+t, and unknown pairs stay split."""
    ranks = {("e", "s"): 0, ("s", "t"): 1, ("es", "t"): 2}
    assert bpe.encode_word("est", ranks) == ["est"]
    assert bpe.encode_word("ets", ranks) == ["e", "t", "s"]
    assert bpe.encode_word("", ranks) == []
    assert bpe.encode_word("x", ranks) == ["x"]


def test_bpe_train_and_encode_spark(spark):
    """End-to-end on Spark: the distributed word-type reduction equals a
    local Counter (layout-invariant across repartition), training over
    it matches the local trainer, and bpe_encode_df's token counts match
    encoding every doc locally. keep_tokens materializes the arrays."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    types = bpe.word_type_counts(df, max_word_types=1000)
    local = Counter(
        w for _, t in DOCS for w in re.findall(PRETOKEN_RE, t)
    )
    assert dict(types) == dict(local)
    # the cap keeps the most frequent types, ties by word — deterministic
    top3 = bpe.word_type_counts(df.repartition(7), max_word_types=3)
    want_top3 = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert top3 == want_top3

    merges = bpe.bpe_train(df, num_merges=60)
    assert merges == naive_merges(sorted(local.items()), 60)

    ranks = {p: i for i, p in enumerate(merges)}
    out = {
        r["doc_id"]: r
        for r in bpe.bpe_encode_df(
            df.repartition(5), merges, keep_tokens=True
        ).collect()
    }
    for did, text in DOCS:
        toks = [
            t
            for w in re.findall(PRETOKEN_RE, text)
            for t in bpe.encode_word(w, ranks)
        ]
        assert out[did]["tokens"] == toks, did
        assert out[did]["n_tokens"] == len(toks)
        assert "".join(toks) == text.replace(" ", "")  # lossless cover
    # count-only mode drops the array column
    slim = bpe.bpe_encode_df(df, merges)
    assert slim.columns == ["doc_id", "n_tokens"]
    # more merges → never more tokens (monotone compression)
    few = bpe.bpe_encode_df(df, merges[:5]).collect()
    many = bpe.bpe_encode_df(df, merges).collect()
    f = {r["doc_id"]: r["n_tokens"] for r in few}
    m = {r["doc_id"]: r["n_tokens"] for r in many}
    assert all(m[k] <= f[k] for k in f)
