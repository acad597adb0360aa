"""Exact-substring duplicate detection (substr.py): the winnowing
guarantee, verified maximal extension, brute-force parity, flood cap."""

import random

import pytest
from pyspark.sql import functions as F

from pypdfocr_spark import substr


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefg ") for _ in range(n))


# ---------------------------------------------------------------- kernels


def test_kgram_hash_window_equality():
    import numpy as np

    a = "xxTHE SHARED MIDDLE PARTyy"
    b = "zzzTHE SHARED MIDDLE PARTw"
    ca = np.frombuffer(a.encode("utf-32-le"), np.uint32).astype(np.uint64)
    cb = np.frombuffer(b.encode("utf-32-le"), np.uint32).astype(np.uint64)
    ha = substr._kgram_hashes(ca, 5, substr._B1, substr._M1)
    hb = substr._kgram_hashes(cb, 5, substr._B1, substr._M1)
    # equal k-grams hash equal at the aligned offsets (a[2..] vs b[3..])
    assert list(ha[2:17]) == list(hb[3:18])


def test_match_forward_and_extend():
    assert substr._match_forward("abcdef", 0, "abcxef", 0) == 3
    assert substr._match_forward("same", 0, "same", 0) == 4
    long_a = "p" * 300 + "q"
    long_b = "p" * 300 + "r"
    assert substr._match_forward(long_a, 0, long_b, 0) == 300
    got = substr._extend("XXcommonYY", 2, "ABcommonCD", 2, 3)
    assert got == (2, 2, 6)
    assert substr._extend("abcdef", 0, "zzzzzz", 0, 3) is None  # collision guard


# ------------------------------------------------------------- guarantee


def test_planted_duplicate_exact_span(spark):
    rng = random.Random(7)
    shared = "The quick brown fox jumps over the lazy dog near the river bank!"
    # distinct sentinels at the seams so the maximal span is EXACTLY the
    # planted string (random flanks can coincidentally extend it)
    a = _rand_text(rng, 79) + "<" + shared + ">" + _rand_text(rng, 59)
    b = _rand_text(rng, 39) + "[" + shared + "]" + _rand_text(rng, 89)
    spans = substr.substring_dup_spans(
        _docs(spark, [a, b]), min_len=len(shared)
    ).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s["id_a"], s["id_b"]) == (0, 1)
    assert s["start_a"] == 80 and s["start_b"] == 40
    assert s["length"] == len(shared)
    assert a[s["start_a"]:s["start_a"] + s["length"]] == shared


def test_below_threshold_not_reported(spark):
    rng = random.Random(11)
    shared = "0123456789" * 4  # 40 chars
    a = _rand_text(rng, 50) + shared + _rand_text(rng, 50)
    b = _rand_text(rng, 70) + shared + _rand_text(rng, 30)
    spans = substr.substring_dup_spans(_docs(spark, [a, b]), min_len=41).collect()
    assert spans == []


def test_identical_docs_full_span(spark):
    rng = random.Random(21)
    t = _rand_text(rng, 192)  # aperiodic: the only alignment is shift 0
    spans = substr.substring_dup_spans(_docs(spark, [t, t]), min_len=50).collect()
    full = [s for s in spans if s["start_a"] == 0 and s["length"] == len(t)]
    assert len(full) == 1
    # random text can admit coincidental short shifted alignments, but
    # every reported span must be a REAL common substring
    for s in spans:
        assert (t[s["start_a"]:s["start_a"] + s["length"]]
                == t[s["start_b"]:s["start_b"] + s["length"]])


def test_periodic_text_shifted_alignments(spark):
    # periodic text: shifted self-alignments are genuine maximal common
    # substrings and MUST all be reported (len 192, period 24, min 50 =>
    # shifts 0, +-24 ... +-120 => 11 spans)
    t = "identical document body " * 8
    spans = substr.substring_dup_spans(_docs(spark, [t, t]), min_len=50).collect()
    got = sorted((s["start_a"], s["start_b"], s["length"]) for s in spans)
    want = sorted(
        [(0, 0, 192)]
        + [(0, sh, 192 - sh) for sh in range(24, 144, 24)]
        + [(sh, 0, 192 - sh) for sh in range(24, 144, 24)]
    )
    assert got == want


def _brute_spans(a, b, L):
    """All maximal common substrings of length >= L between a and b."""
    out = set()
    for i in range(len(a) - L + 1):
        for j in range(len(b) - L + 1):
            if a[i:i + L] != b[j:j + L]:
                continue
            # extend to maximal, then record once
            s, t = i, j
            while s > 0 and t > 0 and a[s - 1] == b[t - 1]:
                s, t = s - 1, t - 1
            e, f = i + L, j + L
            while e < len(a) and f < len(b) and a[e] == b[f]:
                e, f = e + 1, f + 1
            out.add((s, t, e - s))
    return out


def test_bruteforce_parity_random_corpus(spark):
    rng = random.Random(99)
    L = 24
    frags = [_rand_text(rng, 30) for _ in range(4)]
    texts = []
    for _ in range(6):
        parts = [_rand_text(rng, rng.randint(10, 40))]
        for _f in range(rng.randint(0, 3)):
            parts.append(rng.choice(frags))
            parts.append(_rand_text(rng, rng.randint(5, 25)))
        texts.append("".join(parts))
    got = {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["length"])
        for r in substr.substring_dup_spans(
            _docs(spark, texts), min_len=L, max_df=None
        ).collect()
    }
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            for (s, t, ln) in _brute_spans(texts[i], texts[j], L):
                want.add((i, j, s, t, ln))
    assert got == want


def test_layout_invariance(spark):
    rng = random.Random(3)
    shared = "shared boilerplate sentence that repeats across documents ok"
    texts = [_rand_text(rng, 60) + shared + _rand_text(rng, 60) for _ in range(5)]
    df = _docs(spark, texts)
    a = sorted(map(tuple, substr.substring_dup_spans(df, min_len=40).collect()))
    b = sorted(map(tuple, substr.substring_dup_spans(
        df.repartition(7), min_len=40).collect()))
    assert a == b and len(a) == 10  # all C(5,2) pairs found


def test_max_df_flood_cap(spark):
    # 60 docs sharing one license header: uncapped => C(60,2)=1770 spans.
    # max_df=20 drops every fingerprint selected by >20 docs BEFORE the
    # self-join, collapsing the quadratic flood; a residue survives via
    # header k-grams whose winnowing selection depends on doc-specific
    # boundary context (selected in <=20 docs each), bounded by
    # C(max_df,2) pairs per surviving fingerprint — the documented
    # recall/fan-out trade, same as ngram_jaccard_pairs(max_df=...).
    rng = random.Random(5)
    header = "This file is licensed under the Apache License Version 2.0 terms."
    texts = [header + _rand_text(rng, 40) for _ in range(60)]
    df = _docs(spark, texts)
    n_capped = substr.substring_dup_spans(df, min_len=50, max_df=20).count()
    assert n_capped <= 190          # C(20,2): one surviving fp's worst case
    uncapped = substr.substring_dup_spans(df, min_len=50, max_df=None)
    assert uncapped.count() == 1770


def test_dup_fraction_interval_merge(spark):
    rng = random.Random(13)
    shared = "S" + _rand_text(rng, 58) + "E"  # 60 chars, planted once per doc
    a = shared + _rand_text(rng, 60)          # 120 chars, half duplicated
    b = _rand_text(rng, 20) + shared          # 80 chars
    c = _rand_text(rng, 100)                  # clean
    df = _docs(spark, [a, b, c])
    spans = substr.substring_dup_spans(df, min_len=50)
    rows = {r["doc_id"]: r for r in substr.substring_dup_fraction(df, spans).collect()}
    assert rows[0]["dup_chars"] == 60 and abs(rows[0]["dup_frac"] - 0.5) < 1e-12
    assert rows[1]["dup_chars"] == 60
    assert rows[2]["dup_chars"] == 0 and rows[2]["dup_frac"] == 0.0
    assert rows[2]["n_chars"] == 100


def test_min_len_validation(spark):
    with pytest.raises(ValueError):
        substr.substring_dup_spans(_docs(spark, ["x"]), min_len=3)


def test_substring_dedup_apply_cuts_second_copy(spark):
    rng = random.Random(31)
    shared = "B" + _rand_text(rng, 58) + "D"   # 60 chars
    a = shared + _rand_text(rng, 40)           # lowest id: keeps its copy
    b = _rand_text(rng, 30) + shared           # cut here
    c = _rand_text(rng, 80)                    # untouched
    df = _docs(spark, [a, b, c])
    out = {r["doc_id"]: r for r in
           substr.substring_dedup_apply(df, min_len=50).collect()}
    assert out[0]["text"] == a and out[0]["cut_chars"] == 0
    assert out[1]["text"] == b[:30] and out[1]["cut_chars"] == 60
    assert out[2]["text"] == c and out[2]["cut_chars"] == 0
    # the duplicated region survives in exactly its first host
    assert shared in out[0]["text"] and shared not in out[1]["text"]


def test_substring_dedup_apply_merges_overlaps(spark):
    rng = random.Random(37)
    s1 = "1" + _rand_text(rng, 50) + "2"       # 52 chars
    s2 = "3" + _rand_text(rng, 50) + "4"
    mid = _rand_text(rng, 10)
    b = "~" + s1 + mid + s2 + "~"              # both spans, disjoint
    df = _docs(spark, [s1 + "#" + s2, b])
    out = {r["doc_id"]: r for r in
           substr.substring_dedup_apply(df, min_len=50).collect()}
    assert out[1]["cut_chars"] == len(s1) + len(s2)
    assert out[1]["text"] == "~" + mid + "~"
