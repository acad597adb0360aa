"""CCNet-style bigram-LM perplexity: training counts, smoothed scoring
vs an exact local replica, unseen-context behavior, and tier bucketing."""

import math
from collections import Counter

from pypdfocr_spark import lm

REF = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
    (4, "the dog and the cat"),
]
DOCS = [
    (10, "the cat sat on the mat"),          # verbatim reference → head
    (11, "the dog sat on the mat"),
    (12, "a cat ate a fish"),
    (13, "zebra quantum flux unseen tokens entirely"),  # all-unseen → tail
    (14, "word"),                             # 1 token: unscorable
    (15, ""),                                 # empty: unscorable
]


def local_ppl(text, uni, big, V, alpha=0.1):
    ws = [w for w in text.split(" ") if w != ""]
    # mirror _bigrams: pairs over the RAW split (empty tokens kept)
    raw = text.split(" ")
    pairs = [(raw[i], raw[i + 1]) for i in range(len(raw) - 1)]
    pairs = [(a, b) for a, b in pairs]
    if len(raw) < 2:
        return 0, None
    lps = [
        math.log2((big.get(p, 0) + alpha) / (uni.get(p[0], 0) + alpha * V))
        for p in pairs
    ]
    return len(pairs), 2.0 ** (-sum(lps) / len(lps))


def test_perplexity_matches_local_replica(spark):
    """Training tables equal local Counters; smoothed per-doc perplexity
    matches an exact float64 replica to 1e-9 (tolerance, not hash — libm
    territory, which is why this op is pytest-verified, not oracled);
    short docs come back n_bigrams=0 with null ppl instead of vanishing."""
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    model = lm.lm_train(ref)

    uni = Counter(w for _, t in REF for w in t.split(" ") if w)
    big = Counter()
    for _, t in REF:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
    assert {(r["w"], r["c"]) for r in model["unigrams"].collect()} == set(
        uni.items()
    )
    assert {
        ((r["w1"], r["w2"]), r["c"]) for r in model["bigrams"].collect()
    } == set(big.items())
    V = model["vocab_size"]
    assert V == len(uni)

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm.perplexity_df(docs, model).collect()}
    assert len(got) == len(DOCS)
    for did, text in DOCS:
        n, want = local_ppl(text, uni, big, V)
        assert got[did]["n_bigrams"] == n, did
        if want is None:
            assert got[did]["ppl"] is None
        else:
            assert abs(got[did]["ppl"] - want) < 1e-9 * max(1.0, want), did
    # reference-like text scores far lower than unseen gibberish
    assert got[10]["ppl"] < got[13]["ppl"] / 3


def test_perplexity_buckets(spark):
    """Quantile tiering: scored docs split head/middle/tail by corpus
    thresholds (head = most reference-like), unscorable docs get a null
    bucket and are excluded from the thresholds."""
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    model = lm.lm_train(ref)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in lm.perplexity_buckets(
            lm.perplexity_df(docs, model)
        ).collect()
    }
    assert out[10]["bucket"] == "head"
    # note: with backoff-free add-alpha, an ALL-unseen doc scores exactly
    # ppl=V (p=1/V per bigram) — a seen-context/unseen-word doc can score
    # WORSE; rank by the measured ppl, not by intuition
    worst = max(
        (r for r in out.values() if r["ppl"] is not None),
        key=lambda r: r["ppl"],
    )
    assert worst["bucket"] == "tail"
    assert abs(out[13]["ppl"] - 11.0) < 1e-9  # exactly V
    assert out[14]["bucket"] is None and out[15]["bucket"] is None
    scored = [r["bucket"] for r in out.values() if r["bucket"] is not None]
    assert set(scored) <= {"head", "middle", "tail"}
    assert len(scored) == 4
