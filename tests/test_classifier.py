"""Model-based quality filter (classifier.py): feature hashing parity,
gradient replica, separable-corpus accuracy, map-only scoring plan."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from pypdfocr_spark import classifier


GOOD_VOCAB = ["research", "method", "result", "theory", "measure",
              "chapter", "evidence", "analysis", "history", "science"]
SPAM_VOCAB = ["cheap", "winner", "click", "bonus", "prize",
              "offer", "deal", "limited", "free", "casino"]


def _corpus(spark, n_per_class, seed=0, start=0):
    rng = random.Random(seed)
    rows = []
    for i in range(n_per_class):
        good = " ".join(rng.choice(GOOD_VOCAB) for _ in range(rng.randint(8, 20)))
        spam = " ".join(rng.choice(SPAM_VOCAB) for _ in range(rng.randint(8, 20)))
        rows.append((start + 2 * i, good, 1))
        rows.append((start + 2 * i + 1, spam, 0))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, label INT")


def test_feature_hashing_matches_local_replica(spark):
    """The JVM bucket ids (F.hash = murmur3, seed 42) pinned against
    themselves on the string side: same token -> same bucket across docs,
    unigram+bigram layout and counts exactly as specified."""
    df = spark.createDataFrame(
        [(0, "Alpha beta GAMMA"), (1, "alpha beta"), (2, ""), (3, "solo")],
        "doc_id LONG, text STRING",
    )
    nb = 1 << 10
    rows = df.select(
        "doc_id",
        classifier.hashed_feature_col("text", nb).alias("fx"),
        F.pmod(F.hash(F.lit("alpha")), F.lit(nb)).alias("h_alpha"),
        F.pmod(F.hash(F.lit("beta")), F.lit(nb)).alias("h_beta"),
        F.pmod(F.hash(F.lit("gamma")), F.lit(nb)).alias("h_gamma"),
        F.pmod(F.hash(F.lit("alpha beta")), F.lit(nb)).alias("h_ab"),
        F.pmod(F.hash(F.lit("beta gamma")), F.lit(nb)).alias("h_bg"),
        F.pmod(F.hash(F.lit("solo")), F.lit(nb)).alias("h_solo"),
    ).collect()
    r = {x["doc_id"]: x for x in rows}
    assert list(r[0]["fx"]) == [r[0]["h_alpha"], r[0]["h_beta"], r[0]["h_gamma"],
                                r[0]["h_ab"], r[0]["h_bg"]]
    assert list(r[1]["fx"]) == [r[1]["h_alpha"], r[1]["h_beta"], r[1]["h_ab"]]
    assert list(r[2]["fx"]) == []
    assert list(r[3]["fx"]) == [r[3]["h_solo"]]   # no bigrams for 1 token


def test_first_gradient_matches_local_replica(spark):
    df = _corpus(spark, 20, seed=4)
    nb = 1 << 12
    model = classifier.train_quality_classifier(
        df, num_buckets=nb, iterations=1, lr=1.0, l2=0.0
    )
    # replicate iteration 1 from the JVM-computed feature arrays
    feats = df.select(
        classifier.hashed_feature_col("text", nb).alias("fx"),
        F.col("label").cast("double").alias("y"),
    ).collect()
    grad = np.zeros(nb)
    gb = 0.0
    for r in feats:
        idx = np.asarray(r["fx"], dtype=np.int64)
        v = 1.0 / len(idx)
        p = 0.5  # sigmoid(0) at w=0
        np.add.at(grad, idx, (p - r["y"]) * v)
        gb += p - r["y"]
    n = len(feats)
    np.testing.assert_allclose(model.weights, -1.0 * grad / n, rtol=0, atol=1e-12)
    assert abs(model.bias - (-gb / n)) < 1e-12
    assert abs(model.history[0] - np.log(2)) < 1e-9  # loss at w=0 is ln 2


def test_separable_corpus_learns_and_generalizes(spark):
    train = _corpus(spark, 60, seed=1)
    test = _corpus(spark, 40, seed=2, start=10_000)
    model = classifier.train_quality_classifier(train, iterations=30)
    assert model.history[-1] < model.history[0] * 0.5   # loss actually fell
    scored = classifier.classifier_score_df(test, model)
    joined = test.join(scored, "doc_id").collect()
    acc = sum(
        1 for r in joined
        if (r["quality_prob"] >= 0.5) == (r["label"] == 1)
    ) / len(joined)
    assert acc >= 0.95
    # disjoint vocabularies: every doc should be on the right side firmly
    goods = [r["quality_prob"] for r in joined if r["label"] == 1]
    spams = [r["quality_prob"] for r in joined if r["label"] == 0]
    assert min(goods) > max(spams)


def test_layout_invariant_verdicts(spark):
    train = _corpus(spark, 30, seed=3)
    m1 = classifier.train_quality_classifier(train, iterations=10)
    m2 = classifier.train_quality_classifier(train.repartition(13), iterations=10)
    # float reductions: weights agree to rounding, verdicts exactly
    np.testing.assert_allclose(m1.weights, m2.weights, atol=1e-10)
    test = _corpus(spark, 20, seed=5, start=5000)
    s1 = {r["doc_id"]: r["quality_prob"] >= 0.5
          for r in classifier.classifier_score_df(test, m1).collect()}
    s2 = {r["doc_id"]: r["quality_prob"] >= 0.5
          for r in classifier.classifier_score_df(test, m2).collect()}
    assert s1 == s2


def test_quality_filter_gate(spark):
    train = _corpus(spark, 40, seed=6)
    model = classifier.train_quality_classifier(train, iterations=30)
    test = _corpus(spark, 10, seed=7, start=900)
    kept = classifier.quality_filter_df(test, model).collect()
    assert {r["doc_id"] % 2 for r in kept} == {0}       # only the good rows
    assert all("quality_prob" in r.asDict() for r in kept)


def test_score_plan_is_map_only(spark):
    df = _corpus(spark, 2, seed=8)
    model = classifier.QualityModel(
        np.zeros(1 << 10), 0.0, 1 << 10, True, []
    )
    plan = classifier.classifier_score_df(df, model) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([(0, "", 1)], "doc_id LONG, text STRING, label INT")
    with pytest.raises(ValueError):
        classifier.train_quality_classifier(df, iterations=1)


def _mangle(s: str) -> str:
    return s.encode("utf-8").decode("cp1252")


def test_web_gate_fused_matches_chained(spark):
    """recipe.web_gate (2 Arrow stages) must be row-identical to the
    chained fix -> bloom-probe -> score composition (3 Arrow stages) on
    a corpus mixing mojibake, Bloom-seen docs, and both quality classes."""
    from pypdfocr_spark import bloom, recipe, textfix

    train = _corpus(spark, 40, seed=11)
    model = classifier.train_quality_classifier(train, iterations=30)

    rng = random.Random(12)
    rows = []
    for i in range(60):
        vocab = GOOD_VOCAB if i % 2 == 0 else SPAM_VOCAB
        text = " ".join(rng.choice(vocab) for _ in range(12)) + " café"
        rows.append((i, _mangle(text) if i % 3 == 0 else text))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    # reference set = the REPAIRED text of every 5th doc (hashing must
    # see NFC bytes, so seen-ness is decided post-fix in both paths)
    fixed = textfix.fix_text_df(df)
    reference = fixed.where(F.col("doc_id") % 5 == 0)
    bitmap = bloom.bloom_build(reference, "text", num_bits=1 << 16, num_hashes=5)

    chained = (
        bloom.bloom_probe_df(fixed.select("doc_id", "text"), bitmap, num_hashes=5)
        .join(classifier.classifier_score_df(fixed, model), "doc_id")
        .select("doc_id", "text", "maybe_seen", "quality_prob")
    )
    fused = recipe.web_gate(df, model, bitmap, num_hashes=5, return_flags=True)
    got = {r["doc_id"]: r for r in fused.collect()}
    want = {r["doc_id"]: r for r in chained.collect()}
    assert set(got) == set(want) and len(got) == 60
    for did in want:
        assert got[did]["text"] == want[did]["text"]
        assert got[did]["maybe_seen"] == want[did]["maybe_seen"]
        assert abs(got[did]["quality_prob"] - want[did]["quality_prob"]) < 1e-12
    assert any(r["maybe_seen"] for r in want.values())  # probe non-vacuous
    probs = sorted(r["quality_prob"] for r in want.values())
    assert probs[0] < 0.5 < probs[-1]                   # both classes present

    # default form: survivors only = fresh AND above threshold
    kept = {r["doc_id"] for r in recipe.web_gate(
        df, model, bitmap, num_hashes=5, threshold=0.5
    ).collect()}
    assert kept == {
        d for d, r in want.items()
        if not r["maybe_seen"] and r["quality_prob"] >= 0.5
    }
    assert kept  # non-vacuous


def test_web_gate_plan_is_map_only(spark):
    from pypdfocr_spark import recipe

    df = spark.createDataFrame([(0, "alpha beta")], "doc_id LONG, text STRING")
    model = classifier.QualityModel(np.zeros(1 << 10), 0.0, 1 << 10, True, [])
    plan = (
        recipe.web_gate(df, model, bytes(1 << 10), return_flags=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_web_gate_no_bitmap_no_fix(spark):
    from pypdfocr_spark import recipe

    train = _corpus(spark, 20, seed=13)
    model = classifier.train_quality_classifier(train, iterations=20)
    test = _corpus(spark, 10, seed=14, start=700)
    flags = recipe.web_gate(test, model, None, fix=False, return_flags=True)
    rows = flags.collect()
    assert len(rows) == 20 and not any(r["maybe_seen"] for r in rows)
    want = {r["doc_id"]: r["quality_prob"]
            for r in classifier.classifier_score_df(test, model).collect()}
    for r in rows:
        assert abs(r["quality_prob"] - want[r["doc_id"]]) < 1e-12
