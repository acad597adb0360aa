"""Exact-substring duplicate detection — Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better") re-expressed for Spark.

Lee et al. find exact duplicated substrings of ≥ N tokens with a single
giant suffix array — a data structure that wants the whole corpus in one
address space. The distributable equivalent used here is **winnowing**
(Schleimer, Wilkerson & Aiken 2003, the MOSS fingerprinter):

* hash every character ``k``-gram (double 31-bit polynomial rolling
  hash → 62-bit fingerprint, vectorized numpy);
* in every window of ``w`` consecutive k-gram hashes, select the
  (leftmost-) minimum — ~``2/(w+1)`` of k-grams survive;
* **guarantee**: any substring shared by two documents with length
  ≥ ``w + k − 1`` contains a full window of identical hash sequence, so
  BOTH documents select the identical fingerprint — no false negatives
  at or above the length threshold.

Detection then becomes relational: an equi-self-join on fingerprints
yields anchor candidates, and a verification pass extends each anchor to
the MAXIMAL exactly-equal span (false candidates from hash collisions
die here — the output is exact, never probabilistic).

Scale shape (the suffix array has no 100-TB story; this does):

* fingerprint table ≈ ``2·corpus_chars/(w+1)`` rows of (id, int64, int)
  — ~4% of corpus volume at the default window;
* ``max_df`` drops fingerprints shared by more than ``max_df`` docs
  before the self-join (the boilerplate pathology; same recall trade and
  same spelling as ``dedup.ngram_jaccard_pairs``) so candidate fan-out
  is linear, not quadratic;
* only CANDIDATE PAIRS ship document text (two joins), never the cross
  product; extension cost is O(duplicated span), not O(doc²).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# two independent 31-bit polynomial hash streams; fingerprint = h1·2³¹+h2
_B1, _M1 = 131, (1 << 31) - 1          # 2147483647, Mersenne prime
_B2, _M2 = 137, (1 << 31) - 19         # 2147483629, prime


def _kgram_hashes(codes: np.ndarray, k: int, base: int, mod: int) -> np.ndarray:
    """Polynomial hash of every k-gram: k vectorized Horner passes (all
    intermediates < 2^39, no overflow in uint64)."""
    m = len(codes) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    b = np.uint64(base)
    md = np.uint64(mod)
    for j in range(k):
        h = (h * b + codes[j : j + m]) % md
    return h


def _select_fingerprints(text: str, k: int, w: int) -> "tuple[np.ndarray, np.ndarray]":
    """Winnowing selection for one document → (positions, fingerprints).
    Positions are code-point offsets (Python ``str`` indexing)."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = len(codes) - k + 1
    if m < 1:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    h1 = _kgram_hashes(codes, k, _B1, _M1)
    h2 = _kgram_hashes(codes, k, _B2, _M2)
    fp = ((h1 << np.uint64(31)) | h2).view(np.int64)
    if m <= w:
        sel = np.array([int(np.argmin(fp))], dtype=np.int64)
    else:
        sw = np.lib.stride_tricks.sliding_window_view(fp, w)
        sel = np.unique(sw.argmin(axis=1) + np.arange(len(sw)))
    return sel, fp[sel]


FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fp", LongType()),
        StructField("pos", IntegerType()),
    ]
)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    w: int = 26,
) -> DataFrame:
    """(doc_id, fp, pos) winnowing fingerprints — one mapInPandas stage,
    zero shuffle. Output density ~2/(w+1) fingerprints per character."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, fps, poss = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sel, fp = _select_fingerprints(text or "", k, w)
                ids.extend([int(did)] * len(sel))
                fps.extend(fp.tolist())
                poss.extend(sel.tolist())
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "fp": pd.Series(fps, dtype="int64"),
                 "pos": pd.Series(poss, dtype="int32")}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, FP_SCHEMA)


def _match_forward(a: str, i: int, b: str, j: int) -> int:
    """Length of the longest common prefix of a[i:] and b[j:] —
    exponential growth + bisection over C-speed slice equality."""
    lo = 0
    step = 64
    max_len = min(len(a) - i, len(b) - j)
    while lo < max_len:
        n = min(step, max_len - lo)
        if a[i + lo : i + lo + n] == b[j + lo : j + lo + n]:
            lo += n
            step *= 2
        elif n == 1:
            break
        else:
            step = max(1, n // 2)
    return lo


def _extend(a: str, pa: int, b: str, pb: int, k: int) -> "tuple[int, int, int] | None":
    """Maximal exactly-equal span around an anchor k-gram, or None when
    the anchor was a hash collision. Returns (start_a, start_b, length)."""
    if a[pa : pa + k] != b[pb : pb + k]:
        return None
    # backward: longest common suffix of a[:pa], b[:pb] via the forward
    # matcher on reversed prefixes (slices are cheap relative to spans)
    back = _match_forward(a[:pa][::-1], 0, b[:pb][::-1], 0)
    fwd = _match_forward(a, pa + k, b, pb + k)
    return pa - back, pb - back, back + k + fwd


SPAN_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("start_a", IntegerType()),
        StructField("start_b", IntegerType()),
        StructField("length", IntegerType()),
    ]
)


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    max_df: "int | None" = 50,
    cache_registry: "list | None" = None,
) -> DataFrame:
    """All maximal exactly-equal substrings of length ≥ ``min_len``
    between distinct documents: (id_a, id_b, start_a, start_b, length),
    id_a < id_b. Complete at or above ``min_len`` by the winnowing
    guarantee (k and w are derived so ``w + k − 1 = min_len``), exact
    always (anchors are verified and extended against the real text).

    The fingerprint relation feeds four consumers (the hot-fp build, the
    anti-join probe, both self-join sides); it is persisted once so the
    winnowing Python stage runs once, not four times — same lifecycle
    policy as ``dedup.ngram_jaccard_pairs`` (pass ``cache_registry`` to
    receive the persisted DataFrame for deterministic unpersist).

    ``max_df`` drops fingerprints appearing in more than ``max_df``
    documents before the self-join — the boilerplate/flood defense (a
    license header shared by a million pages would otherwise emit
    O(10¹²) candidate anchors). Spans carried ONLY by dropped
    fingerprints are missed; that is the same documented recall trade as
    ``ngram_jaccard_pairs(max_df=…)``, and the dropped text is by
    definition the corpus's most duplicated boilerplate."""
    if min_len < 4:
        raise ValueError("min_len must be >= 4")
    k = (min_len + 1) // 2
    w = min_len - k + 1
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w).persist()
    if cache_registry is not None:
        cache_registry.append(fps)
    if max_df is not None:
        # distinct docs per fingerprint (a fp repeating INSIDE one doc is
        # self-similarity, not corpus boilerplate)
        hot = (
            fps.groupBy("fp")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .where(F.col("n_docs") > max_df)
            .select("fp")
        )
        fps = fps.join(hot, "fp", "left_anti")
    a = fps.alias("a")
    b = fps.alias("b")
    cand = (
        a.join(b, "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("b.pos").alias("pos_b"),
        )
    )
    texts = df.select(F.col(id_col).cast("long"), F.col(text_col))
    cand = cand.join(
        texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta")), "id_a"
    ).join(
        texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb")), "id_b"
    )

    def verify(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for ia, pa, ib, pb, ta, tb in zip(
                pdf["id_a"], pdf["pos_a"], pdf["id_b"], pdf["pos_b"],
                pdf["_ta"], pdf["_tb"],
            ):
                span = _extend(ta, int(pa), tb, int(pb), k)
                if span is not None and span[2] >= min_len:
                    rows.append((int(ia), int(ib), span[0], span[1], span[2]))
            yield pd.DataFrame(
                rows, columns=["id_a", "id_b", "start_a", "start_b", "length"]
            ).astype(
                {"id_a": "int64", "id_b": "int64",
                 "start_a": "int32", "start_b": "int32", "length": "int32"}
            )

    # every anchor inside one duplicated region extends to the SAME
    # maximal span — distinct() collapses them
    return cand.mapInPandas(verify, SPAN_SCHEMA).distinct()


DUPFRAC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dup_chars", LongType()),
        StructField("n_chars", LongType()),
        StructField("dup_frac", DoubleType()),
    ]
)


def substring_dup_fraction(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-character fraction under a span set from
    :func:`substring_dup_spans` — the statistic Lee et al. act on
    (drop/trim documents that are mostly other documents). Spans touching
    a doc on either side are merged as intervals (overlaps counted once).
    One groupBy(doc) with map-side-combined collect_list of (start, len)
    int pairs — bounded by spans-per-doc, not doc size."""
    sides = spans.select(
        F.col("id_a").alias("doc_id"), F.col("start_a").alias("start"), "length"
    ).unionByName(
        spans.select(
            F.col("id_b").alias("doc_id"), F.col("start_b").alias("start"), "length"
        )
    )
    per_doc = sides.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("start", "length"))).alias("_spans")
    )
    lens = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    joined = lens.join(per_doc, "doc_id", "left")

    def merge(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for did, n, sp in zip(pdf["doc_id"], pdf["n_chars"], pdf["_spans"]):
                total = 0
                if sp is not None and len(sp):
                    end = -1
                    cur_s = None
                    for item in sp:
                        s, l = int(item["start"]), int(item["length"])
                        if cur_s is None or s > end:
                            if cur_s is not None:
                                total += end - cur_s
                            cur_s, end = s, s + l
                        else:
                            end = max(end, s + l)
                    total += end - cur_s
                out.append((int(did), total, int(n),
                            (total / n) if n else 0.0))
            yield pd.DataFrame(
                out, columns=["doc_id", "dup_chars", "n_chars", "dup_frac"]
            ).astype({"doc_id": "int64", "dup_chars": "int64", "n_chars": "int64"})

    return joined.mapInPandas(merge, DUPFRAC_SCHEMA)


CUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("cut_chars", LongType()),
    ]
)


def substring_dedup_apply(
    df: DataFrame,
    spans: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    max_df: "int | None" = 50,
) -> DataFrame:
    """Apply-side of Lee et al. 2021: REMOVE one copy of every duplicated
    span, keeping the occurrence in the lower-id document. For each span
    the ``id_b`` side is cut; a doc's cut intervals are merged first so
    overlaps are removed once. Docs playing only the ``id_a`` role keep
    their text verbatim — every duplicated region survives in exactly its
    first (lowest-id) host.

    ``spans`` defaults to ``substring_dup_spans(df, min_len, max_df)``.
    One groupBy(doc) over the span table (bounded by spans, not corpus) +
    a text join for AFFECTED docs only + one Arrow cut stage; untouched
    docs pass through with ``cut_chars = 0`` via a cheap left join."""
    if spans is None:
        spans = substring_dup_spans(df, id_col, text_col, min_len, max_df)
    cuts = (
        spans.select(
            F.col("id_b").alias("doc_id"),
            F.col("start_b").alias("start"),
            "length",
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("start", "length"))).alias("_cuts"))
    )
    base = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    joined = base.join(cuts, "doc_id", "left")

    def cut(batches):
        import pandas as pd

        for pdf in batches:
            ids, texts, ncut = [], [], []
            for did, text, sp in zip(pdf["doc_id"], pdf[text_col], pdf["_cuts"]):
                if sp is None or not len(sp):
                    ids.append(int(did)); texts.append(text); ncut.append(0)
                    continue
                merged = []
                for item in sp:
                    s, e = int(item["start"]), int(item["start"]) + int(item["length"])
                    if merged and s <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], e)
                    else:
                        merged.append([s, e])
                kept, prev = [], 0
                for s, e in merged:
                    kept.append(text[prev:s])
                    prev = e
                kept.append(text[prev:])
                ids.append(int(did))
                texts.append("".join(kept))
                ncut.append(sum(e - s for s, e in merged))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "text": texts,
                 "cut_chars": pd.Series(ncut, dtype="int64")}
            )

    return joined.mapInPandas(cut, CUT_SCHEMA)
