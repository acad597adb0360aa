"""Encoding repair and Unicode normalization — the ftfy step every
crawl pipeline (C4, FineWeb, Dolma) runs before any text analysis.

Crawled text arrives double-mangled: UTF-8 bytes decoded as cp1252
("mojibake": ``é`` → ``Ã©``, ``’`` → ``â€™``), sometimes twice;
decomposed combining sequences that break equality and hashing; C0/C1
control garbage from binary sniffing. This module is a deterministic,
dependency-free core of what ``ftfy.fix_text`` does:

1. **mojibake repair**: if the text contains the cp1252-mojibake
   signature byte pairs, try ``encode(cp1252) → decode(utf-8)`` (falling
   back through latin-1 for the five cp1252 holes) and keep the result
   iff the round trip is lossless — applied up to twice (double-encoded
   text is common);
2. **NFC normalization** (`unicodedata`) so equal-looking strings are
   equal bytes — REQUIRED upstream of every hash-based dedup in this
   repo;
3. **control-character strip** (C0 except tab/newline/CR, C1, and the
   Unicode line/paragraph separators normalized to ``\\n``).

Everything is one map-only Arrow stage (Python is unavoidable here —
Spark has no codec or Unicode-normalization expressions) and idempotent:
``fix_text(fix_text(s)) == fix_text(s)`` is property-tested.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _cp1252_image(b: int) -> str:
    """The character byte ``b`` becomes when mis-decoded: cp1252 where
    defined, latin-1 pass-through for cp1252's five holes (what lenient
    decoders produce)."""
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return bytes([b]).decode("latin-1")


# cp1252-mojibake signature: the image of a UTF-8 lead byte (0xC2-0xF4)
# immediately followed by the image of a continuation byte (0x80-0xBF) —
# e.g. "\u00c3\u00a9" (0xC3 0xA9 = e-acute), "\u00e2\u20ac\u2122"
# (0xE2 0x80 0x99 = right single quote). Built from the codec itself
# rather than hand-typed literals.
_MOJIBAKE_RE = re.compile(
    "[{leads}][{followers}]".format(
        leads=re.escape("".join(_cp1252_image(b) for b in range(0xC2, 0xF5))),
        followers=re.escape("".join(_cp1252_image(b) for b in range(0x80, 0xC0))),
    )
)

# C0 minus \t\n\r, plus DEL and the C1 block
_CONTROL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]")


def _to_cp1252_bytes(s: str) -> "bytes | None":
    """Invert the mis-decode: the byte each char came from when the
    original bytes were read as cp1252 (latin-1 for cp1252's five
    undefined slots, which Python maps straight through)."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        try:
            return s.encode("latin-1")
        except UnicodeEncodeError:
            return None


def repair_mojibake(text: str, max_rounds: int = 2) -> "tuple[str, int]":
    """Undo up to ``max_rounds`` layers of UTF-8-read-as-cp1252. A round
    applies only when the mojibake signature is present AND the inverse
    transform round-trips losslessly as UTF-8 — clean text almost never
    survives that decode, so false repairs need the full lead+continuation
    byte-image pattern by coincidence (the same residual ambiguity ftfy
    accepts). Returns (text, rounds_applied)."""
    applied = 0
    for _ in range(max_rounds):
        if not _MOJIBAKE_RE.search(text):
            break
        raw = _to_cp1252_bytes(text)
        if raw is None:
            break
        try:
            decoded = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        text = decoded
        applied += 1
    return text, applied


def fix_text(text: str, max_passes: int = 4) -> "tuple[str, int]":
    """Full repair: mojibake rounds → NFC → line-separator normalize →
    control strip, iterated to a FIXPOINT (bounded by ``max_passes``) so
    the function is idempotent by construction whenever it stabilizes —
    control-stripping or NFC can expose one more decodable layer.
    Returns (fixed, total_mojibake_rounds)."""
    rounds_total = 0
    for _ in range(max_passes):
        fixed, rounds = repair_mojibake(text)
        rounds_total += rounds
        fixed = unicodedata.normalize("NFC", fixed)
        fixed = fixed.replace("\u2028", "\n").replace("\u2029", "\n")
        fixed = _CONTROL_RE.sub("", fixed)
        if fixed == text:
            break
        text = fixed
    return text, rounds_total


FIX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("changed", BooleanType()),
        StructField("mojibake_rounds", LongType()),
    ]
)


def fix_text_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus form: (doc_id, text, changed, mojibake_rounds) — one
    map-only Arrow stage, no shuffle at any scale. Run FIRST: every
    downstream hash (dedup, winnowing, bloom) sees NFC bytes."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, texts, chg, rds = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                fixed, rounds = fix_text(text or "")
                ids.append(int(did))
                texts.append(fixed)
                chg.append(fixed != (text or ""))
                rds.append(rounds)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "text": texts,
                 "changed": chg,
                 "mojibake_rounds": pd.Series(rds, dtype="int64")}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, FIX_SCHEMA)
