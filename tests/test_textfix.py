"""Encoding repair (textfix.py): mojibake fixtures, NFC, control strip,
idempotence property, Spark table form."""

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from pypdfocr_spark import textfix


def _mangle(s: str, rounds: int = 1) -> str:
    """Produce real mojibake: decode the UTF-8 bytes as cp1252
    (latin-1 for cp1252's holes), `rounds` times."""
    for _ in range(rounds):
        raw = s.encode("utf-8")
        try:
            s = raw.decode("cp1252")
        except UnicodeDecodeError:
            s = raw.decode("latin-1")
    return s


def test_classic_mojibake_fixtures():
    cases = [
        "café results",
        "naïve approach — “quoted” text’s em-dash",
        "résumé • München • 日本語テキスト",
        "emoji 🚀 and €100",
    ]
    for clean in cases:
        garbled = _mangle(clean)
        assert garbled != clean
        fixed, rounds = textfix.fix_text(garbled)
        assert fixed == unicodedata.normalize("NFC", clean)
        assert rounds == 1


def test_double_encoded():
    clean = "déjà vu"
    garbled = _mangle(clean, rounds=2)
    fixed, rounds = textfix.fix_text(garbled)
    assert fixed == clean and rounds == 2


def test_clean_text_untouched():
    for s in ["plain ascii", "日本語テキストです", "math: ∀x∈ℝ",
              "Ã alone is fine", "A±B (cp1252-unreachable pair stays)"]:
        fixed, rounds = textfix.fix_text(s)
        assert rounds == 0
        assert fixed == unicodedata.normalize("NFC", s)


def test_nfc_and_controls():
    decomposed = "été"             # é é via combining acute
    fixed, _ = textfix.fix_text(decomposed)
    assert fixed == "été"
    assert textfix.fix_text("a\x00b\x08c\x9fd")[0] == "abcd"
    assert textfix.fix_text("keep\ttabs\nand\r\nnewlines")[0] == \
        "keep\ttabs\nand\r\nnewlines"
    assert textfix.fix_text("one two three")[0] == "one\ntwo\nthree"


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_fix_text_idempotent(s):
    f1, _ = textfix.fix_text(s)
    f2, _ = textfix.fix_text(f1)
    assert f2 == f1


_CP1252_HOLES = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=80))
def test_mangled_roundtrip_recovers(s):
    """Text whose UTF-8 bytes are all cp1252-decodable (no hole bytes —
    the invertible mangles; hole-byte mangles lose information to the
    decoder's latin-1 fallback and are NOT recoverable by anyone) comes
    back to its own fix_text form exactly."""
    from hypothesis import assume

    raw = s.encode("utf-8")
    assume(not any(b in _CP1252_HOLES for b in raw))
    garbled = raw.decode("cp1252")
    fixed, _ = textfix.fix_text(garbled)
    want, _ = textfix.fix_text(s)
    assert fixed == want


def test_fix_text_df_table(spark):
    df = spark.createDataFrame(
        [(0, _mangle("café")), (1, "clean"), (2, "é"), (3, None)],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in textfix.fix_text_df(df).collect()}
    assert rows[0]["text"] == "café" and rows[0]["mojibake_rounds"] == 1
    assert rows[0]["changed"]
    assert rows[1]["text"] == "clean" and not rows[1]["changed"]
    assert rows[2]["text"] == "é" and rows[2]["changed"]
    assert rows[3]["text"] == "" and not rows[3]["changed"]


def test_fix_plan_is_map_only(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id LONG, text STRING")
    plan = textfix.fix_text_df(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
