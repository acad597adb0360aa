"""Fake-binary end-to-end test of the subprocess extraction path
(VERDICT r4 #2).

``kernels/subproc.py`` is the real-cluster path; until this test it was
exercised only through a mocked ``subprocess`` module. Here the binaries
are REAL executables (generated Python stubs on disk, invoked through
``subprocess.run`` across a genuine process boundary) that speak the same
CLI contracts the reference's tools do:

* ``gs``        — parses -dFirstPage/-dLastPage/-r{dpi}/-sOutputFile argv
                  (the exact argv build_gs_cmd emits), reads the staged
                  PDF, writes one deterministic page image per page;
* ``tesseract`` — answers ``--version``, reads a page image, writes
                  ``<base>.hocr`` (the modern-probe branch of
                  make_hocr_from_img);
* ``pdfinfo``   — prints ``Pages: N``;
* ``pdfimages`` — prints the 3-line ``-list`` table (px dims + gray flag);
* ``identify``  — prints ``%w %x %h %y`` floats.

The stub "PDF" format wraps the synthetic SYNPDF payload behind a real
``%PDF`` header line, and the stub gs/tesseract rasterize/OCR it with the
same deterministic kernels the builtin codec uses — so the test can
assert BYTE-IDENTICAL extracted text between ``ocr_strategy='builtin'``
over the plain corpus and ``ocr_strategy='subprocess'`` over the wrapped
corpus, through real staging, page-count/geometry probes, per-page gs
invocations, hOCR file probing, and scratch cleanup. This mirrors the
reference's own e2e strategy (test/test_pypdfocr.py:51-83 runs real gs +
tesseract over 7 PDFs and checks the extracted text layer).
"""

from __future__ import annotations

import os
import stat
import sys

import pytest

from pypdfocr_spark import corpus, pipeline
from pypdfocr_spark.config import ExtractConfig
from pypdfocr_spark.kernels import codec, subproc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

# PDFs at all three native dpis (7,14→200; 11→400), a spaced routing
# filename (7), html docs (9), and an excluded _ocr.pdf (13).
DOC_IDS = [1, 2, 4, 5, 7, 8, 9, 11, 13, 14, 17, 25]

WRAP_HEADER = b"%PDF-1.4 synthetic-wrapper\n"

_PRELUDE = f"""#!{sys.executable}
import json, sys
sys.path.insert(0, {REPO!r})
from pypdfocr_spark.kernels import codec, hocr


def read_pages(pdf_path):
    data = open(pdf_path, "rb").read()
    body = data.split(b"\\n", 1)[1]  # strip the %PDF wrapper line
    return codec.decode_doc(body)
"""

_GS = """
first = last = None
dpi = 300
template = None
operands = []
for a in sys.argv[1:]:
    if a.startswith("-dFirstPage="):
        first = int(a.split("=", 1)[1])
    elif a.startswith("-dLastPage="):
        last = int(a.split("=", 1)[1])
    elif a.startswith("-sOutputFile="):
        template = a.split("=", 1)[1]
    elif a.startswith("-r") and a[2:].isdigit():
        dpi = int(a[2:])
    elif not a.startswith("-"):
        operands.append(a)
pages = read_pages(operands[-1])
sel = pages[(first or 1) - 1 : (last if last is not None else len(pages))]
for i, page in enumerate(codec.rasterize(sel, dpi)):
    with open(template.replace("%d", str(i + 1)), "w") as f:
        json.dump(page, f)
"""

_TESSERACT = """
if "--version" in sys.argv:
    print("tesseract 5.3.0")
    sys.exit(0)
img_path, out_base = sys.argv[1], sys.argv[2]
with open(img_path) as f:
    page = json.load(f)
with open(out_base + ".hocr", "w") as f:
    f.write(hocr.emit_hocr([page]))
"""

_PDFINFO = """
pages = read_pages(sys.argv[-1]) or []
print("Producer: stub")
print("Pages: %d" % len(pages))
"""

_PDFIMAGES = """
pages = read_pages(sys.argv[-1]) or []
print("page   num  type   width height color comp bpc  enc")
print("----------------------------------------------------")
if pages:
    p0 = pages[0]
    color = "gray" if p0.get("greyscale") else "rgb"
    print("   1     0 image %d %d %s 1 8 jpeg" % (p0["w_px"], p0["h_px"], color))
"""

_IDENTIFY = """
pages = read_pages(sys.argv[-1]) or []
if pages:
    p0 = pages[0]
    d = p0["dpi"]
    print("%r 1.0 %r 1.0" % (p0["w_px"] / d, p0["h_px"] / d))
"""


@pytest.fixture(scope="module")
def fake_bins(tmp_path_factory):
    d = tmp_path_factory.mktemp("fakebins")
    for name, body in [
        ("gs", _GS), ("tesseract", _TESSERACT), ("pdfinfo", _PDFINFO),
        ("pdfimages", _PDFIMAGES), ("identify", _IDENTIFY),
    ]:
        p = d / name
        p.write_text(_PRELUDE + body)
        p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return d


def _corpus_rows(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where("doc_id in (%s)" % ",".join(map(str, DOC_IDS)))
        .collect()
    )
    assert len(docs) == len(DOC_IDS)
    return [
        corpus.build_corpus_row(r["doc_id"], r["text"], r["lang"], r["source"])
        for r in docs
    ]


def _wrap(row: dict) -> dict:
    payload = bytes(row["html"])
    if codec.is_syn_pdf(payload):
        return {**row, "html": WRAP_HEADER + payload}
    return row


def test_subprocess_e2e_byte_identical_to_builtin(spark, fake_bins, tmp_path):
    rows = _corpus_rows(spark)
    plain = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, text string, lang string")
    wrapped = spark.createDataFrame(
        [_wrap(r) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    scratch = str(tmp_path / "scratch")
    # threshold chosen so multi-page docs take the exploded page-split
    # path (staged pdf + per-page gs -dFirstPage) and single-page docs
    # take the light whole-doc subprocess kernel — both real paths run
    heavy_bytes = 4_000
    cfg_builtin = ExtractConfig(ocr_strategy="builtin", heavy_payload_bytes=heavy_bytes)
    cfg_sub = ExtractConfig(
        ocr_strategy="subprocess",
        heavy_payload_bytes=heavy_bytes,
        scratch_dir=scratch,
        gs_binary=str(fake_bins / "gs"),
        tesseract_binary=str(fake_bins / "tesseract"),
        pdfinfo_binary=str(fake_bins / "pdfinfo"),
        pdfimages_binary=str(fake_bins / "pdfimages"),
        identify_binary=str(fake_bins / "identify"),
    )

    sizes = {r["url"]: len(bytes(r["html"])) for r in rows}
    pdf_sizes = [n for u, n in sizes.items() if not u.endswith(".html")]
    assert any(n > heavy_bytes for n in pdf_sizes), "fixture must hit the page-split path"
    assert any(n <= heavy_bytes for n in pdf_sizes), "fixture must hit the whole-doc path"

    cols = ["url", "extracted_text", "extracted_norm", "route", "n_pages", "status"]
    base = {r["url"]: r for r in pipeline.extract(plain, cfg_builtin).select(cols).collect()}
    got = {r["url"]: r for r in pipeline.extract(wrapped, cfg_sub).select(cols).collect()}

    # the subprocess run actually staged heavy PDFs to shared scratch
    staged = [f for f in os.listdir(scratch) if f.endswith(".pdf")]
    assert staged, "page-split staging never engaged"

    assert set(base) == set(got) and base  # same doc set (post source-filter)
    for url in base:
        b, g = base[url], got[url]
        assert g["extracted_text"] == b["extracted_text"], url  # byte identity
        assert g["extracted_norm"] == b["extracted_norm"], url
        assert (g["route"], g["n_pages"], g["status"]) == (
            b["route"], b["n_pages"], b["status"]), url
    # every non-html doc really went through the stubs: a wrapped payload
    # is NOT a SYNPDF, so builtin decode would have yielded 'unsupported'
    assert all(
        got[u]["status"] == "ok" for u in got
    ) and any(not u.endswith(".html") for u in got)

    # K6 analog: the job-end sweep leaves the shared scratch empty
    removed = subproc.clean_scratch(scratch, max_age_s=0.0)
    assert removed == len(staged)
    assert os.listdir(scratch) == []


def test_subprocess_e2e_gs_failure_is_row_status_not_task_failure(spark, fake_bins, tmp_path):
    """A corrupt real PDF must become a decode_error ROW (light path) —
    never a task failure — exercised through the real process boundary."""
    rows = [{
        "url": "https://site1.example/a/broken.pdf",
        "warc_ts": None,
        "html": WRAP_HEADER + b"this is not a synpdf body",
        "text": "x", "lang": "en",
    }]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = ExtractConfig(
        ocr_strategy="subprocess",
        gs_binary=str(fake_bins / "gs"),
        tesseract_binary=str(fake_bins / "tesseract"),
        pdfinfo_binary=str(fake_bins / "pdfinfo"),
        pdfimages_binary=str(fake_bins / "pdfimages"),
        identify_binary=str(fake_bins / "identify"),
    )
    out = pipeline.extract(df, cfg).collect()
    assert len(out) == 1
    assert out[0]["status"] == "decode_error"
    assert out[0]["extracted_text"] == "" and out[0]["n_pages"] == 0
