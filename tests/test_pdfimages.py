"""Pure-Python PDF image extraction — the in-process ``pdfimages``
replacement (ref: pypdfocr/pypdfocr_gs.py:121 shells out to
``pdfimages -list``; here the container walk and every common image
filter run in-repo, no poppler/gs)."""

import hashlib

import numpy as np
import pytest

from pypdfocr_spark import pdfimages
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_pdf_extract_every_filter():
    """Every byte filter (Flate, Flate+PNG-predictor, LZW, RunLength,
    ASCIIHex- and ASCII85-wrapped chains, raw) round-trips the pixels
    EXACTLY through a classic-xref PDF; DCTDecode decodes through the
    in-repo JPEG decoder within DCT rounding; CCITTFaxDecode K=-1 (G4)
    is exact on bilevel pages."""
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(12, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    bil = (rng.randint(0, 2, size=(20, 33)) * 255).astype("uint8")
    cases = [
        ("flate", gray, True), ("flate", rgb, True),
        ("flate_png", gray, True), ("flate_png", rgb, True),
        ("lzw", gray, True), ("rle", rgb, True),
        ("ahx", gray, True), ("a85", rgb, True),
        ("raw", gray, True), ("g4", bil, True), ("dct", gray, False),
    ]
    for filt, img, exact in cases:
        pay = pdfimages.build_pdf([[{"img": img, "filter": filt}]])
        ((no, name, out),) = list(pdfimages.extract_pdf_images(pay))
        assert (no, name) == (0, "Im0") and out.shape == img.shape, filt
        if exact:
            assert (out == img).all(), filt
        else:
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 3, filt


def test_pdf_probe_pages_and_layouts():
    """probe_pdf inventories pages/images without decoding; page
    selection skips other pages' decodes; the PDF 1.5 layout (xref
    STREAM + page dicts inside an object STREAM) parses identically;
    a corrupted startxref falls back to the brute object scan; non-PDF
    payloads and encryption gate."""
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(12, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    bil = (rng.randint(0, 2, size=(20, 33)) * 255).astype("uint8")
    pay = pdfimages.build_pdf([
        [{"img": gray, "filter": "flate"}, {"img": rgb, "filter": "dct"}],
        [{"img": bil, "filter": "g4"}],
        [],
    ])
    meta = pdfimages.probe_pdf(pay)
    assert meta["n_pages"] == 3 and meta["n_images"] == 3
    assert meta["images"][2] == {
        "page": 1, "name": "Im0", "width": 33, "height": 20, "bits": 1,
        "filters": ["CCITTFaxDecode"],
    }
    got = list(pdfimages.extract_pdf_images(pay, pages=[1]))
    assert len(got) == 1 and got[0][0] == 1 and (got[0][2] == bil).all()

    modern = pdfimages.build_pdf(
        [[{"img": gray, "filter": "flate"}], [{"img": bil, "filter": "g4"}]],
        xref_stream=True,
    )
    assert b"/ObjStm" in modern and b"/XRef" in modern and b"trailer" not in modern
    meta = pdfimages.probe_pdf(modern)
    assert meta["n_pages"] == 2 and meta["n_images"] == 2
    got = {no: img for no, _, img in pdfimages.extract_pdf_images(modern)}
    assert (got[0] == gray).all() and (got[1] == bil).all()

    bad = bytearray(pdfimages.build_pdf([[{"img": gray, "filter": "flate"}]]))
    i = bytes(bad).rfind(b"startxref")
    j = bytes(bad).find(b"\n", i + 10)
    bad[i + 10 : j] = b"99999999"[: j - i - 10]
    ((_, _, out),) = list(pdfimages.extract_pdf_images(bytes(bad)))
    assert (out == gray).all()

    with pytest.raises(ValueError, match="missing %PDF"):
        pdfimages.PdfDocument(b"GIF89a nope")
    enc = pdfimages.build_pdf([[{"img": gray, "filter": "flate"}]])
    enc = enc.replace(b"/Root", b"/Encrypt 1 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdfimages.PdfDocument(enc)


def test_pdf_image_features_over_spark(spark, emb):
    """The synthetic scanned-PDF table over the real mapInPandas path:
    each row's Flate image matches the numpy replica exactly and the G4
    image matches its threshold, for BOTH xref layouts."""
    sample = emb.limit(3)
    for xref_stream in (False, True):
        media = pdfimages.pdf_media_table(
            sample, width=8, filters=("flate", "g4"), xref_stream=xref_stream
        )
        got = {
            (r["vec_id"], r["image_name"]): r
            for r in pdfimages.extract_pdf_image_features(media).collect()
        }
        for row in sample.collect():
            f = np.asarray(row["embedding"], dtype="<f4")
            u8 = np.clip(f * 64.0 + 128.0, 0, 255).astype("uint8")
            rows = -(-u8.size // 8)
            gray = np.zeros((rows, 8), dtype="uint8")
            gray.reshape(-1)[: u8.size] = u8
            bil = (gray >= 128) * np.uint8(255)
            for name, want in (("Im0", gray), ("Im1", bil)):
                r = got[(row["vec_id"], name)]
                assert (r["page_no"], r["width"], r["height"], r["channels"]) == (0, 8, rows, 1)
                assert r["min_val"] == int(want.min()) and r["max_val"] == int(want.max())
                assert r["mean_val"] == want.astype("float64").mean()
                assert r["checksum"] == hashlib.md5(want.tobytes()).hexdigest()


def test_searchable_pdf_text_roundtrip():
    """K1 as a real PDF: the invisible-text layer written by
    artifact.render_searchable_pdf reads back through
    pdfimages.extract_pdf_text with EXACTLY the JSON artifact's
    placement (text, x, y, size, mode 3, angle), the optional page
    image decodes back bit-for-bit, string escapes survive, and the
    uncompressed-contents form parses identically."""
    import json
    import math

    from pypdfocr_spark import artifact

    def word(t, x, y, size=10.0, angle=0):
        return {"text": t, "x_pt": x, "y_pt": y, "font_size": size, "angle": angle}

    pages = [
        [{"words": [word("Hello", 72.0, 700.5), word("(w\\or(ld))", 120.25, 700.5, 12.0)]},
         {"words": [word("rotated", 200.0, 650.0, 10.0, 90)]}],
        [{"words": [word("page2", 36.0, 36.0, 8.0)]}],
    ]
    img0 = np.arange(48, dtype=np.uint8).reshape(6, 8)
    pay = artifact.render_searchable_pdf(
        pages, 612.0, 792.0, rotations=[0, 90], page_images=[img0, None]
    )
    want = json.loads(artifact.render_searchable_doc(pages, 612.0, 792.0, [0, 90])[9:])
    got = pdfimages.extract_pdf_text(pay)
    assert len(got) == 2
    for want_page, got_page in zip(want["pages"], got):
        assert len(want_page["words"]) == len(got_page)
        for wj, wp in zip(want_page["words"], got_page):
            assert wp["text"] == wj["t"]
            assert math.isclose(wp["x"], wj["x"], abs_tol=1e-6)
            assert math.isclose(wp["y"], wj["y"], abs_tol=1e-6)
            assert wp["size"] == wj["size"] and wp["mode"] == 3
            assert math.isclose(wp["angle"] % 360, wj["angle"] % 360, abs_tol=1e-3)
    ((no, _, img),) = list(pdfimages.extract_pdf_images(pay))
    assert no == 0 and (img == img0).all()
    assert pdfimages.probe_pdf(pay)["n_pages"] == 2
    plain = artifact.render_searchable_pdf(pages, 612.0, 792.0, compress=False)
    assert pdfimages.extract_pdf_text(plain)[1][0]["text"] == "page2"
