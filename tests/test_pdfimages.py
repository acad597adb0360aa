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
        "filters": ["CCITTFaxDecode"], "inline": False,
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
    # a non-Standard security handler is out of scope and says so
    enc = pdfimages.build_pdf([[{"img": gray, "filter": "flate"}]])
    enc = enc.replace(b"/Root", b"/Encrypt 1 0 R /Root")
    with pytest.raises(NotImplementedError, match="security handler"):
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


# -- font-decoded text extraction ---------------------------------------------


def _one_page(content, fonts=None, forms=None, **kw):
    spec = {"content": content, "fonts": fonts or {}}
    if forms:
        spec["forms"] = forms
    return pdfimages.build_text_pdf([spec], **kw)


def test_pdf_text_base_encodings_and_differences():
    """Simple-font decoding through /Encoding: WinAnsiEncoding maps the
    cp1252 high range (Euro, em-dash, e-acute), MacRomanEncoding its own
    high range, and a /Differences array overrides codes by glyph name
    (AGL names, uniXXXX convention, single-char names)."""
    fonts = {
        "Fw": {"Subtype": "Type1", "BaseFont": "Helvetica",
               "Encoding": "WinAnsiEncoding"},
        "Fm": {"Subtype": "Type1", "BaseFont": "Times-Roman",
               "Encoding": "MacRomanEncoding"},
        "Fd": {"Subtype": "Type1", "BaseFont": "Courier",
               "Encoding": {"Type": "Encoding",
                            "BaseEncoding": "WinAnsiEncoding",
                            "Differences": [65, "eacute", "uni0142", "Z"]}},
    }
    content = (b"BT /Fw 10 Tf 72 700 Td (caf\xe9 \x80\x97) Tj "
               b"/Fm 10 Tf 72 680 Td (caf\x8e) Tj "
               b"/Fd 10 Tf 72 660 Td (ABC) Tj ET")
    (page,) = pdfimages.extract_pdf_text(_one_page(content, fonts))
    assert [w["text"] for w in page] == ["café €—", "café", "éłZ"]
    assert [w["font"] for w in page] == ["Fw", "Fm", "Fd"]


def test_pdf_text_tounicode_bfchar_and_bfrange():
    """ToUnicode CMaps win over /Encoding: bfchar entries (via the
    fixture encoder), hand-written bfrange sections in all three forms
    (incrementing hex, array destination, surrogate-pair destination)."""
    bfchar = pdfimages.encode_tounicode_cmap({0x41: "α", 0x42: "β"})
    bfrange = b"\n".join([
        b"/CIDInit /ProcSet findresource begin",
        b"begincmap",
        b"1 begincodespacerange", b"<00> <ff>", b"endcodespacerange",
        b"1 beginbfrange", b"<20> <22> <0041>", b"endbfrange",
        b"2 beginbfrange",
        b"<30> <31> [<0058> <20ac>]",
        b"<43> <43> <d834dd1e>",
        b"endbfrange",
        b"endcmap", b"end",
    ])
    fonts = {
        "F1": {"Subtype": "Type1", "BaseFont": "Helvetica",
               "ToUnicodeCMap": bfchar},
        "F2": {"Subtype": "Type1", "BaseFont": "Helvetica",
               "ToUnicodeCMap": bfrange},
    }
    content = (b"BT /F1 10 Tf 72 700 Td (ABx) Tj "
               b"/F2 10 Tf 72 680 Td (\x20\x21\x2201C) Tj ET")
    (page,) = pdfimages.extract_pdf_text(_one_page(content, fonts))
    # F1: ToUnicode covers A,B; x falls through to latin-1 identity
    assert page[0]["text"] == "αβx"
    # F2: space..quotedbl increment to ABC; 0/1 via array; C is U+1D11E
    assert page[1]["text"] == "ABC" + "X" + "€" + "\U0001d11e"


def test_pdf_text_type0_identity_h():
    """Type0 Identity-H consumes 2-byte CIDs: ToUnicode (2-byte
    codespace) decodes them; a second Type0 without ToUnicode falls
    back to CID-as-codepoint; /W + /DW drive the advance."""
    cmap = pdfimages.encode_tounicode_cmap(
        {1: "H", 2: "i", 10: "→"}, code_bytes=2
    )
    fonts = {
        "T0": {"Subtype": "Type0", "BaseFont": "T0", "Encoding": "Identity-H",
               "DescendantFonts": [
                   {"Subtype": "CIDFontType2", "BaseFont": "T0", "DW": 600,
                    "W": [1, [500, 520], 10, 12, 800]}],
               "ToUnicodeCMap": cmap},
        "T1": {"Subtype": "Type0", "BaseFont": "T1", "Encoding": "Identity-H",
               "DescendantFonts": [
                   {"Subtype": "CIDFontType2", "BaseFont": "T1"}]},
        "F1": {"Subtype": "Type1", "BaseFont": "Helvetica"},
    }
    content = (b"BT /T0 10 Tf 100 700 Td <0001000200010000000a> Tj "
               b"/F1 10 Tf (after) Tj "
               b"/T1 10 Tf 100 680 Td <00410042> Tj ET")
    (page,) = pdfimages.extract_pdf_text(_one_page(content, fonts))
    assert page[0]["text"] == "HiH�→"  # CID 0 unmapped → replacement
    # advance: 500+520+500+600(DW)+800 thousandths at size 10 = 29.2pt
    assert page[1]["text"] == "after"
    assert page[1]["x"] == pytest.approx(100 + 29.2)
    assert page[2]["text"] == "AB"  # no ToUnicode: CID as codepoint


def test_pdf_text_widths_kerning_and_spacing():
    """/Widths + /FirstChar advance the text matrix between shows; a TJ
    kern offset ≤ -180/1000 em inserts a word gap, smaller ones don't;
    Tc character spacing joins the advance."""
    fonts = {"F1": {"Subtype": "Type1", "BaseFont": "Helvetica",
                    "FirstChar": 65, "Widths": [600, 400]}}
    content = (b"BT /F1 10 Tf 100 700 Td (A) Tj (B) Tj ET "
               b"BT /F1 10 Tf 100 680 Td [(A) -250 (B)] TJ ET "
               b"BT /F1 10 Tf 100 660 Td [(A) -100 (B)] TJ ET "
               b"BT /F1 10 Tf 2 Tc 100 640 Td (A) Tj (B) Tj ET")
    (page,) = pdfimages.extract_pdf_text(_one_page(content, fonts))
    assert page[0]["text"] == "A" and page[1]["text"] == "B"
    assert page[1]["x"] == pytest.approx(106.0)  # 600/1000 * 10
    assert page[2]["text"] == "A B"   # -250 ≤ -180 → space
    assert page[3]["text"] == "AB"    # -100 > -180 → no space
    assert page[5]["x"] == pytest.approx(108.0)  # 6.0 width + 2.0 Tc


def test_pdf_text_cm_form_xobject_and_state():
    """q/cm/Q transform emitted device coordinates; Do on a Form
    XObject recurses with its /Matrix folded into the CTM and its own
    font resources; graphics+text state is restored afterwards."""
    form = {"content": b"BT /Ff 12 Tf 0 0 Td (formtext) Tj ET",
            "matrix": [1, 0, 0, 1, 200, 300],
            "fonts": {"Ff": {"Subtype": "Type1", "BaseFont": "Helvetica"}}}
    fonts = {"F1": {"Subtype": "Type1", "BaseFont": "Helvetica"}}
    content = (b"q 1 0 0 1 50 20 cm BT /F1 10 Tf 10 10 Td (in-cm) Tj ET Q "
               b"/Fx Do "
               b"BT /F1 8 Tf 5 5 Td (after) Tj ET")
    (page,) = pdfimages.extract_pdf_text(
        _one_page(content, fonts, forms={"Fx": form})
    )
    by_text = {w["text"]: w for w in page}
    assert by_text["in-cm"]["x"] == 60.0 and by_text["in-cm"]["y"] == 30.0
    assert by_text["formtext"]["x"] == 200.0 and by_text["formtext"]["y"] == 300.0
    assert by_text["formtext"]["font"] == "Ff"
    assert by_text["after"]["x"] == 5.0 and by_text["after"]["size"] == 8.0


def test_pdf_text_inline_image_skipped():
    """BI…EI inline images skip structurally — by scan when unsized,
    by /L byte length when the binary contains a decoy ' EI '."""
    fonts = {"F1": {"Subtype": "Type1", "BaseFont": "Helvetica"}}
    content = (b"BT /F1 10 Tf 72 700 Td (before) Tj ET "
               b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x00\x01\x02\x03 EI "
               b"BT /F1 10 Tf 72 680 Td (mid) Tj ET "
               b"BI /W 1 /H 1 /L 5 ID a EI  EI "
               b"BT /F1 10 Tf 72 660 Td (end) Tj ET")
    (page,) = pdfimages.extract_pdf_text(_one_page(content, fonts))
    assert [w["text"] for w in page] == ["before", "mid", "end"]


def test_pdf_page_text_assembly_and_spark_table(spark):
    """pdf_page_text clusters records into y-ordered lines with
    x-ordered words; extract_pdf_text_table carries the same per-page
    text through one mapInPandas stage (xref-stream layout included)."""
    fonts = {"F1": {"Subtype": "Type1", "BaseFont": "Helvetica"}}
    content = (b"BT /F1 10 Tf 150 700 Td (world) Tj ET "
               b"BT /F1 10 Tf 72 700.5 Td (hello) Tj ET "
               b"BT /F1 10 Tf 72 650 Td (second line) Tj ET")
    pay = pdfimages.build_text_pdf(
        [{"content": content, "fonts": fonts},
         {"content": b"BT /F1 9 Tf 36 36 Td (page2) Tj ET",
          "fonts": fonts}],
        xref_stream=True,
    )
    assert pdfimages.pdf_page_text(pay) == ["hello world\nsecond line", "page2"]
    media = spark.createDataFrame(
        [(7, bytearray(pay))], "vec_id long, media binary"
    )
    rows = {(r.page_no): r for r in
            pdfimages.extract_pdf_text_table(media).collect()}
    assert rows[0].text == "hello world\nsecond line"
    assert rows[0].n_words == 3 and rows[1].text == "page2"
    assert rows[0].vec_id == 7


def test_pdf_inline_images_bi_id_ei():
    """Inline (BI…ID…EI) images decode identically to XObjects across
    abbreviated keys/filters (§8.9.7): /L-framed Flate RGB, no-/L
    ASCIIHex (the delimiter-checked EI scan), a Form-XObject-nested
    segment reached through Do, raw samples whose bytes CONTAIN ' EI '
    (only /L framing saves those), and probe_pdf listing them without
    decoding — in both classic and xref-stream layouts."""
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(6, 9), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    spec = [[
        {"img": gray, "filter": "flate"},
        {"img": rgb, "inline": True, "filter": "flate"},
        {"img": gray, "inline": True, "filter": "ahx", "length": False},
        {"img": rgb, "inline": "form", "filter": "raw"},
    ]]
    for xref_stream in (False, True):
        pay = pdfimages.build_pdf(spec, xref_stream=xref_stream)
        got = list(pdfimages.extract_pdf_images(pay))
        assert [g[1] for g in got] == ["Im0", "~inline0", "~inline1",
                                       "~inline2"]
        assert (got[0][2] == gray).all() and (got[1][2] == rgb).all()
        assert (got[2][2] == gray).all() and (got[3][2] == rgb).all()
        meta = pdfimages.probe_pdf(pay)
        assert meta["n_images"] == 4
        by_name = {i["name"]: i for i in meta["images"]}
        assert not by_name["Im0"]["inline"]
        assert by_name["~inline1"]["inline"]
        assert by_name["~inline1"]["filters"] == ["ASCIIHexDecode"]

    tricky = np.frombuffer(
        b"xx EI x" + bytes(11), dtype=np.uint8
    ).reshape(2, 9).copy()
    pay = pdfimages.build_pdf([[{"img": tricky, "inline": True,
                                 "filter": "raw"}]])
    ((_, name, out),) = list(pdfimages.extract_pdf_images(pay))
    assert name == "~inline0" and (out == tricky).all()


def test_pdf_icc_separation_colorspaces():
    """ICCBased renders via /N (or /Alternate) — the profile only
    refines colorimetry, so pixels round-trip exactly — and a
    one-colorant Separation space renders as coverage-inverted gray
    (documented approximation: the tint transform is not evaluated)."""
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(7, 8), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    pay = pdfimages.build_pdf([[
        {"img": gray, "filter": "flate", "cs": "icc"},
        {"img": rgb, "filter": "flate", "cs": "icc"},
        {"img": gray, "filter": "flate", "cs": "sep"},
    ]])
    got = list(pdfimages.extract_pdf_images(pay))
    assert (got[0][2] == gray).all()
    assert (got[1][2] == rgb).all()
    assert (got[2][2] == 255 - gray).all()


def test_pdf_info_and_links():
    """Trailer /Info metadata (PDFDoc + UTF-16BE strings, §7.9.4 dates
    ISO-normalized with offset forms, verbatim passthrough for garbage)
    and per-page /Link-URI outlinks, in both xref layouts."""
    g = np.zeros((4, 4), dtype=np.uint8)
    info = {"Title": "Scan 0042", "Author": "A. Writer",
            "Producer": "fixture", "CreationDate": "D:20240305100000Z",
            "ModDate": "D:20240306083000+02'00'"}
    annots = [["https://ex.com/a", "https://ex.com/b"],
              ["https://ex.com/a"]]
    for xref_stream in (False, True):
        pay = pdfimages.build_pdf([[{"img": g}], []], info=info,
                                  annots=annots, xref_stream=xref_stream)
        m = pdfimages.pdf_info(pay)
        assert m["title"] == "Scan 0042" and m["n_pages"] == 2
        assert m["creation_date"] == "2024-03-05T10:00:00+00:00"
        assert m["mod_date"] == "2024-03-06T08:30:00+02:00"
        assert m["links"] == [
            {"page": 0, "uri": "https://ex.com/a"},
            {"page": 0, "uri": "https://ex.com/b"},
            {"page": 1, "uri": "https://ex.com/a"},
        ]
    t = "Café — résumé"
    b16 = (b"\xfe\xff" + t.encode("utf-16-be")).decode("latin-1")
    pay = pdfimages.build_pdf([[]], info={"Title": b16})
    assert pdfimages.pdf_info(pay)["title"] == t
    pay = pdfimages.build_pdf([[]], info={"CreationDate": "yesterday"})
    assert pdfimages.pdf_info(pay)["creation_date"] == "yesterday"
    assert pdfimages.pdf_info(pay)["links"] == []


def test_pdf_meta_table_spark(spark):
    """The Spark op: metadata columns + first-seen-deduped link_uris,
    corrupt payloads as ok=false rows, zero Exchange in the plan."""
    g = np.zeros((4, 4), dtype=np.uint8)
    pay = pdfimages.build_pdf(
        [[{"img": g}]], info={"Title": "Doc"},
        annots=[["u:1", "u:2", "u:1"]],
    )
    df = spark.createDataFrame(
        [("s3://c/a.pdf", bytearray(pay)),
         ("s3://c/bad.pdf", bytearray(b"not a pdf"))],
        "url string, payload binary",
    )
    out = pdfimages.pdf_meta_table(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["url"]: r for r in out.collect()}
    good = rows["s3://c/a.pdf"]
    assert good["ok"] and good["title"] == "Doc"
    assert list(good["link_uris"]) == ["u:1", "u:2"]
    bad = rows["s3://c/bad.pdf"]
    assert bad["ok"] is False and bad["error"]


def test_pdf_xmp_metadata_fallback():
    """Fields /Info does not supply come from the catalog's XMP
    /Metadata packet (§14.3.3 equivalences): rdf:Alt/Seq element forms
    AND the attribute form on rdf:Description; /Info wins where both
    exist; malformed XMP is ignored, never fatal."""
    pay = pdfimages.build_pdf(
        [[]], xmp={"title": "XMP Title", "author": "X. Author",
                   "creation_date": "2024-03-05T10:00:00Z"})
    m = pdfimages.pdf_info(pay)
    assert m["title"] == "XMP Title" and m["author"] == "X. Author"
    assert m["creation_date"] == "2024-03-05T10:00:00+00:00"

    pay = pdfimages.build_pdf([[]], info={"Title": "Info Title"},
                              xmp={"title": "XMP Title", "author": "X"})
    m = pdfimages.pdf_info(pay)
    assert m["title"] == "Info Title" and m["author"] == "X"

    assert pdfimages._parse_xmp(b"<not xml") == {}


def test_pdf_inline_image_crlf_after_id():
    """Writers emitting CRLF after ID (ADVICE r5): the LF half is part
    of the delimiter, not the image data — both the decoder and the
    text walker's structural skip must consume it. A lone LF (or any
    single whitespace byte) still means the data starts right after."""
    fonts = {"F1": {"Subtype": "Type1", "BaseFont": "Helvetica"}}
    content = (
        b"BT /F1 10 Tf 72 700 Td (before) Tj ET\n"
        b"BI /W 1 /H 1 /BPC 8 /CS /G /L 1 ID\r\nZ\r\nEI\n"
        b"BT /F1 10 Tf 72 680 Td (after) Tj ET"
    )
    pay = _one_page(content, fonts)
    got = list(pdfimages.extract_pdf_images(pay))
    assert len(got) == 1
    img = got[0][2]
    assert img.shape == (1, 1) and int(img[0, 0]) == ord("Z")
    # the text walker skips the same framing without desyncing
    (page,) = pdfimages.extract_pdf_text(pay)
    assert [w["text"] for w in page] == ["before", "after"]

    # single-LF delimiter: data byte follows immediately (no CR, no skip)
    content_lf = (
        b"BI /W 1 /H 1 /BPC 8 /CS /G /L 1 ID\nQ\nEI\n"
        b"BT /F1 10 Tf 72 680 Td (tail) Tj ET"
    )
    pay2 = _one_page(content_lf, fonts)
    got2 = list(pdfimages.extract_pdf_images(pay2))
    assert int(got2[0][2][0, 0]) == ord("Q")
    (page2,) = pdfimages.extract_pdf_text(pay2)
    assert [w["text"] for w in page2] == ["tail"]
