"""Synthetic multi-page document codec + geometry detection (T1/T2 stand-ins).

This sandbox has no ghostscript/pdfimages/identify binaries (SURVEY §7), so
"PDF" payloads in the synthetic corpus are a deterministic page-list
encoding (FIXTURES.md F2) that the kernels can rasterize and OCR
losslessly. On a real cluster the subprocess-backed kernels drop in behind
the same two functions (mirroring the reference's ``binary:`` override
design, ref: pypdfocr/pypdfocr.py:314-324).

Payload format (header = the ``MAGIC`` constant below)::

    MAGIC + json({"pages": [
        {"dpi": int, "rotate": 0|90|180|270, "greyscale": bool,
         "w_px": int, "h_px": int,
         "words": [{"t": str, "b": [x0,y0,x1,y1], "l": line_no}, ...]},
        ...]})

Geometry detection reimplements the arithmetic of the reference's
``_get_dpi`` (ref: pypdfocr/pypdfocr_gs.py:117-166):

* ``xdpi = round(x_px / width_in * density)``; likewise ``ydpi``;
* ``output_dpi = max(xdpi, ydpi)`` then clamped to ≥ 300
  (ref: pypdfocr/pypdfocr_gs.py:150-156);
* greyscale flag selects the cheaper grey device
  (ref: pypdfocr/pypdfocr_gs.py:196-203) — carried as metadata here.

Python-3 delta note: the reference runs Python-2 ``round`` (half away from
zero); Python 3 rounds half to even. The synthetic corpus only produces
integral dpi ratios so the behaviors coincide; a real-cluster kernel must
pin half-away-from-zero explicitly (SURVEY §7 "what's hard" (a)).
"""

from __future__ import annotations

import json
import math

try:  # r6: orjson (public, C-accelerated) when present — strictly a
    # fast path: it is stricter than stdlib json (rejects NaN/Infinity,
    # >64-bit ints), so any orjson failure falls back to json.loads and
    # the accepted-input set / parsed values are exactly stdlib's
    import orjson as _fastjson
except Exception:  # pragma: no cover - orjson absent
    _fastjson = None


def loads_json(data):
    """``json.loads`` with an orjson fast path (bytes or str input).
    Raises exactly when stdlib ``json.loads`` would."""
    if _fastjson is not None:
        try:
            return _fastjson.loads(data)
        except Exception:
            pass
    if isinstance(data, (bytes, bytearray)):
        data = data.decode("utf-8")
    return json.loads(data)


MAGIC = b"%SYNPDF2%"
MIN_DPI = 300  # rasterization floor (ref: pypdfocr/pypdfocr_gs.py:60,156)


def round_half_away(x: float) -> int:
    """Python-2 ``round`` semantics: half away from zero."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def encode_doc(pages: list[dict]) -> bytes:
    """Encode a page list as a synthetic 'PDF' payload: magic header +
    one JSON line per page. The line-delimited layout makes the
    page-explode stage a byte split with NO parse — splitting a
    multi-hundred-page document costs O(bytes), and each page is decoded
    exactly once, on the task that OCRs it."""
    if not pages:
        return MAGIC
    return MAGIC + b"\n".join(
        json.dumps(p, separators=(",", ":")).encode("utf-8") for p in pages
    )


def is_syn_pdf(payload: bytes) -> bool:
    return payload[: len(MAGIC)] == MAGIC


def split_pages(payload: bytes) -> list[bytes] | None:
    """Zero-parse page split: payload → per-page JSON byte strings;
    garbage → ``None``; valid empty doc → ``[]``."""
    if not is_syn_pdf(payload):
        return None
    body = payload[len(MAGIC):]
    if not body:
        return []
    return body.split(b"\n")


def decode_doc(payload: bytes) -> list[dict] | None:
    """Decode payload → page list; garbage → ``None`` (graceful
    degradation, matching the reference's never-die-mid-corpus behavior,
    ref: pypdfocr/pypdfocr_pdf.py:276-281). A valid empty document
    decodes to ``[]`` — distinct from garbage."""
    lines = split_pages(payload)
    if lines is None:
        return None
    try:
        pages = [loads_json(ln) for ln in lines]
        return pages if all(isinstance(p, dict) for p in pages) else None
    except Exception:
        return None


def detect_geometry(pages: list[dict]) -> dict:
    """Document-level geometry, reproducing ``_get_dpi``'s math
    (ref: pypdfocr/pypdfocr_gs.py:142-156).

    The first raster image's px dims and the page's physical size drive
    the dpi estimate; max(x,y), clamp ≥300.
    """
    if not pages:
        return {"output_dpi": MIN_DPI, "greyscale": False, "width_pt": 612.0, "height_pt": 792.0}
    p0 = pages[0]
    dpi_native = int(p0.get("dpi", MIN_DPI))
    w_px = int(p0.get("w_px", 2550))
    h_px = int(p0.get("h_px", 3300))
    # physical size in inches implied by the native dpi
    width_in = w_px / dpi_native
    height_in = h_px / dpi_native
    xdpi = round_half_away(w_px / width_in)  # == dpi_native, via the ref formula
    ydpi = round_half_away(h_px / height_in)
    output_dpi = xdpi
    if ydpi > xdpi:
        output_dpi = ydpi
    if output_dpi < MIN_DPI:
        output_dpi = MIN_DPI
    return {
        "output_dpi": int(output_dpi),
        "greyscale": bool(p0.get("greyscale", False)),
        "width_pt": w_px * 72.0 / dpi_native,
        "height_pt": h_px * 72.0 / dpi_native,
    }


def rasterize(pages: list[dict], output_dpi: int) -> list[dict]:
    """T2 stand-in: 'render' each page at output_dpi by scaling word boxes
    from the native grid — the deterministic inverse of what gs+tesseract
    would produce (ref cmd: pypdfocr/pypdfocr_gs.py:170-181,213-214).

    Box scaling uses exact rational scaling on ints so that a 300→300
    round-trip is the identity.
    """
    out = []
    for p in pages:
        native = int(p.get("dpi", MIN_DPI))
        if native == output_dpi:
            out.append(p)
            continue
        scale = output_dpi / native
        words = [
            {
                "t": w["t"],
                "b": [round_half_away(c * scale) for c in w["b"]],
                "l": w["l"],
                "fs": w.get("fs", 10),
            }
            for w in p["words"]
        ]
        out.append(
            {
                **{k: v for k, v in p.items() if k != "words"},
                "dpi": output_dpi,
                "w_px": round_half_away(int(p.get("w_px", 2550)) * scale),
                "h_px": round_half_away(int(p.get("h_px", 3300)) * scale),
                "words": words,
            }
        )
    return out
