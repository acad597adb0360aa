"""Searchable-document artifact rendering (T9/T10/K1 in SURVEY §2) —
optional, off the correctness path (the byte-identity surface is
text/spans, SURVEY §1.1 #5/#6), kept exact so artifact parity is
achievable on a real deployment.

The reference renders each page's invisible text layer onto a
reportlab canvas (render mode 3, Helvetica at the hOCR-reported size,
ref: pypdfocr/pypdfocr_pdf.py:58-78,216-250), concatenates the text pages,
and merges page k of the original with page k of the text layer —
applying a rotate-around-page-center CTM when the original page carries a
nonzero ``/Rotate`` (ref: pypdfocr/pypdfocr_pdf.py:165-201,92-130).

Without a PDF library in this sandbox, the artifact is a deterministic
JSON "searchable document": per page, the final device-space placement of
every invisible word after the rotation merge. The placement math is the
reference's, via kernels.merge.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .kernels import merge


def render_text_page(lines: list[dict], width_pt: float, height_pt: float, rotate: int = 0) -> dict:
    """One page's text layer: every word with its final (merged) position.

    * base placement comes from the span fields (``x_pt``/``y_pt`` — the
      ``(x*72/dpi, height − y*72/dpi)`` transform already applied at parse
      time, ref: pypdfocr/pypdfocr_pdf.py:349);
    * render mode 3 = invisible (ref :76);
    * nonzero page rotation applies the rotate-around-point CTM the
      reference uses at merge time with tx = ty = width/2
      (ref: pypdfocr/pypdfocr_pdf.py:194 — note the reference passes the
      media box *width* for both tx and ty).
    """
    ctm = merge.rotate_around_point_ctm(rotate, width_pt / 2, width_pt / 2) if rotate else None
    words = []
    for line in lines:
        for w in line["words"]:
            x, y = w["x_pt"], w["y_pt"]
            if ctm is not None:
                x, y = merge.apply_ctm(ctm, x, y)
            words.append(
                {
                    "t": w["text"],
                    "x": round(x, 4),
                    "y": round(y, 4),
                    "size": w["font_size"],
                    "angle": w["angle"],
                    "mode": 3,          # invisible text (ref :76)
                    "font": "Helvetica",  # ref :344
                }
            )
    return {"w": round(width_pt, 4), "h": round(height_pt, 4), "rotate": rotate, "words": words}


def render_searchable_doc(
    spans_pages: list[list[dict]],
    width_pt: float,
    height_pt: float,
    rotations: list[int] | None = None,
) -> bytes:
    """K1: the merged searchable-document artifact (magic + JSON pages),
    page-wise zip of original rotation with its text layer
    (ref: pypdfocr/pypdfocr_pdf.py:165-171)."""
    rotations = rotations or [0] * len(spans_pages)
    pages = [
        render_text_page(lines, width_pt, height_pt, rot)
        for lines, rot in zip(spans_pages, rotations)
    ]
    return b"%SYNOCR1%" + json.dumps({"pages": pages}, separators=(",", ":")).encode()


def with_artifacts(spans_df: DataFrame) -> DataFrame:
    """Append an ``artifact`` binary column to span-level extraction
    output (spans.extract_spans) via an Arrow-batched stage."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(spans_df.schema.fields) + [StructField("artifact", BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            artifacts = []
            for span_pages in pdf["spans"]:
                pages = [
                    [ln if isinstance(ln, dict) else ln for ln in p["lines"]]
                    for p in span_pages
                ]
                artifacts.append(render_searchable_doc(pages, 612.0, 792.0))
            out = pdf.copy()
            out["artifact"] = artifacts
            yield out

    return spans_df.mapInPandas(gen, schema)
