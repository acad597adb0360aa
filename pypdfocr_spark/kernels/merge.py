"""Rotation-aware page-merge math (T10 in SURVEY §2.3).

Reimplements the affine CTM the reference builds to merge a text page onto
a rotated original page: translate to origin → rotate → translate back
(ref: pypdfocr/pypdfocr_pdf.py:92-130 ``get_transform`` /
``mergeRotateAroundPointPage``; applied when the original page carries a
nonzero ``/Rotate``, ref :186-201).

The merged-PDF artifact is optional in the rebuild (the correctness
surface is text/spans, SURVEY §1.1 #6); this math is kept exact so the
artifact writer can achieve parity, and it is unit-tested against
hand-computed matrices.
"""

from __future__ import annotations

import math


def _matmul3(a, b):
    return [
        [sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def rotate_around_point_ctm(rotation_deg: float, tx: float, ty: float) -> tuple[float, float, float, float, float, float]:
    """The 6-tuple CTM ``(a, b, c, d, e, f)`` for rotating by
    ``rotation_deg`` around point ``(tx, ty)`` — identical row-vector
    convention to the reference (ref: pypdfocr/pypdfocr_pdf.py:92-109)."""
    translation = [[1, 0, 0], [0, 1, 0], [-tx, -ty, 1]]
    r = math.radians(rotation_deg)
    rotating = [[math.cos(r), math.sin(r), 0], [-math.sin(r), math.cos(r), 0], [0, 0, 1]]
    rtranslation = [[1, 0, 0], [0, 1, 0], [tx, ty, 1]]
    ctm = _matmul3(_matmul3(translation, rotating), rtranslation)
    return (ctm[0][0], ctm[0][1], ctm[1][0], ctm[1][1], ctm[2][0], ctm[2][1])


def apply_ctm(ctm: tuple[float, float, float, float, float, float], x: float, y: float) -> tuple[float, float]:
    """Apply a PDF CTM to a point (row-vector convention)."""
    a, b, c, d, e, f = ctm
    return (a * x + c * y + e, b * x + d * y + f)
