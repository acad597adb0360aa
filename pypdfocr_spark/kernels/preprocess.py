"""Image preprocess kernel (T3 in SURVEY §2.3) — numpy reimplementation of
the reference's ImageMagick chain, off by default like the reference
(``--skip-preprocess`` inverted to opt-in since v0.8.x made it redundant,
ref: pypdfocr/pypdfocr.py:142-146,186-193).

Reference chain (ref: pypdfocr/pypdfocr_preprocess.py:75-89)::

    convert in.jpg -respect-parenthesis
      \\( -clone 0 -colorspace gray -negate -lat 15x15+5% -contrast-stretch 0 \\)
      -compose copy_opacity -composite -opaque none +matte -modulate 100,100
      -blur 1x1 -adaptive-sharpen 0x2
      -negate -morphology Thinning Rectangle:1x30 -negate   # erase vertical rules
      out.jpg

numpy mapping (operating on a float grayscale page array in [0, 1]):

* grayscale + negate + local adaptive threshold (15×15 mean − 5%)
  → :func:`local_adaptive_threshold`
* -blur 1x1 → 3×3 gaussian-ish box blur, :func:`blur3`
* -adaptive-sharpen 0x2 → unsharp mask, :func:`sharpen`
* morphology Thinning Rectangle:1x30 → :func:`erase_vertical_rules`
  (suppresses ≥30-px vertical runs of ink, the table-rule killer)

Graceful-skip contract preserved: any failure returns the input unchanged
(ref: pypdfocr/pypdfocr_preprocess.py:92-93 returns the input filename on
convert failure).
"""

from __future__ import annotations

import numpy as np


def local_adaptive_threshold(img: np.ndarray, window: int = 15, offset: float = 0.05) -> np.ndarray:
    """Binarize: pixel is ink if darker than the local window mean − offset
    (the ``-lat 15x15+5%`` step). Uses an integral image so it stays
    O(n) regardless of window size."""
    pad = window // 2
    padded = np.pad(img.astype(np.float64), pad, mode="edge")
    integ = np.cumsum(np.cumsum(padded, axis=0), axis=1)
    integ = np.pad(integ, ((1, 0), (1, 0)))
    h, w = img.shape
    ys, xs = np.arange(h), np.arange(w)
    y0, y1 = ys[:, None], ys[:, None] + window
    x0, x1 = xs[None, :], xs[None, :] + window
    area = window * window
    local_sum = integ[y1, x1] - integ[y0, x1] - integ[y1, x0] + integ[y0, x0]
    local_mean = local_sum / area
    return (img < local_mean - offset).astype(np.float64)


def blur3(img: np.ndarray) -> np.ndarray:
    """3×3 box blur (the ``-blur 1x1`` step)."""
    padded = np.pad(img, 1, mode="edge")
    out = np.zeros_like(img, dtype=np.float64)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out += padded[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return out / 9.0


def sharpen(img: np.ndarray, amount: float = 2.0) -> np.ndarray:
    """Unsharp mask (the ``-adaptive-sharpen 0x2`` step)."""
    return np.clip(img + amount * (img - blur3(img)), 0.0, 1.0)


def erase_vertical_rules(ink: np.ndarray, min_run: int = 30) -> np.ndarray:
    """Suppress vertical ink runs of length ≥ ``min_run`` px — the
    ``morphology Thinning Rectangle:1x30`` step that stops old Tesseract
    from dropping text next to table rules."""
    out = ink.copy()
    h, w = ink.shape
    for x in range(w):
        col = ink[:, x]
        run_start = None
        for y in range(h + 1):
            on = y < h and col[y] > 0.5
            if on and run_start is None:
                run_start = y
            elif not on and run_start is not None:
                if y - run_start >= min_run:
                    out[run_start:y, x] = 0.0
                run_start = None
    return out


def preprocess_page(img: np.ndarray) -> np.ndarray:
    """The full T3 chain over a grayscale page array in [0,1] (0 = white).
    Any failure returns the input unchanged (graceful skip)."""
    try:
        ink = local_adaptive_threshold(1.0 - img if img.mean() > 0.5 else img)
        ink = erase_vertical_rules(ink)
        soft = sharpen(blur3(ink))
        return soft
    except Exception:
        return img
