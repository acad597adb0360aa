"""Keyword routing kernel (P1–P4 in SURVEY §2.4).

Reimplements the ordered first-match-wins folder routing of the reference:

* ``_get_matching_folder`` — lowercase the page text; scan ``(folder,
  keywords)`` pairs in config insertion order; the first keyword that is a
  substring of the text wins and returns its folder; no match → ``None``
  (ref: pypdfocr/pypdfocr_pdffiler.py:51-60).
* page early-exit — iterate pages in order, stop at the first page with a
  match (ref: pypdfocr/pypdfocr_pdffiler.py:66-68).
* filename fallback — if no content match and the ``-n`` flag is set, match
  against the filename (ref: pypdfocr/pypdfocr_pdffiler.py:70-71,
  pypdfocr/pypdfocr.py:169-170).
* default route — unmatched documents go to the default folder
  (ref: pypdfocr/pypdfocr_filer_dirs.py:54-56).

Order-sensitivity means this is NOT expressible as an unordered keyword
join; it IS expressible as an ordered CASE/WHEN chain (used by the SQL
oracle) and as this loop (used inside vectorized UDFs — the loop is over
the small config, the batch dimension stays vectorized at the caller).

Keywords are normalized with ``str(k).lower()`` like the reference config
loader (ref: pypdfocr/pypdfocr.py:306 — handles integer keywords).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

FolderTargets = Sequence[tuple[str, Sequence[str]]]


def normalize_targets(targets: Iterable[tuple[str, Iterable[object]]]) -> list[tuple[str, list[str]]]:
    """Lowercase/str-coerce keywords, preserving folder + keyword order
    (ref: pypdfocr/pypdfocr.py:301-307)."""
    return [(folder, [str(k).lower() for k in kws]) for folder, kws in targets]


def first_matching_folder(text: str, targets: FolderTargets) -> str | None:
    """Ordered first-substring-match over lowercased text
    (ref: pypdfocr/pypdfocr_pdffiler.py:51-60)."""
    search = text.lower()
    for folder, keywords in targets:
        for kw in keywords:
            if kw in search:
                return folder
    return None


def route_document(
    page_texts: Sequence[str],
    filename: str,
    targets: FolderTargets,
    *,
    use_filename: bool = False,
    default: str | None = None,
) -> str | None:
    """Full document routing: per-page early exit, filename fallback,
    default (ref: pypdfocr/pypdfocr_pdffiler.py:65-74 +
    pypdfocr/pypdfocr_filer_dirs.py:54-56)."""
    folder = None
    for page_text in page_texts:
        folder = first_matching_folder(page_text, targets)
        if folder:
            break
    if not folder and use_filename:
        folder = first_matching_folder(filename, targets)
    return folder if folder else default
