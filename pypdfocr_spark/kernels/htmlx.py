"""HTML boilerplate stripping (north-rule: "HTML boilerplate strip, DOM
heuristics" for Common-Crawl-style pages).

The reference operates on PDFs only; the rebuilt engine's input table
carries HTML payloads too (BASELINE.json input_hint), so this kernel adds
the main-content extraction path for them: drop non-content subtrees
(script/style/head/nav/header/footer/aside/form/iframe/noscript/svg),
keep block-level text, collapse whitespace.

stdlib-only (html.parser) — no lxml in this sandbox; on a real cluster an
lxml-backed kernel drops in behind the same signature.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_SUBTREE = frozenset(
    "script style head nav header footer aside form iframe noscript svg template button".split()
)
_BLOCK = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table article section blockquote pre td th".split()
)
_WS = re.compile(r"\s+")


class _MainContent(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.chunks: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self.chunks.append("\x00")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE and self._skip_depth:
            self._skip_depth -= 1
        elif tag in _BLOCK:
            self.chunks.append("\x00")

    def handle_data(self, data):
        if not self._skip_depth and data:
            self.chunks.append(data)


def strip_boilerplate(html: str) -> str:
    """Main-content text of an HTML page: boilerplate subtrees removed,
    block boundaries → newlines, runs of whitespace collapsed, lines
    stripped; empty lines dropped."""
    parser = _MainContent()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    text = "".join(parser.chunks)
    # block boundaries (sentinel) become line breaks; any literal
    # whitespace runs inside a block — including raw newlines in the
    # source markup — collapse to single spaces
    lines = [_WS.sub(" ", ln).strip() for ln in text.split("\x00")]
    return "\n".join(ln for ln in lines if ln)


class _LinkDensity(HTMLParser):
    """Per-block (anchor_chars, total_chars) accounting for the
    link-density heuristic. Blocks are the same _BLOCK boundaries the
    main extractor uses; text inside _SKIP_SUBTREE never counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._anchor_depth = 0
        self.blocks: list[tuple[str, int, int]] = []  # (text, anchor, total)
        self._chunks: list[str] = []
        self._anchor = 0
        self._total = 0

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._chunks)).strip()
        if self._total:
            self.blocks.append((text, self._anchor, self._total))
        self._chunks, self._anchor, self._total = [], 0, 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag == "a":
            self._anchor_depth += 1
        elif tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._chunks.append(data)
        n = len(data.strip())
        self._total += n
        if self._anchor_depth:
            self._anchor += n

    def close(self):
        super().close()
        self._flush()


def strip_boilerplate_dom(html: str, max_link_density: float = 0.5) -> str:
    """Main-content extraction with the classic link-density DOM heuristic
    on top of the tag filter (north-rule: "DOM heuristics"; the
    boilerpipe/Readability family's core signal): a text block whose
    characters are mostly anchor text is navigation/related-links chrome,
    not content — drop blocks with anchor_chars/total_chars >
    ``max_link_density``. Tag-level filtering alone misses link farms
    living in plain ``<div>``s; this catches them without a class/id
    blocklist. Opt-in: :func:`strip_boilerplate` stays the pipeline
    default (its byte-level contract is oracle-pinned)."""
    parser = _LinkDensity()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    kept = [
        text
        for text, anchor, total in parser.blocks
        if text and (anchor / total) <= max_link_density
    ]
    return "\n".join(kept)
