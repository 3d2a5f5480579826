"""Engine 1 — DOM walker with text-density + link-density boilerplate strip.

The primary extractor of the dual-engine pair: a streaming
``html.parser.HTMLParser`` walk that assembles block-level text with char
offsets, then keeps main-content blocks by trafilatura-style density rules.
Role-parallel to the reference's dict-mode blocks→lines→spans assembly with
its quality-gated 3-method fallback chain (policy_extract.py:330-388,
SURVEY.md §2 B3) and its table-aware second engine (mypdf2.py:173-236, B4).

Determinism rules (SURVEY.md §7 "hard parts"):
  * link-density uses integer cross-multiplication, no floats;
  * block order is document order (streaming parse), no sorts needed;
  * whitespace normalization is a single fixed rule (collapse ``\\s+`` → one
    space, strip) applied per block;
  * spans index into ``extracted_text`` so that
    ``extracted_text[start:end] == block_text`` (FIXTURES.md §5 inv. 3).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

_WS_RE = re.compile(r"\s+")

BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
        "table", "thead", "tbody", "tr", "br", "section", "article", "main",
        "header", "footer", "nav", "aside", "blockquote", "pre", "figure",
        "form", "hr", "title", "body",
    }
)
SKIP_CONTENT_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head"})
BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside"})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})
VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


class _Walker(HTMLParser):
    """Streaming DOM walk → list of (kind, text, link_chars) raw blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str, int]] = []  # (kind, norm_text, link_chars)
        self._pieces: list[tuple[str, bool]] = []     # (data, inside_link)
        self._kind = "text"
        self._skip = 0          # depth inside script/style/…
        self._boiler = 0        # depth inside nav/header/footer/aside
        self._link = 0          # depth inside <a>
        self._table = 0         # depth inside <table>
        self._cells: list[str] = []       # finished cells of current row
        self._cell: list[tuple[str, bool]] | None = None  # open cell pieces

    # -- block assembly -------------------------------------------------
    def _flush(self) -> None:
        if not self._pieces:
            return
        raw = "".join(p for p, _ in self._pieces)
        text = _norm(raw)
        link_chars = sum(len(_norm(p)) for p, in_link in self._pieces if in_link)
        self._pieces = []
        if text:
            kind = "boilerplate" if self._boiler > 0 else self._kind
            self.blocks.append((kind, text, link_chars))
        self._kind = "text"

    def _flush_row(self) -> None:
        if self._cell is not None:
            cell_text = _norm("".join(p for p, _ in self._cell))
            self._cells.append(cell_text)
            self._cell = None
        if self._cells:
            row = " | ".join(self._cells)
            self._cells = []
            if row.strip(" |"):
                kind = "boilerplate" if self._boiler > 0 else "table"
                self.blocks.append((kind, row, 0))

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_CONTENT_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            self._link += 1
            return
        if tag == "table":
            self._flush()
            self._table += 1
            return
        if self._table:
            if tag == "tr":
                self._flush_row()
            elif tag in ("td", "th"):
                if self._cell is not None:
                    self._cells.append(_norm("".join(p for p, _ in self._cell)))
                self._cell = []
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in BOILERPLATE_TAGS:
                self._boiler += 1
            if tag in HEADING_TAGS:
                self._kind = "heading"
            elif tag == "li":
                self._kind = "list"

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_CONTENT_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
            return
        if tag == "table":
            if self._table:
                self._flush_row()
                self._table -= 1
            return
        if self._table:
            if tag == "tr":
                self._flush_row()
            elif tag in ("td", "th"):
                if self._cell is not None:
                    self._cells.append(_norm("".join(p for p, _ in self._cell)))
                    self._cell = None
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in BOILERPLATE_TAGS:
                self._boiler = max(0, self._boiler - 1)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip:
            return
        if tag == "br" and not self._table:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        if self._table:
            if self._cell is not None:
                self._cell.append((data, self._link > 0))
            return
        self._pieces.append((data, self._link > 0))

    def close(self) -> None:  # final flush
        super().close()
        self._flush_row()
        self._flush()


def walk_blocks(html_str: str) -> list[tuple[str, str, int]]:
    """Parse → raw (kind, text, link_chars) blocks in document order."""
    w = _Walker()
    w.feed(html_str)
    w.close()
    return w.blocks


def keep_block(kind: str, text: str, link_chars: int, cfg: PipelineConfig) -> bool:
    """Main-content keep rule (density heuristics).

    * boilerplate-section blocks are always dropped;
    * headings/tables are kept when non-empty;
    * text/list blocks need >= min_block_chars and link density
      <= max_link_density_pct (integer cross-multiply, float-free).
    """
    if kind == "boilerplate":
        return False
    if kind in ("heading", "table"):
        return bool(text)
    n = len(text)
    if n < cfg.min_block_chars:
        return False
    return link_chars * 100 <= n * cfg.max_link_density_pct


def extract_html(html_str: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Full engine-1 extraction of one document.

    Returns ``{"extracted_text", "spans", "n_blocks"}`` where spans are
    ``(start, end, kind)`` into extracted_text, one per kept block.
    """
    blocks = walk_blocks(html_str)
    kept = [(k, t) for k, t, lc in blocks if keep_block(k, t, lc, cfg)]
    sep = cfg.block_join
    texts = [t for _, t in kept]
    extracted = sep.join(texts)
    spans = []
    pos = 0
    for (kind, text) in kept:
        spans.append({"start": pos, "end": pos + len(text), "kind": kind})
        pos += len(text) + len(sep)
    return {"extracted_text": extracted, "spans": spans, "n_blocks": len(kept)}
