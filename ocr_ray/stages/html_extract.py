"""Engine 1 — DOM walker with text-density + link-density boilerplate strip.

The primary extractor of the dual-engine pair: a single-pass regex token
stream (tag names + data only — attributes are never needed, which makes
this ~5x faster than html.parser) drives a block state machine that
assembles block-level text, then keeps main-content blocks by
trafilatura-style density rules.  script/style contents are skipped by
direct fast-forward to the closing tag (the same CDATA semantics
html.parser applies to those two tags).
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
from html import unescape

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
    # collapse whitespace runs + strip; str.split() is 3-6x faster than a
    # regex sub and defines the whitespace set (python str whitespace)
    return " ".join(s.split())


_TOKEN_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[!?][^>]*>|<(/?)([a-zA-Z][a-zA-Z0-9:-]*)[^>]*?>",
    re.DOTALL,
)
_SKIP_CLOSE = {
    t: re.compile(r"</%s\s*>" % t, re.IGNORECASE | re.DOTALL)
    for t in ("script", "style")
}


class _Walker:
    """Block state machine fed by the token stream →
    (kind, text, link_chars, raw_start, raw_end) blocks; raw offsets index
    the canonical decoded html (SURVEY.md §7 hard part 2) and cover the
    block's first..last non-whitespace data segment."""

    def __init__(self) -> None:
        self.blocks: list[tuple[str, str, int, int, int]] = []
        self._pieces: list[tuple[str, bool]] = []     # (data, inside_link)
        self._kind = "text"
        self._skip = 0          # depth inside script/style/…
        self._boiler = 0        # depth inside nav/header/footer/aside
        self._link = 0          # depth inside <a>
        self._table = 0         # depth inside <table>
        self._cells: list[str] = []       # finished cells of current row
        self._cell: list[tuple[str, bool]] | None = None  # open cell pieces
        self._raw_lo: int | None = None   # raw bounds of the open block
        self._raw_hi: int | None = None
        self._row_lo: int | None = None   # raw bounds of the open table row
        self._row_hi: int | None = None

    # -- block assembly -------------------------------------------------
    def _flush(self) -> None:
        if not self._pieces:
            return
        raw = "".join(p for p, _ in self._pieces)
        text = _norm(raw)
        link_chars = sum(len(_norm(p)) for p, in_link in self._pieces if in_link)
        self._pieces = []
        lo = -1 if self._raw_lo is None else self._raw_lo
        hi = -1 if self._raw_hi is None else self._raw_hi
        self._raw_lo = self._raw_hi = None
        if text:
            kind = "boilerplate" if self._boiler > 0 else self._kind
            self.blocks.append((kind, text, link_chars, lo, hi))
        self._kind = "text"

    def _flush_row(self) -> None:
        if self._cell is not None:
            cell_text = _norm("".join(p for p, _ in self._cell))
            self._cells.append(cell_text)
            self._cell = None
        if self._cells:
            row = " | ".join(self._cells)
            self._cells = []
            lo = -1 if self._row_lo is None else self._row_lo
            hi = -1 if self._row_hi is None else self._row_hi
            self._row_lo = self._row_hi = None
            if row.strip(" |"):
                kind = "boilerplate" if self._boiler > 0 else "table"
                self.blocks.append((kind, row, 0, lo, hi))

    # -- token callbacks -------------------------------------------------
    def handle_starttag(self, tag: str) -> None:
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

    def handle_data(self, data: str, raw_start: int = -1, raw_end: int = -1) -> None:
        if self._skip:
            return
        has_content = raw_start >= 0 and not data.isspace() and data
        if self._table:
            if self._cell is not None:
                self._cell.append((data, self._link > 0))
                if has_content:
                    if self._row_lo is None:
                        self._row_lo = raw_start
                    self._row_hi = raw_end
            return
        self._pieces.append((data, self._link > 0))
        if has_content:
            if self._raw_lo is None:
                self._raw_lo = raw_start
            self._raw_hi = raw_end

    def finish(self) -> None:  # final flush
        self._flush_row()
        self._flush()


def walk_blocks(html_str: str) -> list[tuple[str, str, int]]:
    """Tokenize + walk → raw (kind, text, link_chars) blocks in doc order."""
    w = _Walker()
    pos = 0
    n = len(html_str)
    search = _TOKEN_RE.search
    while pos < n:
        m = search(html_str, pos)
        if not m:
            data = html_str[pos:]
            w.handle_data(unescape(data) if "&" in data else data, pos, n)
            break
        if m.start() > pos:
            data = html_str[pos:m.start()]
            w.handle_data(unescape(data) if "&" in data else data, pos, m.start())
        closing, name = m.group(1, 2)
        if name:
            tag = name.lower()
            self_closed = m.group(0).endswith("/>")
            if closing:  # closing tag
                w.handle_endtag(tag)
            elif self_closed:
                # '<svg/>' / '<script src=x/>' have NO content: a bare
                # starttag would leave skip/boiler/link depths unbalanced
                # and silently drop the rest of the document
                w.handle_starttag(tag)
                w.handle_endtag(tag)
            elif tag in _SKIP_CLOSE:
                # CDATA fast-forward past the element content + closing tag
                close = _SKIP_CLOSE[tag].search(html_str, m.end())
                pos = close.end() if close else n
                continue
            else:
                w.handle_starttag(tag)
        pos = m.end()
    w.finish()
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
    kept = [(k, t, lo, hi) for k, t, lc, lo, hi in blocks if keep_block(k, t, lc, cfg)]
    sep = cfg.block_join
    extracted = sep.join(t for _, t, _, _ in kept)
    spans = []
    pos = 0
    for (kind, text, lo, hi) in kept:
        spans.append({"start": pos, "end": pos + len(text), "kind": kind,
                      "raw_start": lo, "raw_end": hi})
        pos += len(text) + len(sep)
    return {"extracted_text": extracted, "spans": spans, "n_blocks": len(kept)}
