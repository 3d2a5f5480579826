"""PDF-like layout parser — char-box clustering into lines/blocks with
reading-order sort (SURVEY.md §7 M3).

Role-parallel to the reference's OCR/layout engines (Tesseract PSM-6 page
assembly, PyMuPDF dict-mode blocks→lines→spans — policy_extract.py:101-120,
330-388): instead of a PDF rasterizer, the payload is a deterministic
serialized char-box list (FIXTURES.md §3):

    {"pages": [{"chars": [{"c":"A","x":72.0,"y":700.2,"w":6.1,"h":10.0}, …]}]}

Algorithm (all coordinates are scaled to int decipoints on load, so every
comparison is integer and bit-deterministic):

  1. per page, sort chars by (-y, x, c) and greedily cluster into LINES
     (|y - line_y| <= line_tol);
  2. cluster lines into COLUMNS by x-interval overlap; columns separated by
     >= column_gap read left column first (two-column detection);
  3. within a column, consecutive lines with y-gap > block_gap start a new
     BLOCK; within a line, x-gap > space_gap inserts one space;
  4. page-number/footer strip: a short final all-digit line is dropped;
  5. pages concatenate in order; blocks join with cfg.block_join, spans are
     (start, end, 'text') into the joined text.
"""

from __future__ import annotations

import json
import re

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

_PAGE_NUM_RE = re.compile(r"^(page\s*)?-?\s*\d+\s*-?$", re.IGNORECASE)

PDF_MAGIC = b'{"pages"'


def is_pdf_payload(payload: bytes) -> bool:
    return payload.lstrip()[:8] == PDF_MAGIC


def _scale(v: float) -> int:
    """decipoint int — deterministic rounding (round-half-away handled by
    python round on .5 banker's — avoid by +0.5 floor on magnitude)."""
    return int(v * 10 + (0.5 if v >= 0 else -0.5))


def _cluster_lines(chars: list[dict], cfg: PipelineConfig) -> list[dict]:
    """chars → [{y, x0, x1, text}] lines (unordered across columns yet)."""
    tol = _scale(cfg.pdf_line_tol)
    boxes = sorted(
        (
            (-_scale(ch["y"]), _scale(ch["x"]), _scale(ch.get("w", 5.0)), str(ch["c"]))
            for ch in chars
        ),
    )
    lines: list[list[tuple[int, int, int, str]]] = []
    cur: list[tuple[int, int, int, str]] = []
    cur_y = None
    for negy, x, w, c in boxes:
        if cur_y is None or abs(negy - cur_y) <= tol:
            cur.append((negy, x, w, c))
            if cur_y is None:
                cur_y = negy
        else:
            lines.append(cur)
            cur = [(negy, x, w, c)]
            cur_y = negy
    if cur:
        lines.append(cur)

    out = []
    space_gap = _scale(cfg.pdf_space_gap)
    for ln in lines:
        ln.sort(key=lambda t: (t[1], t[0], t[3]))  # by x, then y, then char
        parts: list[str] = []
        prev_end = None
        for negy, x, w, c in ln:
            if prev_end is not None and x - prev_end > space_gap:
                parts.append(" ")
            parts.append(c)
            prev_end = x + w
        text = "".join(parts).strip()
        if not text:
            continue
        out.append(
            {
                "y": min(t[0] for t in ln),          # topmost (most-negative… negy)
                "x0": min(t[1] for t in ln),
                "x1": max(t[1] + t[2] for t in ln),
                "text": text,
            }
        )
    return out


def _cluster_columns(chars: list[dict], cfg: PipelineConfig) -> list[list[dict]]:
    """Split the page's chars into columns BEFORE line clustering — chars at
    the same y in different columns must not merge into one line.

    Column detection: merge the sorted char x-intervals; a horizontal gap
    >= column_gap between merged intervals starts a new column.  Columns are
    returned left→right.  A page with no such gap is one column.
    """
    if not chars:
        return []
    gap = _scale(cfg.pdf_column_gap)
    intervals = sorted(
        {(_scale(ch["x"]), _scale(ch["x"]) + _scale(ch.get("w", 5.0))) for ch in chars}
    )
    merged: list[list[int]] = []
    for x0, x1 in intervals:
        if merged and x0 <= merged[-1][1] + gap:
            merged[-1][1] = max(merged[-1][1], x1)
        else:
            merged.append([x0, x1])
    if len(merged) == 1:
        return [chars]
    cols: list[list[dict]] = [[] for _ in merged]
    for ch in chars:
        x = _scale(ch["x"])
        for i, (x0, x1) in enumerate(merged):
            if x0 <= x <= x1:
                cols[i].append(ch)
                break
    return [c for c in cols if c]


def _lines_to_blocks(col: list[dict], cfg: PipelineConfig) -> list[str]:
    block_gap = _scale(cfg.pdf_block_gap)
    blocks: list[list[str]] = []
    prev_y = None
    for ln in col:
        if prev_y is None or ln["y"] - prev_y > block_gap:
            blocks.append([])
        blocks[-1].append(ln["text"])
        prev_y = ln["y"]
    return [" ".join(b) for b in blocks]


def parse_pdf_payload(payload: bytes, cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Charbox payload → {"extracted_text", "spans", "n_blocks"} (same shape
    as html_extract.extract_html)."""
    doc = json.loads(payload.decode("utf-8", errors="replace"))
    all_blocks: list[str] = []
    for page in doc.get("pages", []):
        col_lines = [
            _cluster_lines(col, cfg)
            for col in _cluster_columns(page.get("chars", []), cfg)
        ]
        # footer strip: drop the page-bottom line when it is a bare page number
        flat = [ln for col in col_lines for ln in col]
        if flat:
            bottom = max(flat, key=lambda ln: ln["y"])
            if len(bottom["text"]) <= 12 and _PAGE_NUM_RE.match(bottom["text"]):
                col_lines = [[ln for ln in col if ln is not bottom] for col in col_lines]
        for col in col_lines:
            all_blocks.extend(_lines_to_blocks(col, cfg))
    sep = cfg.block_join
    extracted = sep.join(all_blocks)
    spans = []
    pos = 0
    for b in all_blocks:
        spans.append({"start": pos, "end": pos + len(b), "kind": "text"})
        pos += len(b) + len(sep)
    return {"extracted_text": extracted, "spans": spans, "n_blocks": len(all_blocks)}
