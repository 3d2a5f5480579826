"""PDF-like layout parser — char-box clustering into lines/blocks with
reading-order sort (SURVEY.md §7 M3).

Role-parallel to the reference's OCR/layout engines (Tesseract PSM-6 page
assembly, PyMuPDF dict-mode blocks→lines→spans — policy_extract.py:101-120,
330-388): instead of a PDF rasterizer, the payload is a deterministic
serialized char-box list (FIXTURES.md §3):

    {"pages": [{"chars": [{"c":"A","x":72.0,"y":700.2,"w":6.1,"h":10.0}, …]}]}

Algorithm (coordinates scaled to int decipoints on load; clustering is
numpy over the whole page, one python unpack pass per char):

  1. COLUMNS: chars sorted by x0; a horizontal gap >= column_gap between
     the running max x1 and the next x0 starts a new column (two-column
     detection).  Columns read left → right.
  2. LINES within a column: chars sorted by descending y; a vertical gap
     > line_tol between consecutive distinct y levels starts a new line
     (gap rule — equivalent to greedy base clustering whenever lines are
     separated by more than the tolerance, which any real layout is).
     Within a line chars sort by (x, -y, char).
  3. BLOCKS: consecutive lines with y-gap > block_gap split; within a line
     an x-gap > space_gap inserts one space.
  4. footer strip: a short bottom line that is a bare page number drops;
  5. pages concatenate; blocks join with cfg.block_join, spans are
     (start, end, 'text') into the joined text.
"""

from __future__ import annotations

import json
import re

import numpy as np

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

_PAGE_NUM_RE = re.compile(r"^(page\s*)?-?\s*\d+\s*-?$", re.IGNORECASE)

PDF_MAGIC = b'{"pages"'


def is_pdf_payload(payload: bytes) -> bool:
    """Strict magic-prefix sniff — MUST match the vectorized sniff in
    gates.pre_classify (binary_slice(0,8)); a payload with leading
    whitespace is by spec not a char-box payload."""
    return payload[:8] == PDF_MAGIC


def _scale_arr(v: np.ndarray) -> np.ndarray:
    """decipoint ints, round-half-away-from-zero (deterministic)."""
    return np.where(v >= 0, v * 10 + 0.5, v * 10 - 0.5).astype(np.int64)


def _page_lines(chars: list[dict], cfg: PipelineConfig) -> list[dict]:
    """chars → line dicts {y, x0, text} in reading order (cols l→r)."""
    n = len(chars)
    if n == 0:
        return []
    xs = np.empty(n)
    ys = np.empty(n)
    ws = np.empty(n)
    txt: list[str] = [""] * n
    for i, ch in enumerate(chars):  # the one per-char python pass
        xs[i] = ch["x"]
        ys[i] = ch["y"]
        ws[i] = ch.get("w", 5.0)
        txt[i] = str(ch["c"])
    xi = _scale_arr(xs)
    yi = _scale_arr(ys)
    wi = _scale_arr(ws)
    x1 = xi + wi

    # --- columns: gap rule over x intervals ---
    col_gap = round(cfg.pdf_column_gap * 10)
    order = np.argsort(xi, kind="stable")
    runmax = np.maximum.accumulate(x1[order])
    brk = np.empty(n, dtype=bool)
    brk[0] = True
    brk[1:] = xi[order][1:] > runmax[:-1] + col_gap
    col_sorted = np.cumsum(brk) - 1
    col_id = np.empty(n, dtype=np.int64)
    col_id[order] = col_sorted
    n_cols = int(col_sorted[-1]) + 1

    tol = round(cfg.pdf_line_tol * 10)
    space_gap = round(cfg.pdf_space_gap * 10)
    out: list[dict] = []
    for c in range(n_cols):
        idx = np.nonzero(col_id == c)[0]
        # line ids by descending y (gap rule)
        by_y = idx[np.argsort(-yi[idx], kind="stable")]
        yy = yi[by_y]
        lb = np.empty(len(by_y), dtype=bool)
        lb[0] = True
        lb[1:] = (yy[:-1] - yy[1:]) > tol
        line_of = np.cumsum(lb) - 1
        # one sort for the whole column: (line, x, -y); equal positions keep
        # the stable y-order (input order within exact ties)
        ord2 = np.lexsort((-yy, xi[by_y], line_of))
        g_idx = by_y[ord2]
        g_line = line_of[ord2]
        g_x = xi[g_idx]
        g_x1 = x1[g_idx]
        starts = np.nonzero(
            np.concatenate(([True], g_line[1:] != g_line[:-1]))
        )[0]
        bounds = np.append(starts, len(g_idx))
        # one space-gap vector for the column
        gap_after_prev = np.empty(len(g_idx), dtype=bool)
        gap_after_prev[0] = False
        gap_after_prev[1:] = (g_x[1:] - g_x1[:-1]) > space_gap
        gap_after_prev[starts] = False
        for s, e in zip(bounds[:-1], bounds[1:]):
            parts: list[str] = []
            for m in range(s, e):
                if gap_after_prev[m]:
                    parts.append(" ")
                parts.append(txt[g_idx[m]])
            text = "".join(parts).strip()
            if not text:
                continue
            out.append(
                {
                    "y": -int(yi[g_idx[s:e]].max()),
                    "x0": int(g_x[s:e].min()),
                    "text": text,
                }
            )
    return out


def _lines_to_blocks(lines: list[dict], cfg: PipelineConfig) -> list[str]:
    block_gap = round(cfg.pdf_block_gap * 10)
    blocks: list[list[str]] = []
    prev_y = None
    for ln in lines:
        if prev_y is None or ln["y"] - prev_y > block_gap or ln["y"] < prev_y:
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
        lines = _page_lines(page.get("chars", []), cfg)
        # footer strip: drop the page-bottom line when it is a bare number
        if lines:
            bottom = max(lines, key=lambda ln: ln["y"])
            if len(bottom["text"]) <= 12 and _PAGE_NUM_RE.match(bottom["text"]):
                lines = [ln for ln in lines if ln is not bottom]
        all_blocks.extend(_lines_to_blocks(lines, cfg))
    sep = cfg.block_join
    extracted = sep.join(all_blocks)
    spans = []
    pos = 0
    for b in all_blocks:
        spans.append({"start": pos, "end": pos + len(b), "kind": "text",
                      "raw_start": -1, "raw_end": -1})
        pos += len(b) + len(sep)
    return {"extracted_text": extracted, "spans": spans, "n_blocks": len(all_blocks)}
