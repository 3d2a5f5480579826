"""The heavy extraction stage — a stateful actor for ``map_batches``.

Dual-engine extraction with a deterministic per-row engine vote, the
Ray-Data restatement of the reference's engine-fallback control flow
(policy_extract.py:384-443 corruption vote; mypdf2.py:618-633 fallback
chain PyMuPDF→pdfplumber→PyPDF2 — SURVEY.md §2 B3-B6, E3):

  engine 1   DOM walker w/ density heuristics (stages.html_extract), or the
             char-box layout clusterer for PDF-like payloads
             (stages.pdf_layout) — dispatched per row by payload sniff
             (the form-type dispatch analogue, llm_gla.py:67-596 / C3);
  engine 2   vectorized regex tag-strip (stages.tagstrip);
  engine 3   the input's raw ``text`` column (last resort).

Vote: engine1 wins unless its output is empty or fails the gibberish gate
(same vectorized gate as pre-classify), then engine2 under the same test,
then the text column; all failing ⇒ empty output with parse_status='error'
(record-level error channel — failures are rows, never exceptions).

Usage::

    ds.map_batches(Extractor, batch_format="pyarrow",
                   batch_size=cfg.batch_size_extract,
                   concurrency=cfg.extract_concurrency)

Stateful setup (config, compiled parser machinery) happens once per actor
in ``__init__`` (SURVEY.md §2 K); ``__call__`` does per-batch work only.
The per-row DOM/layout parse is inherently per-document (like batched model
inference) — everything around it (decode, tag-strip, gibberish vote,
output assembly) is vectorized Arrow.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions import gates
from ocr_ray.schema import SPAN_TYPE
from ocr_ray.stages.html_extract import extract_html
from ocr_ray.stages.pdf_layout import is_pdf_payload, parse_pdf_payload
from ocr_ray.stages.tagstrip import tagstrip_array

_EMPTY = {"extracted_text": "", "spans": [], "n_blocks": 0}


def decode_html(html_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonical decode of the binary payload: UTF-8 with U+FFFD replacement.

    Vectorized cast when the whole column is valid UTF-8 (the common case,
    zero-copy); per-row ``bytes.decode(errors='replace')`` otherwise.  Spans
    always index into this one canonical decoding (SURVEY.md §7 hard part 2).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    try:
        return html_col.cast(pa.string())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array(
            [(b.decode("utf-8", "replace") if b is not None else "") for b in html_col.to_pylist()],
            pa.string(),
        )


class Extractor:
    """Callable-class stage: construct once per actor, call per Arrow batch."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG) -> None:
        self.cfg = cfg
        # once-per-actor: pyarrow's internal pools default to the MACHINE's
        # core count inside every Ray worker — a 1-CPU actor must use 1 CPU
        # (same cap as _ShardProcessor; CLAUDE.md sharp edge)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)

    def _engine1(self, html_str: str, payload: bytes) -> tuple[dict, str, bool]:
        """→ (result, engine_name, ok).  A failed PDF parse keeps the 'pdf'
        tag so the vote falls back to the text column, never to a tag-strip
        of the JSON payload."""
        is_pdf = payload is not None and is_pdf_payload(payload)
        try:
            if is_pdf:
                return parse_pdf_payload(payload, self.cfg), "pdf", True
            return extract_html(html_str, self.cfg), "dom", True
        except Exception:
            return _EMPTY, ("pdf" if is_pdf else "dom"), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        """If the batch carries gate columns (is_candidate / reject_reason),
        rejected rows bypass the engines entirely and pass through as
        parse_status='rejected' rows — the record-level channel that keeps
        output ∪ rejects partition-complete for resume (FIXTURES.md §5
        invariant 2) while preserving filter-then-extract economics."""
        if "is_candidate" in batch.column_names:
            mask = pc.coalesce(batch["is_candidate"], pa.scalar(False))
            cand = batch.filter(mask).drop_columns(["is_candidate", "reject_reason"])
            rej = batch.filter(pc.invert(mask))
            parts = []
            if len(cand):
                parts.append(self._process(cand))
            if len(rej):
                parts.append(self._reject_rows(rej))
            if not parts:
                return self._process(cand)  # empty table, correct schema
            return pa.concat_tables(parts)
        return self._process(batch)

    def _reject_rows(self, rej: pa.Table) -> pa.Table:
        n = len(rej)
        empty_str = pa.array([""] * n, pa.string())
        return pa.table(
            {
                "url": rej["url"],
                "warc_ts": rej["warc_ts"],
                "lang": rej["lang"],
                "part_id": rej["part_id"] if "part_id" in rej.column_names
                else pa.array([0] * n, pa.int32()),
                "extracted_text": empty_str,
                "spans": pa.array([[] for _ in range(n)], pa.list_(SPAN_TYPE)),
                "n_blocks": pa.array([0] * n, pa.int32()),
                "engine": pa.array(["none"] * n, pa.string()),
                "parse_status": pa.array(["rejected"] * n, pa.string()),
                "reject_reason": pc.cast(rej["reject_reason"], pa.string()),
                "bytes_in": pc.cast(pc.binary_length(rej["html"]), pa.int64()),
                "bytes_out": pa.array([0] * n, pa.int64()),
            }
        )

    def _process(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = len(batch)
        html_bin = batch["html"].combine_chunks() if isinstance(batch["html"], pa.ChunkedArray) else batch["html"]
        html_str = decode_html(html_bin)

        # engine 1 per row (per-document parse)
        payloads = html_bin.to_pylist()
        strs = html_str.to_pylist()
        e1_results: list[dict] = []
        e1_engine: list[str] = []
        e1_ok: list[bool] = []
        for i in range(n):
            res, eng, ok = self._engine1(strs[i] or "", payloads[i])
            e1_results.append(res)
            e1_engine.append(eng)
            e1_ok.append(ok)

        # vectorized gibberish verdict on engine-1 output (the vote)
        e1_text = pa.array([r["extracted_text"] for r in e1_results], pa.string())
        e1_bad = self._bad_mask(e1_text, pa.array(e1_ok, pa.bool_()))
        e1_bad_l = e1_bad.to_pylist()

        # engine 2 LAZILY: tag-strip only the rows engine 1 lost (usually a
        # tiny fraction — the whole-column strip would dominate the stage)
        fb_idx = [i for i in range(n)
                  if e1_bad_l[i] and e1_engine[i] != "pdf"]
        e2_l: dict[int, str] = {}
        e2_bad_l: dict[int, bool] = {}
        if fb_idx:
            sub = tagstrip_array(pa.array([strs[i] or "" for i in fb_idx], pa.string()))
            sub_bad = self._bad_mask(sub, None).to_pylist()
            for j, i in enumerate(fb_idx):
                e2_l[i] = sub[j].as_py()
                e2_bad_l[i] = sub_bad[j]

        raw_text = batch["text"]
        out_text: list[str] = []
        out_spans: list[list[dict]] = []
        out_blocks: list[int] = []
        out_engine: list[str] = []
        out_status: list[str] = []
        raw_l = raw_text.to_pylist()
        for i in range(n):
            if not e1_bad_l[i]:
                r = e1_results[i]
                out_text.append(r["extracted_text"])
                out_spans.append(r["spans"])
                out_blocks.append(r["n_blocks"])
                out_engine.append(e1_engine[i])
                out_status.append("ok")
            elif i in e2_l and not e2_bad_l[i]:
                t = e2_l[i]
                out_text.append(t)
                out_spans.append([{"start": 0, "end": len(t), "kind": "text",
                                   "raw_start": 0, "raw_end": len(strs[i] or "")}])
                out_blocks.append(1)
                out_engine.append("tagstrip")
                out_status.append("fallback")
            elif raw_l[i] and len(raw_l[i].strip()) >= cfg.gate_min_text_length:
                t = raw_l[i]
                out_text.append(t)
                out_spans.append([{"start": 0, "end": len(t), "kind": "text",
                                   "raw_start": -1, "raw_end": -1}])
                out_blocks.append(1)
                out_engine.append("textcol")
                out_status.append("fallback")
            else:
                out_text.append("")
                out_spans.append([])
                out_blocks.append(0)
                out_engine.append("none")
                out_status.append("error")

        extracted = pa.array(out_text, pa.string())
        cols = {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "part_id": batch["part_id"] if "part_id" in batch.column_names
            else pa.array([0] * n, pa.int32()),
            "extracted_text": extracted,
            "spans": pa.array(out_spans, pa.list_(SPAN_TYPE)),
            "n_blocks": pa.array(out_blocks, pa.int32()),
            "engine": pa.array(out_engine, pa.string()),
            "parse_status": pa.array(out_status, pa.string()),
            "reject_reason": pa.array([""] * n, pa.string()),
            "bytes_in": pc.cast(pc.binary_length(html_bin), pa.int64()),
            "bytes_out": pc.cast(pc.binary_length(pc.cast(extracted, pa.binary())), pa.int64()),
        }
        return pa.table(cols)

    def _bad_mask(self, text: pa.Array, ok: pa.Array | None) -> pa.Array:
        """True where an engine's output must be rejected by the vote."""
        g = gates.gibberish_mask(text, self.cfg)
        bad = pc.cast(pa.array([False] * len(text)), pa.bool_()) if len(text) else pa.array([], pa.bool_())
        for m in g.values():
            bad = pc.or_(bad, pc.coalesce(m, pa.scalar(False)))
        empty = pc.less(pc.utf8_length(text), max(1, self.cfg.vote_min_chars))
        bad = pc.or_(bad, empty)
        if ok is not None:
            bad = pc.or_(bad, pc.invert(ok))
        return pc.coalesce(bad, pa.scalar(False))
