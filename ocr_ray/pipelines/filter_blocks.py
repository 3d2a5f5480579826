"""Block-level filter / section-window operators over extracted pages.

The reference's page-filter stage unions cheap predicates (dollar ≥ $200,
keyword sets), expands hits by a ±buffer, merges adjacent ranges, and caps
the window (policy_filter.py:111-212, policy_additional_interests.py:93-131
— SURVEY.md §2 D4-D6, F1-F9).  Here the unit is the extracted BLOCK (our
page analogue): spans index into extracted_text, so each block's text is a
slice — no text round-tripping through markers.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.gates import dollar_page_mask, keyword_page_mask
from ocr_ray.functions.textnorm import expand_neighbors, merge_page_ranges
from ocr_ray.pipelines.extract import extraction_dataset_cached

SECTION_MARKER = "PROPERTY SECTION"
SECTION_WORDS = ("building", "coverage", "property")


def _block_texts(extracted: str, spans: list[dict]) -> list[str]:
    return [extracted[s["start"]:s["end"]] for s in spans]


def filter_stats_batch(cfg: PipelineConfig):
    """Per-url filter statistics: dollar/keyword hits, buffered+merged kept
    window, reduction percent (the I1 metrics as columns)."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["extracted_text"].to_pylist()
        spans_l = batch["spans"].to_pylist()
        out = {"url": [], "n_blocks": [], "n_dollar_blocks": [],
               "n_keyword_blocks": [], "n_kept_blocks": [], "reduction_pct": []}
        for url, text, spans in zip(urls, texts, spans_l):
            blocks = _block_texts(text or "", spans or [])
            n = len(blocks)
            if n == 0:
                hits_d, hits_k, kept = [], [], 0
            else:
                arr = pa.array(blocks, pa.string())
                dm = dollar_page_mask(arr, cfg).to_pylist()
                km = keyword_page_mask(arr, cfg).to_pylist()
                hits_d = [i for i, m in enumerate(dm) if m]
                hits_k = [i for i, m in enumerate(km) if m]
                hit_union = sorted(set(hits_d) | set(hits_k))
                ranges = merge_page_ranges(hit_union, cfg.page_buffer, 0, n - 1)
                kept_ids = [i for s, e in ranges for i in range(s, e + 1)]
                kept_ids = kept_ids[: cfg.max_filtered_pages]
                kept = len(kept_ids)
            out["url"].append(url)
            out["n_blocks"].append(n)
            out["n_dollar_blocks"].append(len(hits_d))
            out["n_keyword_blocks"].append(len(hits_k))
            out["n_kept_blocks"].append(kept)
            out["reduction_pct"].append(0 if n == 0 else (n - kept) * 100 // n)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "n_blocks": pa.array(out["n_blocks"], pa.int64()),
                "n_dollar_blocks": pa.array(out["n_dollar_blocks"], pa.int64()),
                "n_keyword_blocks": pa.array(out["n_keyword_blocks"], pa.int64()),
                "n_kept_blocks": pa.array(out["n_kept_blocks"], pa.int64()),
                "reduction_pct": pa.array(out["reduction_pct"], pa.int64()),
            }
        )

    return f


def section_selector_batch(cfg: PipelineConfig):
    """F9 analogue: first block carrying the section marker + coverage
    words; emits (url, has_section, section_block_id, window_blocks) where
    window = [marker block ± neighbor radius 1] (D6)."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["extracted_text"].to_pylist()
        spans_l = batch["spans"].to_pylist()
        has, ids, windows = [], [], []
        for text, spans in zip(texts, spans_l):
            blocks = _block_texts(text or "", spans or [])
            sec = -1
            for i, b in enumerate(blocks):
                if SECTION_MARKER in b.upper() and any(
                    w in b.lower() for w in SECTION_WORDS
                ):
                    sec = i
                    break
            has.append(sec >= 0)
            ids.append(sec)
            if sec >= 0 and blocks:
                windows.append(expand_neighbors([sec], 1, 0, len(blocks) - 1))
            else:
                windows.append([])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "has_section": pa.array(has, pa.bool_()),
                "section_block_id": pa.array(ids, pa.int64()),
                "window_blocks": pa.array(windows, pa.list_(pa.int64())),
            }
        )

    return f


def heading_window_batch(cfg: PipelineConfig, num_blocks: int = 4):
    """D4 analogue (qc_head.py:167-223 extract_pages_after_heading): a
    PARAMETERIZED window of ``num_blocks`` blocks starting AT the heading
    block, with the reference's validation dict semantics:

    * heading found, >= num_blocks available → status='success', no warning
    * heading found, fewer available         → status='success' + warning,
      blocks_extracted records the short count (short-doc validation)
    * heading not found                      → status='error', empty window
    """

    def f(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["extracted_text"].to_pylist()
        spans_l = batch["spans"].to_pylist()
        out = {"url": [], "status": [], "start_block": [], "end_block": [],
               "blocks_requested": [], "blocks_extracted": [], "warning": [],
               "window_chars": []}
        for url, text, spans in zip(urls, texts, spans_l):
            blocks = _block_texts(text or "", spans or [])
            sec = -1
            for i, b in enumerate(blocks):
                if SECTION_MARKER in b.upper():
                    sec = i
                    break
            out["url"].append(url)
            out["blocks_requested"].append(num_blocks)
            if sec < 0:
                out["status"].append("error")
                out["start_block"].append(-1)
                out["end_block"].append(-1)
                out["blocks_extracted"].append(0)
                out["warning"].append("")
                out["window_chars"].append(0)
                continue
            end = min(len(blocks), sec + num_blocks)
            got = end - sec
            out["status"].append("success")
            out["start_block"].append(sec)
            out["end_block"].append(end - 1)
            out["blocks_extracted"].append(got)
            out["warning"].append(
                "" if got == num_blocks else
                f"requested {num_blocks} blocks but only {got} available"
            )
            out["window_chars"].append(sum(len(b) for b in blocks[sec:end]))
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "status": pa.array(out["status"], pa.string()),
            "start_block": pa.array(out["start_block"], pa.int64()),
            "end_block": pa.array(out["end_block"], pa.int64()),
            "blocks_requested": pa.array(out["blocks_requested"], pa.int64()),
            "blocks_extracted": pa.array(out["blocks_extracted"], pa.int64()),
            "warning": pa.array(out["warning"], pa.string()),
            "window_chars": pa.array(out["window_chars"], pa.int64()),
        })

    return f


def declarations_head_batch(cfg: PipelineConfig, head_blocks: int = 8):
    """C8 analogue (pl_cov_declarations.py:33-269): validation restricted
    to the DECLARATIONS head — only the first ``head_blocks`` blocks are
    searched, so amounts deep in the policy never leak into the result."""
    from ocr_ray.functions.gates import dollar_page_mask

    def f(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["extracted_text"].to_pylist()
        spans_l = batch["spans"].to_pylist()
        out = {"url": [], "n_head_blocks": [], "head_has_dollar": [],
               "head_chars": []}
        for url, text, spans in zip(urls, texts, spans_l):
            blocks = _block_texts(text or "", spans or [])[:head_blocks]
            out["url"].append(url)
            out["n_head_blocks"].append(len(blocks))
            if blocks:
                dm = dollar_page_mask(pa.array(blocks, pa.string()), cfg)
                out["head_has_dollar"].append(
                    bool(pa.compute.any(dm).as_py())
                )
            else:
                out["head_has_dollar"].append(False)
            out["head_chars"].append(sum(len(b) for b in blocks))
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "n_head_blocks": pa.array(out["n_head_blocks"], pa.int64()),
            "head_has_dollar": pa.array(out["head_has_dollar"], pa.bool_()),
            "head_chars": pa.array(out["head_chars"], pa.int64()),
        })

    return f


def filter_stats(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = extraction_dataset_cached(pages_dir, cfg)
    return ds.map_batches(filter_stats_batch(cfg), batch_format="pyarrow")


def heading_windows(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                    num_blocks: int = 4):
    ds = extraction_dataset_cached(pages_dir, cfg)
    return ds.map_batches(heading_window_batch(cfg, num_blocks),
                          batch_format="pyarrow")


def declarations_head(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                      head_blocks: int = 8):
    ds = extraction_dataset_cached(pages_dir, cfg)
    return ds.map_batches(declarations_head_batch(cfg, head_blocks),
                          batch_format="pyarrow")


def section_windows(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = extraction_dataset_cached(pages_dir, cfg)
    return ds.map_batches(section_selector_batch(cfg), batch_format="pyarrow")
