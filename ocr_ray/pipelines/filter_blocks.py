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
from ocr_ray.pipelines.extract import extraction_dataset

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


def filter_stats(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = extraction_dataset(rd.read_parquet(pages_dir), cfg)
    return ds.map_batches(filter_stats_batch(cfg), batch_format="pyarrow")


def section_windows(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    ds = extraction_dataset(rd.read_parquet(pages_dir), cfg)
    return ds.map_batches(section_selector_batch(cfg), batch_format="pyarrow")
