"""QC / validation stage — the cert-vs-policy compare restated.

The reference validates LLM-extracted certificate fields against policy
text with deterministic guardrails (llm_pl_pol_cov.py:409-565, SURVEY.md
§2 H).  Here the two sides are the engine's ``extracted_text`` and the
input's raw ``text`` layer (the independent second source), compared with
the same verdict taxonomy:

  MATCH      extracted content is corroborated by the raw layer
  MISMATCH   both present but token overlap below threshold
  NOT_FOUND  one side empty

Summary counts are RECOMPUTED from the verdicts (never trusted from
upstream) — the H4 "avoid hallucinated totals" rule.  Everything is
vectorized except the per-row token-set overlap (cheap set ops over
already-split tokens).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# verdict thresholds (integer percent, cross-multiplied — float-free)
MATCH_MIN_OVERLAP_PCT = 70


def _token_set(s: str) -> set[str]:
    return set(s.lower().split())


def qc_verdict_batch(batch: pa.Table) -> pa.Table:
    """Adds qc_status / overlap_pct for rows with extracted_text vs text."""
    ex = batch["extracted_text"].to_pylist()
    raw = batch["text"].to_pylist()
    statuses: list[str] = []
    overlaps: list[int] = []
    for e, r in zip(ex, raw):
        if not e or not r:
            statuses.append("NOT_FOUND")
            overlaps.append(0)
            continue
        te, tr = _token_set(e), _token_set(r)
        if not te:
            statuses.append("NOT_FOUND")
            overlaps.append(0)
            continue
        inter = len(te & tr)
        pct = inter * 100 // len(te)
        overlaps.append(pct)
        statuses.append("MATCH" if pct >= MATCH_MIN_OVERLAP_PCT else "MISMATCH")
    return batch.append_column(
        "qc_status", pa.array(statuses, pa.string())
    ).append_column("overlap_pct", pa.array(overlaps, pa.int64()))


def qc_rollup(ds):
    """Recomputed status counts (H4): groupby(qc_status).count().

    ``ds`` must carry both extracted_text and text columns."""
    from ray.data.aggregate import Count

    return (
        ds.map_batches(qc_verdict_batch, batch_format="pyarrow")
        .groupby("qc_status")
        .aggregate(Count(alias_name="n"))
    )


def qc_pages_rollup(pages_dir: str, cfg=None):
    """End-to-end QC over a pages corpus: extract (order-preserving, no
    gate split so rows stay aligned with the input batch), compare the
    engine output against the raw ``text`` layer, recount statuses."""
    import ray.data as rd

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.stages.extract import Extractor

    cfg = cfg or DEFAULT_CONFIG

    class ExtractWithRaw:
        """Actor-pool stage: Extractor built once per actor (not per batch)."""

        def __init__(self) -> None:
            self.extractor = Extractor(cfg)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = self.extractor(batch)  # no gate columns → order preserved
            return out.append_column("text", batch["text"])

    ds = rd.read_parquet(pages_dir).map_batches(
        ExtractWithRaw, batch_format="pyarrow",
        batch_size=cfg.batch_size_extract, concurrency=(2, 8)
    )
    return qc_rollup(ds)
