"""The end-to-end training-data pipeline — what the engine is FOR.

Composes the implemented stages into the canonical web→training-text flow:

    pages → gates → dual-engine extract          (flagship extraction)
          → keep parse_status ∈ {ok, fallback}
          → exact dedup on content hash          (keep-first by url,warc_ts)
          → quality gate on extracted text       (token/stopword thresholds)
          → (url, fingerprint, n_tokens, n_chars, quality_ok, kept)

Everything streams: the only wide op is the dedup groupby, and its shuffle
key is the 32-hex md5 — never the text.  Dedup keep-first semantics match
SURVEY.md §2 J2; the quality gate is functions.textstats.quality_columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.textstats import md5_fingerprint, quality_columns
from ocr_ray.pipelines.extract import extraction_dataset_cached


def training_corpus(pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG):
    """→ Dataset(url, fingerprint, n_chars, n_tokens, quality_ok, kept).

    ``kept`` is True for rows that survive extraction + dedup + quality —
    the rows a downstream tokenizer would consume.  Non-kept rows remain
    (with kept=False) so accounting stays total.
    """
    ds = extraction_dataset_cached(pages_dir, cfg)

    def score(t: pa.Table) -> pa.Table:
        ok = pc.is_in(t["parse_status"], value_set=pa.array(["ok", "fallback"]))
        q = quality_columns(t["extracted_text"])
        # every rejected/error row has extracted_text='' — a single md5('')
        # fingerprint would be an UNBOUNDED hot key in the dedup shuffle, so
        # non-extracted rows get a per-url salted fingerprint (their own
        # singleton group; kept=False falls out since quality_ok is False)
        fp = pc.if_else(
            ok,
            md5_fingerprint(t["extracted_text"]),
            pc.binary_join_element_wise("skip:", t["url"], ""),
        )
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "fingerprint": fp,
                # coarse dedup-shuffle bucket (hash prefix): keep-first per
                # fingerprint happens VECTORIZED inside each bucket — one
                # Ray group dispatch per bucket, not per distinct content
                "bucket": pc.utf8_slice_codeunits(fp, 0, 2),
                "extracted_ok": pc.cast(ok, pa.bool_()),
                "n_chars": q["n_chars"],
                "n_tokens": q["n_tokens"],
                "quality_ok": q["quality_ok"],
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")

    def first_per_content(g: pd.DataFrame) -> pd.DataFrame:
        # keep-first: smallest (url, warc_ts) wins each content group
        g = g.sort_values(["fingerprint", "url", "warc_ts"])
        elig = g["extracted_ok"] & g["quality_ok"]
        rank = elig.groupby(g["fingerprint"]).cumsum()
        return g.assign(kept=elig & (rank == 1)).drop(columns=["bucket"])

    return (
        scored.groupby("bucket")
        .map_groups(first_per_content, batch_format="pandas")
        .drop_columns(["extracted_ok"])
    )
