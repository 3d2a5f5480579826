"""Fixed Arrow schemas for every table the engine produces.

The reference's dynamic JSON shapes (SURVEY.md §1.1) become explicit
nullable struct/list columns; the conditional 0/1/N additional-interest
shape (llm_pl.py:139-147) is always a ``list<struct>`` — empty lists, never
absent keys.
"""

from __future__ import annotations

import pyarrow as pa

# Input table — exactly BASELINE.json input_hint.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Span into extracted_text: extracted_text[start:end] == block text
# (FIXTURES.md §5 invariant 3).  kind ∈ {text, heading, list, table}.
SPAN_TYPE = pa.struct(
    [
        pa.field("start", pa.int64()),       # into extracted_text
        pa.field("end", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("raw_start", pa.int64()),   # into the canonical html decode
        pa.field("raw_end", pa.int64()),     # (-1 when not applicable)
    ]
)

# Output of the extraction pipeline (SURVEY.md §1.2 "extracted" table).
EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("part_id", pa.int32()),          # hash(url) % num_partitions
        pa.field("extracted_text", pa.string()),  # byte-exact deliverable
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("n_blocks", pa.int32()),
        pa.field("engine", pa.string()),          # dom | tagstrip | textcol | pdf | none
        pa.field("parse_status", pa.string()),    # ok | fallback | error | rejected
        pa.field("reject_reason", pa.string()),   # '' unless parse_status='rejected'
        pa.field("bytes_in", pa.int64()),
        pa.field("bytes_out", pa.int64()),
    ]
)

# Rows rejected by the pre-classify gate (record-level error channel —
# parse failures are rows, never exceptions; SURVEY.md §4).
REJECTS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("reject_reason", pa.string()),
    ]
)

# Per-partition lineage manifest (SURVEY.md §1.1 lineage row; §4 checkpoint).
MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("rows_rejected", pa.int64()),
        pa.field("parse_failures", pa.int64()),
        pa.field("bytes_in", pa.int64()),
        pa.field("bytes_out", pa.int64()),
        pa.field("bytes_stripped", pa.int64()),
        pa.field("wall_ms", pa.int64()),
    ]
)
