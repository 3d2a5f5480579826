"""Append-only tombstone segments — the shared DELETE verb of every
persisted index layout (term/positional postings, IVF cells).

Deletes never touch data files: the deleted keys are written as
uuid-named parquet segments under ``<index_dir>/_tombstones/`` (hive
partitions are ``bucket=``/``cell=``-prefixed dirs, so the underscore
dir never collides and glob-based partition probes never read it).  A
concurrent reader sees either the old or the extended tombstone set —
the same atomicity stance as the append-ingestion path — and repeated
deletes just add segments (set-union semantics).  Lookups subtract the
set at query time via a sorted-array searchsorted against the one-shot
``ray.put`` broadcast; tombstones carry int64 keys only, so even a
billion deletes is ~8 GB — far past the point a real deployment
compacts the layout (rewrite partitions dropping dead rows, clear
``_tombstones/`` — the ``compact_ivf_index`` rewrite path).
"""

from __future__ import annotations

import glob
import os

TOMBSTONE_DIR = "_tombstones"


def append_tombstones(index_dir: str, deleted_ds, key_col: str) -> str:
    """Write ``deleted_ds``'s key column as a new tombstone segment of
    ``index_dir`` (streaming write — the key set never assembles on the
    driver).  Returns ``index_dir``."""
    deleted_ds.select_columns([key_col]).write_parquet(
        os.path.join(index_dir, TOMBSTONE_DIR))
    return index_dir


def read_tombstones(index_dir: str, key_col: str):
    """SORTED distinct tombstoned keys of a layout as an int64 numpy
    array, or None when the layout has none (the zero-cost common case).
    Small-side driver read (key column only) intended for a one-shot
    ``ray.put`` broadcast into the lookup's map_batches."""
    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(glob.glob(
        os.path.join(index_dir, TOMBSTONE_DIR, "*.parquet")))
    if not files:
        return None
    arrs = [pq.read_table(f, columns=[key_col])[key_col]
            .to_numpy(zero_copy_only=False) for f in files]
    return np.unique(np.concatenate(arrs).astype(np.int64))
