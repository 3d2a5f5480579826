"""Partition-granular checkpoint layout + lineage manifests (SURVEY.md §4).

The reference's checkpointing is implicit — every stage persists named
files and reruns pick the best existing input (llm_pl.py:486-495).  Here it
is explicit and atomic:

    out_dir/
      part=00042/data.parquet      # one url-hash partition of the output
      part=00042/manifest.json     # lineage + metrics for that partition

A partition directory is written under a temp name and ``os.rename``d into
place (atomic on one filesystem), so a partition either fully exists with
its manifest or not at all.  ``completed_parts`` lists finished partitions;
a resumed run drops their rows before any heavy work.  At 100 TB scale the
partition count is sized so one partition ≈ one object-store-friendly
chunk (config.num_output_partitions; thousands of parts on a real cluster).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def part_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part={part_id:05d}")


def completed_parts(out_dir: str) -> set[int]:
    """Partitions whose directory + manifest.json exist."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part="):
            try:
                pid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if os.path.exists(os.path.join(out_dir, name, "manifest.json")):
                done.add(pid)
    return done


def write_partition(out_dir: str, part_id: int, table, manifest: dict) -> bool:
    """Atomically write one partition (data.parquet + manifest.json).

    Returns False when the partition already exists (another task / a prior
    run won the rename) — the duplicate work is discarded, which is the
    idempotency story for task retries.
    """
    import pyarrow.parquet as pq

    final = part_dir(out_dir, part_id)
    if os.path.exists(os.path.join(final, "manifest.json")):
        return False
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"_tmp-{part_id:05d}-{uuid.uuid4().hex}")
    os.makedirs(tmp)
    try:
        pq.write_table(table, os.path.join(tmp, "data.parquet"))
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)
        try:
            os.rename(tmp, final)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race — discard
            return False
        return True
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def replace_partition(out_dir: str, part_id: int, table, manifest: dict) -> None:
    """Atomically REPLACE a partition — the incremental-merge write
    (:func:`write_partition`'s keep-first no-op is the wrong semantics
    when a delta rewrites a partition in place).  The new directory is
    fully written under a temp name, the old one renamed aside, the new
    one renamed in, the old removed.  A crash between the two renames
    leaves the old copy under ``_old-<part>-*`` where
    :func:`latest_partition_data` still finds it, so no window loses the
    base rows; a production lakehouse would use a manifest pointer swap,
    which this layout emulates with two renames."""
    import pyarrow.parquet as pq

    final = part_dir(out_dir, part_id)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"_tmp-{part_id:05d}-{uuid.uuid4().hex}")
    os.makedirs(tmp)
    try:
        pq.write_table(table, os.path.join(tmp, "data.parquet"))
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    old = os.path.join(out_dir, f"_old-{part_id:05d}-{uuid.uuid4().hex}")
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old, ignore_errors=True)
    # the live dir is in place: any crash-leftover fallback copies of
    # this partition are stale now
    import glob
    for d in glob.glob(os.path.join(out_dir, f"_old-{part_id:05d}-*")):
        shutil.rmtree(d, ignore_errors=True)


def latest_partition_data(out_dir: str, part_id: int) -> str | None:
    """Path of a partition's data.parquet: the live directory, else the
    newest crash-leftover ``_old-<part>-*`` copy, else None."""
    import glob

    p = os.path.join(part_dir(out_dir, part_id), "data.parquet")
    if os.path.exists(p):
        return p
    olds = sorted(glob.glob(os.path.join(
        out_dir, f"_old-{part_id:05d}-*", "data.parquet")),
        key=os.path.getmtime)
    return olds[-1] if olds else None


class StreamedPartitionWriter:
    """Atomic partition write for data too big to hold at once: row groups
    are appended via ``write(table)`` into the temp dir, then ``finalize``
    renames it into place with the manifest — same all-or-nothing contract
    as :func:`write_partition`, bounded memory."""

    def __init__(self, out_dir: str, part_id: int, schema) -> None:
        import pyarrow.parquet as pq

        self.out_dir = out_dir
        self.part_id = part_id
        os.makedirs(out_dir, exist_ok=True)
        self.tmp = os.path.join(out_dir, f"_tmp-{part_id:05d}-{uuid.uuid4().hex}")
        os.makedirs(self.tmp)
        self._writer = pq.ParquetWriter(
            os.path.join(self.tmp, "data.parquet"), schema
        )

    def write(self, table) -> None:
        self._writer.write_table(table)

    def finalize(self, manifest: dict) -> bool:
        self._writer.close()
        final = part_dir(self.out_dir, self.part_id)
        try:
            with open(os.path.join(self.tmp, "manifest.json"), "w") as f:
                json.dump(manifest, f, sort_keys=True)
            try:
                os.rename(self.tmp, final)
            except OSError:
                shutil.rmtree(self.tmp, ignore_errors=True)
                return False
            return True
        except Exception:
            shutil.rmtree(self.tmp, ignore_errors=True)
            raise

    def abort(self) -> None:
        try:
            self._writer.close()
        finally:
            shutil.rmtree(self.tmp, ignore_errors=True)


def load_manifests(out_dir: str) -> list[dict]:
    """All partition manifests, ordered by part_id."""
    out = []
    for pid in sorted(completed_parts(out_dir)):
        with open(os.path.join(part_dir(out_dir, pid), "manifest.json")) as f:
            out.append(json.load(f))
    return out


def summarize(out_dir: str) -> dict:
    """Aggregate lineage metrics across partitions (driver-side; tiny)."""
    manifests = load_manifests(out_dir)
    keys = ("rows_in", "rows_out", "rows_rejected", "parse_failures",
            "bytes_in", "bytes_out", "bytes_stripped")
    agg = {k: sum(m.get(k, 0) for m in manifests) for k in keys}
    agg["partitions"] = len(manifests)
    return agg


def clear_output(out_dir: str) -> None:
    """Remove all partition dirs, exchange chunks, and markers — used by
    resume=False runs so recomputed results actually replace old output
    (write_partition otherwise discards work when a manifest exists)."""
    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        if name.startswith(("part=", "_chunks", "_tmp-", "_old-")):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
