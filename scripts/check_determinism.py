"""FIXTURES.md §5 invariant 1 evidence: byte-identical output across
parallelism levels and runner implementations, in FRESH processes.

Runs the sharded extraction at num_cpus=8 and num_cpus=32 (separate
processes) plus the url-hash two-phase runner, and compares every
partition's parquet bytes (after canonical row order, which the writers
already impose).

Usage: python scripts/check_determinism.py
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SRC = "/tmp/pages_determinism"
RUNS = [
    ("sharded_8", "sharded", 8),
    ("sharded_32", "sharded", 32),
    ("urlhash_8", "urlhash", 8),
]


def main() -> None:
    subprocess.run(
        [sys.executable, "-m", "ocr_ray", "synth",
         "--sf-dir", "/root/testdata/sf0.001", "--out", SRC,
         "--rows-per-file", "128"],
        check=True, capture_output=True,
    )
    outs = {}
    for name, mode, ncpu in RUNS:
        out = f"/tmp/determinism_{name}"
        subprocess.run(["rm", "-rf", out], check=True)
        subprocess.run(
            [sys.executable, "-m", "ocr_ray", "extract", "--input", SRC,
             "--out", out, "--mode", mode, "--num-cpus", str(ncpu)],
            check=True, capture_output=True,
        )
        outs[name] = out

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    def read_all(d: str) -> pa.Table:
        t = pa.concat_tables(
            [pq.read_table(f) for f in sorted(glob.glob(os.path.join(d, "part=*", "data.parquet")))]
        )
        idx = pc.sort_indices(t, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")])
        return t.take(idx).combine_chunks()

    # sharded 8 vs 32: identical partition layout → file-level byte compare
    a_files = sorted(glob.glob(os.path.join(outs["sharded_8"], "part=*", "data.parquet")))
    b_files = sorted(glob.glob(os.path.join(outs["sharded_32"], "part=*", "data.parquet")))
    assert len(a_files) == len(b_files) and a_files, "partition count mismatch"
    byte_equal = all(
        open(a, "rb").read() == open(b, "rb").read() for a, b in zip(a_files, b_files)
    )
    print(f"sharded num_cpus=8 vs 32: {len(a_files)} partitions, "
          f"file-level byte equality: {byte_equal}")
    assert byte_equal

    # urlhash vs sharded: different partitioning → row-level byte compare
    t_sharded = read_all(outs["sharded_8"])
    t_urlhash = read_all(outs["urlhash_8"])
    same = (
        t_sharded.drop_columns(["part_id"]).equals(t_urlhash.drop_columns(["part_id"]))
    )
    print(f"urlhash vs sharded rows (ex part_id): equal: {same}")
    assert same
    print("DETERMINISM OK")


if __name__ == "__main__":
    main()
