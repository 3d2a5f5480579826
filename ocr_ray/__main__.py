"""CLI entry point — the ``ray job submit``-able surface.

    python -m ocr_ray extract  --input DIR --out DIR [--mode sharded|hash]
                               [--no-resume] [--num-cpus N]
    python -m ocr_ray stats    --out DIR
    python -m ocr_ray synth    --sf-dir DIR --out DIR [--reps N] [--rows-per-file N]

Owns the Ray session (the only places allowed to: CLI, bench.py, tests).
On a real cluster the same module runs via
``ray job submit -- python -m ocr_ray extract …`` with address="auto".
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ocr_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run the extraction pipeline")
    ex.add_argument("--input", required=True, help="pages parquet dir")
    ex.add_argument("--out", required=True, help="output dir (partitioned)")
    ex.add_argument("--mode", choices=("sharded", "urlhash", "hash"), default="sharded")
    ex.add_argument("--no-resume", action="store_true")
    ex.add_argument("--num-cpus", type=int, default=None)

    st = sub.add_parser("stats", help="summarize manifests of an output dir")
    st.add_argument("--out", required=True)

    sy = sub.add_parser("synth", help="materialize a derived pages corpus")
    sy.add_argument("--sf-dir", required=True)
    sy.add_argument("--out", required=True)
    sy.add_argument("--reps", type=int, default=1)
    sy.add_argument("--rows-per-file", type=int, default=512)

    args = ap.parse_args(argv)

    if args.cmd == "stats":
        from ocr_ray.state.manifest import summarize

        print(json.dumps(summarize(args.out), sort_keys=True))
        return 0

    if args.cmd == "synth":
        from ocr_ray.sources.synth import materialize_pages_parquet

        out = materialize_pages_parquet(
            args.sf_dir, args.out, rows_per_file=args.rows_per_file, reps=args.reps
        )
        print(out)
        return 0

    # extract — owns the Ray session
    import ray

    ray.init(
        address=os.environ.get("RAY_ADDRESS", "local"),
        num_cpus=args.num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from ocr_ray.pipelines.extract import (
            run_extraction,
            run_extraction_sharded,
            run_extraction_urlhash,
        )

        runner = {"sharded": run_extraction_sharded,
                  "urlhash": run_extraction_urlhash,
                  "hash": run_extraction}[args.mode]
        summary = runner(args.input, args.out, resume=not args.no_resume)
        print(json.dumps(summary, sort_keys=True))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
