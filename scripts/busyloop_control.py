"""Hardware-throttle control for the scaling benchmark (BASELINE.md).

Measures per-process throughput of a fixed PURE-PYTHON busy loop (no I/O,
no shared data) at increasing process counts.  Any per-core slowdown at
high concurrency is hardware (turbo / shared cache+memory bandwidth), not
framework overhead — separate cluster NODES do not share this effect, so
the in-sandbox 8→32 scaling pair must be read against this control.

Usage: python scripts/busyloop_control.py [counts...]   (default 1 8 32)
Prints one JSON line: per-level mean seconds per unit of work and the
slowdown factor vs the 1-process level.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

_WORK_ITERS = 2_000_000


def _spin(n_rounds: int) -> float:
    """CPU-bound kernel: integer arithmetic loop, returns mean secs/round."""
    t0 = time.monotonic()
    acc = 0
    for _ in range(n_rounds):
        x = 0
        for i in range(_WORK_ITERS // 100):
            x = (x * 1103515245 + 12345 + i) & 0x7FFFFFFF
        acc ^= x
    dt = time.monotonic() - t0
    if acc == -1:  # keep the loop un-eliminable
        print(acc)
    return dt / n_rounds


def _worker(q: "mp.Queue", rounds: int) -> None:
    q.put(_spin(rounds))


def measure(n_procs: int, rounds: int = 1500) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q, rounds)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals) / len(vals)


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    out: dict = {"work_iters": _WORK_ITERS}
    _spin(50)  # warm-up (interpreter / frequency governor)
    base = None
    for n in counts:
        secs = measure(n)  # ~4s of sustained all-core load per level
        out[f"secs_per_round_{n}p"] = round(secs, 4)
        if base is None:
            base = secs
        out[f"slowdown_{n}p"] = round(secs / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
