#!/usr/bin/env python3
"""Hardware-contention attribution for the 8->32 scaling pair (north
rule): run identical per-process numpy workloads at 1, 8, and 32
concurrent processes and report per-process slowdown.

Two workloads:
  stream  — DRAM-streaming (large-array cumsum/argsort/gather, working
            set ~64 MB per process; models the tile kernel's geometry
            and sort traffic)
  cache   — L2-resident compute (same ops on ~256 KB working set;
            models pure ALU work with negligible DRAM traffic)

If `cache` holds per-process wall flat from 8->32 procs while `stream`
inflates ~1.4x, the scaling loss measured in bench.py's 8->32 pair is a
single-socket memory-bandwidth ceiling of this VM, not an engine
property — on a real cluster the 4x step is four machines with four
memory buses.  Run: python scripts/membw_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Process, Queue


def work_stream(mb: int, iters: int) -> float:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 40, size=n, dtype=np.int64)
    idx = rng.permutation(n)
    t0 = time.monotonic()
    for _ in range(iters):
        b = a[idx]                # random gather: DRAM-latency bound
        c = np.cumsum(b >> 8)     # stream read+write
        a ^= c                    # stream read-modify-write
    return time.monotonic() - t0


def work_cache(kb: int, iters: int) -> float:
    import numpy as np

    n = kb * 1024 // 8
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 40, size=n, dtype=np.int64)
    idx = rng.permutation(n)
    t0 = time.monotonic()
    for _ in range(iters):
        b = a[idx]
        c = np.cumsum(b >> 8)
        a ^= c
    return time.monotonic() - t0


def _child(kind: str, q: Queue) -> None:
    if kind == "stream":
        q.put(work_stream(64, 6))
    else:
        q.put(work_cache(256, 1500))


def run(kind: str, procs: int) -> float:
    q: Queue = Queue()
    ps = [Process(target=_child, args=(kind, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    walls = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(walls) / len(walls)


def main() -> None:
    out: dict = {"nproc": os.cpu_count()}
    for kind in ("stream", "cache"):
        per = {}
        for procs in (1, 8, 32):
            per[str(procs)] = round(run(kind, procs), 3)
        base8 = per["8"]
        out[kind] = {
            "per_proc_wall": per,
            "inflation_8_to_32": round(per["32"] / base8, 3),
            "efficiency_8_to_32": round(base8 / per["32"], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
