"""Measure the hypervisor CPU token bucket: burn N cores, log per-second
aggregate sha256 throughput until it visibly throttles.

Usage: python tools/bucket_probe.py [procs] [seconds]
"""
from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _worker(q: mp.Queue, sec: float) -> None:
    h = b"x" * 1024
    t_end = time.time() + sec
    while time.time() < t_end:
        t0 = time.time()
        c = 0
        while time.time() - t0 < 1.0:
            for _ in range(100):
                h = hashlib.sha256(h).digest()
            c += 100
        q.put((round(t0), c))


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q, sec)) for _ in range(procs)]
    t_start = time.time()
    for p in ps:
        p.start()
    # drain while workers run: joining first deadlocks once the queue's pipe
    # buffer fills
    agg: dict[int, int] = {}
    deadline = t_start + sec + 30
    alive = list(ps)
    import queue as _queue
    while alive and time.time() < deadline:
        try:
            t, c = q.get(timeout=1.0)
            agg[t - round(t_start)] = agg.get(t - round(t_start), 0) + c
        except _queue.Empty:
            pass
        alive = [p for p in alive if p.is_alive()]
    while not q.empty():
        t, c = q.get()
        agg[t - round(t_start)] = agg.get(t - round(t_start), 0) + c
    for p in ps:
        p.join(timeout=5)
    for t in sorted(agg):
        print(json.dumps({"sec": t, "mhash": round(agg[t] / 1e6, 1)}))


if __name__ == "__main__":
    main()
