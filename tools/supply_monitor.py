"""Log the host's aggregate CPU supply over time (burst-credit tracker).

The sandbox VM delivers time-varying CPU (hypervisor token bucket): after
sustained load, aggregate throughput drops to ~a quarter of peak regardless
of process count. Scaling runs are only meaningful at full supply, so this
logs a cheap probe every interval for the harness to key off.

Usage: python tools/supply_monitor.py [interval_sec] [count] >> /tmp/supply.log
"""
from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _burn(sec: float) -> int:
    h = b"x" * 1024
    t0 = time.time()
    c = 0
    while time.time() - t0 < sec:
        for _ in range(100):
            h = hashlib.sha256(h).digest()
        c += 100
    return c


def probe(procs: int = 32, sec: float = 0.4) -> float:
    with mp.Pool(procs) as p:
        return sum(p.map(_burn, [sec] * procs)) / sec


def main() -> None:
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    for _ in range(count):
        t0 = time.time()
        agg = probe()
        print(json.dumps({"t": round(t0), "agg_mhash": round(agg / 1e6, 1)}),
              flush=True)
        time.sleep(max(0.0, interval - (time.time() - t0)))


if __name__ == "__main__":
    main()
