"""Shared-nothing node emulation: decompose scaling loss into engine vs silicon.

Motivation (BENCH/BASELINE.md r4): the two-parallelism protocol
(tools/scaling.py) runs both sizes on ONE socket, so at 4N cores the job
competes for the socket's shared memory bandwidth / LLC — resources a real
N->4N *cluster* multiplies by 4 (per-node hardware is constant; that is the
north rule's criterion). As the engine gets faster per event, it gets more
bandwidth-bound, and the single-socket two-size ratio increasingly measures
the silicon, not the engine. The CPU-work inflation at 4N
(cpu_sec ratio ~1.2 on identical work, stall cycles counted as CPU time) is
the tell.

This tool isolates the engine's own coordination cost with a third
configuration: 4 CONCURRENT local[4] jobs, pinned to disjoint 4-core slices
— four shared-nothing "cluster nodes" on exactly the silicon the 16-core
job uses, with ZERO cross-job coordination: identical aggregate hardware
pressure, no shuffles crossing slice boundaries, four independent drivers
(as a real 4-node cluster would also have).

Each node replays its OWN quarter-size stream (same generator spec, n_convs
/ 4, distinct seed — identical distributions, disjoint data), so the three
configurations process comparable aggregate work in comparable wall time.
This matters on this host: the hypervisor sustains only a fraction of the
instantaneous 16-core burst rate, so an experiment whose aggregate
core-seconds exceed the credit bucket measures the token bucket, not the
engine (measured: 4 concurrent full-size replays collapsed from an expected
~110 s to 431 s mid-run; recorded in BENCH/BASELINE.md as the counter-
example). Quarter streams keep every configuration inside the sustainable
envelope.

Per round (order rotates across rounds, cooldown + probe before each):
  coord  — one local[16] job on the FULL stream, cores 0-15
  nodes  — 4 concurrent local[4] jobs, node i on quarter-stream i
  burn4  — one local[4] job on quarter-stream 0 with cache-resident
           burners on cores 4-15 (the equalized single-node baseline of
           tools/scaling.py)

Derived:
  engine_efficiency   = eps_coord / agg_eps_nodes
      -> the 16-core coordinated plan (one shuffle spanning 16 cores,
         one driver) vs embarrassingly-parallel execution on the SAME
         silicon; coordination, shuffle width, and barrier costs only.
         This is the engine-attributable part of N->4N scaling. (The
         per-job stream sizes differ 4x; per-event cost is size-invariant
         for this generator family, and the per-epoch serial driver cost
         appears 3x on every configuration's critical path.)
  silicon_share       = agg_eps_nodes / (4 * eps_burn4)
      -> how much the shared socket throttles four independent nodes vs
         one (same per-job work); pure hardware — a real cluster's nodes
         don't share a socket.
  two_size_efficiency = engine_efficiency * silicon_share
      -> the classic single-socket ratio, for reconciliation with
         tools/scaling.py's headline.

Usage: PYTHONPATH=/root/repo python tools/scaling_nodes.py [rounds]
Env: CDCRYPT_SCALING_CONVS / CDCRYPT_SCALING_EPOCHS select the coord
stream (shared with tools/scaling.py; node streams are CONVS/4 each);
CDCRYPT_SCALING_OUT names the json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling import (  # noqa: E402
    _BURN_SRC,
    _RUNNER_SRC,
    BENCH_DIR,
    BUCKETS,
    REPO,
    RUNNER,
    cpu_probe,
    ensure_stream,
)

SLICES = ("0-3", "4-7", "8-11", "12-15")


def ensure_node_streams() -> list[tuple[str, int]]:
    """Four quarter-size streams, same spec family as ensure_stream's
    (avg_turns/text_repeat/files_per_epoch identical), distinct seeds."""
    sys.path.insert(0, REPO)
    from cdcrypt.sources.changegen import GenSpec, generate_to_dir

    n_epochs = int(os.environ.get("CDCRYPT_SCALING_EPOCHS", "6"))
    n_convs = int(os.environ.get("CDCRYPT_SCALING_CONVS", "120000")) // 4
    out = []
    for i in range(4):
        stream = os.path.join(BENCH_DIR, f"nstream_c{n_convs}_e{n_epochs}_s{i}")
        marker = os.path.join(stream, "_DONE")
        if not os.path.exists(marker):
            os.makedirs(BENCH_DIR, exist_ok=True)
            stats = generate_to_dir(
                stream,
                GenSpec(n_convs=n_convs, avg_turns=35, n_epochs=n_epochs,
                        text_repeat=6, seed=101 + i),
                files_per_epoch=16,
            )
            with open(marker, "w") as f:
                json.dump({k: v for k, v in stats.items() if k != "files"}, f)
        with open(marker) as f:
            out.append((stream, json.load(f)["events"]))
    return out


def _spawn(cpus: int, stream: str, work: str, pin: str) -> subprocess.Popen:
    # NOTE: do NOT wipe `work` here — coord/burn4 pass BENCH_DIR itself
    # (streams live inside). The runner wipes its own t_{cpus}* subdirs,
    # which is the actual per-run state; node isolation comes from the
    # four distinct node{i} work dirs.
    os.makedirs(work, exist_ok=True)
    # stderr to a FILE, not a pipe: Spark logs enough to fill a 64 KB pipe
    # buffer, and the parent reaps runners sequentially — an undrained
    # pipe would deadlock the concurrent node runners
    errpath = os.path.join(work, "runner.stderr")
    p = subprocess.Popen(
        ["taskset", "-c", pin, sys.executable, RUNNER,
         str(cpus), stream, work, str(BUCKETS)],
        stdout=subprocess.PIPE, stderr=open(errpath, "w"), text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    p._errpath = errpath
    return p


def _result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=1800)
    lines = out.strip().splitlines()
    if not lines:
        with open(p._errpath) as f:
            err = f.read()
        raise RuntimeError(
            f"runner produced no output (exit {p.returncode}); stderr tail:\n"
            + "\n".join(err.strip().splitlines()[-15:]))
    return json.loads(lines[-1])


def run_coord(stream: str) -> dict:
    return _result(_spawn(16, stream, BENCH_DIR, "0-15"))


def run_nodes(node_streams: list[tuple[str, int]]) -> dict:
    procs = [
        _spawn(4, s, os.path.join(BENCH_DIR, f"node{i}"), pin)
        for i, (pin, (s, _)) in enumerate(zip(SLICES, node_streams))
    ]
    recs = [_result(p) for p in procs]
    return {
        "walls": [round(r["wall"], 2) for r in recs],
        "wall_max": max(r["wall"] for r in recs),
        "cpu_sec_total": round(sum(r.get("cpu_sec", 0) for r in recs), 1),
    }


def run_burn4(stream: str) -> dict:
    burners = [
        subprocess.Popen(["taskset", "-c", str(core), sys.executable,
                          "-c", _BURN_SRC],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for core in range(4, 16)
    ]
    try:
        return _result(_spawn(4, stream, BENCH_DIR, "0-3"))
    finally:
        for b in burners:
            b.kill()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with open(RUNNER, "w") as f:
        f.write(_RUNNER_SRC.format(repo=REPO))
    stream, n_events = ensure_stream()
    node_streams = ensure_node_streams()
    n_node_events = sum(e for _, e in node_streams)
    print(f"coord stream: {n_events} events; node streams: "
          f"{[e for _, e in node_streams]}; buckets={BUCKETS}", flush=True)

    kinds = ("coord", "nodes", "burn4")
    results: dict[str, list] = {k: [] for k in kinds}
    probes: list[float] = []
    for r in range(rounds):
        order = kinds[r % len(kinds):] + kinds[:r % len(kinds)]
        for kind in order:
            time.sleep(60)
            probe = cpu_probe(procs=16)
            probes.append(probe / 16)
            if kind == "coord":
                rec = run_coord(stream)
                rec["eps"] = n_events / rec["wall"]
            elif kind == "nodes":
                rec = run_nodes(node_streams)
                rec["agg_eps"] = n_node_events / rec["wall_max"]
            else:
                rec = run_burn4(node_streams[0][0])
                rec["eps"] = node_streams[0][1] / rec["wall"]
            rec["probe_mhash_per_core"] = round(probe / 16 / 1e6, 3)
            results[kind].append(rec)
            shown = rec.get("eps") or rec.get("agg_eps")
            print(f"round {r} {kind}: {shown:.0f} eps "
                  f"probe/core {probe/16/1e6:.2f}M sha/s "
                  f"wall {rec.get('wall', rec.get('wall_max')):.1f}s",
                  flush=True)

    def best(k, field):
        return max(x[field] for x in results[k])

    def med(k, field):
        return statistics.median(x[field] for x in results[k])

    eff = {
        "best": round(best("coord", "eps") / best("nodes", "agg_eps"), 3),
        "median": round(med("coord", "eps") / med("nodes", "agg_eps"), 3),
    }
    sil = {
        "best": round(best("nodes", "agg_eps") / (4 * best("burn4", "eps")), 3),
        "median": round(med("nodes", "agg_eps") / (4 * med("burn4", "eps")), 3),
    }
    summary = {
        "coord_events": n_events,
        "node_events": [e for _, e in node_streams],
        "buckets": BUCKETS,
        "rounds": rounds,
        "eps_coord": {"best": round(best("coord", "eps"), 1),
                      "median": round(med("coord", "eps"), 1)},
        "agg_eps_nodes": {"best": round(best("nodes", "agg_eps"), 1),
                          "median": round(med("nodes", "agg_eps"), 1)},
        "eps_burn4": {"best": round(best("burn4", "eps"), 1),
                      "median": round(med("burn4", "eps"), 1)},
        "engine_efficiency": eff,
        "silicon_share": sil,
        "two_size_efficiency": {
            "best": round(eff["best"] * sil["best"], 3),
            "median": round(eff["median"] * sil["median"], 3),
        },
        "probe_drift_pct": round(
            100 * (max(probes) - min(probes)) / max(probes), 1),
        "raw": results,
    }
    out = os.environ.get(
        "CDCRYPT_SCALING_OUT",
        os.path.join(REPO, "BENCH", "scaling_nodes.json"))
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "raw"}))


if __name__ == "__main__":
    main()
