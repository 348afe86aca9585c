"""Phase-level profiling of the CDC replay at one parallelism level.

Usage: PYTHONPATH=/root/repo python tools/profile_epoch.py <cpus> [spec]
Prints per-epoch lineage incl. timings {delta_write_sec, delta_manifest_sec,
commit_sec, merge_total_sec} so the serial fraction is attributable.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cdcrypt.session import get_spark
from cdcrypt.sources.changegen import GenSpec, generate_to_dir
from cdcrypt.streaming.pipeline import IngestPipeline

BENCH_DIR = os.environ.get("CDCRYPT_BENCH_DIR", "/dev/shm/cdcrypt_scaling")
SPECS = {
    "sf0.1": GenSpec(n_convs=60000, avg_turns=35, n_epochs=6, text_repeat=6),
    "sf0.02": GenSpec(n_convs=12000, avg_turns=35, n_epochs=6, text_repeat=6),
}


def main() -> None:
    cpus = int(sys.argv[1])
    spec_name = sys.argv[2] if len(sys.argv) > 2 else "sf0.1"
    stream = os.path.join(BENCH_DIR, f"stream_{spec_name}")
    marker = os.path.join(stream, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(BENCH_DIR, exist_ok=True)
        stats = generate_to_dir(stream, SPECS[spec_name], files_per_epoch=16)
        with open(marker, "w") as f:
            json.dump({k: v for k, v in stats.items() if k != "files"}, f)
    with open(marker) as f:
        n_events = json.load(f)["events"]

    evlog = os.path.join(BENCH_DIR, "eventlog")
    os.makedirs(evlog, exist_ok=True)
    spark = get_spark("prof", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2,
                      extra_conf={"spark.eventLog.enabled": "true",
                                  "spark.eventLog.dir": evlog})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    root = os.path.join(BENCH_DIR, f"prof_t_{cpus}")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_ck", ignore_errors=True)
    pipe = IngestPipeline(stream, root, root + "_ck", bucket_count=64)
    t0 = time.monotonic()
    res = pipe.run(spark)
    wall = time.monotonic() - t0
    for r in res:
        print(json.dumps({k: r.get(k) for k in
                          ("epoch", "batch_rows", "wall_sec", "timings")}))
    print(json.dumps({"cpus": cpus, "wall": round(wall, 2),
                      "eps": round(n_events / wall)}))


if __name__ == "__main__":
    main()
