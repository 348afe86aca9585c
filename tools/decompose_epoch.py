"""Decompose one epoch's cost at a given parallelism: which phase dominates?

Variants (cumulative plan prefixes, all ending in an action):
  scan        read epoch files -> noop write
  shuffle     + repartition_by_bucket -> noop
  resolve     + resolve_latest_agg -> noop
  encrypt     + FieldTransform -> noop
  write       + parquet write (the real thing)

Usage: PYTHONPATH=/root/repo python tools/decompose_epoch.py <cpus> [epoch]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cdcrypt.operators.dedup import resolve_latest_agg
from cdcrypt.operators.transform import FieldTransform, TransformConfig
from cdcrypt.session import get_spark
from cdcrypt.streaming.pipeline import list_epochs
from cdcrypt.table.lake import repartition_by_bucket

BENCH_DIR = os.environ.get("CDCRYPT_BENCH_DIR", "/dev/shm/cdcrypt_scaling")


def main() -> None:
    cpus = int(sys.argv[1])
    epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    buckets = int(os.environ.get("CDCRYPT_BUCKETS", "64"))
    stream = os.path.join(BENCH_DIR, "stream_sf0.1")
    files = list_epochs(stream)[epoch]

    spark = get_spark("decomp", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    enc = FieldTransform(TransformConfig(
        mode="encrypt", fields=["$.text", "$.tool"],
        key_id="cdcrypt/transcripts", aad_field="conv_id"))

    def build(variant: str):
        df = spark.read.parquet(*files)
        if variant == "scan":
            return df
        df = repartition_by_bucket(df, buckets)
        if variant == "shuffle":
            return df
        df = resolve_latest_agg(df)
        if variant == "resolve":
            return df
        df = enc.apply(df)
        return df

    out_dir = os.path.join(BENCH_DIR, f"decomp_{cpus}")
    results = {}
    for variant in ("scan", "shuffle", "resolve", "encrypt", "write"):
        for rep in range(2):
            df = build(variant)
            t0 = time.monotonic()
            if variant == "write":
                shutil.rmtree(out_dir, ignore_errors=True)
                df.write.mode("overwrite").option("compression", "none") \
                    .parquet(out_dir)
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
        results[variant] = round(dt, 2)
        print(variant, round(dt, 2), flush=True)
    print({"cpus": cpus, **results})


if __name__ == "__main__":
    main()
