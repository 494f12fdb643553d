"""Isolated per-query timing (guide §1): one warm-up pass, then N
interleaved timed passes over the named queries, min per query —
bench.py's protocol scoped to a few queries for optimization work.

Usage: python tools/qtime.py [-n PASSES] <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.

Times .collect() (the bench action) so numbers are comparable with
BENCH_QUERIES.json rows; pass --noop to time a noop-sink write
instead (computes every column, excludes driver row transfer).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_and_spark_spark.registry import collect
from hadoop_and_spark_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    n_passes = 3
    noop = False
    if "-n" in args:
        i = args.index("-n")
        n_passes = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--noop" in args:
        noop = True
        args.remove("--noop")
    names = args
    spark = get_spark("qtime")
    queries, _ = collect()

    def run(name: str) -> float:
        gc.collect()
        spark.sparkContext.setJobDescription(f"qtime: {name}")
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        return time.perf_counter() - t0

    # warm-up (codegen + build-once artifacts + worker pool)
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(ncpu, numPartitions=ncpu).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()
    for name in names:
        run(name)
    passes = [{name: run(name) for name in names} for _ in range(n_passes)]
    out = {
        name: round(min(p[name] for p in passes), 3) for name in names
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
