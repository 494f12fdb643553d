"""10x scaling probe (reproducible form of the README's table).

Builds a 10x `documents` corpus from the bench scale dir — each of 10
replicas gets per-replica filler tokens appended so replicas are
NEAR-dups (they collide in shingle space) but not exact dups, keeping
true-pair volumes controlled — then times selected document-family
queries steady-state (untimed warm-up, min of two timed runs) at 1x
and 10x.

Usage: python tools/scaling_probe.py [query ...]
Defaults to the operators added in round 3. Writes the 10x corpus to
/tmp/sfprobe10x (rebuilt only if absent).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_and_spark_spark.registry import collect
from hadoop_and_spark_spark.session import get_spark

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = "/tmp/sfprobe10x"
REPLICAS = 10
DEFAULT_QUERIES = (
    "dedup_clusters",
    "tfidf_retrieval",
    "corpus_split",
    "multimodal_features",
    "boolean_retrieval_persisted",
    "spam_eval_trained",
)


def build_probe_corpus(spark) -> None:
    out = os.path.join(PROBE_DIR, "documents.parquet")
    if os.path.exists(out):
        return
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    reps = None
    for r in range(REPLICAS):
        part = docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.concat(
                F.col("text"),
                F.lit(f" probe{r}x"),
                (F.col("doc_id") % 97).cast("string"),
            ).alias("text"),
        ).select(*docs.columns)
        reps = part if reps is None else reps.unionByName(part)
    reps.write.mode("overwrite").parquet(out)


def steady_state(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).collect()  # warm-up: codegen + footer cache
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT_QUERIES)
    spark = get_spark("scaling-probe")
    build_probe_corpus(spark)
    queries, _ = collect()
    print(f"{'query':32s} {'1x':>7s} {'10x':>7s} {'growth':>7s}")
    for name in names:
        one = steady_state(queries[name], spark, BASE_SF)
        ten = steady_state(queries[name], spark, PROBE_DIR)
        print(f"{name:32s} {one:6.2f}s {ten:6.2f}s {ten / one:6.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
