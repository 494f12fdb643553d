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
PROBE_GEN = 3  # bump when the replica-generation recipe changes
# The probe dir materializes ONLY documents.parquet, events.parquet,
# and embeddings.parquet, so every entry here must read just those.
# documents grow as near-dup replica families (dedup realism); events
# grow by replicating users (user_id offset per replica) so per-user
# stream structure — sessions, as-of, range windows — is preserved
# while the corpus 10x-es along the realistic axis (more users).
DEFAULT_QUERIES = (
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "dedup_minhash_lsh",
    "tfidf_retrieval",
    "corpus_split",
    "stratified_sample",
    "multimodal_features",
    "boolean_retrieval_persisted",
    "spam_eval_trained",
    "asof_attribution",
    "user_sessions",
    "range_join_counts",
    # round-4 session additions (documents/events/embeddings only)
    "pack_sequences",
    "value_outliers",
    "funnel_counts",
    "cohort_retention",
    "kmeans_centroids",
    "knn_ivf_kmeans",
    # round-5 additions (all memoized paths probe COLD — the memo is
    # cleared per timed run; documents/events/embeddings only)
    "dedup_survivors",
    "doc_token_ids",
    "embedding_quantize",
    "embedding_pca",
    "trending_arrivals_stream",
    "event_count_hourly_stream",
    "boolean_retrieval",
    "knn_ivf",
    "spam_train",
)


def _probe_marker() -> str:
    """Cache key for the probe corpus: base path + base mtime +
    generator version. A marker mismatch (stale base data, older
    generator, different SPARK_GRAFT_SF_DIR) forces a rebuild instead
    of silently feeding stale 10x data into the published table."""
    base = os.path.join(BASE_SF, "documents.parquet")
    mtime = int(os.stat(base).st_mtime) if os.path.exists(base) else -1
    return f"{os.path.abspath(base)}|{mtime}|gen{PROBE_GEN}|reps{REPLICAS}"


def build_probe_corpus(spark) -> None:
    out = os.path.join(PROBE_DIR, "documents.parquet")
    marker_path = os.path.join(PROBE_DIR, "MARKER")
    marker = _probe_marker()
    if os.path.exists(out) and os.path.exists(marker_path):
        with open(marker_path) as fh:
            if fh.read() == marker:
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

    ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    ev_reps = None
    for r in range(REPLICAS):
        part = ev.select(
            (F.col("event_id") + r * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        ).select(*ev.columns)
        ev_reps = part if ev_reps is None else ev_reps.unionByName(part)
    ev_reps.write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "events.parquet")
    )

    # embeddings: replicate with offset vec_ids, vectors UNCHANGED —
    # grows the searched corpus 10x for the retrieval family
    # (knn/hybrid probe the fixed query set against more vectors).
    # NOT for the embedding-dedup probes: identical replicas are
    # exact dups and would saturate any near-dup threshold.
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    emb_reps = None
    for r in range(REPLICAS):
        part = emb.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        ).select(*emb.columns)
        emb_reps = part if emb_reps is None else emb_reps.unionByName(part)
    emb_reps.write.mode("overwrite").parquet(
        os.path.join(PROBE_DIR, "embeddings.parquet")
    )
    with open(marker_path, "w") as fh:
        fh.write(marker)


# Queries whose cost is memoized per (session, corpus) have EVERY
# in-session cache cleared before each timed run, so the published
# growth number includes the iterative compute (training /
# convergence / pair mining), not just the cached extract.
def _clear_memo_caches(name: str) -> None:  # noqa: ARG001 — kept for call sites
    from hadoop_and_spark_spark.sources.maintenance import clear_session_caches

    clear_session_caches()


def steady_state(name, fn, spark, sf_dir: str) -> float:
    _clear_memo_caches(name)
    fn(spark, sf_dir).collect()  # warm-up: codegen + footer cache
    best = float("inf")
    for _ in range(2):
        _clear_memo_caches(name)
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
        one = steady_state(name, queries[name], spark, BASE_SF)
        ten = steady_state(name, queries[name], spark, PROBE_DIR)
        print(f"{name:32s} {one:6.2f}s {ten:6.2f}s {ten / one:6.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
