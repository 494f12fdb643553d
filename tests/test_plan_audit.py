"""Registry-wide physical-plan audit.

The per-query pins in test_plans.py check specific plan shapes; this
audit sweeps EVERY registered query's executed plan for the three
antipatterns that silently kill a plan at 100×:

- ``CartesianProduct`` — a non-broadcast cross join (the 1-row
  footer-count cross joins used throughout plan as
  BroadcastNestedLoopJoin over a single row, which is fine and NOT
  flagged).
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan; every
  Python kernel in this engine must be Arrow-batched
  (``ArrowEvalPython`` / ``MapInPandas``).
- An UNPARTITIONED window over unbounded input — the "move the corpus
  to one task" trap (round-3 tfidf bug). Unpartitioned windows are
  allowed only with a boundedness witness in the same plan:
  rank-after-limit (TakeOrderedAndProject feeds the window ≤ k rows)
  or a window over a DISTINCT-VALUE aggregate (cardinality bounded by
  the value domain, not the corpus).
"""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.registry import collect

# Unpartitioned rank window over an orderBy+limit result (≤ k rows);
# witness: TakeOrderedAndProject in the same plan.
RANK_AFTER_LIMIT = {
    "tfidf_retrieval",
    "bm25_retrieval",
    "hybrid_retrieval",
    # vocab ids: row_number over the top-V cut (≤ VOCAB_SIZE rows)
    "doc_token_ids",
}
# Unpartitioned running window over a distinct-score aggregate —
# cardinality is the score domain (bounded ints), never row count.
DISTINCT_VALUE_WINDOW = {"spam_eval", "spam_eval_trained"}

# Queries whose OUTPUT row count is corpus-proportional (≥ ~1 row per
# input document/event/vector, or an exploded multiple of it). These
# must never plan a range-partitioning Exchange (global Sort): the
# driver hash is order-insensitive, consumers need at most
# within-partition order, and at 100× a global sort of the largest
# outputs in the registry is a full extra shuffle bought purely for
# presentation. Small/domain-bounded outputs (vocab tables, hourly
# rollups, top-k) may keep their presentation orderBy — not listed.
CORPUS_SIZED_OUTPUT = {
    "corpus_split",
    "corpus_training_set",
    "decontaminate",
    "dedup_exact",
    "dedup_exact_stream",
    "dedup_simhash",
    "dedup_survivors",
    "dedup_clusters",
    "doc_chunks",
    "doc_hashed_features",
    "doc_perplexity",
    "doc_quality",
    "doc_token_ids",
    "embedding_quantize",
    "langid_heuristic",
    "multimodal_decode",
    "multimodal_features",
    "multimodal_frames",
    "next_event_pairs",
    "pack_sequences",
    "pii_scrub",
    "pseudonymize_events",
    "purchase_click_pairs",
    "repetition_filter",
    "spam_ensemble",
    "spam_score",
    "stratified_sample",
    "token_stats",
    "user_sessions",
    "user_sessions_stream",
    "value_outliers",
    "winnow_fingerprint",
    "asof_attribution",
    "range_join_counts",
    # keyed-cardinality, not strictly per-event, but ~one row per user
    # (10^9 at 100 TB): same no-global-sort rule applies
    "latest_snapshot",
    "cdc_upsert_stream",
}


def _unpartitioned_window_lines(plan: str) -> list[str]:
    # Window node format: `Window [exprs], [partition], [order]`
    # (3 bracket groups). Two groups means partition-only (`sum over
    # (partition by a)` — fine) OR order-only (unpartitioned — the
    # trap). They're told apart by the trailing group: sort specs
    # carry ASC/DESC markers, partition columns don't.
    out = []
    for line in plan.splitlines():
        if "Window [" not in line or "windowspecdefinition" not in line:
            continue
        if line.count("], [") != 1:
            continue
        tail = line.rsplit("], [", 1)[1]
        if " ASC" in tail or " DESC" in tail:
            out.append(line)
    return out


def test_no_query_plans_an_antipattern(spark, sf_dir):
    queries, _ = collect()

    def audit(name: str) -> None:
        fn = queries[name]
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, "CartesianProduct"
        assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF"
        if name in CORPUS_SIZED_OUTPUT:
            assert "rangepartitioning" not in plan, (
                "range-partition Exchange (global sort) on a "
                "corpus-sized output — use sortWithinPartitions"
            )
        unpart = _unpartitioned_window_lines(plan)
        if unpart:
            if name in RANK_AFTER_LIMIT:
                assert "TakeOrderedAndProject" in plan, (
                    "unpartitioned window lost its limit witness"
                )
            elif name in DISTINCT_VALUE_WINDOW:
                assert "HashAggregate" in plan, (
                    "unpartitioned window lost its distinct-value witness"
                )
            else:
                raise AssertionError(
                    f"unbounded unpartitioned window: {unpart[0].strip()[:120]}"
                )

    from conftest import run_queries_concurrently

    run_queries_concurrently(sorted(queries), audit)


def test_corpus_sized_set_is_not_stale(spark, sf_dir):
    """Every CORPUS_SIZED_OUTPUT query must still be registered — a
    renamed/dropped query would quietly stop auditing its plan."""
    queries, _ = collect()
    missing = CORPUS_SIZED_OUTPUT - set(queries)
    assert not missing, f"audit set names unregistered queries: {missing}"


def test_allowlists_are_not_stale(spark, sf_dir):
    """Every allowlisted query must still HAVE an unpartitioned window
    — a stale allowlist entry would quietly stop auditing it."""
    queries, _ = collect()
    for name in sorted(RANK_AFTER_LIMIT | DISTINCT_VALUE_WINDOW):
        plan = (
            queries[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert _unpartitioned_window_lines(plan), name


@pytest.mark.parametrize("name", sorted(RANK_AFTER_LIMIT))
def test_rank_after_limit_witness(spark, sf_dir, name):
    queries, _ = collect()
    plan = (
        queries[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
