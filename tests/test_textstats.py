"""Differential + property tests for text-analysis operators."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import textstats
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(textstats.QUERIES))
def test_textstats_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(
        spark, sf_dir, textstats.QUERIES[name], textstats.ORACLE_SQL[name]
    )
    assert ok, f"{name}: {msg}"


def test_langid_deterministic_and_total(spark, sf_dir):
    rows = textstats.langid_heuristic(spark, sf_dir).collect()
    preds = {r.lang_pred for r in rows}
    assert preds <= set(textstats._LANGS) | {"und"}
    assert all(r.hits >= 0 for r in rows)


def test_quality_bounded(spark, sf_dir):
    rows = textstats.doc_quality(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0 + 1e-9, r
        assert 0.0 <= r.distinct_ratio <= 1.0 + 1e-9, r


def test_winnow_kernel_matches_expression(spark):
    """The Arrow kernel must be bit-identical to the declarative
    winnow_fp_expr on adversarial strings: empty, shorter than the
    gram size, exactly gram-sized, shorter than the window, repeated
    chars, and non-ASCII (code points, not UTF-8 bytes)."""
    import pyspark.sql.functions as F

    cases = [
        "",
        "a",
        "abcdefg",          # len == FP_K - 1 → single whole-string gram
        "abcdefgh",         # len == FP_K → one gram
        "abcdefghij",       # grams shorter than FP_W → one window min
        "aaaaaaaaaaaaaaaa",  # all-equal grams → distinct collapses to 1
        "abcdefghijklmnopqrstuvwxyz" * 3,
        "café au lait, naïve façade",
        "你好世界 abc def ghi jkl",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    expr = {
        r.doc_id: list(r.fp)
        for r in df.select("doc_id", textstats.winnow_fp_expr().alias("fp")).collect()
    }
    for i, t in enumerate(cases):
        got = textstats._winnow_doc(t).tolist()
        assert got == expr[i], (repr(t), got, expr[i])


def test_winnow_fingerprint_detects_near_dups(spark, sf_dir):
    """Planted near-duplicate docs must share a large fraction of
    winnowing fingerprints (the property the operator exists for)."""
    from hadoop_and_spark_spark.operators import dedup

    dup_pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    ]
    assert dup_pairs
    fps = {
        r.doc_id: set(r.fingerprint.split(","))
        for r in textstats.winnow_fingerprint(spark, sf_dir).collect()
    }
    a, b = dup_pairs[0]
    inter = len(fps[a] & fps[b])
    union = len(fps[a] | fps[b])
    assert inter / union >= 0.5, (a, b, inter, union)


def test_corpus_split_total_and_proportions(spark, sf_dir):
    """Every doc gets exactly one split; proportions land near the
    90/5/5 contract (content-hash bucketing is only approximately
    uniform on a finite corpus)."""
    rows = textstats.corpus_split(spark, sf_dir).collect()
    n = len(rows)
    counts = {}
    for r in rows:
        assert (r.bucket < textstats.SPLIT_TRAIN_LT) == (r.split == "train")
        counts[r.split] = counts.get(r.split, 0) + 1
    assert sum(counts.values()) == n and set(counts) == {"train", "val", "test"}
    assert 0.8 < counts["train"] / n < 0.97


def test_corpus_split_content_stable(spark, sf_dir):
    """Assignment depends only on content: re-iding the corpus (new
    doc_ids, same text) must produce the identical text→split map."""
    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.catalog import load_table

    base = textstats.corpus_split(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = docs.join(base, "doc_id").select("text", "split")
    # two docs with identical text must land in the same split
    per_text = joined.groupBy("text").agg(
        F.count_distinct("split").alias("k")
    )
    assert per_text.agg(F.max("k")).first()[0] == 1


def test_stratified_sample_tracks_rates(spark, sf_dir):
    """Per-stratum keep fractions must land near the configured
    thousandth-rates (content bucketing is only approximately uniform
    on a finite corpus) and every kept row must satisfy its own
    bucket < rate predicate."""
    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.catalog import load_table

    kept = textstats.stratified_sample(spark, sf_dir).collect()
    for r in kept:
        assert r.bucket < r.rate_k
        want = textstats.SAMPLE_RATES_K.get(r.lang, textstats.SAMPLE_DEFAULT_K)
        assert r.rate_k == want
    totals = {
        r.lang: r.c
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    by_lang = {}
    for r in kept:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    for lang, total in totals.items():
        rate = textstats.SAMPLE_RATES_K.get(
            lang, textstats.SAMPLE_DEFAULT_K
        ) / textstats.SAMPLE_BUCKETS
        got = by_lang.get(lang, 0) / total
        assert abs(got - rate) < 0.22, (lang, got, rate)


def _mini_docs(spark, tmp_path, texts):
    """Write a documents.parquet-shaped corpus into a tmp sf_dir."""
    rows = [
        (i, t, "en", "unit", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_repetition_filter_flags_degenerate_docs(spark, tmp_path):
    good = "the quick brown fox jumps over a lazy dog near the old river bank today"
    spammy = "buy now " * 30          # one bigram repeated: dup3 ≈ 1
    monotone = "spam " * 50           # single token: top share = 1
    d = _mini_docs(spark, tmp_path, [good, spammy, monotone])
    rows = {r.doc_id: r for r in textstats.repetition_filter(spark, d).collect()}
    assert rows[0].keep and rows[0].dup3_ratio < 0.05
    assert not rows[1].keep and rows[1].dup3_ratio > 0.9
    assert not rows[2].keep and rows[2].top_tok_share == 1.0


def test_doc_chunks_cover_and_overlap(spark, sf_dir):
    from collections import defaultdict

    from hadoop_and_spark_spark.operators.textstats import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunks,
        token_stats,
    )

    chunks = defaultdict(list)
    for r in doc_chunks(spark, sf_dir).collect():
        chunks[r.doc_id].append(r)
    n_tok = {
        r.doc_id: r.ws_tokens for r in token_stats(spark, sf_dir).collect()
    }
    for doc_id, ch in chunks.items():
        ch.sort(key=lambda r: r.chunk_id)
        starts = [r.start for r in ch]
        assert starts == [1 + k * CHUNK_STRIDE for k in range(len(ch))]
        # every chunk bounded; all but the last full-size when doc is long
        for r in ch[:-1]:
            assert r.n_chunk_tokens == CHUNK_TOKENS
        last = ch[-1]
        # the final chunk reaches the end of the token stream exactly
        assert last.start + last.n_chunk_tokens - 1 == max(
            n_tok[doc_id], 1
        ) or n_tok[doc_id] < CHUNK_TOKENS


def test_doc_chunks_exact_small_doc(spark, tmp_path):
    from hadoop_and_spark_spark.operators.textstats import doc_chunks

    d = _mini_docs(spark, tmp_path, ["alpha beta gamma", " ".join(f"t{i}" for i in range(80))])
    rows = sorted(
        doc_chunks(spark, d).collect(), key=lambda r: (r.doc_id, r.chunk_id)
    )
    short = [r for r in rows if r.doc_id == 0]
    assert len(short) == 1 and short[0].chunk_text == "alpha beta gamma"
    long = [r for r in rows if r.doc_id == 1]
    # n=80: ceil((80-32)/24)+1 = 3 chunks, starts 1, 25, 49
    assert [r.start for r in long] == [1, 25, 49]
    assert [r.n_chunk_tokens for r in long] == [32, 32, 32]
    assert long[-1].chunk_text.endswith("t79")


def test_pii_scrub_redacts_planted_pii(spark):
    rows = textstats.pii_scrub(spark, "ignored").collect()
    total = {
        "emails": sum(r.n_emails for r in rows),
        "ips": sum(r.n_ips for r in rows),
        "phones": sum(r.n_phones for r in rows),
    }
    # the committed fixture plants a non-trivial amount of each type
    assert min(total.values()) > 20, total
    for r in rows:
        assert "@" not in r.clean_text
        assert r.has_pii == (r.n_emails + r.n_ips + r.n_phones > 0)
        # every planted marker is typed, never a bare digit run left
        if r.n_emails:
            assert "<EMAIL>" in r.clean_text
        if r.n_ips:
            assert "<IP>" in r.clean_text
        if r.n_phones:
            assert "<PHONE>" in r.clean_text


def test_pack_sequences_layout_invariants(spark, sf_dir):
    """Concat-then-split packing invariants: within each bucket,
    offsets are exactly contiguous (each doc starts where the previous
    ended), every doc's sequence is the one containing its first
    token, seq ids encode their bucket, and total laid-out tokens
    equal the corpus token count (nothing dropped or double-laid)."""
    from hadoop_and_spark_spark.operators.textstats import (
        PACK_BUCKETS,
        SEQ_BUDGET,
        pack_sequences,
    )

    rows = pack_sequences(spark, sf_dir).collect()
    assert rows
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) <= set(range(PACK_BUCKETS))
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rs:
            assert r.start_off == off
            assert r.seq_id == bucket * 1_000_000_000 + r.start_off // SEQ_BUDGET
            off += r.n_tokens

    from hadoop_and_spark_spark.catalog import load_table
    from hadoop_and_spark_spark.functions import tokenize
    from pyspark.sql import functions as F

    corpus_tokens = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(tokenize("text")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r.n_tokens for r in rows) == corpus_tokens


def test_null_text_semantics_per_query(spark, tmp_path):
    """The per-query NULL contract, pinned at unit scale (the corpus
    sweep in test_sources proves engine/oracle parity; this states the
    intended row shapes so a future 'fix' can't silently flip them):
    NULL text → NULL fingerprint row, NULL split, NO chunks, NULL
    quality signals with NULL keep, NULL hashed features — while ''
    stays CONTENT (it fingerprints, splits, and chunks as the
    empty-token document)."""
    import os

    from pyspark.sql import functions as F

    from hadoop_and_spark_spark.catalog import TABLES, load_table

    docs = spark.createDataFrame(
        [(1, None, "en", "s"), (2, "", "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text").cast("long"))
    d = str(tmp_path / "nulldoc")
    os.makedirs(d)
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.parquet(
        os.path.join(d, "documents.parquet")
    )
    for t in TABLES:
        if t != "documents":
            load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
                os.path.join(d, f"{t}.parquet")
            )

    fp = {r.doc_id: r for r in textstats.winnow_fingerprint(spark, d).collect()}
    assert fp[1].n_fp is None and fp[1].fingerprint is None
    assert fp[2].n_fp == 1 and fp[2].fingerprint is not None

    sp = {r.doc_id: r for r in textstats.corpus_split(spark, d).collect()}
    assert sp[1].bucket is None and sp[1].split is None
    assert sp[2].bucket is not None and sp[2].split in ("train", "val", "test")

    ch = textstats.doc_chunks(spark, d).collect()
    assert {r.doc_id for r in ch} == {2}, "NULL text must yield no chunks"

    rf = {r.doc_id: r for r in textstats.repetition_filter(spark, d).collect()}
    assert rf[1].n_tokens is None and rf[1].dup3_ratio is None
    assert rf[1].top_tok_share is None and rf[1].keep is None
    assert rf[2].keep is not None

    hf = {r.doc_id: r for r in textstats.doc_hashed_features(spark, d).collect()}
    assert hf[1].n_features is None and hf[1].features is None
    assert hf[2].n_features == 0 and hf[2].features == ""
