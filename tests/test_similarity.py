"""Differential + property tests for similarity search."""

from __future__ import annotations

import pytest

from hadoop_and_spark_spark.operators import similarity
from hadoop_and_spark_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(similarity.ORACLE_SQL))
def test_similarity_vs_oracle(spark, sf_dir, name):
    ok, msg = compare(
        spark, sf_dir, similarity.QUERIES[name], similarity.ORACLE_SQL[name]
    )
    assert ok, f"{name}: {msg}"


def test_ivf_is_dominated_by_bruteforce(spark, sf_dir):
    """ANN invariant: for each query and rank, the IVF hit's cosine
    can never exceed the exact top-k hit at the same rank (IVF scores
    a subset of what brute force scores)."""
    bf = {
        (r.query_id, r.rank): r.cosine
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.cosine
        for r in similarity.knn_ivf(spark, sf_dir).collect()
    }
    assert ivf, "ivf returned no rows"
    for key, cos in ivf.items():
        assert cos <= bf[key] + 1e-9, key


def test_ivf_recall_reasonable(spark, sf_dir):
    """With NPROBE=4 of 16 lists the probed share of the corpus is
    ~25%; recall@k should beat that handily on clustered data."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_bruteforce(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_ivf(spark, sf_dir).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_ivf_recall_vs_exact(spark, sf_dir):
    """Pin the IVF recall/cost tradeoff: probing NPROBE/NCENTROIDS
    (= 1/4) of the corpus must recover well over the random-baseline
    fraction of the exact top-10 (probes are cosine-ranked, so recall
    beats the 0.25 a random partition choice would give)."""
    from hadoop_and_spark_spark.operators import similarity as S

    exact: dict[int, set] = {}
    for r in S.knn_bruteforce(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set] = {}
    for r in S.knn_ivf(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) > 0.4


def test_persisted_ivf_matches_in_session_and_prunes(spark, sf_dir):
    """The storage round-trip (write cid-partitioned inverted file →
    read → probe) must return exactly the in-session knn_ivf result,
    and the probe join must reach the index scan as DYNAMIC PARTITION
    PRUNING — at scale the search reads NPROBE·|queries| list
    directories, never the whole corpus."""
    import contextlib
    import io

    a = [tuple(r) for r in similarity.knn_ivf(spark, sf_dir).collect()]
    b = [
        tuple(r)
        for r in similarity.knn_ivf_persisted(spark, sf_dir).collect()
    ]
    assert a == b and a

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        similarity.knn_ivf_persisted(spark, sf_dir).explain("formatted")
    assert "dynamicpruningexpression" in buf.getvalue().lower()


def test_kmeans_objective_monotone_and_numpy_twin(spark, sf_dir):
    """Lloyd's invariants: the spherical objective (Σ best-cosine) is
    non-decreasing across iterations, and the trained centroids match
    an independent NumPy reimplementation of the same contract (seed =
    lowest vec_ids, cosine assignment with first-max tie-break, mean
    update, empty clusters keep their centroid) to FP tolerance."""
    import numpy as np

    from hadoop_and_spark_spark.operators import similarity as sim

    vec = sim._vectors(spark, sf_dir).localCheckpoint(eager=True)
    cents, hist = sim.train_spherical_kmeans(vec)
    assert all(b >= a - 1e-9 for a, b in zip(hist, hist[1:]))

    rows = sorted(vec.collect(), key=lambda r: r.vec_id)
    X = np.array([r.emb for r in rows])
    nrm = np.linalg.norm(X, axis=1)
    k = sim.NCENTROIDS
    seeds = [r for r in rows if r.vec_id < k]
    C = np.array([r.emb for r in seeds])
    for _ in range(sim.KMEANS_ITERS):
        cos = (X @ C.T) / np.outer(nrm, np.linalg.norm(C, axis=1))
        assign = np.argmax(cos, axis=1)  # first max = lowest cid
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    got = np.array([emb for _cid, emb, _nrm in cents])
    np.testing.assert_allclose(got, C, rtol=1e-6, atol=1e-9)


def test_ivf_kmeans_recall_beats_seed_model(spark, sf_dir):
    """Plugging trained centroids into the unchanged IVF plan must not
    lose retrieval quality: recall@K_NN vs the exact bruteforce stays
    above an absolute floor and at least matches the seed-centroid
    model minus a small slack (trained lists are better balanced, so
    equal-probe recall should not degrade)."""
    from hadoop_and_spark_spark.operators import similarity as sim

    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.knn_bruteforce(spark, sf_dir).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id)
        for r in sim.knn_ivf_kmeans(spark, sf_dir).collect()
    }
    seed = {
        (r.query_id, r.neighbor_id) for r in sim.knn_ivf(spark, sf_dir).collect()
    }
    r_trained = len(trained & exact) / len(exact)
    r_seed = len(seed & exact) / len(exact)
    assert r_trained >= 0.5
    assert r_trained >= r_seed - 0.05


def test_np_assignment_matches_fold(spark, sf_dir):
    """The Arrow assignment kernel must agree with the bit-portable
    fold assignment on every vector (same highest-cosine contract,
    same first-max tie rule) — the declarative differential reference
    for the kernel used on the trained-model paths."""
    from hadoop_and_spark_spark.operators import similarity as sim

    vec = sim._vectors(spark, sf_dir).localCheckpoint(eager=True)
    seed = vec.where("vec_id < %d" % sim.NCENTROIDS).orderBy("vec_id").collect()
    cents = [(i, list(r.emb), float(r.nrm)) for i, r in enumerate(seed)]
    fold = {r.vec_id: r.cid for r in sim._assign_rows(vec, cents).collect()}
    np_ = {r.vec_id: r.cid for r in sim._assign_np(vec, cents).collect()}
    assert fold == np_ and fold


def test_embedding_quantize_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized values must sit within scale/2 of the original
    (the defining property of round-to-nearest symmetric
    quantization) and every q must fit int8."""
    import pyspark.sql.functions as F

    from hadoop_and_spark_spark.catalog import load_table

    rows = similarity.embedding_quantize(spark, sf_dir).collect()
    assert rows
    orig = {
        (r.vec_id, i): float(x)
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding"))
        .collect()
        for i, x in enumerate(r.embedding)
    }
    for r in rows:
        assert -127 <= r.q <= 127
        # r.scale is rounded to 6 dp for the driver hash; the bound
        # below loosens accordingly.
        assert abs(orig[(r.vec_id, r.dim)] - r.q * r.scale) <= r.scale / 2 + 1e-4


def test_embedding_pca_matches_numpy_twin_and_orders_variance(spark, sf_dir):
    """The distributed sufficient-statistics PCA must agree with a
    single-machine NumPy PCA over the collected corpus (tolerance:
    partition-order FP drift only), with eigenvalues descending."""
    import numpy as np

    comps, evals, n = similarity._pca_components(spark, sf_dir)
    assert len(comps) == similarity.PCA_K and n > 0
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(len(evals) - 1))

    vec = similarity._vectors(spark, sf_dir).collect()
    X = np.array([list(r.emb) for r in vec])
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][: similarity.PCA_K]
    for k, idx in enumerate(order):
        tv = v[:, idx]
        if tv[np.argmax(np.abs(tv))] < 0:
            tv = -tv
        assert abs(w[idx] - evals[k]) <= 1e-8 * max(1.0, abs(w[idx]))
        assert np.max(np.abs(tv - np.array(comps[k]))) < 1e-6

    # projected coords match X @ W^T within round6 + FP tolerance
    got = {
        (r.vec_id, r.k): r.coord
        for r in similarity.embedding_pca(spark, sf_dir).collect()
    }
    W = np.array(comps)
    P = X @ W.T
    ids = [r.vec_id for r in vec]
    for row, vid in enumerate(ids):
        for k in range(similarity.PCA_K):
            assert abs(got[(vid, k)] - P[row, k]) < 2e-6
