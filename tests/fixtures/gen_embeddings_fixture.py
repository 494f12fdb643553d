"""One-shot deterministic generator for embeddings_planted.parquet.

The driver testdata's embeddings are pure random — no pair clears a
production cosine threshold, which is why the registered
dedup_embedding contract runs at the test-only COSINE_T=0.4 with a
bucket cap. This fixture supplies what that corpus can't: PLANTED
near-duplicate pairs at production similarity (cosine ≥ 0.97), so
`dedup_embedding_strict` can demonstrate the uncapped
high-threshold path end-to-end (banding prunes, verify recovers
exactly the planted pairs).

Contents (all deterministic, seed 451):
- 500 base vectors (dim 64, unit-norm, float32) — vec_id 0..499
- 20 planted near-dups of base 0..19 at cosine ≥ 0.97 — vec_id 1000+i
- 5 mid-similarity distractors of base 100..104 at cosine ≈ 0.65 —
  vec_id 2000+i (below the strict threshold: they prove the verify
  filter, not just the banding)

The generator replicates the ENGINES' exact arithmetic — float32
storage rounding, then double-precision left-fold dot products in
element order (the same IEEE op sequence as functions.portable
dot_fold / the Arrow banding kernel) — and asserts that every planted
pair (a) shares at least one strict LSH band and (b) clears the
verify threshold, so fixture regeneration can never silently produce
a corpus the pipeline misses.

Run from the repo root: python tests/fixtures/gen_embeddings_fixture.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from hadoop_and_spark_spark.functions.portable import hyperplanes  # noqa: E402

DIM = 64
N_BASE = 500
N_PLANTED = 20
N_MID = 5
STRICT_BANDS = 4
STRICT_ROWS = 16
STRICT_T = 0.95
SEED = 451

_PLANES = np.asarray(hyperplanes(STRICT_BANDS * STRICT_ROWS, DIM, seed=7))


def _fold_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Left-fold dot product — the exact op sequence of portable
    dot_fold / dot_fold_sql (NOT np.dot, whose pairwise summation
    could flip near-zero signs)."""
    acc = 0.0
    for j in range(len(a)):
        acc += float(a[j]) * float(b[j])
    return acc


def _as_stored(v: np.ndarray) -> np.ndarray:
    """Engine view of a vector: float32 parquet storage read back and
    cast to double."""
    return v.astype(np.float32).astype(np.float64)


def _band_keys(v: np.ndarray) -> set[str]:
    sv = _as_stored(v)
    bits = ["1" if _fold_dot(sv, p) > 0 else "0" for p in _PLANES]
    return {
        f"{j}-" + "-".join(bits[j * STRICT_ROWS : (j + 1) * STRICT_ROWS])
        for j in range(STRICT_BANDS)
    }


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = _as_stored(a), _as_stored(b)
    na = np.sqrt(_fold_dot(sa, sa))
    nb = np.sqrt(_fold_dot(sb, sb))
    return _fold_dot(sa, sb) / (na * nb)


def main() -> None:
    rng = np.random.default_rng(SEED)
    base = rng.normal(size=(N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    ids = list(range(N_BASE))
    vecs = [base[i] for i in range(N_BASE)]

    for i in range(N_PLANTED):
        scale = 0.02
        while True:
            noisy = base[i] + rng.normal(scale=scale, size=DIM)
            noisy /= np.linalg.norm(noisy)
            cos = _cosine(base[i], noisy)
            shared = _band_keys(base[i]) & _band_keys(noisy)
            if cos >= 0.97 and shared:
                break
            scale *= 0.5  # tighten until the pair collides and clears
        ids.append(1000 + i)
        vecs.append(noisy)

    for i in range(N_MID):
        # cos ≈ 0.65: component mix with a fresh random direction
        r = rng.normal(size=DIM)
        r /= np.linalg.norm(r)
        mid = 0.65 * base[100 + i] + np.sqrt(1 - 0.65**2) * r
        mid /= np.linalg.norm(mid)
        assert _cosine(base[100 + i], mid) < STRICT_T - 0.05
        ids.append(2000 + i)
        vecs.append(mid)

    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [[float(np.float32(x)) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = Path(__file__).parent / "embeddings_planted.parquet"
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
