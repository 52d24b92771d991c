"""Deterministic random-hyperplane LSH primitives for embedding
similarity (shared by operators/similarity.py and the consolidated
near-dup oracle in operators/dedup.py — lives here, below the operator
layer, so neither operator module has to import the other at
registration time).

The ±1 hyperplanes are precomputed integer-hash constants, so the
DuckDB oracle replays the exact bucket assignment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .hashing import KNUTH, MOD
from .vectors import cosine_sql, dot, dot_sql

DIM = 64
N_PLANES = 8
PLANE_SEED = 6


def plane_signs() -> list[list[float]]:
    """Deterministic ±1 hyperplanes, precomputed so both engines share them."""
    return [
        [
            1.0 if ((s + 1) * KNUTH + (j + 1) * 40503 + PLANE_SEED * 97) % MOD % 2 == 0 else -1.0
            for j in range(DIM)
        ]
        for s in range(N_PLANES)
    ]


def _plane_sql(signs: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in signs) + "]"


def bucket_col(vec):
    signs = plane_signs()
    return sum(
        F.when(dot(vec, F.array(*[F.lit(x) for x in signs[s]])) > 0, F.lit(1 << s)).otherwise(F.lit(0))
        for s in range(N_PLANES)
    )


def bucket_sql(vec_expr: str) -> str:
    signs = plane_signs()
    return " + ".join(
        f"(CASE WHEN {dot_sql(vec_expr, _plane_sql(signs[s]))} > 0 THEN {1 << s} ELSE 0 END)"
        for s in range(N_PLANES)
    )


# Embedding-cosine near-dup pairs within LSH buckets — spliced into the
# consolidated dedup_near_dup_pairs oracle (operators/dedup.py).
EMB_NEAR_DUP_SQL = f"""
WITH sig AS (
  SELECT vec_id, embedding, {bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round({cosine_sql('a.embedding', 'b.embedding')}, 6) + 0.0 AS score
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.40
"""

# IVF coarse-cell constants + the SemDeDup pair oracle (r9) — also below
# the operator layer for the same registration-time reason. Centroids are
# every IVF_STRIDE-th vector (a literal rule both engines replay);
# SEMANTIC_T sits in a measured gap of the fixture's in-cell cosine
# distribution (see operators/similarity.py for the margins).
IVF_STRIDE = 64
SEMANTIC_T = 0.422

SEMANTIC_PAIRS_SQL = f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % {IVF_STRIDE} = 0),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cosine_sql('a.embedding', 'b.embedding')}, 6) + 0.0 AS cos_sim
FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {SEMANTIC_T}
"""
