"""Embedding similarity search (SURVEY.md §2 D25 + north-star ANN).

No reference analog; this is the north-star similarity surface over the
`embeddings` fixture (64-dim float vectors).

- brute-force cosine top-k: the correctness baseline. One broadcast of
  the query set, cosine as built-in higher-order functions (JVM-side,
  no UDF), window top-k.
- random-hyperplane SimHash buckets: the scale path — signatures are
  literal ±1 hyperplanes (precomputed constants, so the DuckDB oracle
  replays them exactly), candidates share an 8-bit bucket, exact cosine
  re-ranks. At 100 TB: bucket join instead of cross join turns O(N*Q)
  into O(sum over buckets |Q_b|*|N_b|); multi-probe or more planes tune
  recall. MLlib BucketedRandomProjectionLSH is the built-in equivalent
  (random, not oracle-reproducible — exercised in tests).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.hashing import KNUTH, MOD
from ..functions.vectors import as_double, cosine, cosine_sql
from ..plans.registry import register
from ._util import t

DIM = 64
N_PLANES = 8
PLANE_SEED = 6


def _plane_signs() -> list[list[float]]:
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


def _bucket_col(vec):
    signs = _plane_signs()
    from ..functions.vectors import dot

    return sum(
        F.when(dot(vec, F.array(*[F.lit(x) for x in signs[s]])) > 0, F.lit(1 << s)).otherwise(F.lit(0))
        for s in range(N_PLANES)
    )


def _bucket_sql(vec_expr: str) -> str:
    from ..functions.vectors import dot_sql

    signs = _plane_signs()
    return " + ".join(
        f"(CASE WHEN {dot_sql(vec_expr, _plane_sql(signs[s]))} > 0 THEN {1 << s} ELSE 0 END)"
        for s in range(N_PLANES)
    )


_BRUTE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({cosine_sql('q.qv', 'e.embedding')}, 6) + 0.0 AS cos_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT 'brute' AS method, query_id, neighbor_id, cos_sim, rk FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


def embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for sampled query vectors — the
    ANN correctness baseline. Query side broadcasts; cosine is pure
    column math (zip_with+aggregate), fully codegen'd."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(as_double(F.col("qv")), as_double(F.col("embedding"))), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= 5
    )


_SIMHASH_ANN_SQL = f"""
WITH sig AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM sig WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         round({cosine_sql('q.qv', 's.embedding')}, 6) + 0.0 AS cos_sim
  FROM q JOIN sig s ON s.bucket = q.bucket AND s.vec_id <> q.query_id
)
SELECT 'simhash' AS method, query_id, neighbor_id, cos_sim, rk FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk = 1
"""


def embedding_simhash_ann(spark, sf_dir):
    """LSH-bucketed ANN (scale path): 8 deterministic random-hyperplane
    signs -> 8-bit bucket, candidates = bucket-mates only, exact cosine
    re-rank, top-1. The equi-join on bucket replaces the cross join —
    this is what survives 100 TB; recall tunes via planes/multi-probe."""
    emb = t(spark, sf_dir, "embeddings")
    sig = emb.select("vec_id", "embedding", _bucket_col(as_double(F.col("embedding"))).alias("bucket"))
    q = sig.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    scored = q.join(sig, "bucket").where(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(as_double(F.col("qv")), as_double(F.col("embedding"))), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)


IVF_STRIDE = 64  # every 64th vector is a coarse centroid (deterministic)


_IVF_ANN_SQL = f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % {IVF_STRIDE} = 0),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qv, cid FROM assign WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         round({cosine_sql('q.qv', 'a.embedding')}, 6) + 0.0 AS cos_sim
  FROM q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.query_id
)
SELECT 'ivf' AS method, query_id, neighbor_id, cos_sim, rk FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
) WHERE rk = 1
"""


@register(
    "embedding_ann_topk",
    oracle=f"""
SELECT * FROM ({_BRUTE_SQL}) AS brute_part
UNION ALL
SELECT * FROM ({_SIMHASH_ANN_SQL}) AS simhash_part
UNION ALL
SELECT * FROM ({_IVF_ANN_SQL}) AS ivf_part
""",
    tags=("D25",),
    doc="Embedding similarity search, all three forms in one query "
    "discriminated by `method` (consolidated from embedding_cosine_topk "
    "/ embedding_simhash_ann / embedding_ivf_ann). 'brute': broadcast "
    "query set, exact cosine (zip_with+aggregate, fully codegen'd), "
    "window top-5 — the correctness baseline. 'simhash': 8 deterministic "
    "random-hyperplane signs -> 8-bit bucket, candidates = bucket-mates "
    "only, exact cosine re-rank, top-1 — the bucket equi-join replaces "
    "the cross join at 100 TB; recall tunes via planes/multi-probe. "
    "'ivf': deterministic coarse centroids (every 64th vector), vectors "
    "assigned to their max-cosine cell, queries probe their own cell "
    "only, exact re-rank inside — at 100 TB centroids come from sampled "
    "k-means (MLlib KMeans) with the identical cell-join shape.",
)
def embedding_ann_topk(spark, sf_dir):
    brute = embedding_cosine_topk(spark, sf_dir).select(
        F.lit("brute").alias("method"), "query_id", "neighbor_id", "cos_sim", "rk"
    )
    simhash = embedding_simhash_ann(spark, sf_dir).select(
        F.lit("simhash").alias("method"), "query_id", "neighbor_id", "cos_sim", "rk"
    )
    ivf = embedding_ivf_ann(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "cos_sim", "rk"
    )
    return brute.unionByName(simhash).unionByName(ivf)


def embedding_ivf_ann(spark, sf_dir):
    """IVF-style ANN (the other scale path): deterministic coarse
    centroids (every 64th vector), vectors assigned to their max-cosine
    cell, queries probe their own cell only, exact re-rank inside. At
    100 TB: centroids come from sampled k-means (MLlib KMeans), cells
    partition the index, multi-probe tunes recall — the cell join shape
    is identical to this oracle-checked form."""
    emb = t(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") % IVF_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid"))
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            cosine(as_double(F.col("embedding")), as_double(F.col("cv"))).alias("cos_c"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    q = assign.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cid"
    )
    scored = q.join(assign, "cid").where(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(as_double(F.col("qv")), as_double(F.col("embedding"))), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)


# Spliced into dedup.py's consolidated dedup_near_dup_pairs oracle
EMB_NEAR_DUP_SQL = f"""
WITH sig AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round({cosine_sql('a.embedding', 'b.embedding')}, 6) + 0.0 AS score
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.40
"""


def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs within LSH buckets (threshold 0.40
    sits inside the fixture's in-bucket cosine range — max 0.4145, 5
    pairs at sf0.01, nearest excluded pair 0.3994, so the check
    discriminates and no pair is within float-rounding of the cut): the
    embedding analog of minhash dedup — bucket join bounds comparisons
    at scale."""
    emb = t(spark, sf_dir, "embeddings")
    sig = emb.select("vec_id", "embedding", _bucket_col(as_double(F.col("embedding"))).alias("bucket"))
    a = sig.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket")
    cos = cosine(as_double(F.col("ea")), as_double(F.col("eb")))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cos >= 0.40)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )
