"""End-to-end corpus curation pipeline (north-star LLM-data surface):

    quality gate -> exact-dedup keeper -> near-dup canonical -> split

One DataFrame out with a per-document DECISION — the composition a
100 TB training-data pipeline actually runs, built entirely from this
repo's own proven stages so the whole pipeline stays oracle-checkable:

- stage 1 quality: structural gate (n_chars >= CURATE_MIN_CHARS and
  whitespace-token count >= CURATE_MIN_TOKENS; null text fails). The
  thresholds are deliberately simple length signals — the richer
  Gopher-style signals live in text_profile and compose the same way.
- stage 2 exact dedup: survivors keep only the min-doc_id keeper per
  normalized content hash (casefold + whitespace-collapse + trim +
  sha256 — dedup_exact's 'normalized' form, recomputed over the
  survivor set so a rejected doc can't crowd out a surviving copy).
- stage 3 near-dup: MinHash-LSH pairs computed on the SURVIVOR subset
  (pair membership depends only on the two docs' signatures, so this
  equals the full-corpus pair set filtered to survivor endpoints —
  which is exactly what the oracle computes), clustered with the
  alternating star connected-components operator; only each cluster's
  min-doc_id canonical survives.
- stage 4 split: the stratified seeded-ntile train/valid/test split
  over the final survivors (train_test_split's exact mechanics).

Decision vocabulary (the `split` column of part='curated' rows):
'rejected:quality' | 'rejected:exact_dup' | 'rejected:near_dup' |
'train' | 'valid' | 'test'. Every input document appears exactly once.

Scale shape: stage 1 is map-only; stage 2 one shuffle on the content
hash; stage 3 is the banded-LSH equi-join plus ~log n CC rounds (two
shuffles/round); stage 4 one window shuffle on the stratum key. No
stage materializes to the driver beyond CC's bounded convergence probe.
At 100 TB each stage's survivor set only shrinks, so the expensive
stages run on ever-smaller inputs — the pipeline is strictly cheaper
than running its stages standalone.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.hashing import int_hash
from ..functions.text import tokens
from ._dedup_core import star_connected_components
from ._util import t

CURATE_MIN_CHARS = 100
CURATE_MIN_TOKENS = 15
N_TILES = 10  # 8/1/1 like train_test_split
CURATE_SEED = 77  # same seeded permutation as the plain split


def corpus_curate(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_toks"),
    )

    # stage 1 — quality gate (null text: both comparisons go NULL and
    # the filter/CASE treat non-true as reject, identically in DuckDB)
    q_ok = (F.col("n_chars") >= CURATE_MIN_CHARS) & (
        F.col("n_toks") >= CURATE_MIN_TOKENS
    )
    surv1 = base.where(q_ok)

    # stage 2 — exact-dup keeper among quality survivors
    nh = F.sha2(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 256)
    surv1k = surv1.withColumn(
        "e_ok",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy(nh)),
    )
    surv2 = surv1k.where("e_ok").select("doc_id", "lang", "source")

    # stage 3 — near-dup canonical among remaining survivors. The
    # minhash build runs on the SURVIVOR subset only (pair membership
    # depends only on the two docs' signatures, so signaturing fewer
    # docs changes nothing about which survivor pairs verify — the
    # oracle computes the full-corpus pair set and filters endpoints,
    # provably the same set); at 100 TB the quality+exact stages have
    # already dropped the junk before the expensive banding pays for it.
    # (dedup imported lazily: at registration time this module loads
    # while operators.dedup may still be initializing — _dedup_core
    # holds the cycle-free primitives, dedup.py the registered ops)
    from ..scratch import scratch
    from ._dedup_core import shingle_sets, token_hashes
    from .dedup import dedup_minhash_lsh

    surv_docs = d.select("doc_id", "text").join(
        surv2.select("doc_id"), "doc_id", "left_semi"
    )
    sh2 = scratch(shingle_sets(token_hashes(surv_docs)))
    edges = dedup_minhash_lsh(spark, sf_dir, sh=sh2).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    parents, _ = star_connected_components(edges)
    rooted = surv2.join(
        parents.select(F.col("a").alias("doc_id"), F.col("b").alias("root")),
        "doc_id",
        "left",
    ).select(
        "doc_id", "lang", "source", F.coalesce("root", "doc_id").alias("root")
    )
    surv3 = rooted.where(F.col("root") == F.col("doc_id"))

    # stage 4 — stratified seeded split over the final survivors
    win = Window.partitionBy("lang", "source").orderBy(
        int_hash(F.col("doc_id"), 0, CURATE_SEED), F.col("doc_id")
    )
    tile = F.ntile(N_TILES).over(win)
    tiles = surv3.select(
        "doc_id",
        F.when(tile <= 8, F.lit("train"))
        .when(tile == 9, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("final_split"),
    )

    # assemble one decision per input document
    return (
        base.select("doc_id", "lang", "source", q_ok.alias("q_ok"))
        .join(surv1k.select("doc_id", "e_ok"), "doc_id", "left")
        .join(rooted.select("doc_id", "root"), "doc_id", "left")
        .join(tiles, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.when(~F.coalesce("q_ok", F.lit(False)), F.lit("rejected:quality"))
            .when(~F.col("e_ok"), F.lit("rejected:exact_dup"))
            .when(F.col("root") != F.col("doc_id"), F.lit("rejected:near_dup"))
            .otherwise(F.col("final_split"))
            .alias("split"),
        )
    )


def curate_oracle_sql(minhash_pairs_sql: str, int_hash_sql_expr: str) -> str:
    """DuckDB twin of :func:`corpus_curate`, staged CTE for CTE.

    ``minhash_pairs_sql`` is dedup's _MINHASH_SQL verbatim (single
    source of truth for the pair set); ``int_hash_sql_expr`` the seeded
    integer hash of doc_id used by the split ordering."""
    return f"""
WITH RECURSIVE
curate_base AS (
  SELECT doc_id, lang, source, text, n_chars,
         len(list_filter(string_split(text, ' '), tk -> tk <> '')) AS n_toks
  FROM documents
),
surv1 AS (
  SELECT * FROM curate_base
  WHERE n_chars >= {CURATE_MIN_CHARS} AND n_toks >= {CURATE_MIN_TOKENS}
),
surv1k AS (
  SELECT *,
         doc_id = min(doc_id) OVER (
           PARTITION BY sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         ) AS e_ok
  FROM surv1
),
surv2 AS (SELECT doc_id, lang, source FROM surv1k WHERE e_ok),
mh_pairs AS ({minhash_pairs_sql}),
curate_edges AS (
  SELECT p.doc_a AS a, p.doc_b AS b FROM mh_pairs p
  JOIN surv2 sa ON p.doc_a = sa.doc_id JOIN surv2 sb ON p.doc_b = sb.doc_id
  UNION ALL
  SELECT p.doc_b AS a, p.doc_a AS b FROM mh_pairs p
  JOIN surv2 sa ON p.doc_a = sa.doc_id JOIN surv2 sb ON p.doc_b = sb.doc_id
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM surv2
  UNION
  SELECT r.src, e.b AS dst FROM reach r JOIN curate_edges e ON r.dst = e.a
),
cc AS (SELECT src AS doc_id, min(dst) AS root FROM reach GROUP BY src),
surv3 AS (
  SELECT s.doc_id, s.lang, s.source FROM surv2 s
  JOIN cc ON s.doc_id = cc.doc_id AND cc.root = s.doc_id
),
tiles AS (
  SELECT doc_id,
         CASE WHEN tile <= 8 THEN 'train'
              WHEN tile = 9 THEN 'valid'
              ELSE 'test' END AS final_split
  FROM (
    SELECT doc_id, ntile({N_TILES}) OVER (
             PARTITION BY lang, source
             ORDER BY {int_hash_sql_expr}, doc_id) AS tile
    FROM surv3
  ) st
)
SELECT b.doc_id, b.lang, b.source,
       CASE
         WHEN NOT coalesce(b.n_chars >= {CURATE_MIN_CHARS}
                           AND b.n_toks >= {CURATE_MIN_TOKENS}, FALSE)
           THEN 'rejected:quality'
         WHEN NOT k.e_ok THEN 'rejected:exact_dup'
         WHEN cc.root <> b.doc_id THEN 'rejected:near_dup'
         ELSE ti.final_split
       END AS split
FROM curate_base b
LEFT JOIN surv1k k ON b.doc_id = k.doc_id
LEFT JOIN cc ON b.doc_id = cc.doc_id
LEFT JOIN tiles ti ON b.doc_id = ti.doc_id
"""
