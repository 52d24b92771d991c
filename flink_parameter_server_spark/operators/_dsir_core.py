"""Cycle-free DSIR primitives (Xie et al. 2023, arXiv:2302.03169)
shared by text_profile's dsir_logw column (operators/textstats.py) and
train_test_split's 'dsir_selected' part (operators/mlprep.py).

Same no-plans-import rule as _dedup_core: mlprep's late-bound oracle
install runs WHILE the registry package is still importing operator
modules, so anything it needs must not live in a module that imports
..plans (the r9 DSIR_SQL_CTES circular-import failure).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import poly_hash, poly_hash_sql
from ..functions.text import tokens, tokens_sql

# DSIR importance weighting (r9, Xie et al. 2023 "Data Selection for
# Language Models via Importance Resampling"): hashed bag-of-unigrams
# features, per-doc log importance weight = sum over token occurrences
# of ln(p_target(b)/p_raw(b)) with add-1 smoothing over DSIR_B buckets.
# Target distribution = the lang='en' slice of the corpus (stand-in for
# "high-quality domain sample"); raw = the whole corpus.
DSIR_B = 128
DSIR_SEED = 11
DSIR_TARGET_LANG = "en"

# Shared DSIR micro-nat weight pipeline: per-doc EXACT integer weight
# sums fmic(doc_id, smic) — used by text_profile's dsir_logw column AND
# train_test_split's 'dsir_selected' part (which ranks on the integer
# smic, never the float quotient, so ordering is engine-identical).
DSIR_SQL_CTES = f"""fpos AS (
  SELECT doc_id, lang, {poly_hash_sql('tok', DSIR_SEED)} % {DSIR_B} AS b
  FROM (SELECT doc_id, lang, unnest({tokens_sql('text')}) AS tok FROM documents) ft
),
fcnt AS (SELECT doc_id, lang, b, count(*) AS n FROM fpos GROUP BY 1, 2, 3),
fraw AS (SELECT b, sum(n) AS cr FROM fcnt GROUP BY b),
ftgt AS (SELECT b, sum(n) AS ct FROM fcnt WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
ftot AS (
  SELECT (SELECT sum(cr) FROM fraw) AS rr,
         coalesce((SELECT sum(ct) FROM ftgt), 0) AS tt
),
flam AS (
  SELECT fraw.b,
         CAST(CAST(round(ln(((coalesce(ct, 0) + 1.0) / (tt + {float(DSIR_B)}))
                        / ((cr + 1.0) / (rr + {float(DSIR_B)}))), 6)
              AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lmic
  FROM fraw LEFT JOIN ftgt ON fraw.b = ftgt.b CROSS JOIN ftot
),
fmic AS (
  SELECT doc_id, CAST(sum(n * lmic) AS BIGINT) AS smic,
         CAST(sum(n) AS BIGINT) AS ntok
  FROM fcnt JOIN flam ON fcnt.b = flam.b GROUP BY doc_id
)"""


def dsir_features(d):
    """(doc_id, lang, b, n) — hashed bag-of-unigrams bucket counts per
    doc, the shared first stage of the batch weight pipeline and the
    r10 incremental store (streaming/incremental_dsir.py)."""
    feat = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("doc_id", "lang", (poly_hash(F.col("tok"), DSIR_SEED) % DSIR_B).alias("b"))
    return feat.groupBy("doc_id", "lang", "b").agg(F.count(F.lit(1)).alias("n"))


def dsir_lambda(raw, tgt):
    """(b, lmic) — the integer micro-nat log-ratio table from raw
    bucket counts ``raw`` (b, cr) and target counts ``tgt`` (b, ct).
    Factored (r10) so the batch pipeline and the incremental count
    store share ONE arithmetic definition: add-1 smoothing over DSIR_B
    buckets, per-bucket ln ratio rounded to 6dp and carried as exact
    integer micro-nats (any drift here is a hash mismatch in
    text_profile / train_test_split)."""
    tot = raw.agg(F.sum("cr").alias("rr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    )
    lam_val = F.round(
        F.log(
            (
                (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                / (F.col("tt") + F.lit(float(DSIR_B)))
            )
            / ((F.col("cr") + F.lit(1.0)) / (F.col("rr") + F.lit(float(DSIR_B))))
        ),
        6,
    )
    return (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select("b", (lam_val.cast("decimal(18,6)") * 1000000).cast("long").alias("lmic"))
    )


def dsir_weights(fcnt, lam):
    """(doc_id, smic, ntok) — exact integer per-doc weight sums from a
    feature-count frame and a lambda table (shared final stage)."""
    return (
        fcnt.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("lmic")).cast("long").alias("smic"),
            F.sum("n").cast("long").alias("ntok"),
        )
    )


def dsir_micro(d):
    """(doc_id, smic) — per-doc DSIR importance weights as EXACT integer
    micro-nats (Spark twin of DSIR_SQL_CTES; see the DSIR comment block
    in text_profile). ``d``: any (doc_id, lang, text) frame. Shapes:
    one (doc, b) count shuffle, B-row aggregates joined via a broadcast
    lambda table; the only nested-loop joins are 1-row totals
    broadcasts."""
    fcnt = dsir_features(d)
    raw = fcnt.groupBy("b").agg(F.sum("n").alias("cr"))
    tgt = (
        fcnt.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.sum("n").alias("ct"))
    )
    return dsir_weights(fcnt, dsir_lambda(raw, tgt))
