"""Built-in sketch surface (C4 production path, formerly the rows-only
registry entry sketch_builtins): HLL++/Datasketches distinct counts and
approx_percentile must bracket the exact answers, and the DataFrame-stat
bloom filter / count-min builtins must behave (no false negatives,
one-sided overestimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parameter_server_spark.operators._util import t
from flink_parameter_server_spark.operators.sketches import sketch_builtins
from tests.conftest import SF_SMALL


def test_sketch_builtins_bracket_exact(spark):
    rows = sketch_builtins(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        # HLL++ and Datasketches HLL: within 10% of exact at this scale
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.1 * r.exact_users)
        assert abs(r.hll_users - r.exact_users) <= max(2, 0.1 * r.exact_users)
        # approx_percentile returns an actual data value near the median
        assert r.p50_value is not None and r.p50_exact is not None


def test_jvm_stat_bloom_filter_no_false_negatives(spark):
    # PySpark doesn't surface Dataset.stat.bloomFilter; the JVM API does
    ev = t(spark, SF_SMALL, "events")
    bf = ev._jdf.stat().bloomFilter("user_id", 1000, 0.03)
    sample = [r.user_id for r in ev.select("user_id").distinct().limit(50).collect()]
    assert all(bf.mightContain(u) for u in sample)  # no false negatives


def test_jvm_stat_count_min_sketch_overestimates(spark):
    ev = t(spark, SF_SMALL, "events")
    cms = ev._jdf.stat().countMinSketch("event_type", 0.01, 0.95, 42)
    exact = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    for k, n in exact.items():
        assert cms.estimateCount(k) >= n  # one-sided error


def test_sql_count_min_sketch_and_approx_top_k(spark):
    ev = t(spark, SF_SMALL, "events")
    row = ev.agg(
        F.expr("count_min_sketch(event_type, 0.01d, 0.95d, 42)").alias("cms"),
        F.expr("approx_top_k(event_type, 3)").alias("topk"),
    ).collect()[0]
    assert row.cms is not None and len(row.cms) > 0  # binary sketch blob
    top_items = {r["item"] for r in row.topk}
    exact_top = {
        r.event_type
        for r in ev.groupBy("event_type").count().orderBy(F.desc("count")).limit(3).collect()
    }
    assert top_items == exact_top  # small domain: approx == exact


def test_cms_heavy_hitters_one_sided_and_no_misses(spark):
    """r12 sketch='cms_heavy' contract: (1) every estimate is a
    one-sided OVERestimate (est >= exact, the CMS guarantee); (2) NO
    truly heavy token is missed — every (lang, tok) whose exact count
    clears ceil(N_lang/CMS_HH_PHI) appears in the output (recomputed
    driver-side from the raw corpus); (3) the output is exactly the
    estimate-clears-threshold set, so any emitted row with
    check_value < threshold is a visible false positive."""
    from flink_parameter_server_spark.operators.sketches import (
        CMS_HH_PHI,
        _cms_heavy,
    )

    rows = _cms_heavy(spark, SF_SMALL).collect()
    assert rows
    got = {(r["lang"], r["word"]): (r["estimate"], r["check_value"]) for r in rows}
    for (lang, w), (est, exact) in got.items():
        assert est >= exact, f"CMS underestimated ({lang}, {w})"

    d = t(spark, SF_SMALL, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    freq = {
        (r["lang"], r["tok"]): r["n"]
        for r in d.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["lang"] is not None
    }
    ntok = {}
    for (lang, _), n in freq.items():
        ntok[lang] = ntok.get(lang, 0) + n
    thr = {lang: -(-n // CMS_HH_PHI) for lang, n in ntok.items()}
    truly_heavy = {k for k, n in freq.items() if n >= thr[k[0]]}
    assert truly_heavy, "fixture has no heavy tokens — threshold too high"
    missed = truly_heavy - set(got)
    assert not missed, f"heavy tokens missed: {sorted(missed)[:5]}"
    for k in truly_heavy:
        assert got[k][1] == freq[k]  # check_value carries the exact count


def test_cms_heavy_overestimate_visible_on_wide_vocab(spark, tmp_path):
    """The fixture's narrow vocab never collides (BASELINE r12: zero
    overestimates), so this pins the CMS property the fixture cannot:
    with vocab >> CMS_W counters, the min-over-rows estimate of a
    heavy token strictly EXCEEDS its exact count (collisions add, never
    subtract) while the no-miss contract still holds."""
    from flink_parameter_server_spark.operators.sketches import (
        CMS_HH_PHI,
        _cms_heavy,
    )
    from tests.test_textstats import _mk_mix_corpus

    # 4096 distinct filler tokens over 256 counter columns force
    # collisions onto the one heavy token; N = 4096 + 512 occurrences,
    # thr = ceil(N/128) = 36 << 512, so 'hot' is deeply heavy
    docs = []
    for i in range(64):
        toks = [f"t{i}_{j}" for j in range(64)] + ["hot"] * 8
        docs.append((i, " ".join(toks), "en", "web", 0))
    out = _mk_mix_corpus(spark, tmp_path, docs)
    rows = {r["word"]: (r["estimate"], r["check_value"])
            for r in _cms_heavy(spark, out).collect()}
    assert "hot" in rows, "truly heavy token missed"
    est, exact = rows["hot"]
    assert exact == 512
    assert est > exact, "wide vocab must collide into the heavy token's cells"
