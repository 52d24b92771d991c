"""Bit-for-bit parity of the deterministic primitives between Spark and
DuckDB — the foundation every oracle-checked query stands on."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parameter_server_spark.functions import hashing, text, vectors
from tests.conftest import SF_SMALL, register_duck_views


def test_poly_hash_parity(spark, duck):
    register_duck_views(duck, SF_SMALL)
    sdf = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(
            "doc_id",
            hashing.poly_hash(F.col("lang"), 7).alias("h7"),
            hashing.poly_hash(F.col("source"), 991).alias("h991"),
        )
        .orderBy("doc_id")
    )
    duck_rows = duck.execute(
        f"SELECT doc_id, {hashing.poly_hash_sql('lang', 7)} AS h7, "
        f"{hashing.poly_hash_sql('source', 991)} AS h991 FROM documents ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in sdf.collect()] == duck_rows


def test_int_hash_parity(spark, duck):
    register_duck_views(duck, SF_SMALL)
    sdf = (
        spark.read.parquet(f"{SF_SMALL}/part.parquet")
        .select(
            "p_partkey",
            hashing.int_hash(F.col("p_partkey"), j=3, seed=42).alias("h"),
            hashing.unit_uniform(hashing.int_hash(F.col("p_partkey"), j=1, seed=1)).alias("u"),
        )
        .orderBy("p_partkey")
    )
    duck_rows = duck.execute(
        f"SELECT p_partkey, {hashing.int_hash_sql('p_partkey', j=3, seed=42)} AS h, "
        f"{hashing.unit_uniform_sql(hashing.int_hash_sql('p_partkey', j=1, seed=1))} AS u "
        f"FROM part ORDER BY p_partkey"
    ).fetchall()
    assert [tuple(r) for r in sdf.collect()] == duck_rows


def test_dot_and_norm_parity(spark, duck):
    register_duck_views(duck, SF_SMALL)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    v = vectors.as_double(F.col("embedding"))
    sdf = emb.select(
        "vec_id",
        vectors.dot(v, v).alias("d"),
        vectors.norm2(v).alias("n2"),
    ).orderBy("vec_id")
    duck_rows = duck.execute(
        f"SELECT vec_id, {vectors.dot_sql('embedding', 'embedding')} AS d, "
        f"{vectors.norm2_sql('embedding')} AS n2 FROM embeddings ORDER BY vec_id"
    ).fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(duck_rows)
    for (sid, sd, sn), (did, dd, dn) in zip(srows, duck_rows):
        assert sid == did
        assert sd == dd, f"dot mismatch at {sid}: {sd} vs {dd}"
        assert sn == dn


def test_poly_hash_fuzz_parity(spark, duck):
    """Seeded-random fuzz over awkward strings (empty, single char, long,
    repeated, punctuation) — both engines must agree on every one."""
    import random

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _-."
    samples = ["", "a", " ", "  ", "a b", "." * 50, None, "é漢\U0001F600", "a é b"]
    samples += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80))) for _ in range(200)]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "s"])
    got = {
        r.i: (r.h1, r.h2)
        for r in sdf.select(
            "i",
            hashing.poly_hash(F.col("s"), 7).alias("h1"),
            hashing.poly_hash(F.col("s"), 991).alias("h2"),
        ).collect()
    }
    sql = f"SELECT {hashing.poly_hash_sql('?', 7)}, {hashing.poly_hash_sql('?', 991)}"
    # the null-guard CASE references its argument twice, so each call
    # site consumes two placeholders
    n_params = sql.count("?")
    for i, s in enumerate(samples):
        h1, h2 = duck.execute(sql, [s] * n_params).fetchone()
        assert got[i] == (h1, h2), f"mismatch on {s!r}"


def test_negative_zero_convention(spark, duck):
    """Spark's round() always returns +0.0; DuckDB's keeps -0.0. Every
    sign-risky float in oracle SQL must therefore be written
    `round(x, 6) + 0.0` (see ps/queries.py, similarity.py) — this test
    pins the engine behaviors that convention depends on."""
    import math

    from pyspark.sql import functions as F

    srow = spark.range(1).select(F.round(F.lit(-1e-9), 6).alias("r")).collect()[0]
    assert math.copysign(1, srow.r) == 1.0, "Spark round no longer normalizes -0.0"
    raw, fixed = duck.execute("SELECT round(-1e-9, 6), round(-1e-9, 6) + 0.0").fetchone()
    assert math.copysign(1, raw) == -1.0, "DuckDB round now normalizes; convention obsolete"
    assert math.copysign(1, fixed) == 1.0


def test_ngram_parity(spark, duck):
    register_duck_views(duck, SF_SMALL)
    sdf = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", text.word_ngrams(F.col("text"), 3).alias("g"))
        .orderBy("doc_id")
    )
    duck_rows = duck.execute(
        f"SELECT doc_id, {text.word_ngrams_sql('text', 3)} AS g FROM documents ORDER BY doc_id"
    ).fetchall()
    srows = [(r[0], list(r[1])) for r in sdf.collect()]
    drows = [(r[0], list(r[1])) for r in duck_rows]
    assert srows == drows


def test_type_check_flags_hugeint(spark, duck):
    """The compare() type gate must fail an uncast DuckDB HUGEINT sum even
    when every value matches — the driver's hash is type-sensitive and
    this exact mismatch was round 1's only red row (VERDICT r1)."""
    from tests.oracle import compare

    sdf = spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("s"))
    ok, msg = compare(sdf, duck, "SELECT id, sum(v) AS s FROM (VALUES (0,0),(1,2),(2,4)) t(id,v) GROUP BY id")
    assert not ok and "int width" in msg
    ok, msg = compare(sdf, duck, "SELECT id, CAST(sum(v) AS BIGINT) AS s FROM (VALUES (0,0),(1,2),(2,4)) t(id,v) GROUP BY id")
    assert ok, msg


def test_type_check_accepts_narrow_int_vs_bigint(spark, duck):
    """int32 (Spark row_number) vs BIGINT (DuckDB row_number) hashed equal
    in the r01 driver run — the gate must not flag widths <= 64."""
    from tests.oracle import compare

    sdf = spark.range(3).select(F.col("id"), F.lit(1).alias("rk"))
    ok, msg = compare(sdf, duck, "SELECT range AS id, CAST(1 AS BIGINT) AS rk FROM range(3)")
    assert ok, msg
