#!/usr/bin/env python
"""Second-decade scale rehearsal: measure registry entries at ~sf1.

The driver ships sf0.001/0.01/0.1 fixtures; BASELINE.md's scale-curve
table showed every audited entry flat-to-mildly-sloped across those two
decades, with the recorded caveat that fixed per-query overhead
dominates at such sizes. This tool buys ONE more decade of measured
evidence: it synthesizes a ~sf1 dataset as 10 KEY-OFFSET REPLICAS of
the driver's own sf0.1 fixtures (never hand-rolled rows — every value
is derived from driver data) and re-times the curve entries on it.

Replica model — "10 disjoint sub-databases", the shape a 10x-bigger
tenant would actually have:

- every key column gets ``+ i * OFF`` per replica i (FK pairs offset
  together, so referential integrity and join selectivity per key are
  preserved; key cardinality scales 10x, per-key group sizes do NOT —
  duplicating keys would instead 10x every groupBy state and window
  partition, a different and unrealistic workload);
- ``nation``/``region`` stay single-copy (shared small dims, as in any
  multi-tenant star);
- ``documents.text`` gets a per-replica letter suffixed onto EVERY
  whitespace token (replica 0 untouched): token vocabularies become
  disjoint across replicas, so MinHash/SimHash/ngram candidate
  generation sees 10x docs WITHOUT the all-clones-are-near-dups
  artifact verbatim duplication would create (n_chars is recomputed to
  stay consistent);
- ``embeddings.embedding`` is circularly shifted by i dimensions
  (norm-preserving, within-replica geometry identical, cross-replica
  vectors no longer colliding in every LSH bucket).

OFF is divisible by the topk user_stride (50) so c_custkey % stride
sampling keeps the same rate on offset keys.

Usage:
  python tools/scale_rehearsal.py gen   [--out /tmp/sparkgraft_sf1]
  python tools/scale_rehearsal.py run   [--out ...] [--reps 3] [entry ...]

`run` prints one JSON line: {"sf": "sfx10", "queries": {name: median_sec}}.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from flink_parameter_server_spark import scratch
from flink_parameter_server_spark.plans import REGISTRY
from flink_parameter_server_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sparkgraft_sf1"
REPLICAS = 10
OFF = 10_000_000  # > any sf0.1 key; divisible by the topk user_stride 50

# entries with measured scale curves in BASELINE.md — the rehearsal set
CURVE_ENTRIES = [
    "copurchase_recommend_top5",
    "dedup_near_dup_pairs",
    "dedup_cluster_canonical",
    "embedding_ann_topk",
    "text_retrieval",
    "mf_recommend_topk",
    "ps_train_epochs",
]

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ["nation", "region"]


def _suffix_tokens(col, i: int):
    """Append a per-replica letter to every whitespace token (empties
    kept empty so token counts match the original)."""
    sfx = chr(ord("a") + i)
    return F.array_join(
        F.transform(
            F.split(col, " "),
            lambda t: F.when(t == F.lit(""), t).otherwise(F.concat(t, F.lit(sfx))),
        ),
        " ",
    )


def _replica(df: DataFrame, table: str, i: int) -> DataFrame:
    for k in KEY_COLS[table]:
        df = df.withColumn(k, F.col(k) + F.lit(i * OFF))
    if table == "documents" and i > 0:
        df = df.withColumn("text", _suffix_tokens(F.col("text"), i)).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    if table == "embeddings" and i > 0:
        # circular shift by i: norm-preserving per-replica perturbation
        df = df.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), i + 1, 10_000),
                F.slice(F.col("embedding"), 1, i),
            ),
        )
    return df


def generate(out: str, src: str = SRC, replicas: int = REPLICAS, spark=None) -> None:
    spark = spark or get_spark("scale-rehearsal-gen")
    import os as _os
    import shutil as _shutil

    _os.makedirs(out, exist_ok=True)
    for table in SHARED_DIMS:
        # shared dims copy through verbatim (source fixtures are bare
        # single-file parquet — keep that layout, see below)
        dest = f"{out}/{table}.parquet"
        if _os.path.isdir(dest):
            _shutil.rmtree(dest)
        _shutil.copyfile(f"{src}/{table}.parquet", dest)
        print(f"{table}: shared dim copied", flush=True)
    for table, _keys in KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = [_replica(base, table, i) for i in range(replicas)]
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        # Driver fixture layout is ONE bare parquet FILE per table
        # (TESTDATA.md), and the streaming source's
        # pathGlobFilter("events.parquet") contract depends on that — a
        # part-file directory streams zero rows. Write single-part, then
        # move the part file into place as a plain file. Batch entries
        # repartition after the scan, so single-file input does not
        # serialize their hot stages.
        import glob as _glob
        import os as _os
        import shutil as _shutil

        tmpdir = f"{out}/_tmp_{table}"
        full.coalesce(1).write.mode("overwrite").parquet(tmpdir)
        [part] = _glob.glob(f"{tmpdir}/part-*.parquet")
        dest = f"{out}/{table}.parquet"
        if _os.path.isdir(dest):
            _shutil.rmtree(dest)
        elif _os.path.exists(dest):
            _os.remove(dest)
        _shutil.move(part, dest)
        _shutil.rmtree(tmpdir)
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"{table}: {n} rows", flush=True)
    with open(f"{out}/_meta.json", "w") as f:
        json.dump({"src": src, "replicas": replicas}, f)


def run(out: str, reps: int, names: list[str]) -> None:
    spark = get_spark("scale-rehearsal-run")
    # label the artifact with the parameters gen actually used, not the
    # module defaults — a 5-replica sf0.01 set must not be stamped sfx10
    try:
        with open(f"{out}/_meta.json") as f:
            meta = json.load(f)
    except OSError:
        meta = {"src": SRC, "replicas": REPLICAS}
    results = {}
    for name in names:
        samples = []
        for rep in range(-1, reps):  # one untimed warmup
            scratch.release()
            t0 = time.time()
            REGISTRY[name].fn(spark, out).count()
            dt = time.time() - t0
            if rep >= 0:
                samples.append(round(dt, 3))
        results[name] = round(statistics.median(samples), 3)
        print(f"# {name}: {results[name]}s  {samples}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "sf": f"sfx{meta['replicas']}",
                "src": meta["src"],
                "replicas": meta["replicas"],
                "queries": results,
            }
        )
    )


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] not in ("gen", "run"):
        print(__doc__)
        return 2
    cmd, args = args[0], args[1:]
    out, reps, src, replicas = OUT, 3, SRC, REPLICAS
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--out":
            out = args.pop(0)
        elif a == "--reps":
            reps = int(args.pop(0))
        elif a == "--src":
            src = args.pop(0)
        elif a == "--replicas":
            replicas = int(args.pop(0))
        else:
            names.append(a)
    if cmd == "gen":
        generate(out, src=src, replicas=replicas)
    else:
        run(out, reps, names or CURVE_ENTRIES)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
