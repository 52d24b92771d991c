#!/usr/bin/env python
"""Degenerate-input probe: run every registry entry on empty / tiny tables.

At 100 TB a filter, a partition-pruned scan, or an upstream quality gate
routinely hands an operator ZERO rows (or one row) — a plan that throws
on an empty intermediate is a real production bug even if every sf0.1
fixture row exercises it fine. This tool slices the driver's own
sf0.001 fixtures (never hand-rolled rows) down to N rows per table
(N=0: empty-with-schema; N=1: single row with broken FK selectivity),
preserves the driver's bare-single-file parquet layout that the
streaming sources' pathGlobFilter contract depends on, and runs EVERY
registry entry against the result, recording completed/rows vs raised.

A second mode injects NULLs instead of shrinking: ``gen --nulls`` keeps
every sf0.001 row but nulls out the free-form payload columns
(documents.text, embeddings.embedding, events.props, part.p_name) on
half the rows by key parity — the shape a 100 TB lake actually has
after upstream extraction partially fails.

A third mode injects extreme key skew: ``gen --skew`` remaps a third of
orders.o_custkey / events.user_id / lineitem.l_partkey rows (selected
by primary-key mod 3) onto ONE existing hot key — the whale-customer /
bot-user / staple-item shape that breaks naive keyed shuffles at scale.
Run it against the sf0.1 source and verify with
``selfcheck.py --sf <out>`` so the DuckDB oracle replays the SAME
skewed data (parity check, not just completion).

A fourth mode injects MULTIBYTE text: ``gen --unicode`` suffixes every
third document token with accented/CJK/astral characters — the shape
any real corpus has, and the one that separates byte-level from
codepoint-level semantics between Spark and the DuckDB oracles.

A fifth mode injects TIMESTAMP TIES: ``gen --ties`` truncates
events.ts to the minute, so keep-first dedup, as-of joins, and
sessionization hit mass ties — any ordering that is not fully
tie-broken shows up as Spark-vs-oracle hash nondeterminism.

A sixth mode injects IEEE SPECIALS: ``gen --nonfinite`` puts NaN /
+inf / -inf into events.value on a sparse row sample — engine NaN
conventions (ordering, equality, aggregation) are the classic
cross-engine divergence.

Usage:
  python tools/degenerate_probe.py gen [--rows 0 | --nulls | --skew | --unicode | --ties | --nonfinite | --emptytext] [--out /tmp/sparkgraft_empty]
  python tools/degenerate_probe.py run [--out ...] [entry ...]

`run` prints one JSON line:
  {"rows_per_table": N, "ok": {name: rowcount}, "failed": {name: "ExcType: msg"}}
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import traceback

sys.path.insert(0, "/root/repo")

from flink_parameter_server_spark import scratch
from flink_parameter_server_spark.plans import REGISTRY
from flink_parameter_server_spark.session import get_spark

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/sparkgraft_empty"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# (table, payload column, key column for the parity split)
NULL_SITES = {
    "documents": ("text", "doc_id"),
    "embeddings": ("embedding", "vec_id"),
    "events": ("props", "event_id"),
    "part": ("p_name", "p_partkey"),
}

# (table, skewed FK column, row-selector primary key); the hot value is
# min(col) over the source so every remapped row still references an
# existing dimension key
SKEW_SITES = {
    "orders": ("o_custkey", "o_orderkey"),
    "events": ("user_id", "event_id"),
    "lineitem": ("l_partkey", "l_orderkey"),
}


def generate(
    out: str,
    rows: int,
    src: str = SRC,
    spark=None,
    nulls: bool = False,
    skew: bool = False,
    unicode_: bool = False,
    ties: bool = False,
    nonfinite: bool = False,
    emptytext: bool = False,
) -> None:
    from pyspark.sql import functions as F

    spark = spark or get_spark("degenerate-probe-gen")
    tag = next(
        t
        for t, on in [
            ("nulls", nulls),
            ("skew", skew),
            ("unicode", unicode_),
            ("ties", ties),
            ("nonfinite", nonfinite),
            ("emptytext", emptytext),
            (rows, True),
        ]
        if on
    )
    os.makedirs(out, exist_ok=True)
    for table in TABLES:
        sliced = spark.read.parquet(f"{src}/{table}.parquet")
        if nulls:
            if table in NULL_SITES:
                col, key = NULL_SITES[table]
                sliced = sliced.withColumn(
                    col, F.when(F.col(key) % 2 == 0, F.lit(None)).otherwise(F.col(col))
                )
        elif skew:
            if table in SKEW_SITES:
                col, key = SKEW_SITES[table]
                hot = sliced.agg(F.min(col)).first()[0]
                sliced = sliced.withColumn(
                    col, F.when(F.col(key) % 3 == 0, F.lit(hot)).otherwise(F.col(col))
                )
        elif nonfinite:
            if table == "events":
                # IEEE specials in the measure column: NaN / +inf / -inf on
                # a sparse sample of rows — engine NaN conventions (ordering,
                # equality, aggregation) are the classic cross-engine trap
                sliced = sliced.withColumn(
                    "value",
                    F.when(F.col("event_id") % 101 == 0, F.lit(float("nan")))
                    .when(F.col("event_id") % 103 == 0, F.lit(float("inf")))
                    .when(F.col("event_id") % 107 == 0, F.lit(float("-inf")))
                    .otherwise(F.col("value")),
                )
        elif ties:
            if table == "events":
                # truncate ts to the minute: mass timestamp ties expose any
                # ordering that is not fully tie-broken (keep-first dedup,
                # as-of joins, session assembly) as Spark-vs-oracle hash
                # nondeterminism
                sliced = sliced.withColumn("ts", F.date_trunc("minute", F.col("ts")).cast(
                    sliced.schema["ts"].dataType
                ))
        elif emptytext:
            if table == "documents":
                # EMPTY (not null) text on a parity class: distinct from the
                # --nulls axis — empty survives `text IS NOT NULL` scan
                # filters, so every zero-length branch downstream (empty
                # token array, empty utf-8 byte list, cs[1]/cs[len(cs)] on
                # an empty DuckDB list) actually executes (ADVICE r6 on the
                # multimodal features oracle). A second parity class gets
                # WHITESPACE-ONLY text with a tab: the space-only tokenizer
                # keeps '\t' as a "token" (messy-input realism), while the
                # normalized-dedup regex collapses it — the two paths must
                # disagree identically in both engines.
                sliced = sliced.withColumn(
                    "text",
                    F.when(F.col("doc_id") % 4 == 0, F.lit(""))
                    .when(F.col("doc_id") % 4 == 2, F.lit(" \t  "))
                    .otherwise(F.col("text")),
                ).withColumn("n_chars", F.length("text").cast("long"))
        elif unicode_:
            if table == "documents":
                # suffix every third token with multibyte text (Latin-1
                # accent, CJK, astral emoji) — real-corpus shape for the
                # text/dedup/multimodal byte paths; n_chars recomputed in
                # CHARACTERS to stay consistent with the fixture contract
                sliced = sliced.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda tok, i: F.when(
                                (i % 3 == F.lit(0)) & (tok != F.lit("")),
                                F.concat(tok, F.lit("é漢\U0001F600")),
                            ).otherwise(tok),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
        else:
            sliced = sliced.limit(rows)
        tmpdir = f"{out}/_tmp_{table}"
        sliced.coalesce(1).write.mode("overwrite").parquet(tmpdir)
        [part] = glob.glob(f"{tmpdir}/part-*.parquet")
        dest = f"{out}/{table}.parquet"
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        elif os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmpdir)
        print(f"{table}: {tag}", flush=True)
    with open(f"{out}/_rows_per_table", "w") as f:
        f.write(str(tag))


def run(out: str, names: list[str]) -> None:
    spark = get_spark("degenerate-probe-run")
    with open(f"{out}/_rows_per_table") as f:
        rows = f.read()
    ok: dict[str, int] = {}
    failed: dict[str, str] = {}
    for name in names:
        scratch.release()
        try:
            n = REGISTRY[name].fn(spark, out).count()
            ok[name] = n
            print(f"# {name}: ok ({n} rows)", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — probe records, never masks
            failed[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            print(f"# {name}: FAILED {failed[name]}", file=sys.stderr, flush=True)
            traceback.print_exc(limit=3, file=sys.stderr)
    print(json.dumps({"rows_per_table": rows, "ok": ok, "failed": failed}))


def main() -> int:
    args = sys.argv[1:]
    if not args or args[0] not in ("gen", "run"):
        print(__doc__)
        return 2
    cmd, args = args[0], args[1:]
    out, rows, src, nulls, skew, unicode_, ties, nonfinite, emptytext = OUT, 0, SRC, False, False, False, False, False, False
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--out":
            out = args.pop(0)
        elif a == "--rows":
            rows = int(args.pop(0))
        elif a == "--nulls":
            nulls = True
        elif a == "--skew":
            skew = True
        elif a == "--unicode":
            unicode_ = True
        elif a == "--ties":
            ties = True
        elif a == "--nonfinite":
            nonfinite = True
        elif a == "--emptytext":
            emptytext = True
        elif a == "--src":
            src = args.pop(0)
        else:
            names.append(a)
    if cmd == "gen":
        generate(out, rows, src=src, nulls=nulls, skew=skew, unicode_=unicode_, ties=ties, nonfinite=nonfinite, emptytext=emptytext)
    else:
        run(out, names or sorted(REGISTRY))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
