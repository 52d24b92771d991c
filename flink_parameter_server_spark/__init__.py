"""PySpark-native engine with the capabilities of FlinkML/flink-parameter-server.

Not a port: the reference (Scala, ``hu.sztaki.ilab.ps``) implements the
parameter-server pattern on Flink's cyclic DataStream API; this package
rebuilds the same capabilities Spark-first — DataFrame joins/aggregations
for pull/push, driver-loop epochs or keyed streaming state for the
iteration, plus a relational substrate and LLM-data-pipeline operators —
all declared in SURVEY.md §2 and checked against a DuckDB oracle.

Layout:
    sources/    parquet table loaders (the driver fixture tables)
    functions/  deterministic hashing / vector math / text primitives,
                each with a DuckDB-SQL twin so query and oracle share
                one definition
    operators/  relational + dedup + similarity + sketch + text operators
    ps/         the parameter-server kernel (batch pull/push) and the
                ML algorithms built on it (MF, Passive-Aggressive)
    plans/      the query registry consumed by __spark_entry__.py
    streaming/  Structured Streaming forms (windows, online PS)
"""

__version__ = "0.1.0"
