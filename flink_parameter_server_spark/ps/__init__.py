"""Parameter-server kernel + ML algorithms (SURVEY.md §2 A/B layers).

Reference: `hu.sztaki.ilab.ps.FlinkParameterServer#transform` wires
workers and servers into a *cyclic* Flink dataflow [C-high]. Spark's DAG
engine forbids cycles, so the kernel is re-expressed as (a) batch:
pull = equi-join against the params DataFrame, push = groupBy-sum of
deltas folded into params, iteration = driver-side epoch loop with
lineage checkpointing; (b) online: keyed state in Structured Streaming
(streaming/online_ps.py).
"""

from .kernel import BatchParameterServer

__all__ = ["BatchParameterServer"]
