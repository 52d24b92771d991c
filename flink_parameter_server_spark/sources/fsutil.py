"""Filesystem-agnostic path probes for store readers (ADVICE r10).

Store modules (ann_index cells, incremental_dsir counts) must decide
"does this store exist yet" — and they target object-store/HDFS
deployments, where a driver-local ``os.path.isdir`` silently reads a
POPULATED remote store as empty (weights computed against the current
batch alone, probes against an empty catalog). Resolve existence
through the Hadoop FileSystem API instead: it honors the path's scheme
(file://, hdfs://, s3a://, ...) via the session's Hadoop configuration,
exactly as the read itself would.
"""

from __future__ import annotations


def path_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on whatever filesystem its scheme names
    (local paths included — the local test fixture and the remote
    deployment go through the same probe)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)
