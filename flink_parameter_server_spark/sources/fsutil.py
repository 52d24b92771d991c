"""Filesystem-agnostic path probes for store readers (ADVICE r10).

Store modules (ann_index cells, incremental_dsir counts, the
incremental dedup/curate band/hash stores) must decide "does this
store exist yet" — and they target object-store/HDFS deployments,
where a driver-local ``os.path.isdir`` silently reads a POPULATED
remote store as empty (weights computed against the current batch
alone, probes against an empty catalog, batches deduped against
nothing). Resolve existence through the Hadoop FileSystem API instead:
it honors the path's scheme (file://, hdfs://, s3a://, ...) via the
session's Hadoop configuration, exactly as the read itself would.

Scope (deliberate): READ-path probes route through here because their
failure mode is SILENT wrong results. Maintenance ops that still use
shutil/os (compact_store, compact_index, rebuild_index's swap) fail
LOUDLY on a remote scheme — a different class; compact_dsir_counts
shows the FS-API form for when those are lifted too.
"""

from __future__ import annotations


def _fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def path_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on whatever filesystem its scheme names
    (local paths included — the local test fixture and the remote
    deployment go through the same probe)."""
    fs, p, _ = _fs(spark, path)
    return fs.exists(p)


def list_dir_names(spark, path: str) -> list[str]:
    """Child entry NAMES of a directory (not full paths), any scheme."""
    fs, p, _ = _fs(spark, path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def delete_path(spark, path: str) -> bool:
    """Recursive delete, any scheme. Returns Hadoop's success flag."""
    fs, p, _ = _fs(spark, path)
    return fs.delete(p, True)


def rename_path(spark, src: str, dst: str) -> bool:
    """Rename/move, any scheme. On object stores this is a copy under
    the hood — callers doing swap-style maintenance (write tmp, delete
    live, rename tmp over it) accept that window exactly as the local
    form does. Returns Hadoop's success flag."""
    fs, p, jvm = _fs(spark, src)
    return fs.rename(p, jvm.org.apache.hadoop.fs.Path(dst))
