"""Multimodal (binary) column operators — north-star requirement.

No reference analog. Pattern: media lives as an opaque `binary` column
with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched Pandas functions via ``mapInPandas`` — the only operators
in this engine that leave the JVM, because byte-level media decoding
genuinely can't be expressed in Spark SQL.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic stand-in (`_fake_decode`): real byte math
over the binary payload, no PIL/ffmpeg. The Spark-side plumbing —
binary column synthesis, Arrow batch shapes, output schema, partition
behavior — is real and oracle-checked (the oracle recomputes the same
byte math from the source text, since payload = utf-8(text)).

Scale: mapInPandas streams Arrow batches; per-batch memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`, and media-sized rows at
100 TB want that lowered plus binary columns stored out-of-line
(parquet BYTE_ARRAY with a size-capped row group) — documented knobs,
same code.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..plans.registry import register
from ._util import t

FEATURE_DIM = 4

_OUT_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, f0 bigint, f1 bigint, f2 bigint, f3 bigint"
)


def media_table(spark, sf_dir: str) -> DataFrame:
    """Synthesize the binary media table: payload = utf-8 bytes of text,
    metadata derived from n_chars (stands in for a real image table)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> dict:
    """STUB decode: a real decoder (PIL/ffmpeg) is unavailable in this
    container; this deterministic byte math keeps the pipeline testable.
    Swap this function for the real decoder in production."""
    n = len(content)
    total = sum(content)
    return {
        "n_bytes": n,
        "f0": content[0] if n else 0,
        "f1": content[-1] if n else 0,
        "f2": total % 256,
        "f3": total % 1_000_003,
    }


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["content"].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "f0": feats.map(lambda d: d["f0"]),
                    "f1": feats.map(lambda d: d["f1"]),
                    "f2": feats.map(lambda d: d["f2"]),
                    "f3": feats.map(lambda d: d["f3"]),
                }
            )
            yield out

    return media.mapInPandas(batches, schema=_OUT_SCHEMA)


FRAME_BYTES = 64  # bytes per fake "frame"
FRAME_STRIDE = 4  # sample every 4th frame

_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, byte_off bigint, frame_bytes bigint, checksum bigint"


def frame_sample(media: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: treat the binary payload as a fake video
    whose frames are fixed FRAME_BYTES windows; emit every FRAME_STRIDE-th
    frame as its own row (one input row -> many output rows — the exact
    batch shape a real video frame sampler produces from mapInPandas).
    The per-frame "decode" is the same declared byte-math stub as
    :func:`_fake_decode`; swap in ffmpeg frame extraction in production.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "byte_off": [], "frame_bytes": [], "checksum": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n = len(content)
                nframes = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, nframes, FRAME_STRIDE):
                    chunk = content[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f)
                    rows["byte_off"].append(f * FRAME_BYTES)
                    rows["frame_bytes"].append(len(chunk))
                    rows["checksum"].append(sum(chunk) % 1_000_003)
            yield pd.DataFrame(rows, dtype="int64") if rows["doc_id"] else pd.DataFrame(
                {k: pd.Series([], dtype="int64") for k in rows}
            )

    return media.select("doc_id", "content").mapInPandas(batches, schema=_FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                        c -> CAST(ascii(c) AS BIGINT)) AS cs
  FROM documents
),
fr AS (
  SELECT doc_id, cs,
         unnest(range(0, CAST(ceil(len(cs) / {float(FRAME_BYTES)}) AS BIGINT))) AS f
  FROM codes
)
SELECT doc_id, f AS frame_idx, f * {FRAME_BYTES} AS byte_off,
       CAST(least({FRAME_BYTES}, len(cs) - f * {FRAME_BYTES}) AS BIGINT) AS frame_bytes,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                                cs[f * {FRAME_BYTES} + 1 : (f + 1) * {FRAME_BYTES}]),
                   (a, x) -> a + x) % 1000003 AS checksum
FROM fr WHERE f % {FRAME_STRIDE} = 0
""",
    tags=("north-star", "D22"),
    doc="Multimodal frame sampling: binary payload as fixed-size frame "
    "windows, every FRAME_STRIDE-th frame emitted as its own row via "
    "Arrow-batched mapInPandas (1 row in -> N frame rows out, the real "
    "video-sampler batch shape). Frame decode is the declared byte-math "
    "stub; the oracle replays frame offsets/checksums from the source "
    "text with list slicing.",
)
def multimodal_frame_sample(spark, sf_dir):
    return frame_sample(media_table(spark, sf_dir))


@register(
    "multimodal_decode_features",
    oracle="""
WITH codes AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                        c -> CAST(ascii(c) AS BIGINT)) AS cs,
         n_chars
  FROM documents
)
SELECT doc_id, 'image/fake' AS media_type,
       CAST(len(cs) AS BIGINT) AS n_bytes,
       CAST(n_chars % 640 AS INT) AS width,
       CAST(n_chars % 480 AS INT) AS height,
       cs[1] AS f0, cs[len(cs)] AS f1,
       list_reduce(list_prepend(CAST(0 AS BIGINT), cs), (a, x) -> a + x) % 256 AS f2,
       list_reduce(list_prepend(CAST(0 AS BIGINT), cs), (a, x) -> a + x) % 1000003 AS f3
FROM codes
""",
    tags=("north-star", "D22"),
    doc="Multimodal pipeline plumbing: binary media column + typed "
    "metadata -> Arrow-batched mapInPandas decode/feature-extract. The "
    "decode itself is a deterministic stub (no media libs in container); "
    "the oracle replays the byte math from the source text (payload is "
    "its utf-8 encoding, ascii-only fixture).",
)
def multimodal_decode_features(spark, sf_dir):
    return decode_features(media_table(spark, sf_dir))
