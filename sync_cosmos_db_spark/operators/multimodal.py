"""Multimodal column handling (X5): image/audio/video as opaque binary
columns with typed metadata.

No reference implementation (SURVEY.md §2.3; mandated by BASELINE.json).

Design: an asset is ``(content BINARY, meta STRUCT<mime,…>)``. Binary
payloads ride through Spark untouched (Tungsten stores them off-heap;
parquet stores them as BYTE_ARRAY); metadata is ordinary typed columns
so filters on mime/size/dimensions push down WITHOUT touching bytes.

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
one place Python is justified, because codec work is per-blob native
code anyway. The image/audio codecs are NOT in this container, so the
decode kernel is STUBBED: ``decode_images(df, fake=True)`` produces
deterministic pseudo-decoded metadata derived from the bytes, and
``fake=False`` raises ``NotImplementedError`` at the exact seam where
Pillow/ffmpeg would slot in. The Spark-side plumbing — schema, batch
iteration, partition-wise execution, column pruning — is real and
tested.

100 TB notes: binary columns make row groups huge — writers should size
``parquet.block.size`` accordingly and keep metadata in separate
(prunable) columns; decode fan-out is embarrassingly parallel, so
``repartition`` by size-bucket before ``mapInPandas`` to even out task
skew from variable blob sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the (stub) image decoder.
DECODED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("decode_ok", T.BooleanType()),
])


def attach_binary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Harness adapter: manufacture an asset table from ``documents`` by
    encoding text as the binary payload (UTF-8) with a fake mime. In
    production this column comes straight from the source (Cosmos
    attachment, object-store pointer, …)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def binary_stats(assets: DataFrame) -> DataFrame:
    """Pure-metadata pass over binary payloads: byte length + sha256 —
    JVM-side, no decode, no Python."""
    return assets.select(
        "asset_id",
        "mime",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


def decode_images(assets: DataFrame, fake: bool = True,
                  batch_size_hint: int | None = None) -> DataFrame:
    """Decode binary image payloads to typed metadata via Arrow-batched
    ``mapInPandas``.

    ``fake=True`` (default in this container) runs a deterministic stub
    that derives plausible (width, height, channels) from the payload
    bytes; swap the marked block for Pillow's ``Image.open`` when a
    codec is available. ``fake=False`` is the production seam and raises
    until then.

    The batch closure is deliberately SELF-CONTAINED (imports inside, no
    module-level references): cloudpickle then ships it by value, so
    executors don't need this package importable on their Python path.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires Pillow/opencv, not present in this "
            "container — the mapInPandas plumbing below is codec-ready")

    out_cols = [f.name for f in DECODED_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = []
            for asset_id, content, mime in zip(pdf["asset_id"],
                                               pdf["content"], pdf["mime"]):
                b = bytes(content) if content is not None else b""
                h = hashlib.sha256(b).digest()
                # >>> codec seam: replace from here with a real decode <<<
                out.append({
                    "asset_id": asset_id,
                    "mime": mime,
                    "n_bytes": len(b),
                    "width": 64 + h[0] % 192,
                    "height": 64 + h[1] % 192,
                    "n_channels": 1 + h[2] % 4,
                    "decode_ok": len(b) > 0,
                })
                # >>> end codec seam <<<
            yield _pd.DataFrame(out, columns=out_cols)

    return assets.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explode each asset into frame-index
    rows (metadata only; actual frame extraction is the same stubbed
    codec seam). Shows the scale-shape: explode happens AFTER filters,
    so pruning cuts the fan-out."""
    n_frames = (F.length("content").cast("long") % 300 + 1).alias("n_frames")
    return (
        assets.withColumn("n_frames", n_frames)
        .withColumn("frame_idx",
                    F.explode(F.sequence(F.lit(0).cast("long"),
                                         F.col("n_frames") - 1,
                                         F.lit(every_n).cast("long"))))
        .select("asset_id", "mime", "n_frames", "frame_idx")
    )
