"""Multimodal column operators: image/audio/video as opaque binary +
typed metadata.

The container has no image/audio codecs, so the decode step is a
deterministic fake behind ``FAKE_CODEC`` (shape-correct, seedable) —
the Spark-side plumbing (schemas, Arrow batch shape, partitioning,
UDF signatures) is real and tested. Swapping in PIL/librosa is a
one-function change inside the kernel.

Media rows ride with pages as extra resource parts (content_type
image/*), so the canonical source is the exploded ``resources``
relation from parse.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = ("url string, part_index int, content_type string, "
                  "n_bytes bigint, media_kind string")

FEATURES_DDL = ("url string, part_index int, media_kind string, "
                "width int, height int, n_frames int, "
                "feature array<float>")

FAKE_CODEC = True  # no PIL/cv2/librosa in this container


def media_resources(resources: DataFrame) -> DataFrame:
    """Filter resource parts to media mime types and attach a typed
    ``media_kind`` column — pure Catalyst ops."""
    kind = (F.when(F.col("content_type").startswith("image/"), "image")
            .when(F.col("content_type").startswith("audio/"), "audio")
            .when(F.col("content_type").startswith("video/"), "video"))
    return (resources
            .withColumn("media_kind", kind)
            .where(F.col("media_kind").isNotNull())
            .select("url", "part_index", "content_type", "content",
                    F.length("content").alias("n_bytes"), "media_kind"))


def _fake_decode(blob: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real codec: derives a stable
    (width, height, n_frames, 8-dim feature) straight from the blob
    bytes — a "header read", like a real codec sniffing dimensions.
    Pure byte arithmetic (no hashing) so the DuckDB correctness
    oracle can restate it from the page generator's blob rule."""
    if FAKE_CODEC:
        h = (blob or b"").ljust(16, b"\0")
        width = 16 + h[0] % 240
        height = 16 + h[1] % 240
        n_frames = 1 + h[2] % 4
        feat = [(b - 128) / 128.0 for b in h[8:16]]
        return width, height, n_frames, feat
    raise NotImplementedError(
        "real codec path: plug PIL.Image.open(io.BytesIO(blob)) here")


def extract_features(media: DataFrame, batch_size_hint: int = 64
                     ) -> DataFrame:
    """Decode + featurize media parts via mapInArrow.

    Batch shape: binary blobs stay in Arrow buffers end-to-end; the
    kernel touches bytes only inside the (stub) codec. At scale this
    stage is CPU-bound and embarrassingly parallel — keep it a narrow
    map after a ``repartition`` sized to executor count if upstream
    partitions are few.
    """
    import pyarrow as pa

    schema = pa.schema([
        ("url", pa.string()), ("part_index", pa.int32()),
        ("media_kind", pa.string()), ("width", pa.int32()),
        ("height", pa.int32()), ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ])

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            idxs = batch.column("part_index").to_pylist()
            kinds = batch.column("media_kind").to_pylist()
            blobs = batch.column("content").to_pylist()
            ws, hs, nf, feats = [], [], [], []
            for blob in blobs:
                w, h, n, f = _fake_decode(blob)
                ws.append(w)
                hs.append(h)
                nf.append(n)
                feats.append(f)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(idxs, pa.int32()),
                 pa.array(kinds, pa.string()),
                 pa.array(ws, pa.int32()), pa.array(hs, pa.int32()),
                 pa.array(nf, pa.int32()),
                 pa.array(feats, pa.list_(pa.float32()))],
                schema=schema)

    return media.select("url", "part_index", "media_kind", "content") \
        .mapInArrow(kernel, FEATURES_DDL)


def frame_sample(features: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode n_frames into frame indices,
    keep every ``every``-th — demonstrates the video path's row
    explosion shape without a real decoder."""
    return (features
            .where(F.col("media_kind") == "video")
            .select("url", "part_index",
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"))
            .where(F.col("frame_idx") % every == 0))
