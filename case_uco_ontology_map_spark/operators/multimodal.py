"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED behind
``decoder=`` hooks because image/audio libraries are not in this container
— swap in PIL/torchaudio decoders on a real cluster without touching the
dataflow. The deterministic fake decoder makes the plumbing testable.

Design notes for 100 TB:
  * binary payloads stay OUT of every plan that doesn't decode them —
    readers must select only metadata columns (Parquet column pruning);
  * decode/resize/frame-sample are mapInPandas over Arrow binary arrays —
    one Python crossing per stage, batch-sized by
    spark.sql.execution.arrow.maxRecordsPerBatch;
  * feature vectors come back as array<float> ready for
    operators.similarity / operators.dedup.embedding_near_dups.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: sha256-seeded
    pseudo-pixels of the declared shape. REPLACE with a real codec
    (e.g. PIL.Image.open) on a cluster with the library installed."""
    digest = hashlib.sha256(payload).digest()
    seed = struct.unpack("<Q", digest[:8])[0] % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def real_decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """The production decode hook. Not implemented in this container."""
    raise NotImplementedError(
        "real image/audio decoding requires PIL/torchaudio — not available "
        "in this environment; inject via decoder= parameter"
    )


Decoder = Callable[[bytes, int, int], np.ndarray]


def extract_image_features(
    media: DataFrame,
    dim: int = 64,
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """payload → feature embedding (array<float>): decode (hook), downsample
    to an 8×8 gray thumbnail, flatten, L2-normalize. One mapInPandas
    crossing; output joins operators.similarity directly."""
    decode = decoder or fake_decode
    out_schema = "media_id long, url string, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        side = int(np.sqrt(dim))
        for pdf in batches:
            rows = []
            for mid, url, payload, w, h in zip(
                pdf["media_id"], pdf["url"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if payload is None or not w or not h:
                    rows.append((mid, url, None))
                    continue
                img = decode(bytes(payload), int(w), int(h))
                gray = img.mean(axis=2)
                ys = np.linspace(0, gray.shape[0] - 1, side).astype(int)
                xs = np.linspace(0, gray.shape[1] - 1, side).astype(int)
                thumb = gray[np.ix_(ys, xs)].astype(np.float64).ravel()
                norm = np.linalg.norm(thumb)
                feat = (thumb / norm if norm > 0 else thumb).astype(np.float32)
                rows.append((mid, url, feat.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "url", "feature"])

    return media.select("media_id", "url", "payload", "width", "height").mapInPandas(
        kernel, schema=out_schema
    )


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    decoder: Optional[Decoder] = None,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode as raw RGB bytes with
    updated metadata. Demonstrates binary-in/binary-out batch shape."""
    decode = decoder or fake_decode
    out_schema = (
        "media_id long, url string, payload binary, width int, height int"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, payload, w, h in zip(
                pdf["media_id"], pdf["url"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if payload is None or not w or not h:
                    rows.append((mid, url, None, None, None))
                    continue
                img = decode(bytes(payload), int(w), int(h))
                ys = np.linspace(0, img.shape[0] - 1, target_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, target_w).astype(int)
                resized = img[np.ix_(ys, xs)]
                rows.append(
                    (mid, url, resized.tobytes(), target_w, target_h)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "url", "payload", "width", "height"]
            )

    return media.select("media_id", "url", "payload", "width", "height").mapInPandas(
        kernel, schema=out_schema
    )


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan: one output row per sampled timestamp with the
    frame STUBBED as a deterministic slice of the payload (a real frame
    grabber plugs into the same row shape). Explodes duration_ms into
    timestamps JVM-side — only the frame extraction is Python."""
    timestamps = F.sequence(
        F.lit(0),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    exploded = media.filter(F.col("media_type") == "video").select(
        "media_id",
        "url",
        "payload",
        F.explode(timestamps).alias("frame_ts_ms"),
    )
    out_schema = "media_id long, url string, frame_ts_ms int, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, payload, ts in zip(
                pdf["media_id"], pdf["url"], pdf["payload"], pdf["frame_ts_ms"]
            ):
                if payload is None:
                    rows.append((mid, url, ts, None))
                    continue
                b = bytes(payload)
                # STUB: deterministic 16-byte "frame" per timestamp
                start = (int(ts) * 7) % max(len(b) - 16, 1)
                rows.append((mid, url, ts, b[start : start + 16]))
            yield pd.DataFrame(
                rows, columns=["media_id", "url", "frame_ts_ms", "frame"]
            )

    return exploded.mapInPandas(kernel, schema=out_schema)
