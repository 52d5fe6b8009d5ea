"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch iteration, partition behavior) is
real and tested; the codec step is pluggable because decode libraries
(PIL/ffmpeg/librosa) are not in this container:

- ``decoder='stub'``    → raises NotImplementedError (the honest default);
- ``decoder='fake'``    → deterministic bytes-derived pseudo-decode so
  pipelines and tests exercise the full path;
- ``decoder='pil'``     → real image decode if PIL is importable.

At scale: mapInPandas streams Arrow batches, so a 100 TB binary corpus flows
through without per-row Python overhead; repartition by size-bucket first if
blob sizes are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, content binary, media_type string, "
    "meta struct<filename:string, source:string, declared_w:int, declared_h:int>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "mean_luma double, feature array<double>"
)


def _fake_decode(content: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic pseudo-decode: derive dims and a small 'pixel' array
    from the bytes. Stands in for a codec with the same interface."""
    if not content:
        return 0, 0, np.zeros((0, 0), dtype=np.uint8)
    arr = np.frombuffer(content, dtype=np.uint8)
    w = int(arr[: min(8, len(arr))].sum() % 31) + 2
    h = int(arr[-min(8, len(arr)):].sum() % 23) + 2
    pixels = np.resize(arr, (h, w))
    return w, h, pixels


def _pil_decode(content: bytes):
    from io import BytesIO

    from PIL import Image  # noqa: F401 — gated import

    img = Image.open(BytesIO(content)).convert("L")
    pixels = np.asarray(img, dtype=np.uint8)
    return img.width, img.height, pixels


_DECODERS = {"fake": _fake_decode, "pil": _pil_decode}


def extract_image_features(
    df: DataFrame, decoder: str = "stub", feature_bins: int = 8
) -> DataFrame:
    """Decode → feature-extract over a binary column: dims, byte size, mean
    luma, and a small luma-histogram feature vector (the embedding-ish
    output an ANN stage would consume)."""
    if decoder == "stub":
        raise NotImplementedError(
            "image decode requires a codec; use decoder='fake' for the "
            "deterministic test path or decoder='pil' with PIL installed"
        )
    decode = _DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            # zip over column arrays, not iterrows(): iterrows materializes a
            # Series per row and dominated the batch cost at round 1.
            for media_id, raw in zip(batch["media_id"], batch["content"]):
                content = bytes(raw) if raw is not None else b""
                w, h, pixels = decode(content)
                flat = pixels.astype(np.float64).ravel()
                hist = (
                    np.histogram(flat, bins=feature_bins, range=(0, 255))[0]
                    .astype(np.float64)
                )
                total = hist.sum()
                out.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "n_bytes": len(content),
                        "mean_luma": float(flat.mean()) if flat.size else 0.0,
                        "feature": (hist / total if total else hist).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling for video-ish blobs: emit up to ``max_frames`` chunks
    per media row (one output row per frame) — the UDTF-shaped explode a
    real ffmpeg sampler would produce. Chunking is byte-based here; the
    row-multiplying plumbing is what's under test."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for media_id, raw in zip(batch["media_id"], batch["content"]):
                content = bytes(raw) if raw is not None else b""
                for i in range(min(max_frames, max(1, len(content) // every_n_bytes))):
                    chunk = content[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_no": i,
                            "frame_bytes": chunk,
                            "frame_size": len(chunk),
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="media_id long, frame_no int, frame_bytes binary, frame_size int"
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media blobs so the
    multimodal path has a real corpus to run on in this container."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.concat_ws(".", F.col("doc_id").cast("string"), F.lit("bin")).alias(
                "filename"
            ),
            F.col("source").alias("source"),
            F.lit(None).cast("int").alias("declared_w"),
            F.lit(None).cast("int").alias("declared_h"),
        ).alias("meta"),
    )
