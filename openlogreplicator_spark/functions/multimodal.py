"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns plus typed metadata, the way a
100 TB training-data lake stores them.  All compute runs through
``mapInPandas`` — per-partition Arrow batch iterators, the ONLY sanctioned
Python-in-the-hot-path shape (vectorized, zero per-row serde) — so the
Spark-side plumbing (schema, batch iteration, partition sizing) is real and
tested even though the actual codecs are not in this container.

Codec policy: the decode steps are STUBS — ``decode='real'`` raises
NotImplementedError where PIL/ffmpeg would be called; the default
``decode='fake'`` derives deterministic features from the bytes (md5-seeded)
so pipelines and tests exercise identical shapes end-to-end.

Scale notes: media rows are large and few per partition — size
``spark.sql.files.maxPartitionBytes`` (or repartition by a size column) so
an Arrow batch of N rows fits executor memory; ``mapInPandas`` streams
batches, never materializing a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"
THUMB_SCHEMA = "media_id long, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm pseudo-feature from the bytes (md5-seeded) —
    the stand-in for a real encoder forward pass."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-12)


def extract_features(df: DataFrame, dim: int = 16, decode: str = "fake") -> DataFrame:
    """binary payload → embedding feature, batched via mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real decoders (PIL/torchvision/ffmpeg) are not in this "
                    "container; plug them in here"
                )
            feats = [
                _fake_feature(p if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256, decode: str = "fake") -> DataFrame:
    """Image thumbnailing; fake mode scales the metadata and truncates the
    payload deterministically (shape-preserving stand-in for PIL resize)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("PIL not in this container")
            out = []
            # itertuples, not iterrows: no per-row Series construction (rows
            # here are few-but-large media blobs, the loop stays cheap)
            for r in pdf[["media_id", "width", "height", "payload"]].itertuples(index=False):
                w = int(r.width) if pd.notna(r.width) else 0
                h = int(r.height) if pd.notna(r.height) else 0
                scale = min(max_side / max(w, h, 1), 1.0)
                tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
                payload = r.payload or b""
                cut = max(int(len(payload) * scale * scale), 1)
                out.append((r.media_id, payload[:cut], tw, th))
            yield pd.DataFrame(out, columns=["media_id", "thumb", "thumb_w", "thumb_h"])

    return df.filter(df.kind == "image").mapInPandas(op, schema=THUMB_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, decode: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled frame (fan-out
    inside the Arrow batch — the mapInPandas analog of explode)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("ffmpeg not in this container")
            rows = []
            for r in pdf[["media_id", "duration_ms", "payload"]].itertuples(index=False):
                dur = int(r.duration_ms) if pd.notna(r.duration_ms) else 0
                payload = r.payload or b""
                n = max(dur // every_ms, 1)
                for k in range(n):
                    tag = hashlib.md5(payload + k.to_bytes(4, "big")).digest()
                    rows.append((r.media_id, k, tag))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.filter(df.kind == "video").mapInPandas(op, schema=FRAME_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                (64 + i) if kind == "image" else None,
                (48 + i) if kind == "image" else None,
                (1000 * (1 + i % 7)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
