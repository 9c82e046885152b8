"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing — schema,
batch shape, partitioning, UDF signatures — is real and tested.

Decode contract: the deterministic fake (``fake=True``, the default) is the
PERMANENT test/bench contract — SHA-256-derived feature vectors, stable
across processes and oracle-checkable (frame counts + shapes have an exact
SQL oracle in ``__spark_entry__``). The real-codec path stays import-gated
(``fake=False`` raises ``NotImplementedError`` until Pillow/av are present,
surfaced per-row through the ``error`` column, never a task failure).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType()),       # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def _decode_real(payload: bytes, mime: str) -> np.ndarray:  # pragma: no cover
    """Where a real decoder goes. Kept import-gated so environments with
    Pillow/av get real decode without code changes."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires Pillow/av; not present in this container"
        ) from exc
    raise NotImplementedError("real decode path not wired yet")


def _decode_fake(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake decode: SHA-256 of the payload expanded into a
    float feature vector — stable across processes, exercises the full
    Arrow round-trip with realistic shapes."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def media_features_df(
    media: DataFrame, dim: int = 16, frame_stride_ms: int = 1000,
    fake: bool = True,
) -> DataFrame:
    """media table → per-item feature vectors (+ frame sampling for video).

    Batch shape: one Arrow batch holds whole payloads; keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` low for large media
    (same sizing rule as HTML rows, session.py).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            kinds = pdf["kind"].to_numpy()
            durs = (
                pd.to_numeric(pdf["duration_ms"], errors="coerce")
                .fillna(0)
                .astype("int64")
                .to_numpy()
            )
            # whole-batch frame counts (video samples every frame_stride_ms)
            n_frames = np.where(
                kinds == "video",
                np.maximum(1, durs // frame_stride_ms),
                1,
            ).astype("int32")
            feats = np.zeros((n, dim), dtype=np.float64)
            errors: list[str | None] = [None] * n
            # column-zip iteration (NOT iterrows: no per-row Series build);
            # the sha256 per frame is C-speed
            for i, (payload, mime, nf) in enumerate(
                zip(pdf["payload"].to_numpy(), pdf["mime"].to_numpy(), n_frames)
            ):
                try:
                    if fake:
                        p = bytes(payload) if payload is not None else b""
                        acc = np.zeros(dim, dtype=np.float64)
                        for k in range(int(nf)):
                            acc += _decode_fake(p + bytes([k % 256]), dim)
                        feats[i] = acc / int(nf)
                    else:
                        feats[i] = _decode_real(payload, mime)[:dim]
                except NotImplementedError as exc:
                    errors[i] = str(exc)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].to_numpy(),
                    "kind": kinds,
                    "feature": [row.astype(np.float32) for row in feats],
                    "n_frames": n_frames,
                    "error": errors,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def fake_media_table(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows for tests/bench."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        rows.append(
            (
                f"m-{i:06d}", kind,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                rng.randrange(1000, 10000) if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
