"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``.  The decode step itself is
STUBBED (image/audio libs are not in this container): ``decode_stub``
produces deterministic fake features, and ``decode_real`` raises
NotImplementedError with the intended contract — the Spark-side plumbing
(schema, batch shape, partition sizing) is real and tested.

Scale notes: binary payloads dominate row size, so
* metadata-only stages must NOT read the payload — keep payload in its own
  column and select it away early (column pruning drops it from the scan);
* batches are capped by spark.sql.execution.arrow.maxRecordsPerBatch so a
  batch of large blobs fits executor memory;
* payload-heavy tables should be partitioned by size, not row count
  (maxPartitionBytes), which parquet + Spark handle natively.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


try:  # optional dependency gate: the real image path lights up when pillow exists
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """The real decode contract: payload -> pixel array / PCM samples.

    * image/* — pillow (optional import): grayscale pixel grid in [0, 1].
    * audio/wav — stdlib ``wave``: PCM samples in [-1, 1] (no external dep,
      so this path is REAL and tested in every environment).
    * anything else (video containers, compressed audio) needs pyav /
      libsndfile — NotImplementedError with the swap-in contract.
    """
    if mime.startswith("image/"):
        if not HAVE_PIL:
            raise NotImplementedError(
                "image decode requires pillow (pip install pillow); decode_stub "
                "is the fallback with the same (payload, mime) -> ndarray shape"
            )
        import io

        img = _PILImage.open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.float64) / 255.0
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            raw = w.readframes(w.getnframes())
            width = w.getsampwidth()
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None:
            raise NotImplementedError(f"unsupported PCM sample width {width}")
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if width == 1:  # 8-bit wav is unsigned
            return (samples - 128.0) / 128.0
        return samples / float(2 ** (8 * width - 1))
    raise NotImplementedError(
        f"no decoder for mime {mime!r}: video/compressed audio require pyav / "
        "libsndfile — swap in a decoder with the same (payload, mime) -> "
        "ndarray signature"
    )


def featurize(arr: np.ndarray) -> np.ndarray:
    """Pool any decoded array (pixel grid / PCM samples) to a FEATURE_DIM
    float32 vector: flatten, pad, column-mean — the same pooling the stub
    applies to raw bytes, so stub and real paths share one feature shape."""
    flat = np.asarray(arr, dtype=np.float64).ravel()
    if flat.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    pad = (-flat.size) % FEATURE_DIM
    return (
        np.pad(flat, (0, pad)).reshape(-1, FEATURE_DIM).mean(axis=0).astype(np.float32)
    )


def real_decoder(payload: bytes, mime: str) -> np.ndarray:
    """decode_real + featurize — drop-in for extract_features(decoder=...)."""
    return featurize(decode_real(payload, mime))


def decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic fake decode: a FEATURE_DIM float vector derived from the
    byte content — stable across runs, so downstream tests are exact."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    pad = (-len(arr)) % FEATURE_DIM
    a = np.pad(arr, (0, pad)).reshape(-1, FEATURE_DIM).astype(np.float64)
    return (a.mean(axis=0) / 255.0).astype(np.float32)


def extract_features(media: DataFrame, decoder=decode_stub) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out.
    Payload column is dropped on output (features are small; blobs are not)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, checks, sizes = [], [], []
            for payload, mime in zip(b["payload"], b["mime"]):
                data = bytes(payload) if payload is not None else b""
                feats.append([float(x) for x in decoder(data, mime)])
                arr = np.frombuffer(data, dtype=np.uint8)
                checks.append(int(arr.astype(np.uint64).sum() % (2**62)))
                sizes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "modality": b["modality"],
                    "n_bytes": sizes,
                    "checksum": checks,
                    "feature": feats,
                }
            )

    return media.select("media_id", "modality", "mime", "payload").mapInPandas(
        run, schema=FEATURES
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — pure column
    arithmetic (sequence/explode); the decode of each frame is the stubbed
    step.  Demonstrates fan-out without touching payloads."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """mapInPandas resize: nearest-neighbor downsample of the payload
    interpreted as a width x height byte grid (the stub-decode pixel
    stand-in; a real deployment swaps the grid for decode_real's pixel
    array — identical batch shape and schema).  Non-image rows pass through
    untouched; output schema == input schema (MEDIA), width/height updated.
    Deterministic, so tests are exact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads, ws, hs = [], [], []
            for payload, mod, w in zip(b["payload"], b["modality"], b["width"]):
                if mod != "image" or payload is None:
                    payloads.append(payload)
                    ws.append(None)
                    hs.append(None)
                    continue
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                sw = int(w) if not pd.isnull(w) and w > 0 else max(
                    int(np.ceil(np.sqrt(max(len(data), 1)))), 1
                )
                sh = max(int(np.ceil(len(data) / sw)), 1)
                grid = np.pad(data, (0, sw * sh - len(data))).reshape(sh, sw)
                yi = (np.arange(out_h) * sh) // out_h
                xi = (np.arange(out_w) * sw) // out_w
                payloads.append(grid[np.ix_(yi, xi)].astype(np.uint8).tobytes())
                ws.append(out_w)
                hs.append(out_h)
            out = b.copy()
            out["payload"] = payloads
            out["width"] = pd.Series(
                [w if w is not None else b["width"].iloc[i] for i, w in enumerate(ws)],
                index=b.index,
                dtype="object",
            )
            out["height"] = pd.Series(
                [h if h is not None else b["height"].iloc[i] for i, h in enumerate(hs)],
                index=b.index,
                dtype="object",
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA)


def synthetic_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic media fixture: payload bytes derived from (seed, id)."""
    rng = np.random.default_rng(seed)
    rows = []
    mods = ["image", "audio", "video"]
    for i in range(n):
        m = mods[i % 3]
        size = int(rng.integers(64, 4096))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        rows.append(
            (
                i,
                m,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[m],
                payload,
                64 if m == "image" else None,
                48 if m == "image" else None,
                int(rng.integers(500, 5000)) if m != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA)
