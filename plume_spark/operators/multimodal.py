"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``.  ``decode_real`` is REAL in
every environment for netpbm images (pure-Python P5/P6), 8-bit PNG
(pure-Python over stdlib zlib — a genuinely compressed codec), PCM wav
(stdlib ``wave``), and YUV4MPEG2 video; JPEG/WebP ride the optional pillow
gate, and compressed audio/video codecs raise NotImplementedError with the
swap-in contract (pyav/libsndfile are not in this container), with
``decode_stub`` as the deterministic fake for oracle-checked plumbing tests.

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


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Pure-Python decoder for binary netpbm images (P5 grayscale / P6 RGB):
    grayscale pixel grid in [0, 1].  No dependency, so the REAL image branch
    of decode_real is exercised in every environment — pillow extends
    coverage to compressed formats (PNG/JPEG) when present.  RGB collapses
    with pillow's integer ITU-R 601-2 luma ((299R + 587G + 114B) // 1000),
    so P6 decoded here is bit-identical to pillow's convert("L")."""
    magic = payload[:2]
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:  # width, height, maxval; '#' comments allowed
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm samples not supported")
    ch = 1 if magic == b"P5" else 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    if ch == 1:
        gray = raster.reshape(h, w).astype(np.float64)
    else:
        rgb = raster.reshape(h, w, 3).astype(np.uint32)
        gray = (
            (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
        ).astype(np.float64)
    return gray / float(maxval)


def _decode_png(payload: bytes) -> np.ndarray:
    """Pure-Python PNG decoder (stdlib ``zlib`` only): 8-bit non-interlaced
    grayscale / RGB / RGBA / gray+alpha / palette images -> grayscale pixel
    grid in [0, 1].  PNG is a genuinely COMPRESSED format (DEFLATE stream +
    per-scanline predictive filters), so with this the real image branch of
    :func:`decode_real` covers a compressed codec in every environment — no
    pillow needed.  All five reconstruction filters (None/Sub/Up/Average/
    Paeth, PNG spec §9) are implemented; 16-bit depth and Adam7 interlacing
    raise loudly (pillow remains the swap-in for those).  RGB collapses with
    the module's integer ITU-R 601-2 luma, matching the netpbm path."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos = 8
    idat = bytearray()
    plte = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + CRC
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported (8 only)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    bpp = channels  # bytes per pixel at depth 8
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    rows: list[bytes] = []
    prev = bytes(stride)
    at = 0
    for _y in range(h):
        ftype = raw[at]
        cur = bytearray(raw[at + 1 : at + 1 + stride])
        at += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        prev = bytes(cur)
        rows.append(prev)
    px = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, channels)
    if ctype == 3:  # palette indices -> RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        px = plte[px[..., 0]]
        channels = 3
    if channels <= 2:  # grayscale (alpha, if any, dropped — features are luma)
        gray = px[..., 0].astype(np.float64)
    else:
        rgb = px[..., :3].astype(np.uint32)
        gray = (
            (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
        ).astype(np.float64)
    return gray / 255.0


def _decode_y4m(payload: bytes) -> np.ndarray:
    """Pure-Python decoder for uncompressed YUV4MPEG2 video: (n_frames, h, w)
    luma grid in [0, 1].  y4m is the standard raw-video interchange format
    (mjpegtools/ffmpeg `-f yuv4mpegpipe`): one global header line
    ``YUV4MPEG2 W<w> H<h> F<num:den> [C<fmt>]``, then per frame a ``FRAME``
    line followed by raw planes.  Only the luma plane is kept (features are
    grayscale everywhere in this module); chroma bytes are skipped by the
    per-colorspace frame stride.  Compressed codecs still raise — the
    swap-in is pyav with the same (payload) -> (n, h, w) shape."""
    header_end = payload.index(b"\n")
    header = payload[:header_end].decode("ascii")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    cspace = "420"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C":
            cspace = tok[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    luma = w * h
    chroma = {
        "420": luma // 2, "420jpeg": luma // 2, "420mpeg2": luma // 2,
        "420paldv": luma // 2, "422": luma, "444": luma * 2, "mono": 0,
    }
    extra = chroma.get(cspace.split("p")[0] if cspace.startswith("420p") else cspace)
    if extra is None:
        raise NotImplementedError(f"y4m colorspace {cspace!r} not supported")
    frames = []
    pos = header_end + 1
    while pos < len(payload):
        nl = payload.index(b"\n", pos)  # FRAME [params]
        if not payload[pos:nl].startswith(b"FRAME"):
            raise ValueError("y4m frame marker missing")
        pos = nl + 1
        frames.append(np.frombuffer(payload, dtype=np.uint8, count=luma, offset=pos))
        pos += luma + extra
    return np.stack(frames).reshape(len(frames), h, w).astype(np.float64) / 255.0


def _decode_qoi(payload: bytes) -> np.ndarray:
    """Pure-Python decoder for QOI images (the public "Quite OK Image"
    spec, qoiformat.org, v1.0): a second genuinely COMPRESSED codec (after
    PNG/zlib) decoded for real with zero dependencies — run-length, seen-
    pixel index, byte-diff and luma-diff ops.  Returns the same [0, 1]
    grayscale grid as the other image paths (integer ITU-R 601-2 luma, so
    RGB collapse is bit-identical to _decode_pnm/_decode_png)."""
    if payload[:4] != b"qoif" or len(payload) < 22:
        raise ValueError("not a QOI stream")
    w = int.from_bytes(payload[4:8], "big")
    h = int.from_bytes(payload[8:12], "big")
    if w == 0 or h == 0 or w * h > 1 << 26:
        raise ValueError(f"bad QOI dimensions {w}x{h}")
    # channels (payload[12]) and colorspace (payload[13]) are advisory —
    # the op stream is self-describing either way
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    out = np.empty((h * w, 3), dtype=np.uint8)
    pos, at = 0, 14
    n = h * w
    while pos < n:
        byte = payload[at]
        at += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, b = payload[at], payload[at + 1], payload[at + 2]
            at += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = (
                payload[at], payload[at + 1], payload[at + 2], payload[at + 3]
            )
            at += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF (2-bit deltas, bias 2)
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA (6-bit dg, 4-bit dr-dg / db-dg)
                b2 = payload[at]
                at += 1
                dg = (byte & 0x3F) - 32
                r = (r + dg - 8 + ((b2 >> 4) & 0x0F)) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg - 8 + (b2 & 0x0F)) & 0xFF
            else:  # QOI_OP_RUN (bias -1; 0xFE/0xFF handled above)
                run = (byte & 0x3F) + 1
                if pos + run > n:
                    raise ValueError("QOI run past end of image")
                out[pos : pos + run] = (r, g, b)
                pos += run
                continue
        out[pos] = (r, g, b)
        pos += 1
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
    rgb = out.reshape(h, w, 3).astype(np.uint32)
    gray = (
        (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    ).astype(np.float64)
    return gray / 255.0


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """The real decode contract: payload -> pixel array / PCM samples /
    frame stack.

    * image/* netpbm (P5/P6) — pure-Python ``_decode_pnm``: no dependency,
      REAL and tested in every environment;
    * image/png (8-bit, non-interlaced) — pure-Python ``_decode_png`` over
      stdlib zlib: a genuinely COMPRESSED codec decoded for real with no
      dependency, all five scanline filters;
    * image QOI (``qoif`` magic) — pure-Python ``_decode_qoi``: a second
      real compressed codec (run-length / index / diff / luma ops), zero
      dependencies;
    * other image/* (JPEG/WebP/16-bit or interlaced PNG) — pillow (optional
      import): grayscale pixel grid in [0, 1], same luma as the netpbm path;
    * audio/wav — stdlib ``wave``: PCM samples in [-1, 1] (no external dep,
      so this path is REAL and tested in every environment);
    * video/* YUV4MPEG2 — pure-Python ``_decode_y4m``: (n_frames, h, w)
      luma stack, REAL in every environment.
    * anything else (compressed video/audio codecs) needs pyav /
      libsndfile — NotImplementedError with the swap-in contract.
    """
    if mime.startswith("image/"):
        if payload[:2] in (b"P5", b"P6"):
            return _decode_pnm(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(payload)
        if payload[:4] == b"qoif":
            return _decode_qoi(payload)
        if not HAVE_PIL:
            raise NotImplementedError(
                "JPEG/WebP decode requires pillow (pip install pillow); "
                "netpbm P5/P6 and 8-bit PNG decode without it, and "
                "decode_stub is the fallback with the same "
                "(payload, mime) -> ndarray shape"
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
    if mime.startswith("video/") and payload[:9] == b"YUV4MPEG2":
        return _decode_y4m(payload)
    raise NotImplementedError(
        f"no decoder for mime {mime!r}: compressed video/audio codecs require "
        "pyav / libsndfile — swap in a decoder with the same (payload, mime) "
        "-> ndarray signature"
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


FRAME_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_frame_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL per-frame features for raw (YUV4MPEG2) video payloads: decode
    the luma stack with ``_decode_y4m``, keep every ``every_n``-th frame,
    featurize each to a FEATURE_DIM vector — the video analog of
    extract_features, fan-out included (one input row -> one row per
    sampled frame).  Arrow batches in/out; non-video rows are dropped by
    the plan's filter, and payloads never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, totals, feats = [], [], [], []
            for media_id, payload, mime in zip(b["media_id"], b["payload"], b["mime"]):
                if payload is None:
                    continue
                stack = decode_real(bytes(payload), mime)
                for i in range(0, len(stack), every_n):
                    ids.append(media_id)
                    idxs.append(i)
                    totals.append(len(stack))
                    feats.append([float(x) for x in featurize(stack[i])])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_frames": totals, "feature": feats}
            )

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "mime", "payload")
        .mapInPandas(run, schema=FRAME_FEATURES)
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
