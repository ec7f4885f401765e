"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY §2.11 / north star): image/audio/video content travels
as a ``binary`` column plus a metadata struct (modality, byte length,
content hash). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partitioning) is real. Codecs: all three modalities decode FOR REAL
for their library-free container formats — PPM (P6) images, RIFF/WAVE
16-bit PCM audio, YUV4MPEG2 (4:2:0) video (``decode_ppm`` /
``decode_wav`` / ``decode_y4m`` — pure byte parsing + numpy, each
hash-checked end-to-end against an analytic oracle); raw-PCM window
energy is real numpy compute. Compressed formats that need external
libraries (JPEG/PNG/MP3/H.264/...) stay behind the documented
``NotImplementedError`` gate with the md5-deterministic fake
featureizer covering the plumbing.

At 100 TB: binary payloads dominate row size, so operators here avoid
shuffling payload bytes — features are extracted in a map-only pass and
the payload is dropped before any wide transformation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), False),
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("content_hash", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)


def attach_media_columns(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap a binary column into the canonical (media_id, payload, meta) shape."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("content_hash"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires an image library (PIL/opencv) — not present
    in this environment. The Spark plumbing around it is tested with
    the deterministic fake extractor below."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; use extract_features(deterministic fake) for plumbing"
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Map-only Arrow-batched feature extraction.

    Deterministic fake featureizer (md5-seeded) standing in for a real
    decode→embed pipeline; the schema/batching/partition behavior is
    exactly what a real extractor would use. Payload bytes are dropped
    in the same pass (never shuffled)."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf["payload"]:
                h = hashlib.md5(bytes(payload) if payload is not None else b"").digest()
                vec = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16)
                feats.append((vec.astype(np.float32) / 65535.0).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, _FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frame_bytes", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling: slice each payload into fixed-size
    frames, keep every ``stride``-th. One row in, many rows out — the
    row-expanding Arrow batch shape a real video pipeline uses (decode
    is byte-slicing here; a real codec would replace ``_frames`` only).
    Payload bytes never outlive the map task."""

    def _frames(payload: bytes | None):
        buf = bytes(payload) if payload is not None else b""
        n = max((len(buf) + frame_bytes - 1) // frame_bytes, 1)
        for i in range(0, n, stride):
            chunk = buf[i * frame_bytes : (i + 1) * frame_bytes]
            yield i, len(chunk), hashlib.md5(chunk).hexdigest()

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, sizes, hashes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, nb, h in _frames(payload):
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(nb)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "n_frame_bytes": pd.array(sizes, dtype="int32"),
                    "frame_hash": hashes,
                }
            )

    return media.mapInPandas(run, _FRAME_SCHEMA)


_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("rms_energy", T.DoubleType(), False),
    ]
)


def audio_window_energy(media: DataFrame, window: int = 1024) -> DataFrame:
    """Audio-style windowed RMS energy over the payload interpreted as
    raw 16-bit PCM — genuinely computed (no codec needed for raw PCM),
    vectorized numpy per Arrow batch. The VAD/silence-trim primitives
    of an audio curation pipeline have exactly this shape."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, energies = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload) if payload is not None else b""
                samples = np.frombuffer(buf[: len(buf) - (len(buf) % 2)], dtype="<i2")
                if len(samples) == 0:
                    samples = np.zeros(1, dtype="<i2")
                n_win = (len(samples) + window - 1) // window
                padded = np.zeros(n_win * window, dtype=np.float64)
                padded[: len(samples)] = samples.astype(np.float64)
                rms = np.sqrt((padded.reshape(n_win, window) ** 2).mean(axis=1))
                ids.extend([mid] * n_win)
                idxs.extend(range(n_win))
                energies.extend(np.round(rms, 6).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_idx": pd.array(idxs, dtype="int32"),
                    "rms_energy": energies,
                }
            )

    return media.mapInPandas(run, _ENERGY_SCHEMA)


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for binary PPM (P6) — pure byte parsing +
    numpy, no external image library (PPM is the one raster format
    whose codec is a header parse). Returns an (h, w, 3) uint8 array.

    Handles arbitrary header whitespace and '#' comment lines per the
    netpbm spec; rejects non-P6 magics and truncated rasters rather
    than guessing."""
    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


_PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
    ]
)


def ppm_image_stats(media: DataFrame) -> DataFrame:
    """Map-only Arrow-batched REAL decode of PPM payloads to per-image
    channel statistics (exact integer sums — engine-deterministic).
    The payload is consumed and dropped inside the same pass: only the
    six small stat columns ever leave the scan stage, which is the
    100 TB rule for binary columns."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("media_id", "width", "height", "sum_r", "sum_g", "sum_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out["media_id"].append(int(mid))
                out["height"].append(int(img.shape[0]))
                out["width"].append(int(img.shape[1]))
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, _PPM_STATS_SCHEMA)


def synthesize_ppm(media_id: int, width: int, height: int) -> bytes:
    """Deterministic P6 test image: pixel (x, y) has
    R=(3x+7y+id)%256, G=(5x+y+2id)%256, B=(x+11y+3id)%256 — a closed
    form both engines can recompute analytically (the oracle for the
    real-decode round trip)."""
    y, x = np.mgrid[0:height, 0:width]
    r = (3 * x + 7 * y + media_id) % 256
    g = (5 * x + y + 2 * media_id) % 256
    b = (x + 11 * y + 3 * media_id) % 256
    img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    header = f"P6\n# synthetic {media_id}\n{width} {height}\n255\n".encode()
    return header + img.tobytes()


def synthetic_ppm_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic P6 payload per id (the synthesize_ppm
    closed form; width 4+id%5, height 3+id%4) — Arrow-batched UDF, the
    test-harness side of the real-decode round trip."""

    @F.pandas_udf(T.BinaryType())
    def make_ppm(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: synthesize_ppm(int(i), 4 + int(i) % 5, 3 + int(i) % 4)
        )

    return df.withColumn("payload", make_ppm(id_col))


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL audio decode for RIFF/WAVE 16-bit PCM — pure chunk-walking
    + numpy (canonical WAV is, like PPM, a header grammar over raw
    samples). Returns (sample_rate, n_channels, samples) with samples
    shaped (n_frames, n_channels) int16.

    Walks the RIFF chunk list (skipping unknown chunks like LIST/fact,
    honoring the spec's even-byte chunk padding); rejects non-PCM
    encodings, bit depths other than 16, and truncated data chunks."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    f"only 16-bit PCM supported (format={audio_format}, bits={bits})"
                )
            fmt = (rate, channels)
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("truncated data chunk")
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    rate, channels = fmt
    samples = np.frombuffer(data[: len(data) - (len(data) % (2 * channels))], dtype="<i2")
    return rate, channels, samples.reshape(-1, channels)


_WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def wav_audio_stats(media: DataFrame) -> DataFrame:
    """Map-only Arrow-batched REAL WAV decode to per-clip statistics
    (exact integer sum of |sample| and peak amplitude) — payload
    consumed and dropped in the scan stage, the multimodal rule."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                k: []
                for k in (
                    "media_id", "sample_rate", "n_channels", "n_frames",
                    "sum_abs", "peak",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, ch, samples = decode_wav(bytes(payload))
                a = np.abs(samples.astype(np.int64))
                out["media_id"].append(int(mid))
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(int(ch))
                out["n_frames"].append(int(samples.shape[0]))
                out["sum_abs"].append(int(a.sum()))
                out["peak"].append(int(a.max()) if a.size else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, _WAV_STATS_SCHEMA)


def synthesize_wav(
    media_id: int, n_frames: int, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM WAV: frame i, channel c has sample
    ((7i + 13c + media_id) % 4001) - 2000 — a closed form both engines
    can recompute analytically. Includes a LIST chunk before fmt/data
    so decoders must actually walk the chunk grammar."""
    i = np.arange(n_frames)[:, None]
    c = np.arange(channels)[None, :]
    samples = (((7 * i + 13 * c + media_id) % 4001) - 2000).astype("<i2")
    data = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    lst = b"note"  # 4-byte dummy LIST body
    chunks = (
        b"LIST" + len(lst).to_bytes(4, "little") + lst
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def synthetic_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic WAV payload per id (n_frames 64+id%64,
    mono, 8 kHz)."""

    @F.pandas_udf(T.BinaryType())
    def make_wav(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synthesize_wav(int(i), 64 + int(i) % 64))

    return df.withColumn("payload", make_wav(id_col))


def decode_y4m(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL video decode for YUV4MPEG2 (4:2:0) — the raw-frame video
    container whose codec, like PPM/WAV, is a header grammar. Returns
    (width, height, y_planes) with y_planes shaped
    (n_frames, height, width) uint8 (luma; chroma planes are parsed
    past but not returned).

    Parses the stream header's parameter tokens (W/H mandatory,
    C420* colorspace only), then walks FRAME markers; rejects other
    colorspaces, odd dimensions, and truncated frames."""
    if payload is None or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    cspace = "C420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            cspace = t
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    if not cspace.startswith("C420"):
        raise ValueError(f"only 4:2:0 supported, got {cspace}")
    if w % 2 or h % 2:
        raise ValueError("4:2:0 requires even dimensions")
    y_size, c_size = w * h, (w // 2) * (h // 2)
    frame_size = y_size + 2 * c_size
    pos = nl + 1
    planes = []
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("expected FRAME marker")
        fnl = payload.index(b"\n", pos)
        pos = fnl + 1
        raster = payload[pos : pos + frame_size]
        if len(raster) != frame_size:
            raise ValueError("truncated frame")
        planes.append(
            np.frombuffer(raster[:y_size], dtype=np.uint8).reshape(h, w)
        )
        pos += frame_size
    return w, h, np.stack(planes) if planes else np.zeros((0, h, w), np.uint8)


_Y4M_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("luma_sum", T.LongType(), False),
    ]
)


def y4m_frame_luma(media: DataFrame, stride: int = 2) -> DataFrame:
    """Map-only Arrow-batched REAL video decode + frame sampling:
    every ``stride``-th frame's exact luma sum — the
    decode→frame-sample→featurize shape of a video curation pipeline,
    with the payload consumed inside the scan stage (row-expanding
    output like `sample_frames`, but from genuinely decoded frames)."""

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("media_id", "frame_idx", "width", "height", "luma_sum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, planes = decode_y4m(bytes(payload))
                for i in range(0, planes.shape[0], stride):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["luma_sum"].append(int(planes[i].sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "width": pd.array(out["width"], dtype="int32"),
                    "height": pd.array(out["height"], dtype="int32"),
                    "luma_sum": out["luma_sum"],
                }
            )

    return media.mapInPandas(run, _Y4M_FRAME_SCHEMA)


def synthesize_y4m(media_id: int, width: int, height: int, n_frames: int) -> bytes:
    """Deterministic 4:2:0 Y4M clip: luma(x, y, f) =
    (5x + 3y + 11f + media_id) % 256, chroma planes constant 128 —
    closed-form, recomputable analytically by the oracle."""
    y, x = np.mgrid[0:height, 0:width]
    chroma = np.full((height // 2) * (width // 2), 128, dtype=np.uint8).tobytes()
    parts = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()]
    for f in range(n_frames):
        luma = ((5 * x + 3 * y + 11 * f + media_id) % 256).astype(np.uint8)
        parts.append(b"FRAME\n" + luma.tobytes() + chroma + chroma)
    return b"".join(parts)


def synthetic_y4m_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic Y4M payload per id (width 4+2*(id%3),
    height 4+2*(id%2), 3+id%4 frames)."""

    @F.pandas_udf(T.BinaryType())
    def make_y4m(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: synthesize_y4m(
                int(i), 4 + 2 * (int(i) % 3), 4 + 2 * (int(i) % 2), 3 + int(i) % 4
            )
        )

    return df.withColumn("payload", make_y4m(id_col))
