"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real -- schemas, partitioning, Arrow batch flow
through ``mapInPandas``, per-frame explosion. The codec layer has two
modes:

* ``real=False`` (default): a deterministic fake decode derived from the
  payload bytes -- schema-identical, runs on any payload, used by the
  driver queries so results never depend on payload format;
* ``real=True``: REAL dependency-free decoders -- PNG (:func:`decode_png`,
  stdlib ``zlib``: 8-bit grey/truecolor/+alpha, all five scanline filters)
  and binary PPM (P6, :func:`decode_ppm`) for images behind a
  magic-sniffing dispatcher (:func:`decode_image`), RIFF/WAVE PCM16 for
  audio (:func:`decode_wav`, stdlib ``wave``) and YUV4MPEG2 (Y4M, mono
  colorspace) for video (:func:`decode_y4m`) -- with real feature kernels
  (grid-pooled grayscale means for images and frames, windowed RMS
  energies for audio). Compressed video containers (h264/mp4/ogg) remain
  out of scope -- demuxing them genuinely needs ffmpeg; a production
  deployment swaps only the per-format kernel, every DataFrame shape
  stays identical.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, embedding array<float>"
)
AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms int, mfcc array<float>"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame array<float>"

_EMB_DIM = 16


def generate_media(
    spark: SparkSession, n: int = 64, seed: int = 13, codec: str = "fake"
) -> DataFrame:
    """Deterministic media table.

    ``codec='fake'``: payload = seeded pseudo-random bytes (any shape works
    for the fake decode). ``codec='real'``: image payloads are REAL binary
    PPMs, audio payloads REAL PCM16 WAVs, and video payloads REAL
    YUV4MPEG2 (Y4M mono) streams -- all seeded-deterministic, so the
    ``real=True`` decode path runs end-to-end on every modality.
    """
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        width = 64 + (i % 8) * 16 if kind != "audio" else None
        height = 48 + (i % 8) * 12 if kind != "audio" else None
        duration_ms = 1000 + i * 37 if kind != "image" else None
        rng = np.random.default_rng(seed * 1_000_003 + i)
        if codec == "real" and kind == "image":
            # alternate PNG / PPM payloads so the sniffing dispatcher and
            # both decoders run end-to-end in every real-codec table
            pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
            if (i // 3) % 2:
                payload = encode_png(pixels, filter_type=(i // 6) % 5)
            else:
                payload = encode_ppm(pixels)
        elif codec == "real" and kind == "audio":
            n_samples = 16000 * duration_ms // 1000
            payload = encode_wav(
                rng.integers(-32768, 32768, size=n_samples, dtype=np.int16), 16000
            )
        elif codec == "real" and kind == "video":
            n_frames = max(1, 25 * duration_ms // 1000)
            payload = encode_y4m(
                rng.integers(0, 256, size=(n_frames, height, width), dtype=np.uint8),
                fps=(25, 1),
            )
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8  # 256 B
        meta = {
            "width": width,
            "height": height,
            "duration_ms": duration_ms,
            "codec": {
                "image": "png" if (i // 3) % 2 else "ppm",
                "audio": "pcm16",
                "video": "y4m",
            }[kind]
            if codec == "real"
            else {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real, dependency-free codecs (the real=True path).
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 RGB array (h, w, 3) -> binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) -> (width, height, uint8 array (h, w, 3)).

    Full header grammar: magic, then width/height/maxval separated by
    whitespace, ``#`` comments allowed between tokens, single whitespace
    byte before the raster. Raises ValueError on anything else.
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, np.frombuffer(raster, dtype=np.uint8).reshape(
        height, width, 3
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 RGB array (h, w, 3) -> PNG (8-bit truecolor, non-interlaced).

    ``filter_type`` selects the per-scanline filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) applied to every row -- any compliant decoder
    reconstructs identical pixels, so round-tripping through each value
    exercises every unfilter path of :func:`decode_png`.
    """
    import zlib

    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    px = pixels.astype(np.int16)
    prev = np.zeros((w, 3), dtype=np.int16)
    raw = bytearray()
    for r in range(h):
        row = px[r]
        left = np.vstack([np.zeros((1, 3), np.int16), row[:-1]])
        upleft = np.vstack([np.zeros((1, 3), np.int16), prev[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - (left + prev) // 2
        elif filter_type == 4:
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, truecolor, deflate, adaptive, no interlace
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over int16 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG -> (width, height, uint8 RGB array (h, w, 3)). Pure stdlib.

    Supports 8-bit greyscale (0), truecolor (2), greyscale+alpha (4) and
    truecolor+alpha (6), non-interlaced, all five scanline filters;
    greyscale is expanded to RGB and alpha is dropped, so every supported
    file lands in the one feature-kernel shape. Palette (3), 16-bit and
    Adam7 files raise ValueError -- they never occur in ML training dumps'
    RGB exports, and a production deployment swaps this kernel for an
    image library while every DataFrame shape stays identical.
    """
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    channels = depth = interlace = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if (zlib.crc32(tag + body) & 0xFFFFFFFF) != int.from_bytes(
            payload[pos + 8 + length : pos + 12 + length], "big"
        ):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, color_type, _comp, _filt, interlace = body[8:13]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or color_type not in (0, 2, 4, 6):
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} "
            f"interlace={interlace}): only 8-bit non-interlaced "
            f"grey/truecolor (+alpha) is decoded here"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int16)
        if ftype == 0:
            recon = line
        elif ftype == 2:
            recon = (line + prev) % 256
        elif ftype in (1, 3, 4):
            # left-referencing filters are a per-pixel recurrence: the
            # reconstructed left neighbor feeds the next pixel, so walk
            # pixel groups; channels within a group vectorize
            recon = np.empty(stride, dtype=np.int16)
            for i in range(0, stride, channels):
                left = recon[i - channels : i] if i else np.zeros(channels, np.int16)
                up = prev[i : i + channels]
                upleft = (
                    prev[i - channels : i] if i else np.zeros(channels, np.int16)
                )
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, upleft)
                recon[i : i + channels] = (line[i : i + channels] + pred) % 256
        else:
            raise ValueError(f"unknown PNG scanline filter {ftype}")
        out[r] = recon.astype(np.uint8)
        prev = recon
    px = out.reshape(height, width, channels)
    if color_type == 0:
        px = np.repeat(px, 3, axis=2)
    elif color_type == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif color_type == 6:
        px = px[:, :, :3]
    return width, height, px


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Sniff the payload magic and decode: PNG or binary PPM (P6)."""
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    raise ValueError("unrecognized image payload (expected PNG or P6 PPM)")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes (stdlib ``wave``)."""
    assert samples.dtype == np.int16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (sample_rate, int16 samples of channel 0)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV is supported")
        rate = w.getframerate()
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        if w.getnchannels() > 1:
            frames = frames[:: w.getnchannels()]
    return rate, frames


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """uint8 grayscale frames (n, h, w) -> YUV4MPEG2 stream (Cmono).

    Y4M is the uncompressed interchange format of the mjpegtools suite
    (also read/written by ffmpeg): a text stream header, then one
    ``FRAME\\n`` marker + raw plane bytes per frame. ``Cmono`` carries the
    luma plane only, so a frame is exactly ``h*w`` bytes.
    """
    n, h, w = frames.shape
    assert frames.dtype == np.uint8
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, fps[0], fps[1])
    return head + b"".join(
        b"FRAME\n" + frames[i].tobytes() for i in range(n)
    )


def decode_y4m(payload: bytes) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """YUV4MPEG2 (Cmono) -> (width, height, (fps_num, fps_den),
    uint8 frames (n, h, w)). Raises ValueError on anything else --
    compressed containers need ffmpeg and are out of scope by design."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps = (25, 1)
    colorspace = "420jpeg"  # the Y4M default when C is absent
    for tag in payload[9:nl].split():
        key, val = tag[:1], tag[1:].decode()
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == b"C":
            colorspace = val
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "mono":
        raise ValueError(f"only Cmono Y4M is supported, got C{colorspace}")
    frame_bytes = width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        pos = fnl + 1
        raw = payload[pos : pos + frame_bytes]
        if len(raw) != frame_bytes:
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(raw, dtype=np.uint8).reshape(height, width))
        pos += frame_bytes
    return width, height, fps, np.stack(frames) if frames else np.empty(
        (0, height, width), dtype=np.uint8
    )


def _gray_embedding(gray: np.ndarray, dim: int = _EMB_DIM) -> np.ndarray:
    """Grid-pooled means of a grayscale plane, in [0, 1]."""
    h, w = gray.shape
    gray = gray.astype(np.float64)
    g = int(np.sqrt(dim))
    cells = [
        gray[h * r // g : h * (r + 1) // g, w * c // g : w * (c + 1) // g].mean()
        for r in range(g)
        for c in range(g)
    ]
    return (np.array(cells) / 255.0).astype(np.float32)


def _image_embedding(pixels: np.ndarray, dim: int = _EMB_DIM) -> np.ndarray:
    """Real image feature: 4x4 grid-pooled grayscale means in [0, 1]."""
    return _gray_embedding(pixels.astype(np.float64).mean(axis=2), dim)


def _audio_energies(samples: np.ndarray, dim: int = _EMB_DIM) -> np.ndarray:
    """Real audio feature: RMS energy of ``dim`` equal windows, in [0, 1]."""
    n = len(samples)
    x = samples.astype(np.float64) / 32768.0
    out = []
    for i in range(dim):
        win = x[n * i // dim : n * (i + 1) // dim]
        out.append(float(np.sqrt(np.mean(win * win))) if len(win) else 0.0)
    return np.array(out, dtype=np.float32)


def _fake_embedding(payload: bytes, dim: int = _EMB_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: bytes -> unit vector."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / 2**32) - 0.5
    return (v / np.linalg.norm(v)).astype(np.float32)


def decode_image_features(media: DataFrame, real: bool = False) -> DataFrame:
    """image rows -> (media_id, width, height, embedding).

    Arrow-batched ``mapInPandas``: each batch decodes payloads column-wise.
    ``real=True`` decodes PNG or binary PPM payloads (magic-sniffed,
    :func:`decode_image`) and extracts grid-pooled grayscale features from
    the actual pixels -- width/height come from the image header, not the
    metadata column.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                decoded = [decode_image(bytes(p)) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": [w for w, _, _ in decoded],
                        "height": [h for _, h, _ in decoded],
                        "embedding": [
                            _image_embedding(px).tolist() for _, _, px in decoded
                        ],
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "embedding": pdf["payload"].map(
                        lambda p: _fake_embedding(bytes(p)).tolist()
                    ),
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        op, IMAGE_FEATURES_SCHEMA
    )


def decode_audio_features(media: DataFrame, real: bool = False) -> DataFrame:
    """audio rows -> (media_id, duration_ms, mfcc[16]).

    ``real=True`` parses RIFF/WAVE PCM16 payloads (:func:`decode_wav`) --
    duration is derived from the actual frame count and sample rate, and
    the feature vector is the windowed RMS energy of the real samples.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                decoded = [decode_wav(bytes(p)) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "duration_ms": [
                            int(round(len(s) * 1000 / r)) for r, s in decoded
                        ],
                        "mfcc": [_audio_energies(s).tolist() for _, s in decoded],
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"]),
                    "mfcc": pdf["payload"].map(
                        lambda p: _fake_embedding(bytes(p)).tolist()
                    ),
                }
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        op, AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 500, real: bool = False
) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx,
    frame_ms, frame-embedding).

    ``real=True`` demuxes YUV4MPEG2 payloads (:func:`decode_y4m`), picks
    the frame nearest each ``every_ms`` timestamp from the stream's own
    frame rate, and embeds the actual luma plane. Duration comes from the
    real frame count, not the metadata column. Compressed containers
    (h264 etc.) raise ValueError -- demuxing them needs ffmpeg.

    The fan-out (rows-per-frame) happens inside the Arrow batch, so a long
    video never materializes as one giant row downstream.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_ms": [], "frame": []
            }
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                if real:
                    _, _, (num, den), frames = decode_y4m(payload)
                    duration = int(len(frames) * 1000 * den / num)
                    for idx, ms in enumerate(range(0, duration, every_ms)):
                        src = min(int(round(ms * num / (1000 * den))), len(frames) - 1)
                        out["media_id"].append(row["media_id"])
                        out["frame_idx"].append(idx)
                        out["frame_ms"].append(ms)
                        out["frame"].append(_gray_embedding(frames[src]).tolist())
                    continue
                duration = row["meta"]["duration_ms"] or 0
                for idx, ms in enumerate(range(0, duration, every_ms)):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(idx)
                    out["frame_ms"].append(ms)
                    out["frame"].append(
                        _fake_embedding(payload + idx.to_bytes(4, "little")).tolist()
                    )
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").mapInPandas(op, FRAME_SCHEMA)
