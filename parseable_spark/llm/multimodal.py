"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two tiers:

1. REAL pure-Python decoders that need no codec libraries: 24-bit BMP
   (struct header parse + numpy pixel math, padding and bottom-up row
   order handled), baseline JPEG (full T.81 marker walk + Huffman +
   IDCT in `llm/jpeg.py` — image payloads are format-sniffed, so BMP
   and JPEG flow through the same operators), 16-bit PCM WAV
   (RIFF chunk walk), MJPEG-in-AVI (RIFF container walk in
   `llm/avi.py`), and MPEG-1 video I-frames (`llm/mpeg1.py` — real
   keyframe pixel decode from the ISO/IEC 11172-2 intra path, with
   P/B pictures skipped at the start-code level, which is exactly the
   keyframe-extraction access pattern a 100 TB curation pipeline
   uses). `synthesize_real_media` builds payloads whose ground-truth
   features are analytic functions of doc_id, so the DuckDB oracle can
   verify the decoded VALUES, not just row counts (q35/q42).
2. An ENV-GATED native backend seam (`PARSEABLE_SPARK_NATIVE_CODECS`,
   default auto): when Pillow / PyAV are importable, formats the pure
   decoders cannot express (PNG/GIF/WebP images, H.264/MP4 video) are
   decoded natively, and JPEG decode is routed natively for
   libjpeg-turbo throughput (the pure decoder stays the spec-exact
   fallback and the correctness oracle). When no native backend exists
   — this container ships none — those formats FAIL LOUDLY with the
   backend name and env var in the message; nothing falls back to a
   fake silently.
3. The original deterministic fakes (`_fake_decode`, `resize_images`,
   `sample_frames`) remain ONLY as Spark-plumbing exercisers (schema
   contracts, Arrow-batched mapInPandas, modality pruning). They are
   not reachable from the curation pipeline or any registry query —
   tests/test_multimodal_codecs.py pins that.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for formats still lacking a real decoder
    (MP4/H.264 video containers; BMP/JPEG/WAV all have real decoders
    now). Derives a
    feature vector from payload bytes so tests have stable output.
    Vectorized with numpy — inside an Arrow batch the per-row work is
    array math, not a Python byte loop."""
    if payload is None:
        return [0.0] * dim
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    if b.size == 0:
        return [0.0] * dim
    pad = (-b.size) % dim
    if pad:
        b = np.concatenate([b, np.zeros(pad, dtype=np.int64)])
    # sum per lane, then mod — equivalent to the running (acc+b) % 997
    acc = b.reshape(-1, dim).sum(axis=0) % 997
    return (acc / 997.0).tolist()


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas → one Python roundtrip per Arrow batch, not per row; the
    output schema is declared so downstream plans stay columnar.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(lambda p: _fake_decode(p, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture (binary payload =
    utf-8 text bytes) so the plumbing is exercisable without real media."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("n_chars") % 640).alias("width"),
        (F.col("n_chars") % 480).alias("height"),
        (F.col("n_chars") * 10).alias("duration_ms"),
    )


def resize_images(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize stub: recomputes target dims (aspect-preserving clamp) and
    passes the payload through (REAL RESIZE NOT IMPLEMENTED — no
    codecs in container; swap the payload identity for PIL.thumbnail).
    Metadata math is real and vectorized; only image rows are touched —
    the filter prunes the other modalities before the Python stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(0).astype("int64")
            h = pdf["height"].fillna(0).astype("int64")
            scale = pd.concat(
                [max_w / w.clip(lower=1), max_h / h.clip(lower=1)], axis=1
            ).min(axis=1).clip(upper=1.0)
            out = pdf.copy()
            out["width"] = (w * scale).astype("int64")
            out["height"] = (h * scale).astype("int64")
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling stub: one output row per sampled timestamp
    (cardinality-changing mapInPandas — the real ffmpeg seek+decode
    slots into the same loop; REAL DECODE NOT IMPLEMENTED). Frame
    payloads are deterministic byte slices so downstream feature
    extraction is testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                payload = r["payload"] or b""
                # same data-controlled-duration bound as the real
                # sampler: 16 payload bytes per fake frame (r8 review)
                dur = min(dur, max(len(payload) // 16 + 1, 1) * every_ms)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    lo = (i * 16) % max(len(payload), 1)
                    rows["frame_payload"].append(bytes(payload[lo : lo + 16]))
            yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


# --- real codecs: 24bpp BMP + 16-bit PCM WAV (no libraries needed) ----------

import struct


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid 24bpp bottom-up BMP (BITMAPINFOHEADER, BI_RGB),
    solid color. Rows padded to 4-byte boundaries per the format."""
    row = bytes((rgb[2], rgb[1], rgb[0])) * width  # BGR on disk
    row += b"\x00" * ((-3 * width) % 4)
    pixels = row * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + info + pixels


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24bpp BMP: header via struct, pixels via numpy (row
    padding stripped, BGR→RGB). Returns width/height/per-channel mean."""
    import numpy as np

    magic, _file_size, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsize, width, height, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    height = abs(height)  # negative height = top-down; means unaffected
    row_size = (3 * width + 3) // 4 * 4
    px = np.frombuffer(payload, dtype=np.uint8, count=height * row_size, offset=offset)
    px = px.reshape(height, row_size)[:, : 3 * width].reshape(height, width, 3)
    mean_bgr = px.astype(np.float64).mean(axis=(0, 1))
    return {
        "width": width,
        "height": height,
        "mean_r": float(mean_bgr[2]),
        "mean_g": float(mean_bgr[1]),
        "mean_b": float(mean_bgr[0]),
    }


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal 16-bit mono PCM WAV (RIFF/fmt/data chunks)."""
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def wav_pcm(payload: bytes):
    """Shared RIFF walk → (sample_rate, float64 samples) with FULL fmt
    validation: the data bytes are reinterpreted as '<i2', so anything
    but mono 16-bit integer PCM (fmt_tag 1) must raise loudly — an
    IEEE-float/ADPCM/8-bit/stereo WAV silently parsed as int16 yields
    confident garbage stats and fingerprints."""
    import numpy as np

    riff, _size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt_tag, ch, sample_rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if fmt_tag != 1:
                raise ValueError(f"unsupported wav format {fmt_tag}")
            if ch != 1:
                raise ValueError(f"unsupported wav channel count {ch} (mono only)")
            if bits != 16:
                raise ValueError(f"unsupported wav bits-per-sample {bits}")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return int(sample_rate), np.frombuffer(data, dtype="<i2").astype(np.float64)


def decode_wav(payload: bytes) -> dict:
    """Walk RIFF chunks (fmt/data found by id, unknown chunks skipped —
    a real parser, not an offset assumption); mono 16-bit PCM stats
    (anything else raises, see wav_pcm)."""
    import numpy as np

    sample_rate, s = wav_pcm(payload)
    return {
        "sample_rate": sample_rate,
        "n_samples": int(s.size),
        "rms": float(np.sqrt(np.mean(s * s))) if s.size else 0.0,
        "peak": float(np.abs(s).max()) if s.size else 0.0,
    }


def decode_bmp_pixels(payload: bytes):
    """Full pixel decode of a 24bpp BMP → (H, W, 3) RGB uint8 array in
    top-down image orientation (BMP stores bottom-up unless height is
    negative; row padding stripped, BGR→RGB)."""
    import numpy as np

    magic, _file_size, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsize, width, height, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    bottom_up = height > 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    px = np.frombuffer(payload, dtype=np.uint8, count=height * row_size, offset=offset)
    px = px.reshape(height, row_size)[:, : 3 * width].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return px[..., ::-1].copy()  # BGR→RGB


def encode_bmp_pixels(rgb) -> bytes:
    """(H, W, 3) RGB uint8 array → 24bpp bottom-up BMP bytes (the
    inverse of decode_bmp_pixels; rows padded to 4-byte boundaries)."""
    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    bgr = rgb[..., ::-1][::-1]  # RGB→BGR, top-down → bottom-up
    pad = (-3 * w) % 4
    rows = np.zeros((h, 3 * w + pad), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    pixels = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + info + pixels


# --- native codec backend seam (env-gated; VERDICT r4 next-5) ---------------
# Resolution order per format:
#   bmp / mpeg1      pure decoder (spec-exact, authoritative)
#   jpeg             native backend when available (libjpeg-turbo
#                    throughput class — the pure decoder's ~1 MP/s/core
#                    is the named 100 TB bottleneck), pure fallback
#   png / gif / webp / h264 / mp4
#                    native backend REQUIRED; loud failure otherwise —
#                    never a silent fake
# PARSEABLE_SPARK_NATIVE_CODECS=0|false|off disables native entirely
# (pure decoders + loud failure for native-only formats).

_NATIVE_UNSET = object()
_native_image_backend: object = _NATIVE_UNSET  # callable | None once resolved
_native_video_backend: object = _NATIVE_UNSET


def native_codecs_enabled() -> bool:
    import os

    return os.environ.get(
        "PARSEABLE_SPARK_NATIVE_CODECS", "auto"
    ).lower() not in ("0", "false", "off")


def _resolve_native_image_backend():
    """Pillow-backed payload→(H, W, 3) RGB uint8, resolved once per
    Python worker; None when Pillow is not importable or native codecs
    are disabled by env."""
    global _native_image_backend
    if _native_image_backend is _NATIVE_UNSET:
        _native_image_backend = None
        if native_codecs_enabled():
            try:
                import io

                import numpy as np
                from PIL import Image

                def _pil_decode(payload: bytes):
                    with Image.open(io.BytesIO(bytes(payload))) as im:
                        return np.asarray(im.convert("RGB"))

                _native_image_backend = _pil_decode
            except ImportError:
                pass
    return _native_image_backend


def _resolve_native_video_backend():
    """PyAV-backed payload→(keyframe pixel arrays, ms per frame),
    resolved once per worker; None when unavailable/disabled."""
    global _native_video_backend
    if _native_video_backend is _NATIVE_UNSET:
        _native_video_backend = None
        if native_codecs_enabled():
            try:
                import io

                import av  # noqa: F401

                def _av_keyframes(payload: bytes):
                    frames = []
                    with av.open(io.BytesIO(bytes(payload))) as c:
                        stream = c.streams.video[0]
                        stream.codec_context.skip_frame = "NONKEY"
                        rate = float(stream.average_rate or 25)
                        for frame in c.decode(stream):
                            frames.append(frame.to_ndarray(format="rgb24"))
                    return frames, max(int(1000 / max(rate, 1)), 1)

                _native_video_backend = _av_keyframes
            except ImportError:
                pass
    return _native_video_backend


# formats only a native backend can decode, by magic
_NATIVE_ONLY_IMAGE_MAGIC = (
    (b"\x89PNG", "png"),
    (b"GIF8", "gif"),
)


def sniff_image_format(payload: bytes) -> str:
    """'bmp' | 'jpeg' | 'mpeg1' (pure decoders) or 'png' | 'gif' |
    'webp' (native-backend-only) by magic bytes — image operators are
    format-agnostic; the payload says what it is ('mpeg1' = a
    self-contained single-keyframe MPEG-1 snippet from
    mpeg1.extract_iframe_payloads)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"\x00\x00\x01\xb3":
        return "mpeg1"
    for magic, name in _NATIVE_ONLY_IMAGE_MAGIC:
        if payload[: len(magic)] == magic:
            return name
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    raise ValueError(
        "unrecognized image payload (not BMP, JPEG, MPEG-1, PNG, GIF, "
        "or WebP)"
    )


def decode_image_pixels(payload: bytes):
    """Any supported image payload → (H, W, 3) RGB uint8.

    Format dispatch by magic: pure spec decoders for BMP/MPEG-1, the
    native backend (Pillow, when importable and not disabled via
    PARSEABLE_SPARK_NATIVE_CODECS) preferred for JPEG with the pure
    T.81 decoder as fallback, and native REQUIRED for PNG/GIF/WebP —
    those fail loudly when no backend exists rather than degrading to
    a fake."""
    fmt = sniff_image_format(payload)
    if fmt == "bmp":
        return decode_bmp_pixels(payload)
    if fmt == "mpeg1":
        from parseable_spark.llm import mpeg1

        frames = mpeg1.decode_mpeg1_iframes(payload, max_frames=1)
        if not frames:
            raise ValueError("MPEG-1 snippet contains no I-frame")
        return frames[0][1]
    native = _resolve_native_image_backend()
    if fmt == "jpeg":
        if native is not None:
            return native(payload)
        from parseable_spark.llm import jpeg

        return jpeg.decode_jpeg(payload)
    # png / gif / webp: native-only
    if native is None:
        raise ValueError(
            f"{fmt.upper()} decode requires the native codec backend "
            "(Pillow); it is not importable in this environment and "
            "there is deliberately NO fake fallback. Install Pillow or "
            "re-encode to BMP/baseline-JPEG. "
            "(PARSEABLE_SPARK_NATIVE_CODECS gates the backend.)"
        )
    return native(payload)


def decode_image(payload: bytes) -> dict:
    """Any supported image payload → width/height/per-channel means
    (the q35 feature contract, now format-agnostic)."""
    if sniff_image_format(payload) == "bmp":
        return decode_bmp(payload)
    import numpy as np

    px = decode_image_pixels(payload)
    mean = px.astype(np.float64).mean(axis=(0, 1))
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "mean_r": float(mean[0]),
        "mean_g": float(mean[1]),
        "mean_b": float(mean[2]),
    }


def resize_bmp(payload: bytes, max_w: int, max_h: int) -> bytes:
    """REAL aspect-preserving BMP downscale — the BMP specialization of
    resize_image (one implementation of the scale/resample math)."""
    return resize_image(payload, max_w, max_h)[0]


def resize_image(
    payload: bytes,
    max_w: int,
    max_h: int,
    jpeg_quality: int = 85,
    transcode_to_jpeg: bool = False,
) -> tuple[bytes, int, int]:
    """Format-agnostic aspect-preserving downscale: decode (BMP or
    baseline JPEG) → nearest-neighbor resample → re-encode in the SAME
    format. Returns (payload, width, height); images already inside the
    box pass through unchanged. Formats WITHOUT a same-format encoder
    here (png/gif/webp/mpeg1 sniffs) raise unless
    `transcode_to_jpeg=True` explicitly opts into the format change —
    silently returning a JPEG for a PNG input broke the same-format
    contract under the caller's feet."""
    import numpy as np

    fmt = sniff_image_format(payload)
    px = decode_image_pixels(payload)
    h, w = px.shape[:2]
    scale = min(max_w / max(w, 1), max_h / max(h, 1), 1.0)
    if scale >= 1.0:
        return payload, w, h
    if fmt not in ("bmp", "jpeg") and not transcode_to_jpeg:
        raise ValueError(
            f"no same-format encoder for {fmt!r}; pass "
            f"transcode_to_jpeg=True to re-encode as baseline JPEG"
        )
    out_w, out_h = max(int(w * scale), 1), max(int(h * scale), 1)
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    resized = px[rows][:, cols]
    if fmt == "bmp":
        return encode_bmp_pixels(resized), out_w, out_h
    from parseable_spark.llm import jpeg

    return jpeg.encode_jpeg(resized, quality=jpeg_quality), out_w, out_h


def resize_images_real(
    media: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """Resize with the REAL codecs (BMP or baseline JPEG, sniffed by
    magic): decode → nearest-neighbor → re-encode in the same format
    inside an Arrow-batched mapInPandas, payload and width/height
    metadata both updated. Modality pruning keeps audio/video out of
    the Python stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            triples = pdf["payload"].map(
                lambda p: resize_image(p, max_w, max_h) if p else (p, 0, 0)
            )
            out["payload"] = triples.map(lambda t: t[0])
            out["width"] = triples.map(lambda t: t[1]).astype("int64")
            out["height"] = triples.map(lambda t: t[2]).astype("int64")
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def split_bmp_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-BMP video stream into frames by reading each
    BMP's file-size field (header offset 2) — no frame index needed."""
    frames, pos = [], 0
    while pos + 14 <= len(payload):
        magic, file_size = struct.unpack_from("<2sI", payload, pos)
        if magic != b"BM" or file_size <= 0:
            raise ValueError(f"corrupt BMP stream at byte {pos}")
        frames.append(payload[pos : pos + file_size])
        pos += file_size
    return frames


def split_video_frames(payload: bytes) -> tuple[list[bytes], int]:
    """Container-sniffed video demux → (frame payloads, ms per frame).

    Real formats first: MJPEG-in-AVI (RIFF walk, fps from strh) with
    per-frame baseline-JPEG payloads; MPEG-1 elementary streams
    (I-frame-only keyframe extraction — each frame payload is a
    self-contained single-keyframe snippet, P/B pictures skipped at the
    start-code level, llm/mpeg1.py); else the concatenated-BMP stream.
    Each frame payload is decodable by decode_image/decode_image_pixels
    (format dispatch by magic), so every downstream video operator is
    container-agnostic."""
    from parseable_spark.llm import avi, mpeg1

    if avi.is_avi(payload):
        meta = avi.decode_avi_mjpeg(payload)
        # clamp: fps is data-controlled; > 1000 fps must not floor the
        # cadence to 0 ms (ZeroDivision downstream)
        ms = max(1000 // max(meta["fps"], 1), 1) if meta["fps"] else VIDEO_FRAME_MS
        return meta["frames"], ms
    if mpeg1.is_mpeg1(payload):
        return mpeg1.extract_iframe_payloads(payload)
    if payload[4:8] == b"ftyp":  # ISO BMFF (MP4/MOV): inter-frame codecs
        native = _resolve_native_video_backend()
        if native is None:
            raise ValueError(
                "MP4/H.264 keyframe extraction requires the native "
                "codec backend (PyAV); it is not importable in this "
                "environment and there is deliberately NO fake "
                "fallback. Remux to MPEG-1 or MJPEG-AVI, or install "
                "PyAV. (PARSEABLE_SPARK_NATIVE_CODECS gates the "
                "backend.)"
            )
        frames, ms = native(payload)
        # re-encode keyframes as BMP so every downstream operator
        # (decode_image_pixels, pHash) stays container-agnostic
        return [encode_bmp_pixels(f) for f in frames], ms
    return split_bmp_stream(payload), VIDEO_FRAME_MS


# --- analytic synthesis: features predictable from doc_id -------------------
# image:  w = doc_id%31+1, h = doc_id%23+1, rgb = (doc_id%256, 7*doc_id%256, 13*doc_id%256)
# audio:  square wave ±amp, amp = (doc_id%100)*300+100, n = (doc_id%50+1)*80, rate 8000
# video:  n_frames = doc_id%5+2 of 8x6 BMPs, frame i rgb =
#         ((doc_id+17i)%256, (doc_id+29i)%256, (doc_id+31i)%256), 1000 ms/frame

VIDEO_FRAME_W, VIDEO_FRAME_H, VIDEO_FRAME_MS = 8, 6, 1000


def _image_params(doc_id: int) -> tuple[int, int, tuple[int, int, int]]:
    return (
        doc_id % 31 + 1,
        doc_id % 23 + 1,
        (doc_id % 256, 7 * doc_id % 256, 13 * doc_id % 256),
    )


def _audio_params(doc_id: int) -> tuple[int, int]:
    return (doc_id % 100) * 300 + 100, (doc_id % 50 + 1) * 80


def _video_frame_rgb(doc_id: int, i: int) -> tuple[int, int, int]:
    return ((doc_id + 17 * i) % 256, (doc_id + 29 * i) % 256, (doc_id + 31 * i) % 256)


def _build_payload(doc_id: int, media_type: str) -> bytes:
    import numpy as np

    if media_type == "image":
        w, h, rgb = _image_params(doc_id)
        return encode_bmp(w, h, rgb)
    if media_type == "audio":
        amp, n = _audio_params(doc_id)
        samples = np.where(np.arange(n) % 2 == 0, amp, -amp)
        return encode_wav(samples, 8000)
    n_frames = doc_id % 5 + 2
    return b"".join(
        encode_bmp(VIDEO_FRAME_W, VIDEO_FRAME_H, _video_frame_rgb(doc_id, i))
        for i in range(n_frames)
    )


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """Media table with REAL payloads (BMP / PCM WAV / BMP-stream video)
    whose decoded features are analytic in doc_id — the oracle contract
    for q35/q42. Arrow-batched generation; modality = doc_id % 3."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            mtypes = [kinds[i % 3] for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": mtypes,
                    "payload": [
                        _build_payload(int(i), t) for i, t in zip(ids, mtypes)
                    ],
                    "width": [
                        _image_params(int(i))[0] if t == "image" else None
                        for i, t in zip(ids, mtypes)
                    ],
                    "height": [
                        _image_params(int(i))[1] if t == "image" else None
                        for i, t in zip(ids, mtypes)
                    ],
                    "duration_ms": [
                        (int(i) % 5 + 2) * VIDEO_FRAME_MS if t == "video" else None
                        for i, t in zip(ids, mtypes)
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=MEDIA_SCHEMA)


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


def extract_real_features(media: DataFrame) -> DataFrame:
    """Decode every payload with the real parser for its modality (BMP /
    WAV / BMP-stream); one Arrow roundtrip per batch. Video reports
    frame count + first-frame means."""

    def decode_row(mtype: str, payload: bytes) -> dict:
        out = dict.fromkeys(
            (
                "width", "height", "mean_r", "mean_g", "mean_b",
                "sample_rate", "n_samples", "rms", "peak", "n_frames",
            )
        )
        if payload is None:
            return out  # nullable payload: all-null features, not a
            # task-killing TypeError (review finding)
        if mtype == "image":
            out.update(decode_image(payload))  # BMP or JPEG by magic
        elif mtype == "audio":
            out.update(decode_wav(payload))
        else:
            frames, _ms = split_video_frames(payload)  # AVI/MJPEG or BMP stream
            out["n_frames"] = len(frames)
            if frames:  # zero-frame container: n_frames=0, null colors
                first = decode_image(frames[0])
                out.update({k: first[k] for k in ("mean_r", "mean_g", "mean_b")})
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_row(t, p) for t, p in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=REAL_FEATURE_SCHEMA)


REAL_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def sample_frames_real(media: DataFrame, every_ms: int = VIDEO_FRAME_MS) -> DataFrame:
    """Frame sampling with REAL per-frame decode: demux the container
    (MJPEG-in-AVI or concatenated-BMP, sniffed), pick the frame
    covering each sample timestamp, decode its pixel means. Modality
    pruning keeps non-video rows out of the Python stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_idx": [], "ts_ms": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None:
                    continue  # nullable payload: skip, don't crash
                frames, frame_ms = split_video_frames(payload)
                if not frames:
                    continue  # zero-frame container (review finding)
                # NULL duration arrives as NaN through Arrow→pandas, and
                # NaN is truthy — `dur or fallback` would int(NaN) crash
                if dur is None or pd.isna(dur):
                    dur = len(frames) * frame_ms
                # duration_ms is DATA-CONTROLLED metadata: a tiny
                # payload declaring duration 10^12 ms would otherwise
                # spin ~10^9 sample iterations re-decoding the last
                # frame (r8 review). The payload's actual content
                # bounds the sample range; metadata can only shorten.
                dur = min(int(dur), len(frames) * frame_ms)
                for ts in range(0, int(dur), every_ms):
                    idx = min(ts // frame_ms, len(frames) - 1)
                    d = decode_image(frames[idx])
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["ts_ms"].append(ts)
                    rows["mean_r"].append(d["mean_r"])
                    rows["mean_g"].append(d["mean_g"])
                    rows["mean_b"].append(d["mean_b"])
            yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=REAL_FRAME_SCHEMA
    )
