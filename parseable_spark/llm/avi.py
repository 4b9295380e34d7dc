"""MJPEG-in-AVI video container — pure-stdlib RIFF parse + writer.

A real, standard video format (RIFF 'AVI ' with 'MJPG' streams) whose
frames are baseline JPEGs — decodable end-to-end with llm/jpeg.py, no
codec libraries. This replaces the concatenated-BMP stand-in as the
demonstration video path; `_fake_decode` in multimodal.py now covers
only inter-frame codecs (H.264/MP4) that genuinely need a codec stack.

Writer emits the canonical structure (hdrl with avih/strh/strf, movi
with 00dc chunks, idx1 index); the parser is a chunk walk that
tolerates unknown chunks and LISTs — the same defensive shape as the
WAV parser in multimodal.py.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """JPEG frame payloads → AVI (MJPG fourcc, one video stream, idx1).

    Deterministic byte output; frames are stored as-is in 00dc chunks.
    """
    n = len(jpeg_frames)
    us_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,  # scale/rate → fps
        0, n, max_bytes, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the movi list-type word
    idx_entries, off = [], 4
    for f in jpeg_frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def decode_avi_mjpeg(payload: bytes) -> dict:
    """AVI bytes → {'fps', 'width', 'height', 'n_frames', 'frames':
    [jpeg bytes, ...]} via a defensive RIFF walk (unknown chunks
    skipped; 00db uncompressed-named chunks accepted too — some muxers
    mislabel). Frame pixel decode is the caller's choice
    (jpeg.decode_jpeg) so metadata-only reads stay cheap."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")
    fps, width, height = None, None, None
    cur_stream: bytes | None = None  # fccType of the latest strh seen
    n_streams = 0  # strh chunks seen, in declaration order
    video_idx: int | None = None  # the video stream's index
    frames: list[bytes] = []

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        nonlocal fps, width, height, cur_stream, n_streams, video_idx
        if depth > 32:
            # LIST nesting is DATA-CONTROLLED: a ~12 KB payload of
            # nothing but nested LISTs would otherwise recurse to
            # RecursionError (r8 review). Real AVIs nest 2-3 deep.
            raise ValueError("AVI LIST nesting too deep (corrupt payload)")
        pos = lo
        while pos + 8 <= hi:
            cid = payload[pos : pos + 4]
            csize = struct.unpack_from("<I", payload, pos + 4)[0]
            body_lo = pos + 8
            body_hi = min(body_lo + csize, hi)
            if cid == b"LIST":
                walk(body_lo + 4, body_hi, depth + 1)  # skip list type word
            elif cid == b"strh":
                # remember the stream type so the FOLLOWING strf is
                # associated with it — an audio strl preceding the
                # video strl (common muxer output) must not have its
                # WAVEFORMATEX misread as BITMAPINFOHEADER
                cur_stream = payload[body_lo : body_lo + 4]
                if cur_stream == b"vids" and video_idx is None:
                    video_idx = n_streams
                    scale, rate = struct.unpack_from("<II", payload, body_lo + 20)
                    fps = rate // max(scale, 1)
                n_streams += 1
            elif cid == b"strf" and cur_stream == b"vids" and width is None:
                _sz, w, h = struct.unpack_from("<Iii", payload, body_lo)
                width, height = w, abs(h)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                # frame chunks are named '{NN}dc' after the stream's
                # declaration order — hardcoding '00dc' rejected any AVI
                # whose video is not the first stream. 'dc'/'db' are
                # video-typed suffixes (audio uses 'wb'), so any
                # digit-prefixed one is a video frame; multi-video AVIs
                # are out of scope (single vids stream assumed).
                frames.append(payload[body_lo:body_hi])
            pos = body_lo + csize + (csize % 2)

    walk(12, len(payload))
    if width is None or not frames:
        raise ValueError("missing strf header or frame chunks")
    return {
        "fps": fps or 0,
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }
