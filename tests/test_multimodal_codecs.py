"""Real multimodal codecs: BMP/WAV round-trips, malformed input, and
the Spark decode stages (VERDICT r1 next-6)."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from parseable_spark.llm import multimodal as mm


def test_bmp_roundtrip_exact():
    for w, h, rgb in [(1, 1, (0, 0, 0)), (5, 3, (10, 200, 77)), (31, 23, (255, 1, 128))]:
        d = mm.decode_bmp(mm.encode_bmp(w, h, rgb))
        assert d == {
            "width": w,
            "height": h,
            "mean_r": float(rgb[0]),
            "mean_g": float(rgb[1]),
            "mean_b": float(rgb[2]),
        }


def test_bmp_row_padding_respected():
    # w=5 → 15 data bytes per row, padded to 16; a naive parser that
    # ignores padding would smear channels across rows
    payload = mm.encode_bmp(5, 4, (9, 18, 27))
    assert (len(payload) - 54) % 4 == 0
    assert mm.decode_bmp(payload)["mean_g"] == 18.0


def test_wav_roundtrip_and_stdlib_cross_parse():
    amp, n = 1234, 400
    samples = np.where(np.arange(n) % 2 == 0, amp, -amp)
    payload = mm.encode_wav(samples, 8000)
    d = mm.decode_wav(payload)
    assert d == {"sample_rate": 8000, "n_samples": n, "rms": float(amp), "peak": float(amp)}
    # python's own wave module agrees on the container layout
    wf = wave.open(io.BytesIO(payload))
    assert (wf.getframerate(), wf.getnframes(), wf.getsampwidth(), wf.getnchannels()) == (
        8000, n, 2, 1,
    )


def test_wav_parser_skips_unknown_chunks():
    import struct

    amp = 100
    payload = mm.encode_wav(np.array([amp, -amp]), 16000)
    # splice a LIST chunk between fmt and data — parsers that assume
    # data starts at byte 36 break here
    fmt_end = 12 + 8 + 16
    listed = (
        payload[:fmt_end]
        + struct.pack("<4sI", b"LIST", 4)
        + b"INFO"
        + payload[fmt_end:]
    )
    d = mm.decode_wav(listed)
    assert d["sample_rate"] == 16000 and d["n_samples"] == 2 and d["peak"] == float(amp)


def test_malformed_payloads_raise():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"PNG\x00" + b"\x00" * 64)
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + b"\x00" * 64)
    with pytest.raises(ValueError):
        mm.split_bmp_stream(b"XX" + b"\x00" * 20)


def test_bmp_stream_split_by_header_sizes():
    frames_in = [mm.encode_bmp(8, 6, mm._video_frame_rgb(7, i)) for i in range(4)]
    frames_out = mm.split_bmp_stream(b"".join(frames_in))
    assert frames_out == frames_in


def test_extract_real_features_spark(spark):
    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id bigint")
    media = mm.synthesize_real_media(docs)
    feats = {r["media_id"]: r for r in mm.extract_real_features(media).collect()}
    assert len(feats) == 9
    # doc 0: image 1x1, rgb (0,0,0)
    assert feats[0]["media_type"] == "image" and feats[0]["width"] == 1
    # doc 4: audio, amp = 4*300+100, n = 5*80
    a = feats[4]
    assert a["media_type"] == "audio"
    assert (a["sample_rate"], a["n_samples"], a["rms"], a["peak"]) == (8000, 400, 1300.0, 1300.0)
    # doc 5: video, n_frames = 5%5+2 = 2, first-frame mean_r = 5
    v = feats[5]
    assert v["media_type"] == "video" and v["n_frames"] == 2 and v["mean_r"] == 5.0


def test_sample_frames_real_spark(spark):
    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id bigint")
    media = mm.synthesize_real_media(docs)
    rows = mm.sample_frames_real(media, every_ms=1000).collect()
    # video docs: 2, 5, 8 with 4, 2, 5 frames
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["media_id"], []).append(r)
    assert {k: len(v) for k, v in per_doc.items()} == {2: 4, 5: 2, 8: 5}
    f3 = next(r for r in per_doc[2] if r["frame_idx"] == 3)
    assert f3["ts_ms"] == 3000 and f3["mean_r"] == float((2 + 17 * 3) % 256)


class TestRealResize:
    def test_pixel_roundtrip(self):
        """encode_bmp_pixels is the exact inverse of decode_bmp_pixels,
        including non-multiple-of-4 row widths (padding path)."""
        import numpy as np

        from parseable_spark.llm.multimodal import (
            decode_bmp_pixels,
            encode_bmp_pixels,
        )

        rng = np.random.default_rng(7)
        for w, h in [(5, 3), (4, 4), (1, 1), (7, 2)]:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (decode_bmp_pixels(encode_bmp_pixels(px)) == px).all()

    def test_nearest_neighbor_values_exact(self):
        """Downscale of a gradient image produces exactly the
        nearest-neighbor-sampled pixels, and the aspect clamp matches
        the documented dim math."""
        import numpy as np

        from parseable_spark.llm.multimodal import (
            decode_bmp_pixels,
            encode_bmp_pixels,
            resize_bmp,
        )

        h, w = 10, 20
        px = np.zeros((h, w, 3), dtype=np.uint8)
        px[..., 0] = np.arange(w)[None, :] * 12  # R encodes column
        px[..., 1] = np.arange(h)[:, None] * 25  # G encodes row
        out = decode_bmp_pixels(resize_bmp(encode_bmp_pixels(px), 8, 8))
        oh, ow = out.shape[:2]
        assert (ow, oh) == (8, 4)  # scale = min(8/20, 8/10, 1) = 0.4
        rows = np.arange(oh) * h // oh
        cols = np.arange(ow) * w // ow
        assert (out == px[rows][:, cols]).all()
        # already-small image passes through byte-identical
        small = encode_bmp_pixels(px[:4, :4])
        assert resize_bmp(small, 8, 8) == small

    def test_resize_images_real_spark(self, spark):
        """The Spark path: synthesized analytic BMPs resized through
        Arrow-batched mapInPandas; re-decoded dims and means match the
        analytic prediction (solid color ⇒ means invariant under NN)."""
        from pyspark.sql import functions as F

        from parseable_spark.llm import multimodal
        from parseable_spark.tables import load_table
        from tests.conftest import SF_SMALL

        docs = load_table(spark, SF_SMALL, "documents").filter("doc_id < 90")
        media = multimodal.synthesize_real_media(docs)
        out = multimodal.resize_images_real(media, max_w=8, max_h=8)
        rows = out.collect()
        assert rows  # images exist in doc_id < 90
        for r in rows:
            w, h, rgb = multimodal._image_params(r["media_id"])
            scale = min(8 / w, 8 / h, 1.0)
            assert r["width"] == max(int(w * scale), 1)
            assert r["height"] == max(int(h * scale), 1)
            dec = multimodal.decode_bmp(bytes(r["payload"]))
            assert (dec["width"], dec["height"]) == (r["width"], r["height"])
            # solid color: channel means survive any resampling exactly
            assert (dec["mean_r"], dec["mean_g"], dec["mean_b"]) == tuple(
                float(c) for c in rgb
            )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan  # Arrow-batched, not row Python


class TestJpegCodec:
    """Baseline JPEG codec (llm/jpeg.py): pure-numpy encoder + decoder.

    The decoder is validated two ways: (a) against an INDEPENDENT numpy
    reference of the same public math (DCT→quantize→dequantize→IDCT,
    no entropy coding) — the decode of our encoder's bytes must equal
    that reference exactly, proving the Huffman/marker layer is
    lossless; (b) by PSNR against the source across qualities,
    subsamplings, restart intervals, and odd dimensions.
    """

    @staticmethod
    def _psnr(a, b):
        import numpy as np

        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

    @staticmethod
    def _gradient(h, w):
        import numpy as np

        y, x = np.mgrid[0:h, 0:w]
        return np.stack([(x * 4) % 256, (y * 6) % 256, (x + y) % 256], axis=-1).astype(
            np.uint8
        )

    def test_entropy_layer_lossless_vs_reference_math(self):
        """decode(encode(img)) == independent numpy quantization
        roundtrip (444): every bit of loss comes from quantization, the
        Huffman/marker/bit-IO layer adds none."""
        import numpy as np

        from parseable_spark.llm import jpeg

        img = self._gradient(24, 40)
        quality = 75
        # independent reference: same public pipeline, no entropy code
        qt_lum, qt_chrom = jpeg._scaled_tables(quality)
        ycc = jpeg.rgb_to_ycbcr(img)
        planes = []
        for ci in range(3):
            qt = (qt_lum if ci == 0 else qt_chrom).reshape(8, 8).astype(float)
            blocks = jpeg._to_blocks(ycc[..., ci] - 128.0)
            coefs = np.round((jpeg._D @ blocks @ jpeg._D.T) / qt)
            planes.append(jpeg._from_blocks(jpeg._D.T @ (coefs * qt) @ jpeg._D) + 128.0)
        expected = jpeg.ycbcr_to_rgb(np.stack(planes, axis=-1))
        got = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
        assert np.array_equal(got, expected)

    def test_roundtrip_psnr_across_options(self):
        from parseable_spark.llm import jpeg

        img = self._gradient(37, 53)  # non-multiple-of-8/16 dims
        floor = {("444", 50): 40, ("444", 90): 45, ("420", 50): 35, ("420", 90): 40}
        for (sub, q), bound in floor.items():
            dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
            assert dec.shape == img.shape
            assert self._psnr(img, dec) > bound, (sub, q)

    def test_restart_markers_resync_identically(self):
        """Restart intervals change the byte stream but not the decoded
        pixels; decoder resyncs at every RSTn."""
        import numpy as np

        from parseable_spark.llm import jpeg

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
        for interval in (1, 3, 7):
            enc = jpeg.encode_jpeg(img, quality=85, restart_interval=interval)
            assert np.array_equal(jpeg.decode_jpeg(enc), plain)
        enc420 = jpeg.encode_jpeg(img, quality=85, subsampling="420", restart_interval=2)
        assert np.array_equal(
            jpeg.decode_jpeg(enc420),
            jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsampling="420")),
        )

    def test_odd_dimensions_and_determinism(self):
        import numpy as np

        from parseable_spark.llm import jpeg

        for shape in [(1, 1), (8, 8), (9, 17), (16, 15), (33, 1)]:
            im = (np.indices(shape).sum(axis=0)[..., None].repeat(3, -1) * 7).astype(
                np.uint8
            )
            for sub in ("444", "420"):
                enc = jpeg.encode_jpeg(im, 92, subsampling=sub)
                assert enc == jpeg.encode_jpeg(im, 92, subsampling=sub)  # deterministic
                dec = jpeg.decode_jpeg(enc)
                assert dec.shape == im.shape
                assert self._psnr(im, dec) > 30

    def test_byte_stuffing_and_dimensions_fast_path(self):
        """A solid mid-gray image produces 0xFF-rich streams in some
        blocks; roundtrip must survive stuffing. jpeg_dimensions reads
        SOF0 without entropy decode."""
        import numpy as np

        from parseable_spark.llm import jpeg

        img = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
        enc = jpeg.encode_jpeg(img, quality=90)
        assert jpeg.jpeg_dimensions(enc) == (24, 16)
        assert self._psnr(img, jpeg.decode_jpeg(enc)) > 45

    def test_fast_lut_matches_code_assignment(self):
        """The 16-bit-peek decode LUT (r4 fast path) must agree with the
        canonical T.81 code assignment for EVERY index: any index whose
        top bits are a valid code maps to that code's symbol + length;
        indices under no code have length 0."""
        from parseable_spark.llm import jpeg

        # the standard Annex K luminance AC table — the richest shape
        # (code lengths 2..16, 162 symbols)
        bits, vals = jpeg.AC_LUM_BITS, jpeg.AC_LUM_VALS
        codes = jpeg._build_huffman_codes(list(bits), list(vals))
        sym, ln = jpeg._build_fast_lut(list(bits), list(vals))
        covered = 0
        for s, (code, length) in codes.items():
            base = code << (16 - length)
            span = 1 << (16 - length)
            covered += span
            for idx in (base, base + span - 1, base + span // 2):
                assert sym[idx] == s and ln[idx] == length, (s, code, length)
        assert sum(1 for x in ln if x > 0) == covered

    def test_unstuff_entropy_boundaries(self):
        from parseable_spark.llm import jpeg

        # stuffed FF00 → FF; RST0 pair excised with boundary recorded;
        # real marker (FFD9) terminates
        payload = bytes([0xAA, 0xFF, 0x00, 0xBB, 0xFF, 0xD0, 0xCC, 0xFF, 0xD9])
        buf, bounds = jpeg._unstuff_entropy(payload, 0)
        assert buf == bytes([0xAA, 0xFF, 0xBB, 0xCC])
        assert bounds == [3]  # data after RST0 starts at unstuffed offset 3

    def test_malformed_jpeg_raises(self):
        import pytest

        from parseable_spark.llm import jpeg

        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"not a jpeg")
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
        # progressive SOF2 is explicitly rejected, not mis-decoded
        import struct as _s

        seg = b"\xff\xd8" + b"\xff\xc2" + _s.pack(">H", 11) + bytes(9) + b"\xff\xd9"
        with pytest.raises(ValueError, match="non-baseline"):
            jpeg.decode_jpeg(seg)

    def test_fast_lut_cache_is_lru_bounded(self):
        """Per-image optimized Huffman tables (libjpeg optimize_coding)
        mean a heterogeneous corpus feeds the LUT cache a distinct key
        per image; unbounded, a long-lived executor worker accrues
        ~1 MB per entry until OOM (ADVICE r4). The cache must cap at
        _FAST_LUT_CAP with LRU eviction and still return correct
        tables after eviction."""
        from parseable_spark.llm import jpeg

        jpeg._FAST_LUT_CACHE.clear()
        # synthesize distinct valid (bits, vals) tables: one code of
        # length 1 with a varying symbol value
        def table(sym):
            bits = [1] + [0] * 15
            return bits, [sym]

        first = jpeg._build_fast_lut(*table(0))
        for s in range(1, jpeg._FAST_LUT_CAP + 10):
            jpeg._build_fast_lut(*table(s))
        assert len(jpeg._FAST_LUT_CACHE) == jpeg._FAST_LUT_CAP
        # the oldest entries were evicted, the newest retained
        assert (tuple(table(0)[0]), (0,)) not in jpeg._FAST_LUT_CACHE
        assert (tuple(table(0)[0]), (jpeg._FAST_LUT_CAP + 9,)) in jpeg._FAST_LUT_CACHE
        # rebuilt-after-eviction output identical to the original
        sym, ln = jpeg._build_fast_lut(*table(0))
        assert sym == first[0] and ln == first[1]
        # LRU: a cache hit refreshes recency
        jpeg._build_fast_lut(*table(0))  # now newest
        for s in range(1000, 1000 + jpeg._FAST_LUT_CAP - 1):
            jpeg._build_fast_lut(*table(s))
        assert (tuple(table(0)[0]), (0,)) in jpeg._FAST_LUT_CACHE
        jpeg._FAST_LUT_CACHE.clear()


class TestJpegSparkPath:
    def test_jpeg_media_features_and_resize(self, spark):
        """JPEG payloads flow through the SAME Spark operators as BMP
        (format sniffed by magic): extract_real_features decodes them,
        resize_images_real re-encodes them as JPEG with correct dims."""
        import numpy as np
        import pandas as pd

        from parseable_spark.llm import jpeg, multimodal

        def solid_jpeg(doc_id):
            w, h, rgb = multimodal._image_params(doc_id)
            return jpeg.encode_jpeg(
                np.full((h, w, 3), rgb, dtype=np.uint8), quality=95
            )

        ids = [0, 3, 33, 63, 90]
        pdf = pd.DataFrame(
            {
                "media_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": [solid_jpeg(i) for i in ids],
                "width": [multimodal._image_params(i)[0] for i in ids],
                "height": [multimodal._image_params(i)[1] for i in ids],
                "duration_ms": [None] * len(ids),
            }
        )
        media = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
        feats = {r["media_id"]: r for r in multimodal.extract_real_features(media).collect()}
        for i in ids:
            w, h, rgb = multimodal._image_params(i)
            r = feats[i]
            assert (r["width"], r["height"]) == (w, h)
            # solid color at q95: decoded means within quantization error
            for got, want in zip((r["mean_r"], r["mean_g"], r["mean_b"]), rgb):
                assert abs(got - want) < 3.0, (i, got, want)
        resized = {
            r["media_id"]: r
            for r in multimodal.resize_images_real(media, max_w=8, max_h=8).collect()
        }
        for i in ids:
            w, h, _ = multimodal._image_params(i)
            scale = min(8 / w, 8 / h, 1.0)
            r = resized[i]
            assert r["width"] == max(int(w * scale), 1)
            assert r["height"] == max(int(h * scale), 1)
            payload = bytes(r["payload"])
            if scale < 1.0:  # re-encoded in the SAME format
                assert payload[:2] == b"\xff\xd8"
                assert jpeg.jpeg_dimensions(payload) == (r["width"], r["height"])


class TestAviMjpeg:
    """MJPEG-in-AVI container (llm/avi.py): real RIFF structure, JPEG
    frames decodable by our own baseline codec."""

    @staticmethod
    def _frames(n, w=16, h=8):
        import numpy as np

        from parseable_spark.llm import jpeg

        return [
            jpeg.encode_jpeg(
                np.full((h, w, 3), ((20 * i) % 256, 80, 160), dtype=np.uint8),
                quality=95,
            )
            for i in range(n)
        ]

    def test_roundtrip_structure_and_frames(self):
        from parseable_spark.llm import avi, jpeg

        frames = self._frames(4)
        payload = avi.encode_avi_mjpeg(frames, width=16, height=8, fps=5)
        assert avi.is_avi(payload)
        meta = avi.decode_avi_mjpeg(payload)
        assert (meta["fps"], meta["width"], meta["height"], meta["n_frames"]) == (5, 16, 8, 4)
        assert meta["frames"] == frames  # stored verbatim, odd sizes padded outside
        # every demuxed frame is a real decodable JPEG
        px = jpeg.decode_jpeg(meta["frames"][2])
        assert px.shape == (8, 16, 3)
        assert abs(float(px[..., 0].mean()) - 40.0) < 3  # (20*2)%256 within quant error

    def test_unknown_chunks_tolerated(self):
        import struct as _s

        from parseable_spark.llm import avi

        frames = self._frames(2)
        payload = bytearray(avi.encode_avi_mjpeg(frames, 16, 8, fps=10))
        # splice an unknown JUNK chunk right after the hdrl list
        junk = b"JUNK" + _s.pack("<I", 6) + b"abcdef"
        insert_at = payload.find(b"LIST", 12)
        hdrl_size = _s.unpack_from("<I", payload, insert_at + 4)[0]
        pos = insert_at + 8 + hdrl_size + (hdrl_size % 2)
        payload[pos:pos] = junk
        _s.pack_into("<I", payload, 4, len(payload) - 8)
        meta = avi.decode_avi_mjpeg(bytes(payload))
        assert meta["n_frames"] == 2 and meta["frames"] == frames

    def test_malformed_raises(self):
        import pytest

        from parseable_spark.llm import avi

        with pytest.raises(ValueError):
            avi.decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            avi.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00AVI ")  # no frames

    def test_audio_strl_before_video_strl(self):
        """Spec-valid muxer layout with the audio stream list FIRST:
        the audio strf (WAVEFORMATEX) must not be misparsed as the
        video BITMAPINFOHEADER (which yielded width=nSamplesPerSec,
        height=nAvgBytesPerSec garbage)."""
        import struct as _s

        from parseable_spark.llm import avi

        frames = self._frames(2)
        payload = bytearray(avi.encode_avi_mjpeg(frames, 16, 8, fps=10))
        # build an audio strl: strh(auds) + strf(WAVEFORMATEX 8kHz mono)
        strh_auds = _s.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, 8000, 0, 16000, 0, 0xFFFFFFFF, 0, 0, 0, 0, 0,
        )
        wavefmt = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        strl = avi._list(
            b"strl",
            avi._chunk(b"strh", strh_auds) + avi._chunk(b"strf", wavefmt),
        )
        # splice it INSIDE hdrl, before the video strl
        hdrl_at = payload.find(b"hdrl")
        video_strl_at = payload.find(b"LIST", hdrl_at)
        payload[video_strl_at:video_strl_at] = strl
        # fix the hdrl LIST size and the RIFF size
        _s.pack_into("<I", payload, hdrl_at - 4,
                     _s.unpack_from("<I", payload, hdrl_at - 4)[0] + len(strl))
        _s.pack_into("<I", payload, 4, len(payload) - 8)
        meta = avi.decode_avi_mjpeg(bytes(payload))
        assert (meta["width"], meta["height"]) == (16, 8)
        assert meta["frames"] == frames

    def test_avi_video_through_spark_operators(self, spark):
        """AVI/MJPEG videos flow through extract_real_features and
        sample_frames_real (container sniffed per row; same operators
        as BMP-stream videos)."""
        import numpy as np
        import pandas as pd

        from parseable_spark.llm import avi, jpeg, multimodal

        def make_video(doc_id, n):
            frames = [
                jpeg.encode_jpeg(
                    np.full((8, 16, 3), ((doc_id + 40 * i) % 256, 10, 200), np.uint8),
                    quality=95,
                )
                for i in range(n)
            ]
            return avi.encode_avi_mjpeg(frames, 16, 8, fps=2)  # 500 ms/frame

        pdf = pd.DataFrame(
            {
                "media_id": [1, 2],
                "media_type": ["video", "video"],
                "payload": [make_video(60, 3), make_video(5, 2)],
                "width": [None, None],
                "height": [None, None],
                "duration_ms": [1500, 1000],
            }
        )
        media = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
        feats = {r["media_id"]: r for r in multimodal.extract_real_features(media).collect()}
        assert feats[1]["n_frames"] == 3 and feats[2]["n_frames"] == 2
        assert abs(feats[1]["mean_r"] - 60.0) < 3  # first-frame red mean
        sampled = multimodal.sample_frames_real(media, every_ms=500).collect()
        by_id = {}
        for r in sampled:
            by_id.setdefault(r["media_id"], []).append(r)
        assert len(by_id[1]) == 3  # 1500 ms at 500 ms/frame
        idx1 = sorted(r["frame_idx"] for r in by_id[1])
        assert idx1 == [0, 1, 2]
        for r in by_id[1]:
            want = (60 + 40 * r["frame_idx"]) % 256
            assert abs(r["mean_r"] - want) < 3


class TestNativeBackendSeam:
    """Env-gated native codec dispatch (VERDICT r4 next-5): native-only
    formats fail LOUDLY without a backend, route through it when one is
    installed, and the fakes stay unreachable from curation code."""

    PNG = b"\x89PNG\r\n\x1a\n" + bytes(32)
    MP4 = bytes(4) + b"ftypisom" + bytes(32)

    @pytest.fixture(autouse=True)
    def _reset_backends(self):
        from parseable_spark.llm import multimodal as M

        yield
        M._native_image_backend = M._NATIVE_UNSET
        M._native_video_backend = M._NATIVE_UNSET

    def test_native_only_image_fails_loudly_without_backend(self):
        from parseable_spark.llm import multimodal as M

        assert M.sniff_image_format(self.PNG) == "png"
        with pytest.raises(ValueError, match="Pillow.*NO fake"):
            M.decode_image_pixels(self.PNG)

    def test_mp4_fails_loudly_without_backend(self):
        from parseable_spark.llm import multimodal as M

        with pytest.raises(ValueError, match="PyAV.*NO fake"):
            M.split_video_frames(self.MP4)

    def test_jpeg_prefers_native_backend_when_installed(self):
        import numpy as np

        from parseable_spark.llm import jpeg
        from parseable_spark.llm import multimodal as M

        img = np.full((9, 11, 3), 77, dtype=np.uint8)
        payload = jpeg.encode_jpeg(img, quality=90)
        pure = M.decode_image_pixels(payload)  # no backend -> pure T.81
        calls = []

        def fake_native(p):
            calls.append(bytes(p[:2]))
            return jpeg.decode_jpeg(p)  # stands in for libjpeg-turbo

        M._native_image_backend = fake_native
        via_native = M.decode_image_pixels(payload)
        assert calls == [b"\xff\xd8"]  # dispatched through the backend
        assert np.array_equal(pure, via_native)
        # PNG now decodes through the backend instead of raising
        M._native_image_backend = lambda p: np.zeros((2, 2, 3), np.uint8)
        assert M.decode_image_pixels(self.PNG).shape == (2, 2, 3)
        # BMP/MPEG-1 stay on the authoritative pure decoders
        bmp = M.encode_bmp_pixels(img)
        M._native_image_backend = lambda p: (_ for _ in ()).throw(
            AssertionError("BMP must not reach the native backend")
        )
        assert np.array_equal(M.decode_image_pixels(bmp), img)

    def test_mp4_routes_through_native_video_backend(self):
        import numpy as np

        from parseable_spark.llm import multimodal as M

        kf = np.full((6, 8, 3), 123, dtype=np.uint8)
        M._native_video_backend = lambda p: ([kf], 40)
        frames, ms = M.split_video_frames(self.MP4)
        assert ms == 40 and len(frames) == 1
        # keyframes are re-encoded BMP: container-agnostic downstream
        assert np.array_equal(M.decode_image_pixels(frames[0]), kf)

    def test_env_kill_switch_disables_native(self, monkeypatch):
        from parseable_spark.llm import multimodal as M

        monkeypatch.setenv("PARSEABLE_SPARK_NATIVE_CODECS", "0")
        assert not M.native_codecs_enabled()
        M._native_image_backend = M._NATIVE_UNSET
        assert M._resolve_native_image_backend() is None
        monkeypatch.setenv("PARSEABLE_SPARK_NATIVE_CODECS", "auto")
        assert M.native_codecs_enabled()

    def test_fakes_unreachable_from_curation_and_registry(self):
        """The deterministic fakes are plumbing exercisers only: no
        curation-pipeline or registry-query source references them."""
        import pathlib

        root = pathlib.Path("/root/repo/parseable_spark")
        banned = ("_fake_decode(", "extract_features(", "resize_images(",
                  "sample_frames(")  # call-sites; docstring mentions OK
        offenders = []
        for path in list(root.rglob("*.py")):
            if path.name == "multimodal.py":
                continue
            src = path.read_text()
            for b in banned:
                if b in src:
                    offenders.append((str(path), b))
        assert offenders == []


class TestCodecHardeningR5S7:
    """Round-5 session-7 codec review fixes."""

    def test_avi_video_as_second_stream(self):
        """Frame chunks named '01dc' (video declared second) must be
        found — the '00dc' hardcode rejected valid audio+video files."""
        import struct as _s

        from parseable_spark.llm import avi, jpeg
        import numpy as np

        px = np.zeros((8, 16, 3), dtype=np.uint8)
        px[:, :8] = 200
        frames = [jpeg.encode_jpeg(px, quality=90)]
        payload = bytearray(avi.encode_avi_mjpeg(frames, 16, 8, fps=10))
        # rename the frame chunks to stream index 1 and prepend an
        # audio strl so the video IS stream 1
        idx = payload.find(b"00dc")
        while idx != -1:
            payload[idx:idx + 4] = b"01dc"
            idx = payload.find(b"00dc", idx + 4)
        strh_auds = _s.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, 8000, 0, 16000, 0, 0xFFFFFFFF, 0, 0, 0, 0, 0,
        )
        wavefmt = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        strl = avi._list(
            b"strl", avi._chunk(b"strh", strh_auds) + avi._chunk(b"strf", wavefmt)
        )
        hdrl_at = payload.find(b"hdrl")
        video_strl_at = payload.find(b"LIST", hdrl_at)
        payload[video_strl_at:video_strl_at] = strl
        _s.pack_into("<I", payload, hdrl_at - 4,
                     _s.unpack_from("<I", payload, hdrl_at - 4)[0] + len(strl))
        _s.pack_into("<I", payload, 4, len(payload) - 8)
        meta = avi.decode_avi_mjpeg(bytes(payload))
        assert meta["n_frames"] == 1 and meta["frames"] == frames
        assert (meta["width"], meta["height"]) == (16, 8)

    def test_jpeg_fill_bytes_before_marker(self):
        """T.81 B.1.1.2: 0xFF fill bytes before a marker are legal."""
        from parseable_spark.llm import jpeg
        import numpy as np

        px = np.full((8, 8, 3), 128, dtype=np.uint8)
        payload = jpeg.encode_jpeg(px, quality=90)
        # splice a fill byte before the first DQT marker
        at = payload.find(b"\xff\xdb")
        stuffed = payload[:at] + b"\xff" + payload[at:]
        assert jpeg.jpeg_dimensions(stuffed) == (8, 8)
        base = jpeg.decode_jpeg(payload)
        got = jpeg.decode_jpeg(stuffed)
        assert (got == base).all()

    def test_wav_fmt_validation_loud(self):
        """Non-mono / non-16-bit / non-PCM WAVs raise instead of being
        silently fingerprinted as int16 garbage."""
        import struct as _s

        import pytest as _pytest

        from parseable_spark.llm.audiohash import _pcm_samples
        from parseable_spark.llm.multimodal import decode_wav, encode_wav

        ok = encode_wav([0, 1000, -1000], sample_rate=8000)
        assert decode_wav(ok)["n_samples"] == 3
        assert _pcm_samples(ok).size == 3

        def wav(fmt_tag=1, ch=1, bits=16):
            fmt = _s.pack("<4sIHHIIHH", b"fmt ", 16, fmt_tag, ch, 8000,
                          8000 * ch * bits // 8, ch * bits // 8, bits)
            data = b"\x00\x00" * 4
            body = b"WAVE" + fmt + _s.pack("<4sI", b"data", len(data)) + data
            return _s.pack("<4sI", b"RIFF", len(body)) + body

        for bad in (wav(fmt_tag=3), wav(ch=2), wav(bits=8)):
            with _pytest.raises(ValueError):
                decode_wav(bad)
            with _pytest.raises(ValueError):
                _pcm_samples(bad)

    def test_mpeg1_user_data_between_picture_and_slice(self):
        """user_data (00 00 01 B2) after the picture header must be
        skipped, not silently produce an all-black frame."""
        import numpy as np

        from parseable_spark.llm import mpeg1

        px = np.zeros((16, 16, 3), dtype=np.uint8)
        px[:, :8] = 220
        stream = mpeg1.encode_mpeg1([px], fps=25)
        pic_at = stream.find(b"\x00\x00\x01\x00")
        # picture header is 8 bytes here (start code + 10+3+16+1+pad bits)
        slice_at = stream.find(b"\x00\x00\x01\x01", pic_at)
        assert slice_at != -1
        user_data = b"\x00\x00\x01\xb2hello"
        stuffed = stream[:slice_at] + user_data + stream[slice_at:]
        base = mpeg1.decode_mpeg1_iframes(stream)[0][1]
        got = mpeg1.decode_mpeg1_iframes(stuffed)[0][1]
        assert (got == base).all()
        assert got.max() > 100  # not a black frame

    def test_mpeg1_encode_dimension_validation(self):
        import numpy as np
        import pytest as _pytest

        from parseable_spark.llm import mpeg1

        with _pytest.raises(ValueError):
            mpeg1.encode_mpeg1([np.zeros((16, 4096, 3), dtype=np.uint8)])
        with _pytest.raises(ValueError):
            mpeg1.encode_mpeg1([np.zeros((2816, 16, 3), dtype=np.uint8)])

    def test_resize_refuses_silent_transcode(self):
        import numpy as np
        import pytest as _pytest

        from parseable_spark.llm import mpeg1
        from parseable_spark.llm.multimodal import resize_image

        px = np.full((32, 32, 3), 90, dtype=np.uint8)
        clip = mpeg1.encode_mpeg1([px], fps=25)
        with _pytest.raises(ValueError, match="same-format"):
            resize_image(clip, 16, 16)
        out, w, h = resize_image(clip, 16, 16, transcode_to_jpeg=True)
        assert (w, h) == (16, 16) and out[:2] == b"\xff\xd8"  # JPEG SOI
