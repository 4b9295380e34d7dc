"""MPEG-1 intra-only codec (llm/mpeg1.py) — real keyframe extraction.

Implemented from the public ISO/IEC 11172-2 spec; these tests pin the
syntax layer (start codes, VLC subset + escape, DC prediction), the
reconstruction math (oddification, clamps) against an independent
numpy re-derivation, the I-frame-only skip behavior, and the
integration through the container-agnostic video operators."""

from __future__ import annotations

import numpy as np
import pytest

from parseable_spark.llm import mpeg1


def _frames(n=3, h=36, w=40):
    out = []
    for t in range(n):
        x = np.linspace(0, 2 * np.pi, max(h, w))
        base = (np.sin(x[:w] + t)[None, :] * np.cos(x[:h, None] / 2) * 80 + 128)
        f = np.clip(
            np.stack([base, base * 0.8 + 20, 255 - base], axis=-1), 0, 255
        ).astype(np.uint8)
        out.append(f)
    return out


def _psnr(a, b):
    err = np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return 20 * np.log10(255 / max(err, 1e-9))


class TestCodec:
    def test_roundtrip_quality_and_rate(self):
        frames = _frames()
        sizes = {}
        for q in (2, 8, 16):
            enc = mpeg1.encode_mpeg1(frames, qscale=q)
            dec = mpeg1.decode_mpeg1_iframes(enc)
            assert [o for o, _ in dec] == [0, 1, 2]
            for (o, d), f in zip(dec, frames):
                assert d.shape == f.shape
                floor = {2: 33, 8: 30, 16: 26}[q]
                assert _psnr(d, f) > floor, (q, o, _psnr(d, f))
            sizes[q] = len(enc)
        # coarser quantizer → smaller stream (rate-distortion sanity)
        assert sizes[2] > sizes[8] > sizes[16]

    def test_determinism_and_dimensions(self):
        frames = _frames(2, 17, 33)  # non-multiple-of-16 dims
        enc = mpeg1.encode_mpeg1(frames, qscale=4)
        assert enc == mpeg1.encode_mpeg1(frames, qscale=4)
        assert mpeg1.is_mpeg1(enc)
        assert mpeg1.mpeg1_dimensions(enc) == (33, 17)
        dec = mpeg1.decode_mpeg1_iframes(enc)
        assert dec[0][1].shape == (17, 33, 3)

    def test_iframe_index_without_decode(self):
        enc = mpeg1.encode_mpeg1(_frames(4), qscale=8)
        idx = mpeg1.iframe_index(enc)
        assert [e["ordinal"] for e in idx] == [0, 1, 2, 3]
        assert all(e["coding_type"] == "I" for e in idx)
        assert [e["temporal_reference"] for e in idx] == [0, 1, 2, 3]
        assert idx[0]["offset"] < idx[1]["offset"] < idx[2]["offset"]

    def test_p_frames_skipped_at_startcode_level(self):
        """Keyframe extraction: a P picture spliced between two I
        pictures is skipped without parsing its slices; ordinals keep
        counting every picture."""
        frames = _frames(2)
        enc = mpeg1.encode_mpeg1(frames, qscale=4)
        pics = [o for o, c in mpeg1._start_codes(enc) if c == mpeg1.PIC_START]
        # craft a P picture: header (type=2) + full_pel/forward_f bits
        # + one slice of 0xFF filler (no start-code emulation possible)
        pbr = mpeg1._BW()
        pbr.start_code(mpeg1.PIC_START)
        pbr.write(1, 10)  # temporal_reference
        pbr.write(2, 3)  # P
        pbr.write(0xFFFF, 16)
        pbr.write(0, 1)  # full_pel_forward_vector
        pbr.write(1, 3)  # forward_f_code
        pbr.write(0, 1)  # extra_bit_picture
        pbr.start_code(0x01)
        p_pic = bytes(pbr.out) + b"\xff" * 40
        spliced = enc[: pics[1]] + p_pic + enc[pics[1] :]
        idx = mpeg1.iframe_index(spliced)
        assert [e["coding_type"] for e in idx] == ["I", "P", "I"]
        dec = mpeg1.decode_mpeg1_iframes(spliced)
        assert [o for o, _ in dec] == [0, 2]  # P (ordinal 1) skipped
        ref = mpeg1.decode_mpeg1_iframes(enc)
        assert np.array_equal(dec[1][1], ref[1][1])

    def test_escape_coding_roundtrip(self):
        """A high-contrast checkerboard forces AC levels outside the
        short VLC table → escape path on encode AND decode."""
        f = np.zeros((16, 16, 3), dtype=np.uint8)
        f[::2, ::2] = 255
        f[1::2, 1::2] = 255
        enc = mpeg1.encode_mpeg1([f], qscale=1)
        dec = mpeg1.decode_mpeg1_iframes(enc)
        assert _psnr(dec[0][1], f) > 20

    def test_reconstruction_matches_independent_math(self):
        """Decode must equal a from-scratch numpy re-derivation of the
        spec's intra path (dequant + oddification + clamp + IDCT) for a
        single-block gray ramp."""
        ramp = np.tile(np.arange(16, dtype=np.uint8) * 12 + 16, (16, 1))
        f = np.stack([ramp] * 3, axis=-1)
        q = 4
        enc = mpeg1.encode_mpeg1([f], qscale=q)
        got = mpeg1.decode_mpeg1_iframes(enc)[0][1]

        from parseable_spark.llm.jpeg import _D, ZIGZAG, UNZIGZAG, rgb_to_ycbcr, ycbcr_to_rgb

        ycc = rgb_to_ycbcr(f)
        wq = mpeg1.DEFAULT_INTRA_Q.reshape(64)[ZIGZAG]
        planes = []
        for comp, ds in ((0, 1), (1, 2), (2, 2)):
            plane = ycc[..., comp]
            if ds == 2:
                plane = plane.reshape(8, 2, 8, 2).mean(axis=(1, 3))
            n = plane.shape[0] // 8
            rec_plane = np.zeros_like(plane)
            for by in range(n):
                for bx in range(n):
                    blk = plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
                    zz = (_D @ blk @ _D.T).reshape(64)[ZIGZAG]
                    qdc = int(round(zz[0] / 8.0))
                    rec = np.zeros(64, dtype=np.int64)
                    rec[0] = qdc * 8
                    for i in range(1, 64):
                        level = int(np.fix(16 * zz[i] / (2 * q * wq[i])))
                        level = max(-255, min(255, level))
                        if level == 0:
                            continue
                        # spec dequant truncates toward zero (11172-2
                        # 2.4.4.1), not floor
                        prod = 2 * level * q * wq[i]
                        val = prod // 16 if prod >= 0 else -((-prod) // 16)
                        if val % 2 == 0:
                            val -= 1 if val > 0 else -1
                        rec[i] = max(-2048, min(2047, val))
                    sp = _D.T @ rec[UNZIGZAG].reshape(8, 8).astype(float) @ _D
                    rec_plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = sp
            if ds == 2:
                rec_plane = np.repeat(np.repeat(rec_plane, 2, axis=0), 2, axis=1)
            planes.append(rec_plane)
        want = ycbcr_to_rgb(np.stack(planes, axis=-1))
        assert np.array_equal(got, want)

    def test_intra_dequant_truncates_toward_zero(self):
        """ISO 11172-2 2.4.4.1: integer division in the intra dequant
        truncates toward zero. Floor division lands negative
        coefficients 2 steps off: true quotient -36.5 must reconstruct
        -35 (trunc -36, oddified toward zero), never -37 (ADVICE r4)."""
        # 2*level*qscale*wq = 2*(-4)*1*73 = -584; -584/16 = -36.5
        assert mpeg1._intra_dequant(-4, 1, 73) == -35
        assert mpeg1._intra_dequant(4, 1, 73) == 35  # symmetric
        # exact quotients: only oddification applies (-8 -> -7)
        assert mpeg1._intra_dequant(-2, 2, 16) == -7
        assert mpeg1._intra_dequant(2, 2, 16) == 7
        # clamp still applies
        assert mpeg1._intra_dequant(255, 31, 255) == 2047
        assert mpeg1._intra_dequant(-255, 31, 255) == -2048

    def test_snippets_equal_full_decode(self):
        enc = mpeg1.encode_mpeg1(_frames(3), qscale=8)
        snips, ms = mpeg1.extract_iframe_payloads(enc)
        assert len(snips) == 3 and ms == 40  # 25 fps
        full = mpeg1.decode_mpeg1_iframes(enc)
        for s, (_, ref) in zip(snips, full):
            assert mpeg1.is_mpeg1(s)
            got = mpeg1.decode_mpeg1_iframes(s)
            assert len(got) == 1 and np.array_equal(got[0][1], ref)

    def test_malformed_and_longtail_raise(self):
        with pytest.raises(ValueError, match="not an MPEG-1"):
            mpeg1.decode_mpeg1_iframes(b"\xff\xd8nope")
        with pytest.raises(ValueError, match="qscale"):
            mpeg1.encode_mpeg1(_frames(1), qscale=0)
        with pytest.raises(ValueError, match="no frames"):
            mpeg1.encode_mpeg1([])
        # a long-tail VLC prefix fails loudly instead of decoding wrong
        enc = bytearray(mpeg1.encode_mpeg1(_frames(1), qscale=8))
        pics = [o for o, c in mpeg1._start_codes(bytes(enc)) if 1 <= c <= 0xAF]
        # corrupt the first slice body into an unsupported prefix
        enc[pics[0] + 5 : pics[0] + 9] = b"\x00\x00\x00\x01"[:4].replace(b"\x01", b"\x02")
        with pytest.raises(ValueError):
            mpeg1.decode_mpeg1_iframes(bytes(enc))


class TestIntegration:
    def test_split_video_frames_mpeg1_branch(self):
        from parseable_spark.llm.multimodal import (
            decode_image,
            decode_image_pixels,
            split_video_frames,
        )

        frames = _frames(3)
        enc = mpeg1.encode_mpeg1(frames, qscale=4)
        payloads, ms = split_video_frames(enc)
        assert len(payloads) == 3 and ms == 40
        px = decode_image_pixels(payloads[1])
        assert px.shape == frames[1].shape and _psnr(px, frames[1]) > 30
        meta = decode_image(payloads[0])
        assert (meta["width"], meta["height"]) == (40, 36)

    def test_extract_real_features_on_mpeg1(self, spark):
        from parseable_spark.llm.multimodal import MEDIA_SCHEMA, extract_real_features

        enc = mpeg1.encode_mpeg1(_frames(2), qscale=4)
        df = spark.createDataFrame(
            [(1, "video", bytearray(enc), None, None, None)], MEDIA_SCHEMA
        )
        row = extract_real_features(df).collect()[0]
        assert row["n_frames"] == 2
        assert row["mean_r"] is not None and 0 <= row["mean_r"] <= 255

    def test_sample_frames_real_null_duration(self, spark):
        """NULL duration_ms arrives as NaN via Arrow→pandas, and NaN is
        truthy — `dur or fallback` used to int(NaN) crash (r4 fix:
        derive duration from the demuxed frame count)."""
        import numpy as np

        from parseable_spark.llm.multimodal import MEDIA_SCHEMA, sample_frames_real

        fr = [np.full((24, 32, 3), i * 60 + 40, dtype=np.uint8) for i in range(3)]
        enc = mpeg1.encode_mpeg1(fr, qscale=4)
        df = spark.createDataFrame(
            [(7, "video", bytearray(enc), None, None, None)], MEDIA_SCHEMA
        )
        rows = sample_frames_real(df, every_ms=40).collect()
        assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [(0, 0), (1, 40), (2, 80)]
        # real decoded keyframe pixels, not fakes: means track the input
        assert [round(r["mean_r"]) for r in rows] == [40, 100, 160]
