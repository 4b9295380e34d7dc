"""MPEG-1 video, intra-only — real I-frame (keyframe) extraction.

Implemented from the PUBLIC spec, ISO/IEC 11172-2 (sequence / GOP /
picture / slice / macroblock / block syntax; Annex B VLC tables): an
intra-only encoder (every picture an I-frame, one slice per macroblock
row) and a decoder that decodes ONLY I-frames and *skips* P/B pictures
by start-code walking — which is exactly what a 100 TB video-curation
pipeline does for thumbnailing/sampling: seek to sync points, decode
keyframes, never touch motion compensation. This shrinks the
``_fake_decode`` surface (llm/multimodal.py) to modern inter-frame
codecs (H.264/MP4) only: MPEG-1 keyframes are now REAL pixels.

Scope notes (all documented behavior, not accidents):
- VLC coverage: the encoder emits only Annex B's short AC codes
  (lengths 2–7) and routes every other (run, level) through the ESCAPE
  mechanism, which the spec allows for any coefficient; the decoder
  accepts the same subset + escape and raises on longer-tail VLC
  prefixes instead of guessing. Streams we produce are therefore
  spec-legal and decode on real players; rare external streams using
  the long-tail codes fail loudly, not wrongly.
- Color: JFIF full-range BT.601 matrix (shared with llm/jpeg.py)
  rather than broadcast 16–235 levels — a self-consistent
  simplification, noted for interop.
- Reconstruction follows the spec's intra path: fixed 8× DC quantizer,
  default intra quantizer matrix, oddification (mismatch control) and
  ±2048 clamp on AC dequant.

DCT / zigzag / color machinery reused from llm/jpeg.py (same public
8×8 DCT-II).
"""

from __future__ import annotations

import numpy as np

from .jpeg import _D, ZIGZAG, UNZIGZAG, rgb_to_ycbcr, ycbcr_to_rgb

SEQ_START = 0xB3
GOP_START = 0xB8
PIC_START = 0x00
SEQ_END = 0xB7
EXT_START = 0xB5
USER_DATA = 0xB2

# default intra quantizer matrix (ISO/IEC 11172-2 §2.4.3.2), raster order
DEFAULT_INTRA_Q = np.array(
    [
        [8, 16, 19, 22, 26, 27, 29, 34],
        [16, 16, 22, 24, 27, 29, 34, 37],
        [19, 22, 26, 27, 29, 34, 34, 38],
        [22, 22, 26, 27, 29, 34, 37, 40],
        [22, 26, 27, 29, 32, 35, 40, 48],
        [26, 27, 29, 32, 35, 40, 48, 58],
        [26, 27, 29, 34, 38, 46, 56, 69],
        [27, 29, 35, 38, 46, 56, 69, 83],
    ],
    dtype=np.int64,
)

# Annex B.3 / B.4: dct_dc_size VLCs
DC_LUM_CODES = {0: "100", 1: "00", 2: "01", 3: "101", 4: "110", 5: "1110",
                6: "11110", 7: "111110", 8: "1111110"}
DC_CHROM_CODES = {0: "00", 1: "01", 2: "10", 3: "110", 4: "1110", 5: "11110",
                  6: "111110", 7: "1111110", 8: "11111110"}
DC_LUM_DECODE = {v: k for k, v in DC_LUM_CODES.items()}
DC_CHROM_DECODE = {v: k for k, v in DC_CHROM_CODES.items()}

# Annex B.5 (dct_coeff_next), the short-code subset; sign bit follows.
# Everything else is emitted via ESCAPE ('000001' + 6-bit run + level).
AC_CODES = {
    (0, 1): "11", (1, 1): "011", (0, 2): "0100", (2, 1): "0101",
    (0, 3): "00101", (3, 1): "00111", (4, 1): "00110",
    (1, 2): "000110", (5, 1): "000111", (6, 1): "000101", (7, 1): "000100",
    (0, 4): "0000110", (2, 2): "0000100", (8, 1): "0000111", (9, 1): "0000101",
}
AC_DECODE = {v: k for k, v in AC_CODES.items()}
EOB = "10"
ESCAPE = "000001"
_AC_MAXLEN = 7

# Annex B.1 macroblock_address_increment (short subset; our encoder
# always emits 1). '00000001111' = stuffing, '00000001000' = escape(+33).
MBA_DECODE = {"1": 1, "011": 2, "010": 3, "0011": 4, "0010": 5,
              "00011": 6, "00010": 7}
MBA_STUFFING = "00000001111"
MBA_ESCAPE = "00000001000"
# merged once: rebuilt-per-macroblock dicts were the hot-loop waste in
# the bit-serial decode path
MBA_FULL_DECODE = {**MBA_DECODE, MBA_STUFFING: "stuff", MBA_ESCAPE: "esc"}

# picture_rate code (§2.4.3.2) → fps; index 0 forbidden
PICTURE_RATES = [None, 23.976, 24.0, 25.0, 29.97, 30.0, 50.0, 59.94, 60.0]


class _BW:
    """MSB-first bit writer (no byte stuffing — MPEG start codes are
    byte-aligned and VLC structure avoids start-code emulation)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_bits(self, bits: str) -> None:
        self.write(int(bits, 2), len(bits))

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def start_code(self, code: int) -> None:
        self.align()
        self.out += bytes((0, 0, 1, code))


class _BR:
    """MSB-first bit reader over one slice/picture byte range."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek_rest_zero(self) -> bool:
        """True when everything remaining is zero padding (slice end)."""
        save = self.pos
        left = self.bits_left()
        if left <= 0:
            return True
        v = self.read(min(left, 23))
        self.pos = save
        return v == 0

    def read_vlc(self, table: dict[str, object], maxlen: int, what: str):
        s = ""
        for _ in range(maxlen):
            s += str(self.read(1))
            if s in table:
                return table[s], s
        raise ValueError(f"unsupported {what} VLC prefix {s!r} (long-tail code)")


def _dc_size(v: int) -> int:
    return int(abs(v)).bit_length()


def _signed_bits(diff: int, size: int) -> int:
    """JPEG-style amplitude convention (shared by MPEG-1 DC): negative
    values are stored as diff + 2^size - 1."""
    return diff if diff >= 0 else diff + (1 << size) - 1


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- encoder -----------------------------------------------------------------


def _encode_block(bw: _BW, coefs: np.ndarray, pred: int, qscale: int,
                  dc_codes: dict[int, str]) -> int:
    """One 8×8 intra block: DC differential + AC run/levels + EOB.
    Returns the new DC predictor. `coefs` is the raw (unquantized) DCT."""
    zz = coefs.reshape(64)[ZIGZAG]
    qdc = int(round(zz[0] / 8.0))
    diff = qdc - pred
    size = min(_dc_size(diff), 8)
    bw.write_bits(dc_codes[size])
    if size:
        bw.write(_signed_bits(diff, size), size)
    wq = DEFAULT_INTRA_Q.reshape(64)[ZIGZAG]
    run = 0
    for i in range(1, 64):
        # inverse of the spec reconstruction (2*level*qscale*W)/16
        level = int(np.fix(16 * zz[i] / (2 * qscale * wq[i])))
        level = max(-255, min(255, level))
        if level == 0:
            run += 1
            continue
        key = (run, abs(level))
        if key in AC_CODES:
            bw.write_bits(AC_CODES[key])
            bw.write(0 if level > 0 else 1, 1)
        else:  # spec-legal escape for everything outside the short table
            bw.write_bits(ESCAPE)
            bw.write(run, 6)
            if -127 <= level <= 127:
                bw.write(level & 0xFF, 8)
            elif level > 0:
                bw.write(0, 8)
                bw.write(level, 8)
            else:
                bw.write(0x80, 8)
                bw.write((256 + level) & 0xFF, 8)
        run = 0
    bw.write_bits(EOB)
    return qdc


def encode_mpeg1(frames: list[np.ndarray], fps: float = 25.0, qscale: int = 8) -> bytes:
    """(H, W, 3) uint8 RGB frames → intra-only MPEG-1 video elementary
    stream (sequence header, one GOP, every picture an I-frame, one
    slice per macroblock row)."""
    if not frames:
        raise ValueError("no frames")
    if not 1 <= qscale <= 31:
        raise ValueError("qscale must be 1..31")
    h, w = frames[0].shape[:2]
    # sequence-header fields are 12 bits, and slice start codes are
    # 0x01..0xAF (175 macroblock rows = 2800 px) — silent truncation
    # wrote width=0 headers / start codes colliding with SEQ_START
    if not 1 <= w <= 4095:
        raise ValueError(f"width must be 1..4095 (12-bit header field), got {w}")
    if not 1 <= h <= 2800:
        raise ValueError(
            f"height must be 1..2800 (175 slice start codes 0x01..0xAF), got {h}"
        )
    mb_w, mb_h = -(-w // 16), -(-h // 16)
    rate_code = min(range(1, 9), key=lambda i: abs(PICTURE_RATES[i] - fps))

    bw = _BW()
    bw.start_code(SEQ_START)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(1, 4)  # pel aspect 1:1
    bw.write(rate_code, 4)
    bw.write(0x3FFFF, 18)  # variable bit rate
    bw.write(1, 1)  # marker
    bw.write(0, 10)  # vbv_buffer_size
    bw.write(0, 1)  # constrained_parameters_flag
    bw.write(0, 1)  # load_intra_quantizer_matrix (default)
    bw.write(0, 1)  # load_non_intra_quantizer_matrix
    bw.start_code(GOP_START)
    bw.write(0, 25)  # time_code
    bw.write(1, 1)  # closed_gop
    bw.write(0, 1)  # broken_link

    for t, frame in enumerate(frames):
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        bw.start_code(PIC_START)
        bw.write(t & 0x3FF, 10)  # temporal_reference
        bw.write(1, 3)  # picture_coding_type = I
        bw.write(0xFFFF, 16)  # vbv_delay
        bw.write(0, 1)  # extra_bit_picture

        ycc = rgb_to_ycbcr(frame.astype(np.uint8))
        pad_h, pad_w = mb_h * 16, mb_w * 16
        planes = np.zeros((pad_h, pad_w, 3), dtype=np.float64)
        planes[:h, :w] = ycc
        planes[h:, :w] = planes[h - 1 : h, :w]  # edge-pad
        planes[:, w:] = planes[:, w - 1 : w]
        y = planes[..., 0]
        cb = planes[..., 1].reshape(pad_h // 2, 2, pad_w // 2, 2).mean(axis=(1, 3))
        cr = planes[..., 2].reshape(pad_h // 2, 2, pad_w // 2, 2).mean(axis=(1, 3))

        for row in range(mb_h):
            bw.start_code(row + 1)  # slice_vertical_position (1-based)
            bw.write(qscale, 5)
            bw.write(0, 1)  # extra_bit_slice terminator
            pred_y = pred_cb = pred_cr = 1024 // 8  # reset per slice (QDC units)
            for col in range(mb_w):
                bw.write_bits("1")  # macroblock_address_increment = 1
                bw.write_bits("1")  # macroblock_type: intra
                my, mx = row * 16, col * 16
                for by in (0, 1):
                    for bx in (0, 1):
                        blk = y[my + 8 * by : my + 8 * by + 8,
                                mx + 8 * bx : mx + 8 * bx + 8]
                        pred_y = _encode_block(
                            bw, _D @ blk @ _D.T, pred_y, qscale, DC_LUM_CODES
                        )
                cby, cbx = row * 8, col * 8
                pred_cb = _encode_block(
                    bw, _D @ cb[cby : cby + 8, cbx : cbx + 8] @ _D.T,
                    pred_cb, qscale, DC_CHROM_CODES,
                )
                pred_cr = _encode_block(
                    bw, _D @ cr[cby : cby + 8, cbx : cbx + 8] @ _D.T,
                    pred_cr, qscale, DC_CHROM_CODES,
                )
    bw.start_code(SEQ_END)
    bw.align()
    return bytes(bw.out)


# --- decoder -----------------------------------------------------------------


def _start_codes(data: bytes) -> list[tuple[int, int]]:
    """(byte_offset, code) of every 00 00 01 xx start code."""
    out = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0 or j + 3 >= len(data):
            break
        out.append((j, data[j + 3]))
        i = j + 3
    return out


def is_mpeg1(payload: bytes) -> bool:
    return payload[:4] == bytes((0, 0, 1, SEQ_START))


def _parse_sequence_header(data: bytes, off: int):
    br = _BR(data[off + 4 : off + 16])
    w = br.read(12)
    h = br.read(12)
    br.read(4)  # aspect
    rate_code = br.read(4)
    fps = PICTURE_RATES[rate_code] if 1 <= rate_code <= 8 else 25.0
    br.read(18 + 1 + 10 + 1)
    load_intra = br.read(1)
    if load_intra:
        raise ValueError("custom quantizer matrices not supported")
    return w, h, fps


def mpeg1_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the sequence header — metadata fast path."""
    if not is_mpeg1(payload):
        raise ValueError("not an MPEG-1 video stream")
    w, h, _ = _parse_sequence_header(payload, 0)
    return w, h


def iframe_index(payload: bytes) -> list[dict]:
    """Keyframe scan WITHOUT pixel decode: every picture's byte offset,
    temporal reference, coding type, and ordinal — the sync-point index
    a sampler seeks with (the spec's random-access entry points)."""
    if not is_mpeg1(payload):
        raise ValueError("not an MPEG-1 video stream")
    out = []
    ordinal = 0
    for off, code in _start_codes(payload):
        if code == PIC_START:
            br = _BR(payload[off + 4 : off + 8])
            tref = br.read(10)
            ptype = br.read(3)
            out.append(
                {
                    "offset": off,
                    "ordinal": ordinal,
                    "temporal_reference": tref,
                    "coding_type": {1: "I", 2: "P", 3: "B", 4: "D"}.get(ptype, "?"),
                }
            )
            ordinal += 1
    return out


def _intra_dequant(level: int, qscale: int, wq_i: int) -> int:
    """Intra AC reconstruction per ISO 11172-2 2.4.4.1: dequantize with
    integer TRUNCATION (toward zero — Python's // floors toward -inf
    and would land negative coefficients 2 quantizer steps off), then
    oddification (mismatch control), then the ±2048 clamp."""
    prod = 2 * level * qscale * wq_i
    val = prod // 16 if prod >= 0 else -((-prod) // 16)
    if val % 2 == 0:
        val -= 1 if val > 0 else -1
    return max(-2048, min(2047, val))


def _decode_block(br: _BR, pred: int, qscale: int, dc_decode: dict[str, int]) -> tuple[np.ndarray, int]:
    """One intra block → (8×8 spatial plane, new DC predictor)."""
    size, _ = br.read_vlc(dc_decode, 8, "dct_dc_size")
    qdc = pred + (_extend(br.read(size), size) if size else 0)
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = qdc * 8
    wq = DEFAULT_INTRA_Q.reshape(64)[ZIGZAG]
    i = 0
    while True:
        s = ""
        run = level = None
        for _ in range(_AC_MAXLEN):
            s += str(br.read(1))
            if s == EOB:
                break
            if s == ESCAPE:
                run = br.read(6)
                v = br.read(8)
                if v == 0:
                    level = br.read(8)
                elif v == 0x80:
                    level = br.read(8) - 256
                else:
                    level = v if v < 128 else v - 256
                break
            if s in AC_DECODE:
                run, mag = AC_DECODE[s]
                level = -mag if br.read(1) else mag
                break
        else:
            raise ValueError(f"unsupported AC VLC prefix {s!r} (long-tail code)")
        if s == EOB:
            break
        i += run + 1
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _intra_dequant(level, qscale, wq[i])
    blk = zz[UNZIGZAG].reshape(8, 8).astype(np.float64)
    return _D.T @ blk @ _D, qdc


def decode_mpeg1_iframes(payload: bytes, max_frames: int | None = None) -> list[tuple[int, np.ndarray]]:
    """Decode every I-frame (skipping P/B pictures entirely — keyframe
    extraction) → [(picture_ordinal, (H, W, 3) RGB uint8)]."""
    if not is_mpeg1(payload):
        raise ValueError("not an MPEG-1 video stream")
    w, h, _fps = _parse_sequence_header(payload, 0)
    mb_w, mb_h = -(-w // 16), -(-h // 16)
    codes = _start_codes(payload)
    out: list[tuple[int, np.ndarray]] = []
    ordinal = -1
    i = 0
    while i < len(codes):
        off, code = codes[i]
        if code != PIC_START:
            i += 1
            continue
        ordinal += 1
        br = _BR(payload[off + 4 : off + 8])
        br.read(10)
        ptype = br.read(3)
        if ptype != 1:  # not an I-frame: skip to the next picture
            i += 1
            continue
        y = np.zeros((mb_h * 16, mb_w * 16))
        cb = np.zeros((mb_h * 8, mb_w * 8))
        cr = np.zeros((mb_h * 8, mb_w * 8))
        j = i + 1
        # user_data (0xB2) / extension (0xB5) may legally sit between
        # the picture header and the first slice (ISO 11172-2 picture
        # layer) — skipping past them instead of bailing prevents a
        # silent all-black frame
        while j < len(codes) and codes[j][1] in (0xB2, 0xB5):
            j += 1
        if j >= len(codes) or not (0x01 <= codes[j][1] <= 0xAF):
            raise ValueError(
                "picture header with no following slice (corrupt stream)"
            )
        while j < len(codes) and 0x01 <= codes[j][1] <= 0xAF:
            s_off, s_code = codes[j]
            s_end = codes[j + 1][0] if j + 1 < len(codes) else len(payload)
            sbr = _BR(payload[s_off + 4 : s_end])
            qscale = sbr.read(5)
            while sbr.read(1):  # extra_information_slice
                sbr.read(8)
            row = s_code - 1
            mb_addr = row * mb_w - 1
            pred_y = pred_cb = pred_cr = 1024 // 8
            while not sbr.peek_rest_zero():
                inc = 0
                while True:
                    v, s = sbr.read_vlc(
                        MBA_FULL_DECODE,
                        11,
                        "macroblock_address_increment",
                    )
                    if v == "stuff":
                        continue
                    if v == "esc":
                        inc += 33
                        continue
                    inc += v
                    break
                mb_addr += inc
                if inc > 1:
                    pred_y = pred_cb = pred_cr = 1024 // 8  # skipped MBs reset DC pred
                # macroblock_type (I-picture, B.2a): '1' intra, '01' intra+quant
                if sbr.read(1) == 0:
                    if sbr.read(1) != 1:
                        raise ValueError("bad I-picture macroblock_type")
                    qscale = sbr.read(5)
                r, c = divmod(mb_addr, mb_w)
                my, mx = r * 16, c * 16
                for by in (0, 1):
                    for bx in (0, 1):
                        blk, pred_y = _decode_block(sbr, pred_y, qscale, DC_LUM_DECODE)
                        y[my + 8 * by : my + 8 * by + 8, mx + 8 * bx : mx + 8 * bx + 8] = blk
                blk, pred_cb = _decode_block(sbr, pred_cb, qscale, DC_CHROM_DECODE)
                cb[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = blk
                blk, pred_cr = _decode_block(sbr, pred_cr, qscale, DC_CHROM_DECODE)
                cr[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = blk
            j += 1
        cb_up = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
        cr_up = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
        rgb = ycbcr_to_rgb(np.stack([y, cb_up, cr_up], axis=-1))
        out.append((ordinal, rgb[:h, :w]))
        if max_frames is not None and len(out) >= max_frames:
            return out
        i = j
    return out


def extract_iframe_payloads(payload: bytes) -> tuple[list[bytes], int]:
    """Self-contained single-I-frame MPEG-1 snippets (sequence header +
    picture data), one per keyframe — each independently decodable, the
    unit a frame sampler distributes. Returns (snippets, frame_ms)."""
    if not is_mpeg1(payload):
        raise ValueError("not an MPEG-1 video stream")
    _w, _h, fps = _parse_sequence_header(payload, 0)
    codes = _start_codes(payload)
    seq_end = next(
        (o for o, c in codes if c in (GOP_START, PIC_START) and o > 0), len(payload)
    )
    header = payload[:seq_end]
    pics = [o for o, c in codes if c == PIC_START]
    out = []
    for k, off in enumerate(pics):
        br = _BR(payload[off + 4 : off + 8])
        br.read(10)
        if br.read(3) != 1:
            continue  # not an I-frame
        end = pics[k + 1] if k + 1 < len(pics) else next(
            (o for o, c in codes if o > off and c in (SEQ_END, SEQ_START, GOP_START)),
            len(payload),
        )
        out.append(header + payload[off:end] + bytes((0, 0, 1, SEQ_END)))
    return out, int(1000 / fps)
