"""Property-based coverage of the round-3 pure-Python layers.

No Spark here — these pin invariants of the JPEG codec, the AVI
container, the outbound egress policy, and the static-schema parser
for arbitrary inputs, complementing the fixed examples in their main
test files.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parseable_spark.llm import avi, jpeg

# ---- JPEG codec ------------------------------------------------------------

dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@st.composite
def images(draw):
    h, w = draw(dims)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["solid", "gradient", "noise"]))
    if kind == "solid":
        rgb = rng.integers(0, 256, 3)
        return np.full((h, w, 3), rgb, dtype=np.uint8)
    if kind == "gradient":
        y, x = np.mgrid[0:h, 0:w]
        return np.stack(
            [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
        ).astype(np.uint8)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)


class TestJpegProperties:
    @settings(max_examples=25, deadline=None)
    @given(images(), st.sampled_from([60, 85, 95]), st.sampled_from(["444", "420"]))
    def test_roundtrip_shape_and_bounded_error(self, img, q, sub):
        """decode(encode(x)) always returns the exact input shape and
        uint8 dtype; per-pixel error is bounded by quantization (never
        unbounded garbage) for ANY image."""
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, subsampling=sub))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 64  # mean error far below the value range

    @settings(max_examples=15, deadline=None)
    @given(images(), st.integers(1, 5))
    def test_restart_interval_never_changes_pixels(self, img, interval):
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
        rst = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=85, restart_interval=interval)
        )
        assert np.array_equal(plain, rst)

    @settings(max_examples=15, deadline=None)
    @given(images())
    def test_dimensions_header_matches(self, img):
        enc = jpeg.encode_jpeg(img, quality=75)
        assert jpeg.jpeg_dimensions(enc) == (img.shape[1], img.shape[0])


# ---- AVI container ---------------------------------------------------------


class TestAviProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(st.binary(min_size=1, max_size=200), min_size=1, max_size=8),
        st.integers(1, 60),
    )
    def test_mux_demux_roundtrip_verbatim(self, frames, fps):
        """Any payload list survives mux→demux byte-identically, with
        fps and count preserved (the container layer never touches
        frame bytes)."""
        payload = avi.encode_avi_mjpeg(frames, width=16, height=8, fps=fps)
        meta = avi.decode_avi_mjpeg(payload)
        assert meta["frames"] == frames
        assert meta["fps"] == fps and meta["n_frames"] == len(frames)


# ---- outbound policy -------------------------------------------------------

from parseable_spark.query.outbound_policy import (  # noqa: E402
    OutboundPolicyError,
    TargetPolicy,
    prepare_target,
    validate_policy,
)

ip_octet = st.integers(0, 255)
public_ips = st.tuples(st.integers(11, 99), ip_octet, ip_octet, ip_octet).map(
    lambda t: ".".join(map(str, t))
).filter(lambda ip: not ip.startswith(("127.", "169.254.", "100.")))


class TestPolicyProperties:
    @settings(max_examples=40, deadline=None)
    @given(public_ips)
    def test_consistency_deny_beats_allow_never_crashes(self, ip):
        """For any resolved public address: a policy that denies its
        /8 always rejects; the empty policy always accepts; outcomes
        are deterministic (same call twice, same result)."""
        res = lambda host, port: [ip]  # noqa: E731
        out1 = prepare_target("http://h.example.com/", "webhook", TargetPolicy(), resolver=res)
        out2 = prepare_target("http://h.example.com/", "webhook", TargetPolicy(), resolver=res)
        assert out1 == out2 and out1["addrs"] == [ip]
        deny = TargetPolicy(denied_cidrs=[f"{ip.split('.')[0]}.0.0.0/8"])
        try:
            prepare_target("http://h.example.com/", "webhook", deny, resolver=res)
            raise AssertionError("denied CIDR accepted")
        except OutboundPolicyError:
            pass

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.sampled_from(["a.com", "b.org", "x.a.com", "c.net"]), max_size=3),
        st.lists(st.sampled_from(["a.com", "b.org", "d.io"]), max_size=3),
    )
    def test_validate_policy_conflict_is_symmetric(self, allowed, denied):
        """validate_policy(a, d) raises iff validate_policy(d, a)
        raises — overlap is a symmetric relation."""
        def outcome(al, de):
            try:
                validate_policy(TargetPolicy(allowed_domains=al, denied_domains=de))
                return True
            except OutboundPolicyError:
                return False

        assert outcome(allowed, denied) == outcome(denied, allowed)


# ---- static schema parser --------------------------------------------------

from parseable_spark.ingest.static_schema import (  # noqa: E402
    STATIC_TYPES,
    parse_static_schema,
)

field_names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=8
).filter(lambda s: s != "p_timestamp")


class TestStaticSchemaProperties:
    @settings(max_examples=40, deadline=None)
    @given(
        st.dictionaries(field_names, st.sampled_from(sorted(STATIC_TYPES)), min_size=1, max_size=6)
    )
    def test_valid_declarations_always_parse_completely(self, decl):
        out = parse_static_schema(
            {"fields": [{"name": n, "data_type": t} for n, t in decl.items()]}
        )
        assert set(out) == set(decl)
        assert all(out[n] == STATIC_TYPES[decl[n]] for n in decl)
