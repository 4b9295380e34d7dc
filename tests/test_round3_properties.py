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


# ---- mixture sampling rates ------------------------------------------------


class TestMixtureRateProperties:
    counts = st.dictionaries(
        st.text(st.characters(categories=["L", "N"]), min_size=1, max_size=8),
        st.integers(0, 10**7),
        min_size=1,
        max_size=12,
    )

    @given(counts, st.floats(0.05, 1.0))
    @settings(max_examples=100, deadline=None)
    def test_rates_bounded_and_cover_every_domain(self, counts, t):
        from parseable_spark.llm.sampling import mixture_rates

        rates = mixture_rates(counts, temperature=t)
        assert set(rates) == set(counts)
        assert all(0.0 <= v <= 1.0 for v in rates.values())
        # with no target, the most-boosted nonzero domain keeps everything
        if any(n > 0 for n in counts.values()):
            assert max(rates[d] for d, n in counts.items() if n > 0) == 1.0
        # zero-count domains never sample
        assert all(rates[d] == 0.0 for d, n in counts.items() if n == 0)

    @given(counts, st.floats(0.05, 1.0), st.integers(1, 10**6))
    @settings(max_examples=100, deadline=None)
    def test_target_rows_is_a_capped_fixpoint(self, counts, t, target):
        from parseable_spark.llm.sampling import mixture_rates

        rates = mixture_rates(counts, temperature=t, target_rows=target)
        total = sum(counts.values())
        expected = sum(rates[d] * counts[d] for d in counts)
        # expected kept rows hits the target, or saturates at the corpus
        want = min(float(target), float(total))
        assert expected <= total + 1e-6
        assert abs(expected - want) < max(1.0, want * 1e-6) or (
            want == float(total) and all(
                rates[d] == 1.0 for d, n in counts.items() if n > 0
            )
        )

    @given(counts)
    @settings(max_examples=50, deadline=None)
    def test_temperature_one_is_uniform_rate(self, counts):
        from parseable_spark.llm.sampling import mixture_rates

        rates = mixture_rates(counts, temperature=1.0)
        nz = {d for d, n in counts.items() if n > 0}
        # T=1 preserves natural proportions: every nonzero domain gets
        # the same acceptance rate (scaled to 1.0 without a target)
        assert all(rates[d] == 1.0 for d in nz)


# ---- BPE -------------------------------------------------------------------


class TestBpeProperties:
    words = st.lists(
        st.tuples(
            st.text(st.characters(categories=["L"]), min_size=1, max_size=10).map(
                str.lower
            ),
            st.integers(1, 1000),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @given(words, st.integers(0, 60))
    @settings(max_examples=60, deadline=None)
    def test_segments_reassemble_to_the_word(self, vocab, n_merges):
        from parseable_spark.llm.bpe import EOW, bpe_segments, bpe_train

        merges = bpe_train(vocab, num_merges=n_merges)
        for w, _ in vocab:
            segs = bpe_segments(w, merges)
            assert "".join(segs) == w + EOW  # lossless segmentation
            assert 1 <= len(segs) <= len(w)

    @given(words)
    @settings(max_examples=40, deadline=None)
    def test_more_merges_never_increase_token_count(self, vocab):
        from parseable_spark.llm.bpe import bpe_segments, bpe_train

        full = bpe_train(vocab, num_merges=80)
        for cut in (0, len(full) // 2, len(full)):
            m = full[:cut]
            n_cut = sum(len(bpe_segments(w, m)) for w, _ in vocab)
            n_full = sum(len(bpe_segments(w, full)) for w, _ in vocab)
            assert n_full <= n_cut


# ---- PQ ADC table ----------------------------------------------------------


class TestAdcProperties:
    @given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 2**31 - 1))
    @settings(max_examples=50, deadline=None)
    def test_table_shape_and_self_distance_zero(self, m, k, seed):
        from parseable_spark.llm.pq import adc_table

        rng = np.random.default_rng(seed)
        sub = 3
        books = [[list(rng.normal(size=sub)) for _ in range(k)] for _ in range(m)]
        q = [x for book in books for x in book[0]]  # q = centroid 0 per subspace
        table = adc_table(q, books)
        assert len(table) == m and all(len(row) == k for row in table)
        assert all(abs(table[j][0]) < 1e-12 for j in range(m))
        assert all(v >= 0.0 for row in table for v in row)


# ---- Bloom bit kernels (new in r4) -----------------------------------------

from parseable_spark.llm.bloom import _member, _or_bits


@st.composite
def position_sets(draw):
    nbytes = draw(st.integers(4, 64))
    m = nbytes * 8
    k = draw(st.integers(1, 8))
    n_rows = draw(st.integers(1, 20))
    rows = [
        draw(st.lists(st.integers(0, m - 1), min_size=k, max_size=k))
        for _ in range(n_rows)
    ]
    return nbytes, k, rows


class TestBloomBitProperties:
    @settings(max_examples=60, deadline=None)
    @given(position_sets())
    def test_or_bits_sets_exactly_inserted_bits(self, case):
        import pandas as pd

        nbytes, _, rows = case
        bitmap = _or_bits(pd.DataFrame({"pos": rows}), nbytes)
        want = {p for r in rows for p in r}
        got = {i for i in range(nbytes * 8) if bitmap[i >> 3] >> (i & 7) & 1}
        assert got == want

    @settings(max_examples=60, deadline=None)
    @given(position_sets())
    def test_inserted_rows_are_members(self, case):
        import pandas as pd

        nbytes, k, rows = case
        bitmap = _or_bits(pd.DataFrame({"pos": rows}), nbytes)
        pos = np.asarray(rows, dtype=np.int64).reshape(-1, k)
        assert _member(bitmap, pos).all()

    @settings(max_examples=60, deadline=None)
    @given(position_sets())
    def test_rows_touching_unset_bits_are_non_members(self, case):
        import pandas as pd

        nbytes, k, rows = case
        m = nbytes * 8
        used = {p for r in rows for p in r}
        free = [p for p in range(m) if p not in used]
        if not free:
            return
        bitmap = _or_bits(pd.DataFrame({"pos": rows}), nbytes)
        # every probe row contains at least one never-set bit
        probes = np.asarray(
            [[free[0]] + rows[i % len(rows)][: k - 1] for i in range(5)],
            dtype=np.int64,
        )
        assert not _member(bitmap, probes).any()

    @settings(max_examples=40, deadline=None)
    @given(position_sets(), position_sets())
    def test_or_merge_is_union(self, a, b):
        import pandas as pd

        nbytes = min(a[0], b[0])
        m = nbytes * 8
        ra = [[p % m for p in r] for r in a[2]]
        rb = [[p % m for p in r] for r in b[2]]
        ba = _or_bits(pd.DataFrame({"pos": ra}), nbytes)
        bb = _or_bits(pd.DataFrame({"pos": rb}), nbytes)
        both = _or_bits(pd.DataFrame({"pos": ra + rb}), nbytes)
        assert (np.bitwise_or(ba, bb) == both).all()
