"""Property-based coverage of the flattening + schema layers.

The reference's densest unit-test area is flattening and schema
conflict handling (flatten.rs:400-667, format/mod.rs:713-899); fixed
examples live in test_ingest.py — these properties pin the invariants
for arbitrary JSON shapes.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from parseable_spark.ingest import flatten as fl
from parseable_spark.ingest import schema as sc

# ---- strategies ------------------------------------------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), max_size=8
    ),
)

keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",)), min_size=1, max_size=6
)

json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(keys, children, max_size=3),
    ),
    max_leaves=12,
)

json_objects = st.dictionaries(keys, json_values, min_size=1, max_size=4)

# objects with no arrays-of-objects (flatten() rejects mixed arrays)
flat_safe_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(scalars, max_size=3),
        st.dictionaries(keys, children, max_size=3),
    ),
    max_leaves=12,
)
flat_safe_objects = st.dictionaries(keys, flat_safe_values, min_size=1, max_size=4)


# ---- flatten() properties --------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(flat_safe_objects)
def test_flatten_output_is_single_level(obj):
    out = fl.flatten(obj, "_")
    for v in out.values():
        assert not isinstance(v, dict)
        if isinstance(v, list):
            assert not any(isinstance(x, dict) for x in v)


@settings(max_examples=200, deadline=None)
@given(flat_safe_objects)
def test_flatten_deterministic_and_preserves_scalars(obj):
    a = fl.flatten(json.loads(json.dumps(obj)), "_")
    b = fl.flatten(json.loads(json.dumps(obj)), "_")
    assert a == b
    # every scalar leaf survives into some output value
    def leaves(v):
        if isinstance(v, dict):
            for x in v.values():
                yield from leaves(x)
        elif isinstance(v, list):
            for x in v:
                yield from leaves(x)
        elif v is not None:
            yield v

    out_leaves = list(leaves(a))
    for leaf in leaves(obj):
        assert leaf in out_leaves


@settings(max_examples=200, deadline=None)
@given(json_objects)
def test_generic_flattening_multiplies_by_array_lengths(obj):
    """The cartesian explode yields prod over array fields of their
    total expansion counts; empty arrays keep the event (×1) while a
    non-empty array whose elements all expand to nothing annihilates it
    (×0) — exactly the reference fold (flatten.rs:320-343)."""
    rows = fl.generic_flattening(obj)
    expected = 1
    for v in obj.values():
        if isinstance(v, list) and v:
            # each element may itself expand (nested arrays/objects)
            expected *= sum(len(fl.generic_flattening(item)) for item in v)
        elif isinstance(v, dict):
            expected *= len(fl.generic_flattening(v))
    assert len(rows) == expected
    assert all(isinstance(r, dict) for r in rows)


@settings(max_examples=100, deadline=None)
@given(json_values)
def test_depth_gate_consistent_with_flatten_level(v):
    """has_more_than_max_allowed_levels(x, 1, 1) is True iff any
    non-empty dict appears anywhere (its values sit at level 2; arrays
    are depth-transparent) — flatten.rs:376-389."""
    gate = fl.has_more_than_max_allowed_levels(v, 1, 1)

    def any_nonempty_dict(x):
        if isinstance(x, dict):
            return bool(x)
        if isinstance(x, list):
            return any(any_nonempty_dict(y) for y in x)
        return False

    assert gate == any_nonempty_dict(v)


# ---- schema properties -----------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.dictionaries(keys, scalars, max_size=4), max_size=5))
def test_schema_merge_idempotent_and_order_insensitive(records):
    s1 = sc.infer_batch_schema(records)
    s2 = sc.infer_batch_schema(list(reversed(records)))
    assert s1 == s2  # order-insensitive
    reg = sc.SchemaRegistry()
    reg.merge(dict(s1))
    snapshot = dict(reg.fields)
    reg.merge(dict(s1))
    assert reg.fields == snapshot  # idempotent


@settings(max_examples=200, deadline=None)
@given(scalars, scalars)
def test_type_promotion_commutative(a, b):
    ta, tb = sc.infer_value_type(a), sc.infer_value_type(b)
    assert sc.promote(ta, tb) == sc.promote(tb, ta)


_type_names = st.sampled_from([sc.FLOAT64, sc.UTF8, sc.BOOL, sc.TIMESTAMP_MS, sc.LIST])


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(keys, _type_names, min_size=1, max_size=3),
    st.lists(st.dictionaries(keys, scalars, max_size=4), min_size=2, max_size=6),
)
def test_conflict_pipeline_yields_mergeable_schema(committed, records):
    """After the full conflict pipeline (batch-level sibling renaming +
    per-record fallback), the resulting batch schema must union-merge
    into the committed schema WITHOUT a type clash — the invariant
    SchemaRegistry.merge enforces with a hard error (mod.rs:158-180)."""
    reg = sc.SchemaRegistry(fields=dict(committed))
    raw_inferred = sc.infer_batch_schema(records)
    conflicts = sc.detect_schema_conflicts(raw_inferred, reg.fields, records, "v1")
    recs = sc.rename_conflicting_fields(records, conflicts, reg.fields, "v1")
    recs = sc.rename_per_record_type_mismatches(recs, raw_inferred, reg.fields, "v1")
    inferred = sc.infer_batch_schema(recs)
    coerced = sc.override_data_type(inferred, recs, "v1", True)
    batch_schema = {k: reg.fields.get(k, t) for k, t in coerced.items()}
    reg.merge(batch_schema)  # must not raise
    # committed types never change
    for k, t in committed.items():
        assert reg.fields[k] == t
