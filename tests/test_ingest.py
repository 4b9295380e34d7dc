"""Ingest-layer tests — the reference's own test strategy (SURVEY §5
'flattening, JSON→Arrow + schema conflicts') plus the FIXTURES.md §6
schema-evolution batches."""

from __future__ import annotations

from datetime import datetime

import pytest

from parseable_spark.ingest import flatten as fl
from parseable_spark.ingest import schema as sc
from parseable_spark.ingest.events import Stream, StreamConfig, prepare_batch


class TestFlatten:
    def test_nested_object_keys(self):
        assert fl.flatten({"a": {"b": 1}}, "_") == {"a_b": 1}
        assert fl.flatten({"a": {"b": 1}}, ".") == {"a.b": 1}
        assert fl.flatten({"a": {"b": {"c": 2}}, "x": 0}, ".") == {"a.b.c": 2, "x": 0}

    def test_array_of_objects_transpose(self):
        # reference flatten.rs:252-296 docstring example
        out = fl.flatten({"key": [{"a": 1}, {"b": 2}]}, ".")
        assert out == {"key.a": [1, None], "key.b": [None, 2]}

    def test_array_transpose_null_element(self):
        out = fl.flatten({"k": [{"a": 1}, None, {"a": 3}]}, ".")
        assert out == {"k.a": [1, None, 3]}

    def test_array_of_scalars_untouched(self):
        assert fl.flatten({"k": [1, 2, 3]}, ".") == {"k": [1, 2, 3]}

    def test_non_object_in_mixed_array_rejected(self):
        with pytest.raises(fl.NonObjectInArray):
            fl.flatten({"k": [{"a": 1}, 5]}, ".")

    def test_top_level_scalar_rejected(self):
        with pytest.raises(fl.CannotFlatten):
            fl.flatten(42, ".")

    def test_depth_gate(self):
        deep = {"a": {"b": {"c": {"d": {"e": ["a", "b"]}}}}}
        assert fl.has_more_than_max_allowed_levels(deep, 1)
        shallow = {"a": [{"b": 1}, {"c": 2}], "d": {"e": 4}}
        assert not fl.has_more_than_max_allowed_levels(shallow, 1)

    def test_generic_flattening_explode(self):
        # reference flatten.rs:300-308 examples 3 & 4
        assert fl.generic_flattening([{"a": [{"b": 1}, {"c": 2}]}]) == [
            {"a": {"b": 1}},
            {"a": {"c": 2}},
        ]
        out = fl.generic_flattening({"a": [{"b": 1}, {"c": 2}], "d": {"e": 4}})
        assert {"a": {"b": 1}, "d": {"e": 4}} in out
        assert {"a": {"c": 2}, "d": {"e": 4}} in out
        assert len(out) == 2

    def test_generic_flattening_empty_array_kept(self):
        assert fl.generic_flattening({"a": [], "b": 1}) == [{"a": [], "b": 1}]

    def test_flatten_json_body_explodes_then_flattens(self):
        recs = fl.flatten_json_body({"a": {"b": [{"c": 1}, {"c": 2}]}})
        assert recs == [{"a_b_c": 1}, {"a_b_c": 2}]

    def test_flatten_json_body_deep_no_explode(self):
        deep = {"a": {"b": {"c": {"d": {"e": 1}}}}}
        recs = fl.flatten_json_body(deep)
        assert recs == [{"a_b_c_d_e": 1}]  # still flattened, not exploded

    def test_custom_partition_validation(self):
        with pytest.raises(fl.FieldError):
            fl.flatten_json_body({"x": 1}, custom_partition="host")
        with pytest.raises(fl.FieldError):
            fl.flatten_json_body({"host": "a.b"}, custom_partition="host")
        with pytest.raises(fl.FieldError):
            fl.flatten_json_body({"host": 1.5}, custom_partition="host")
        # integral floats stringify with a period too ("3.0") and must
        # be rejected like the reference's to_string().contains('.')
        with pytest.raises(fl.FieldError):
            fl.flatten_json_body({"host": 3.0}, custom_partition="host")
        assert fl.flatten_json_body({"host": "web1"}, custom_partition="host")
        assert fl.flatten_json_body({"host": 3}, custom_partition="host")


class TestSchema:
    def test_v1_numbers_become_float64(self):
        recs = [{"status": 200, "ratio": 0.5}]
        coerced = sc.override_data_type(sc.infer_batch_schema(recs), recs)
        assert coerced == {"status": sc.FLOAT64, "ratio": sc.FLOAT64}

    def test_time_named_string_becomes_timestamp(self):
        recs = [{"created_at": "2026-08-01T00:00:00Z", "note": "2026-08-01T00:00:00Z"}]
        coerced = sc.override_data_type(sc.infer_batch_schema(recs), recs)
        assert coerced["created_at"] == sc.TIMESTAMP_MS
        assert coerced["note"] == sc.UTF8  # name not time-like → stays utf8

    def test_non_datetime_time_named_string_stays_utf8(self):
        recs = [{"timestamp": "not a date"}]
        coerced = sc.override_data_type(sc.infer_batch_schema(recs), recs)
        assert coerced["timestamp"] == sc.UTF8

    def test_series_hash_stays_unsigned(self):
        recs = [{sc.SERIES_HASH_COLUMN: 2**64 - 1}]
        coerced = sc.override_data_type(sc.infer_batch_schema(recs), recs)
        assert coerced[sc.SERIES_HASH_COLUMN] == sc.UINT64

    def test_at_key_rename_and_collision(self):
        assert sc.rename_json_keys([{"@timestamp": "x"}]) == [{"_timestamp": "x"}]
        with pytest.raises(ValueError, match="collision"):
            sc.rename_json_keys([{"@ts": 1, "_ts": 2}])

    def test_conflict_typed_sibling(self):
        # FIXTURES.md §6 batches 1-2: level float64 then "info" → level_utf8
        existing = {"level": sc.FLOAT64}
        recs = [{"level": "info", "msg": "b"}]
        conflicts = sc.detect_schema_conflicts(
            sc.infer_batch_schema(recs), existing, recs
        )
        assert conflicts == {"level": "level_utf8"}
        renamed = sc.rename_conflicting_fields(recs, conflicts, existing)
        assert renamed == [{"level_utf8": "info", "msg": "b"}]

    def test_compatible_value_not_renamed(self):
        # int value on a float64 column is V1-compatible — no sibling
        existing = {"level": sc.FLOAT64}
        recs = [{"level": 30}]
        conflicts = sc.detect_schema_conflicts(
            sc.infer_batch_schema(recs), existing, recs
        )
        assert conflicts == {}

    def test_per_record_mixed_types(self):
        # FIXTURES.md §6 batch 3: one batch, utf8 wins inference; the
        # bool record must route to a typed sibling per-record
        recs = [{"escaped": "true"}, {"escaped": True}]
        inferred = sc.infer_batch_schema(recs)
        assert inferred == {"escaped": sc.UTF8}
        out = sc.rename_per_record_type_mismatches(recs, inferred, {})
        assert out == [{"escaped": "true"}, {"escaped_bool": True}]

    def test_registry_union_merge_sorted(self):
        r = sc.SchemaRegistry()
        assert r.merge({"b": sc.UTF8}) is True
        assert r.merge({"a": sc.FLOAT64, "b": sc.UTF8}) is True
        assert r.merge({"a": sc.FLOAT64}) is False
        assert r.sorted_names() == ["a", "b"]
        with pytest.raises(ValueError, match="merge conflict"):
            r.merge({"a": sc.UTF8})

    def test_registry_roundtrip(self, tmp_path):
        r = sc.SchemaRegistry({"x": sc.FLOAT64})
        p = str(tmp_path / "s" / "stream.json")
        r.save(p)
        assert sc.SchemaRegistry.load(p).fields == {"x": sc.FLOAT64}


class TestStreamIngest:
    def test_end_to_end_evolution(self, spark):
        stream = Stream(StreamConfig(name="logs"))
        ts = datetime(2026, 8, 13, 12, 0, 0)
        df1 = stream.ingest(spark, [{"level": 30, "msg": "a"}], p_timestamp=ts)
        assert dict(df1.dtypes)["level"] == "double"
        # batch 2: conflicting string level routes to level_utf8
        df2 = stream.ingest(spark, [{"level": "info", "msg": "b"}], p_timestamp=ts)
        assert "level_utf8" in df2.columns
        assert stream.registry.fields["level"] == sc.FLOAT64
        assert stream.registry.fields["level_utf8"] == sc.UTF8
        # batch 4: @timestamp rename + auto coercion
        df3 = stream.ingest(spark, [{"@timestamp": "2026-08-01T00:00:00Z"}], p_timestamp=ts)
        assert dict(df3.dtypes)["_timestamp"] == "timestamp_ntz"
        # nested array-of-objects transpose (batch 5 analog via flatten)
        df4 = stream.ingest(spark, [{"a": {"b": [{"c": 1}, {"c": 2}]}}], p_timestamp=ts)
        # V1 + shallow → generic explode produced two rows with a_b_c
        assert df4.count() == 2

    def test_p_timestamp_reserved(self, spark):
        stream = Stream(StreamConfig(name="logs"))
        with pytest.raises(ValueError, match="reserved"):
            stream.ingest(spark, [{"p_timestamp": "2026-01-01T00:00:00Z"}])

    def test_partition_layout_names_reserved(self, spark):
        """r6 review (empirically confirmed): a user field named
        date/hour/minute was SILENTLY NULLed by the first flush —
        partitionBy strips partition columns from the data files while
        staged rows still showed the value. Reserved loudly instead,
        same contract as p_timestamp."""
        for bad in ("date", "hour", "minute"):
            stream = Stream(StreamConfig(name="logs"))
            with pytest.raises(ValueError, match="reserved"):
                stream.ingest(spark, [{bad: "2020-01-01", "ok": 1}])

    def test_meta_fields(self, spark):
        stream = Stream(StreamConfig(name="logs"))
        df = stream.ingest(
            spark,
            {"x": 1},
            p_custom_fields={"p_user_agent": "curl/8", "p_src_ip": "10.0.0.1"},
        )
        row = df.collect()[0]
        assert row["p_user_agent"] == "curl/8"
        assert row["p_src_ip"] == "10.0.0.1"


def test_rejected_batch_commits_no_schema(spark):
    """Code-review regression: a batch rejected during value coercion
    must not have committed its new fields to the stream registry."""
    import pytest as _pytest

    from parseable_spark.ingest.events import Stream, StreamConfig

    from parseable_spark.ingest.events import prepare_batch

    stream = Stream(StreamConfig(name="rej"))
    with _pytest.raises(ValueError):
        prepare_batch(
            [{"login_time": "2024-01-01T00:00:00Z"}, {"login_time": "yesterday"}],
            stream.registry,
            stream.config,
        )
    assert "login_time" not in stream.registry.fields
    # a later plain-string batch is NOT conflict-renamed
    out = prepare_batch(
        [{"login_time": "whenever"}], stream.registry, stream.config
    )
    assert stream.registry.fields.get("login_time") == "utf8"
    assert all("login_time_utf8" not in r for r in out.records)


def test_rfc2822_timestamp_batch_coerces():
    """parses_as_datetime classifies RFC2822 strings as TIMESTAMP_MS;
    coercion must accept them too (fromisoformat alone rejected the
    batch the schema layer deliberately typed as timestamp)."""
    from datetime import datetime

    from parseable_spark.ingest import schema as sc
    from parseable_spark.ingest.events import Stream, StreamConfig, prepare_batch

    stream = Stream(StreamConfig(name="rfc"))
    out = prepare_batch(
        [{"received_date": "Tue, 01 Jul 2003 10:52:37 +0200", "n": 1}],
        stream.registry,
        stream.config,
    )
    assert stream.registry.fields["received_date"] == sc.TIMESTAMP_MS
    # normalized to naive UTC, millisecond precision
    assert out.records[0]["received_date"] == datetime(2003, 7, 1, 8, 52, 37)
