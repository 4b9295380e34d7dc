"""Registry-shape guard: the driver's correctness gate enumerates at
most 50 sorted entries, so the registry must stay EXACTLY q01..q50 —
every operator family inside the checked window (VERDICT r2 §missing-1).
"""

from __future__ import annotations

import re

from parseable_spark.queries import registry


def test_registry_is_exactly_q01_to_q50():
    names = sorted(registry())
    assert len(names) == 50, f"registry must hold exactly 50 entries, got {len(names)}"
    nums = []
    for n in names:
        m = re.fullmatch(r"q(\d{2})_[a-z0-9_]+", n)
        assert m, f"bad registry name: {n}"
        nums.append(int(m.group(1)))
    assert nums == list(range(1, 51)), "q-numbers must be contiguous 01..50"


def test_every_entry_has_an_oracle():
    r = registry()
    rows_only = [n for n, spec in r.items() if spec.oracle is None]
    # since r4 even the sketch rollup is hash-gated: q19 emits the exact
    # COUNT(DISTINCT)/percentile companions as value columns and folds
    # the sketch estimates into within-bound booleans the oracle pins to
    # TRUE, so no registry entry is rows-only.
    assert rows_only == []
    assert "q06_count_distinct" in r and "q46_latency_percentiles" in r


def test_entry_contract():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) == set(q)
    assert callable(q["q01_pricing_summary"])
