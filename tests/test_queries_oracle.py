"""Oracle-check every registered query at sf0.001 (fast CI gate).

The driver runs the same comparison at sf0.01; this is the local
regression net. Comparison = row count + sorted column names +
normalized cell values, matching tools/check_oracle.py.
"""

from __future__ import annotations

import pytest

from parseable_spark.queries import registry
from tests.conftest import SF_SMALL
from tools.check_oracle import compare

SPECS = sorted(registry().items())


@pytest.mark.parametrize("name", [n for n, _ in SPECS])
def test_query_matches_oracle(name, spark, duck):
    spec = dict(SPECS)[name]
    sdf = spec.fn(spark, SF_SMALL).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: must execute
        return
    odf = duck.sql(spec.oracle).df()
    ok, msg = compare(name, sdf, odf)
    assert ok, f"{name}: {msg}"
