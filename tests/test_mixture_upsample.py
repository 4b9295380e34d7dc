"""Temperature-mixture resampling WITH replacement
(llm/sampling.py mixture_upsample): exact parity with an independent
pure-Python reference (hashlib.md5 == Spark md5), flattening behavior,
determinism, and plan quality.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parseable_spark.llm.sampling import (
    _threshold_hex,
    mixture_upsample,
    mixture_upsample_rates,
)


def _ref_copies(doc_id: str, rate: float) -> list[int]:
    """Independent reference: copy i emitted iff i < floor(r), plus
    copy floor(r) iff md5(f'{id}:{copy}') first byte < /256 threshold."""
    full = int(math.floor(rate))
    out = list(range(full))
    thr = _threshold_hex(min(rate - full, 1.0))
    h = hashlib.md5(f"{doc_id}:{full}".encode()).hexdigest()[:2]
    if h < thr:
        out.append(full)
    return out


def _corpus(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for d, n in sizes.items():
        for _ in range(n):
            rows.append((f"doc{i}", d))
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "domain"]))


def test_rates_allow_upsampling():
    rates = mixture_upsample_rates({"big": 900, "small": 100}, temperature=0.5)
    # α=0.5 flattening: small domain repeats (>1), big shrinks (<1)
    assert rates["small"] > 1.0 and rates["big"] < 1.0
    # expected total ≈ original corpus size
    exp = rates["big"] * 900 + rates["small"] * 100
    assert exp == pytest.approx(1000, rel=1e-9)
    # target_rows scales the whole mixture
    r2 = mixture_upsample_rates({"big": 900, "small": 100}, 0.5, target_rows=500)
    assert r2["small"] == pytest.approx(rates["small"] / 2, rel=1e-9)


def test_matches_independent_reference_exactly(spark):
    sizes = {"web": 400, "code": 60, "wiki": 40}
    df = _corpus(spark, sizes)
    out = mixture_upsample(df, "domain", temperature=0.5)
    got: dict[str, list[int]] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
    rates = mixture_upsample_rates(sizes, temperature=0.5)
    rows = df.collect()
    for r in rows:
        exp = _ref_copies(r["doc_id"], rates[r["domain"]])
        assert sorted(got.get(r["doc_id"], [])) == exp, r["doc_id"]


def test_flattens_and_is_deterministic(spark):
    sizes = {"big": 800, "tiny": 50}
    df = _corpus(spark, sizes)
    out = mixture_upsample(df, "domain", temperature=0.3)
    counts = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    # tiny domain upsampled well past its raw size, big cut down
    assert counts["tiny"] > 50 and counts["big"] < 800
    # reproducible end to end
    again = {
        r["domain"]: r["n"]
        for r in mixture_upsample(df, "domain", temperature=0.3)
        .groupBy("domain")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert again == counts


def test_copy_indices_are_distinct_per_doc(spark):
    df = _corpus(spark, {"tiny": 20, "big": 500})
    out = mixture_upsample(df, "domain", temperature=0.2)
    dup = (
        out.groupBy("doc_id", "copy_idx")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup == 0


def test_plan_is_scan_local(spark):
    """No shuffle in the resample itself (the domain-count aggregate is
    a separate bounded job): explain shows no Exchange."""
    df = _corpus(spark, {"a": 50, "b": 10})
    out = mixture_upsample(df, "domain", temperature=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    from parseable_spark.llm.sampling import epoch_shuffle

    # replicas shuffle apart on (id, copy) — composes with epoch_shuffle
    keyed = out.withColumn(
        "doc_copy", F.concat_ws("#", "doc_id", F.col("copy_idx").cast("string"))
    )
    shuffled = epoch_shuffle(keyed, seed=1, n_shards=4, id_col="doc_copy")
    assert shuffled.count() == out.count()


def test_validation():
    with pytest.raises(ValueError):
        mixture_upsample_rates({"a": 1}, temperature=0.0)
    with pytest.raises(ValueError):
        mixture_upsample_rates({"a": -1})
    assert mixture_upsample_rates({}) == {}
