"""Sharded Bloom-filter membership index for exact dedup at corpus scale.

The public Dolma pipeline (Soldaini et al. 2024) deduplicates a
multi-TB corpus against its history with a Bloom filter rather than a
stored digest table: ~10 bits per item at 1 % false-positive rate is
12× smaller than a 16-byte digest column, and membership is O(k) bit
probes with no join against the historical corpus at all. This module
is that recipe re-expressed Spark-first:

- The filter is SHARDED: ``num_shards`` independent bitmaps keyed by a
  shard hash of the item. Each shard is a single binary cell (default
  128 KiB), so the whole index is a tiny DataFrame of
  ``(shard_id, bitmap)`` rows that persists as parquet. Sharding is
  what makes every phase distributed-friendly:
  * build — one shuffle of (shard_id, positions) rows, one
    ``applyInPandas`` per shard that ORs bits into a numpy bitmap;
  * probe — ``cogroup`` of the increment with the index on shard_id:
    one co-partitioned shuffle, the bitmap crosses the wire ONCE per
    shard (never duplicated per probe row), membership is a
    vectorized numpy gather;
  * merge — groupBy(shard_id) + bitwise OR, so rolling ingestion
    unions an increment's sub-filter into the index without touching
    rows of the historical corpus.
- All hashing is ``xxhash64`` JVM-side (deterministic, seedable via an
  extra literal column), so two builds of the same corpus are
  bit-identical and merge == rebuild exactly — which is what the tests
  pin.

False positives are inherent (a hit means "drop or verify", never
"definitely duplicate"); false negatives are impossible, which is the
direction curation needs: nothing already in the corpus sneaks back in.

Beyond the reference's operator set (its dedup story stops at
content digests); kept alongside `build_lsh_index`
(dedup.py:238) as the exact-membership counterpart of the near-dup
index.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

# seed namespace: shard selector must be independent of the k probe
# hashes or shard-local bit positions would correlate across items in
# the same shard.
_SHARD_SEED = -1

BLOOM_SCHEMA = StructType(
    [
        StructField("shard_id", LongType(), False),
        StructField("bitmap", BinaryType(), False),
    ]
)


def bloom_params(capacity: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: total bits m = -n·ln p / ln²2, hashes
    k = (m/n)·ln 2. Returns (total_bits, num_hashes)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _positions(key: Column, num_shards: int, bits_per_shard: int, num_hashes: int):
    """(shard_id, array of num_hashes bit positions) — all JVM-side.

    Double hashing (Kirsch–Mitzenmacher, public result): position_i =
    (h1 + i·h2) mod m needs only two xxhash64 evaluations per item yet
    behaves like k independent hashes — at k=7 that is 3.5× less
    hashing per row than k seeded hashes, and it keeps the projection
    a compact codegen expression. h1/h2 are masked to 31 bits so the
    combination cannot overflow bigint under ANSI mode (the session
    default); 31 bits of position entropy bounds bits_per_shard below
    2^31, far above any cache-resident shard size.
    """
    if not 0 < bits_per_shard < 1 << 31:
        raise ValueError("bits_per_shard must be in (0, 2^31)")
    shard = F.pmod(F.xxhash64(key, F.lit(_SHARD_SEED)), F.lit(num_shards))
    h1 = F.pmod(F.xxhash64(key, F.lit(0)), F.lit(1 << 31))
    # h2 forced odd so it is coprime with a power-of-two m and the
    # probe sequence cycles through all positions
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(1 << 31)).bitwiseOR(F.lit(1))
    pos = F.array(
        *[
            F.pmod(h1 + F.lit(i) * h2, F.lit(bits_per_shard))
            for i in range(num_hashes)
        ]
    )
    return shard, pos


def _or_bits(pdf: pd.DataFrame, nbytes: int) -> np.ndarray:
    bitmap = np.zeros(nbytes, dtype=np.uint8)
    pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["pos"]])
    np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitmap


def _member(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized membership: row i is a member iff every bit in
    pos[i, :] is set. pos is an (n_rows, k) int64 matrix."""
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bloom_build(
    docs: DataFrame,
    key_col: str = "text",
    num_shards: int = 16,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 7,
) -> DataFrame:
    """Build the sharded filter over ``key_col``: DataFrame
    (shard_id, bitmap) with one row per non-empty shard (absent shard
    ⇒ all-zero bitmap; probes treat it as definite miss).

    Scale shape: the only wide op is the repartition of
    (shard_id, positions) rows — narrow longs, not document text — and
    the per-shard reducer holds exactly one bitmap in memory.
    Defaults (16 × 1 MiBit) hold ~1.7 M items at 1 % FPP; at 100 TB
    size via `bloom_params` and raise num_shards so each bitmap stays
    cache-resident (e.g. 10¹¹ items ⇒ ~1000 shards × 16 MiB).
    """
    if bits_per_shard % 8 or bits_per_shard <= 0:
        raise ValueError("bits_per_shard must be a positive multiple of 8")
    nbytes = bits_per_shard // 8
    shard, pos = _positions(F.col(key_col), num_shards, bits_per_shard, num_hashes)
    rows = docs.select(shard.alias("shard_id"), pos.alias("pos"))

    # STREAMING build: mapInPandas iterates Arrow batches, OR-ing each
    # into per-shard accumulators — task memory is O(bitmaps in this
    # partition), the documented bound. The previous
    # groupBy.applyInPandas materialized a shard's ENTIRE probe-row
    # set as one pandas DataFrame first (items_per_shard × k position
    # arrays — tens of GB at the docstring's own 10^11-item sizing),
    # OOMing long before the OR ran. Repartitioning by shard_id first
    # keeps each shard's accumulator on exactly one task; OR is
    # order-independent, so output bitmaps are bit-identical.
    def build_stream(batches) -> "pd.DataFrame":
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            for sid, grp in pdf.groupby("shard_id"):
                part = _or_bits(grp, nbytes)
                prev = acc.get(int(sid))
                acc[int(sid)] = part if prev is None else np.bitwise_or(prev, part)
        for sid, arr in acc.items():
            yield pd.DataFrame({"shard_id": [sid], "bitmap": [arr.tobytes()]})

    return rows.repartition(num_shards, "shard_id").mapInPandas(
        build_stream, schema=BLOOM_SCHEMA
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitwise-OR union of two filters built with identical geometry —
    the rolling-ingestion commit: OR the increment's sub-filter in,
    bit-identical to rebuilding over the union (tested)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: np.ndarray | None = None
        for raw in pdf["bitmap"]:
            arr = np.frombuffer(raw, dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame(
            {"shard_id": pdf["shard_id"].iloc[:1], "bitmap": [acc.tobytes()]}
        )

    return a.unionByName(b).groupBy("shard_id").applyInPandas(merge, BLOOM_SCHEMA)


def bloom_probe(
    increment: DataFrame,
    bloom: DataFrame,
    key_col: str = "text",
    num_shards: int = 16,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 7,
) -> DataFrame:
    """Tag each increment row with ``maybe_member``: True ⇒ the key MAY
    be in the corpus the filter was built over (false-positive rate per
    geometry), False ⇒ it definitely is not.

    Plan: cogroup on shard_id — one shuffle of the increment keyed by
    shard, one of the (tiny) filter; inside each co-group the bitmap is
    materialized once and membership for all of the shard's probe rows
    is a single numpy gather. No per-row Python, no bitmap-per-row
    join blowup, and the increment's own payload columns ride through
    untouched.
    """
    nbytes = bits_per_shard // 8
    shard, pos = _positions(F.col(key_col), num_shards, bits_per_shard, num_hashes)
    from pyspark.sql.types import BooleanType

    probes = increment.withColumn("_shard_id", shard).withColumn("_pos", pos)
    out_schema = StructType(
        [f for f in probes.schema.fields if f.name not in ("_shard_id", "_pos")]
        + [StructField("maybe_member", BooleanType(), True)]
    )

    def check(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        k = num_hashes
        pos = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in left["_pos"]]
        ).reshape(-1, k)
        if right.empty:
            member = np.zeros(len(left), dtype=bool)
        else:
            bitmap = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
            member = _member(bitmap, pos)
        out = left.drop(columns=["_shard_id", "_pos"])
        out["maybe_member"] = member
        return out

    return (
        probes.groupBy("_shard_id")
        .cogroup(bloom.groupBy("shard_id"))
        .applyInPandas(check, schema=out_schema)
    )


def bloom_filter_new(
    increment: DataFrame,
    bloom: DataFrame,
    key_col: str = "text",
    num_shards: int = 16,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 7,
) -> DataFrame:
    """The Dolma-style incremental exact-dedup gate: rows of the
    increment whose key is DEFINITELY absent from the indexed corpus
    (no false negatives; a small FPP fraction of genuinely-new rows is
    dropped — the curation-safe direction). Commit the survivors with
    ``bloom_merge(bloom, bloom_build(survivors, ...))``."""
    tagged = bloom_probe(
        increment, bloom, key_col, num_shards, bits_per_shard, num_hashes
    )
    return tagged.filter(~F.col("maybe_member")).drop("maybe_member")


def bloom_fill_ratio(bloom: DataFrame, num_hashes: int = 7) -> DataFrame:
    """Per-shard occupancy diagnostics: fraction of set bits and the
    implied false-positive rate fill**k. The operational saturation
    gauge — when est_fpp drifts past the design point, rotate in a
    bigger geometry (build the next epoch's filter larger; probes fan
    to both during the overlap)."""
    from pyspark.sql.types import DoubleType

    fill_schema = StructType(
        [
            StructField("shard_id", LongType(), False),
            StructField("fill", DoubleType(), False),
            StructField("est_fpp", DoubleType(), False),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.frombuffer(pdf["bitmap"].iloc[0], dtype=np.uint8)
        fill = float(np.unpackbits(bitmap).mean())
        return pd.DataFrame(
            {
                "shard_id": pdf["shard_id"].iloc[:1],
                "fill": [fill],
                "est_fpp": [fill**num_hashes],
            }
        )

    return bloom.groupBy("shard_id").applyInPandas(stats, fill_schema)
