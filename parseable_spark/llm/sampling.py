"""Deterministic (hash-bucket) sampling for training-data pipelines.

Random `df.sample()` is non-reproducible across runs/partitionings and
can't be oracle-checked. Hash sampling keys the keep/drop decision on a
content-stable id digest instead: a row is kept iff the first byte of
md5(id) falls under a rate-derived threshold. Properties that matter at
100 TB:

- pure narrow map — no shuffle, no RNG state, pushdown-friendly;
- reproducible across engines (md5 is bit-identical everywhere, which
  is also what makes the DuckDB oracle exact);
- stable under re-partitioning, retries, and incremental reruns: a doc
  is in or out of the sample forever, so downstream caches stay valid;
- stratified variant = per-stratum thresholds via one CASE expression,
  still scan-local (no per-group windows or count passes).

Rates are quantized to 1/256 (one hex byte). That is deliberate: a
documented, engine-portable quantum beats a float comparison that
depends on hex→float conversion semantics.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _threshold_hex(rate: float) -> str:
    """Rate → 2-char lowercase hex bound; row kept iff prefix < bound.

    Quantized to /256: a rate that rounds to 256 quanta keeps
    everything, so it must return the above-any-hex sentinel — NOT
    format(256, "02x") == "100", whose 3 chars break the 2-char
    lexicographic compare ("ff" < "100" is False; only "0x"/"10"
    buckets ≈ 6.6% would survive a requested ~99.9% keep rate).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    q = round(rate * 256)
    return format(q, "02x") if q < 256 else "zz"  # "zz" > any hex


def _bucket(id_col: str) -> Column:
    # first md5 byte of the stringified id; lowercase hex in every engine
    return F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 2)


def hash_sample(
    df: DataFrame,
    rate: float | None = None,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    strata_rates: Mapping[str, float] | None = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep a deterministic ~`rate` fraction of rows (quantized /256).

    Uniform: pass `rate`. Stratified: pass `strata_col` +
    `strata_rates` ({stratum value: rate}); strata not listed fall back
    to `default_rate`. The filter compiles to a single scan-local
    predicate — lexicographic compare of a 2-char hex prefix, which
    equals numeric compare for lowercase hex.

    NULL-id rows are always dropped (the digest of NULL is NULL and
    NULL < bound is never true) — ids are the sampling key; rows
    without one have no stable in/out identity to preserve.
    """
    if (rate is None) == (strata_rates is None):
        raise ValueError("pass exactly one of rate= or strata_rates=")
    if rate is not None:
        return df.filter(_bucket(id_col) < F.lit(_threshold_hex(rate)))
    if strata_col is None:
        raise ValueError("strata_rates requires strata_col")
    bound = F.lit(_threshold_hex(default_rate))
    for value, r in strata_rates.items():
        # a None key must match NULL strata (plain == is never true
        # against NULL, which would silently drop every NULL-stratum
        # row regardless of its configured rate)
        cond = (
            F.col(strata_col).isNull()
            if value is None
            else F.col(strata_col) == value
        )
        bound = F.when(cond, F.lit(_threshold_hex(r))).otherwise(bound)
    return df.filter(_bucket(id_col) < bound)


def per_group_sample(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-group sample ("hash reservoir"): rank rows in
    each group by md5(id) and keep the k smallest. Uniform over the
    group (the digest is unordered w.r.t. any data attribute), fully
    reproducible, and incremental-friendly: a new row displaces the
    current max-digest member iff its digest is smaller — no RNG state
    to carry between runs.

    One shuffle (window partition on the group). For pathologically
    hot groups at 100 TB, pre-thin with hash_sample(rate≈10k·k/|group|)
    first so the window sorts thousands of rows, not billions — the
    composition stays deterministic because both stages key on the
    same digest.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group_col).orderBy(_bucket_full(id_col), id_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def _bucket_full(id_col: str) -> Column:
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def hash_split(
    df: DataFrame,
    splits: Mapping[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: the md5(id) byte that drives
    hash_sample also assigns each row to exactly one named split, with
    fractions quantized to /256. Properties: disjoint + exhaustive,
    stable under reruns/repartitioning (a doc never migrates between
    train and test — the leak-safety property), scan-local (no shuffle).
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bounds: list[tuple[str, str]] = []
    acc = 0.0
    for name, frac in splits.items():
        acc += frac
        bounds.append((name, _threshold_hex(min(acc, 1.0))))
    # CASE WHEN b < hi_1 THEN s_1 WHEN b < hi_2 THEN s_2 ... ELSE s_last:
    # first matching cumulative bound wins, last split catches the tail
    b = _bucket(id_col)
    chain = None
    for name, hi in bounds[:-1]:
        cond = b < F.lit(hi)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    out = chain.otherwise(F.lit(bounds[-1][0])) if chain is not None else F.lit(bounds[-1][0])
    return df.withColumn(split_col, out)


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sequence packing for training batches: shard the
    corpus by md5(id) (fixed fan-out, balanced), order each shard by
    the same digest (deterministic pseudo-random order), then assign
    batch ids by cumulative token count — batch = floor((cumsum -
    tokens) / budget), so a batch holds consecutive docs until the
    token budget spills into the next one.

    One shuffle (window partition on shard). Shards are independent —
    at 100 TB the parallelism knob is n_shards, and each shard's
    running sum is a linear scan of its sorted run. Deterministic end
    to end: same corpus → same batches, across engines (oracle) and
    across reruns (cache-safe epochs).
    """
    from pyspark.sql.window import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    digest = _bucket_full(id_col)
    shard = F.conv(F.substring(digest, 1, 2), 16, 10).cast("int") % n_shards
    w = (
        Window.partitionBy("shard")
        .orderBy("_digest", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_digest", digest)
        .withColumn("shard", shard)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .withColumn(
            "batch_id",
            F.floor((F.col("_cum") - F.col(tokens_col)) / F.lit(budget)).cast("bigint"),
        )
        .drop("_digest", "_cum")
    )


def _validate_mixture_args(
    temperature: float, target_rows: int | None, domain_counts: Mapping | None = None
) -> None:
    """Shared prologue for the mixture planners — cheap, so callers can
    run it BEFORE triggering the corpus-wide domain-count job."""
    if not 0.0 < temperature <= 1.0:
        raise ValueError(f"temperature must be in (0, 1], got {temperature}")
    if target_rows is not None and target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    if domain_counts is not None and any(n < 0 for n in domain_counts.values()):
        raise ValueError("negative domain count")


def _domain_counts(df: DataFrame, domain_col: str) -> dict:
    """ONE hash aggregate over domain_col (bounded output, collected)."""
    return {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def mixture_upsample_rates(
    domain_counts: Mapping[str, int],
    temperature: float = 1.0,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Per-domain EXPECTED-COPY rates for temperature-flattened mixing
    with replacement: E[rows_d] = target · n_d^T / Σ n^T, so rates may
    exceed 1 (a small domain is visited more than once per epoch —
    the mT5/XLM-R α-sampling recipe, where downsample-only mixing
    would starve the big domains instead of repeating the small ones).
    `target_rows` defaults to the original corpus size. Pure driver
    arithmetic over the tiny domain-count table."""
    _validate_mixture_args(temperature, target_rows, domain_counts)
    if not domain_counts:
        return {}
    weights = {d: float(n) ** temperature for d, n in domain_counts.items() if n > 0}
    wsum = sum(weights.values())
    if wsum == 0.0:
        return {d: 0.0 for d in domain_counts}
    total = float(target_rows if target_rows is not None else sum(domain_counts.values()))
    rates = {d: total * w / wsum / domain_counts[d] for d, w in weights.items()}
    for d in domain_counts:
        rates.setdefault(d, 0.0)
    return rates


def mixture_upsample(
    df: DataFrame,
    domain_col: str,
    temperature: float = 1.0,
    target_rows: int | None = None,
    id_col: str = "doc_id",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic temperature-mixture resampling WITH replacement.

    Each row in domain d is emitted floor(r_d) times plus one extra
    copy kept by the same /256 hash gate as `hash_sample`, salted by
    the copy index — so the output is exactly reproducible (no RNG),
    stable under re-partitioning, and E[copies] = r_d quantized to
    /256. `copy_col` distinguishes the replicas (training loaders
    shuffle them apart; `epoch_shuffle` on (id, copy) does it here).

    Plan shape: one scan-local explode of exactly floor(r_d)+1 copy
    indices per row (the sequence bound is the PER-DOMAIN CASE column,
    never a global max — a skewed mixture where one tiny domain repeats
    10^5 times must not fan every big-domain row out 10^5-wide before
    the filter) and a per-domain CASE predicate — no shuffle, no driver
    loop over rows. The domain-count aggregate (bounded output) is the
    only extra job. At 100 TB this is the standard mixing pass:
    fact-scan-shaped, pushdown-friendly."""
    import math

    # validate BEFORE the corpus-wide aggregate: a bad temperature must
    # raise in microseconds, not after an hours-long scan
    _validate_mixture_args(temperature, target_rows)
    counts = _domain_counts(df, domain_col)
    rates = mixture_upsample_rates(counts, temperature, target_rows)
    if not rates:
        return df.withColumn(copy_col, F.lit(0)).limit(0)
    # per-domain floor(rate) and fractional-threshold CASE columns
    full_col = F.lit(0)
    thr_col = F.lit(_threshold_hex(0.0))
    for d, r in rates.items():
        cond = (
            F.col(domain_col).isNull() if d is None else F.col(domain_col) == d
        )
        full_col = F.when(cond, F.lit(int(math.floor(r)))).otherwise(full_col)
        thr_col = F.when(
            cond, F.lit(_threshold_hex(min(r - math.floor(r), 1.0)))
        ).otherwise(thr_col)
    # copy index 0..floor(r_d): i < floor(r) → full copy; i == floor(r)
    # → kept iff the copy-salted hash byte clears the fraction gate.
    # NULL-id rows are dropped OUTRIGHT before the explode to match
    # hash_sample's semantics: the NULL-propagating digest only gated
    # the fractional copy, so NULL-id rows in rate>=1 domains kept
    # their floor(r) full copies (review finding). An explicit filter
    # covers both branches.
    copies = F.explode(F.sequence(F.lit(0), full_col))
    df = df.filter(F.col(id_col).isNotNull())
    salted = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col(copy_col).cast("string"),
            ).cast("binary")
        ),
        1,
        2,
    )
    out = df.withColumn(copy_col, copies)
    return out.filter(
        (F.col(copy_col) < full_col)
        | ((F.col(copy_col) == full_col) & (salted < thr_col))
    )


def mixture_rates(
    domain_counts: Mapping[str, int],
    temperature: float = 1.0,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Per-domain acceptance rates for temperature-flattened corpus
    mixing — the standard training-mixture recipe (multinomial domain
    sampling with p_d ∝ n_d^T, as in the public mT5/XLM-R/LLaMA data
    recipes): T=1 keeps natural proportions, T→0 approaches uniform,
    intermediate T boosts small domains without drowning large ones.

    Rates are capped at 1.0 (a filter cannot upsample). When
    `target_rows` is None the mixture is scaled so the most-boosted
    domain keeps everything (largest possible corpus at the requested
    shape); otherwise rates scale toward `target_rows` total rows.
    Pure driver-side arithmetic over the (tiny) domain-count table.
    """
    _validate_mixture_args(temperature, target_rows, domain_counts)
    if not domain_counts:
        return {}
    weights = {d: float(n) ** temperature for d, n in domain_counts.items() if n > 0}
    wsum = sum(weights.values())
    if wsum == 0.0:
        return {d: 0.0 for d in domain_counts}
    total = sum(domain_counts.values())
    n_target = float(target_rows) if target_rows is not None else float(total)
    # unscaled rate ∝ (w_d / n_d); normalize so either the max rate is
    # 1.0 (no target) or expected kept rows ≈ target_rows (capped)
    raw = {d: weights[d] / domain_counts[d] for d in weights}
    if target_rows is None:
        # divide by the max (x/x == 1.0 exactly) rather than multiply
        # by its reciprocal, so the most-boosted domain's rate is an
        # exact 1.0, not 1-ε
        rmax = max(raw.values())
        rates = {d: min(1.0, r / rmax) for d, r in raw.items()}
        for d in domain_counts:
            rates.setdefault(d, 0.0)
        return rates
    # expected kept rows is monotone in the scale (with per-domain
    # saturation at rate 1.0) — bisect it to the requested total.
    # Beyond hi = 1/min(raw) every rate saturates, so that is the
    # tight upper bound (a fixed huge bound starves the bisection of
    # precision when the needed scale is small).
    n_target = min(n_target, float(total))
    exp = lambda s: sum(min(1.0, raw[d] * s) * domain_counts[d] for d in raw)  # noqa: E731
    lo, hi = 0.0, 1.0 / min(raw.values())
    for _ in range(100):
        mid = (lo + hi) / 2
        if exp(mid) < n_target:
            lo = mid
        else:
            hi = mid
    scale = (lo + hi) / 2
    rates = {d: min(1.0, raw[d] * scale) for d in raw}
    for d, n in domain_counts.items():
        rates.setdefault(d, 0.0)
    return rates


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    temperature: float = 1.0,
    target_rows: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-mixture downsampling by domain.

    Plan: ONE hash aggregate over `domain_col` (output cardinality =
    number of domains — bounded, collected to the driver), driver-side
    rate arithmetic (`mixture_rates`), then the scan-local stratified
    hash filter (`hash_sample`) — no shuffle of the data path, same
    reproducibility properties as every sampler here. At 100 TB the
    count pass is a metadata-cheap columnar scan of one column and the
    sample itself is a pushdown-friendly predicate.
    """
    _validate_mixture_args(temperature, target_rows)
    counts = _domain_counts(df, domain_col)
    rates = mixture_rates(counts, temperature, target_rows)
    return hash_sample(
        df, strata_col=domain_col, strata_rates=rates, id_col=id_col
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded deterministic global shuffle for a training epoch:
    every row gets (shard, ord) from xxhash64(id, seed), the frame is
    repartitioned to exactly `n_shards` output partitions by shard and
    sorted (shard, ord, id) within each — so writing it yields shard
    files in a pseudo-random document order that is reproducible from
    `seed` alone and DIFFERENT each epoch (contrast `pack_sequences`,
    whose digest order is fixed).

    Scale shape: one hash-partitioned shuffle, per-partition sort
    (external, spillable), no global sort and no driver state. The
    shard count is the write-parallelism knob; at 100 TB pick
    n_shards so a shard ~ the target training-file size.

    Epoch reshuffles recompute only this exchange — upstream stages
    (tokenization, packing) are untouched by a seed change.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # Exact 1:1 shard→partition by construction: F.hash IS the Murmur3
    # (seed 42) that HashPartitioning applies to the repartition key, so
    # defining shard = pmod(hash(key), n) and repartitioning by that key
    # lands every shard in its own partition. (Hash-partitioning the
    # shard VALUES instead collided them balls-in-bins style — ~1/e of
    # output partitions empty, others holding 2-3 shards — and range
    # partitioning's sampled boundaries merge adjacent shards.)
    hkey = F.xxhash64(F.col(id_col), F.lit(seed))
    keyed = (
        df.withColumn("_h", hkey)
        .withColumn("shard", F.pmod(F.hash(F.col("_h")), F.lit(n_shards)))
        .withColumn("ord", F.xxhash64(F.col(id_col), F.lit(seed + 1)))
    )
    return (
        keyed.repartition(n_shards, "_h")
        .sortWithinPartitions("shard", "ord", id_col)
        .drop("_h")
    )
