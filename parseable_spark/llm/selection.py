"""Data selection via importance resampling (DSIR).

The public DSIR recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): represent every document as hashed
n-gram (unigram + bigram) counts in B buckets, fit two bag-of-ngrams
multinomials — p̂ on a small TARGET corpus (the distribution you want
more of) and q̂ on the RAW pool — and resample the pool with importance
weights w(x) = Π p̂[b]/q̂[b] over the document's features, using the
Gumbel top-k trick so sampling-without-replacement is a single
distributed top-k.

Spark shape (every phase a column expression — no UDFs, no driver
state beyond the B-row ratio table):
- featurize: one scan per corpus; bigrams from a lag window (the
  codegen-friendly gram builder measured 5.7× faster than HOF
  shingles — see lm.py), bucket id = xxhash64 mod B.
- fit: one hash aggregate per corpus → a B-row table of Laplace-
  smoothed log ratios. B defaults to 10⁴ (the paper's scale), so the
  table broadcasts everywhere.
- weigh: bucket rows ⨝ broadcast(ratios) → per-doc sum. One shuffle
  on the doc key.
- resample: deterministic Gumbel key from xxhash64(id, seed), then
  orderBy+limit — Spark executes TakeOrderedAndProject, a per-
  partition heap + driver merge of k rows, never a global sort.

All randomness is hash-derived, so selection is reproducible and
oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parseable_spark.llm.dedup import normalized_words


def hashed_feature_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """(id, bucket) — one row per unigram and bigram occurrence,
    hashed into `buckets`. The DSIR feature extractor."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(normalized_words(F.col(text_col)), lambda w: F.length(w) > 0)
        ).alias("pos", "w"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    toks = toks.select(id_col, "w", F.lag("w", 1).over(w).alias("_prev"))
    grams = F.array(
        F.struct(F.col("w").alias("gram")),
        F.when(
            F.col("_prev").isNotNull(),
            F.struct(F.concat_ws(" ", "_prev", "w").alias("gram")),
        ),
    )
    return toks.select(
        id_col,
        F.explode(F.filter(grams, lambda s: s.isNotNull())).alias("g"),
    ).select(
        id_col, F.pmod(F.xxhash64("g.gram"), F.lit(buckets)).alias("bucket")
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """Fit both multinomials and emit the DENSE B-row importance table:
    (bucket, log_ratio) for every bucket in [0, B), with log_ratio =
    log p̂_target[b] − log p̂_raw[b], Laplace-smoothed so never-seen
    buckets stay finite. Dense on purpose: a bucket unseen in both
    corpora has smoothed ratio log((raw_total+sB)/(tgt_total+sB)) —
    NOT 0 when the corpus totals differ — so omitting it and letting
    the scorer default to 0 would bias every document by
    n_unseen_features × that constant whenever the scored docs are not
    the fitted raw pool (incremental scoring). B is bounded (10⁴
    default), so dense still broadcasts."""
    if not smoothing > 0:
        # smoothing=0 makes log(0) NULL for target-unseen buckets, and
        # the scorer's coalesce silently treats them as NEUTRAL rather
        # than strongly negative — inflated weights for junk documents
        # with no error anywhere (r6 review)
        raise ValueError("smoothing must be > 0 (Laplace term keeps log finite)")

    def fit(df: DataFrame, name: str) -> tuple[DataFrame, int]:
        feats = hashed_feature_rows(
            df.select(F.monotonically_increasing_id().alias("_id"), text_col),
            "_id",
            text_col,
            buckets,
        )
        # one scan: the corpus total is the sum of the (≤ B-row)
        # bucket aggregate, not a second pass over the feature DAG
        cnt = (
            feats.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(f"cnt_{name}"))
            .localCheckpoint()
        )
        total = cnt.agg(F.sum(f"cnt_{name}")).first()[0] or 0
        return cnt, total

    tgt, tgt_total = fit(target, "t")
    rw, raw_total = fit(raw, "r")
    all_buckets = target.sparkSession.range(buckets).select(
        F.col("id").alias("bucket")
    )
    joined = (
        all_buckets.join(tgt, "bucket", "left")
        .join(rw, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
            F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
        )
    )
    log_p = F.log((F.col("cnt_t") + F.lit(smoothing))) - F.lit(
        math.log(tgt_total + smoothing * buckets)
    )
    log_q = F.log((F.col("cnt_r") + F.lit(smoothing))) - F.lit(
        math.log(raw_total + smoothing * buckets)
    )
    return joined.select("bucket", (log_p - log_q).alias("log_ratio"))


def dsir_log_weights(
    docs: DataFrame,
    log_ratios: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    ndigits: int = 6,
) -> DataFrame:
    """Per-document log importance weight: Σ over the doc's hashed
    n-grams of log_ratio[bucket]. The dsir_log_ratios table is dense
    over [0, B) so every probe hits; the coalesce(0) is a neutral
    fallback only for externally-built sparse tables. Token-less
    documents get (n_features=0, log_weight=0) — the empty product is
    weight 1, so they stay selectable. Returns
    (id, n_features, log_weight)."""
    feats = hashed_feature_rows(docs, id_col, text_col, buckets)
    agg = (
        feats.join(F.broadcast(log_ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.round(
                F.sum(F.coalesce("log_ratio", F.lit(0.0))), ndigits
            ).alias("log_weight"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).cast("bigint").alias("n_features"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def _gumbel(id_col: str, seed: int) -> Column:
    """Deterministic Gumbel(0,1) noise from a hash of the doc id:
    u = (xxhash64 mod 2^53)/2^53 in (0,1), g = −log(−log u)."""
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 53))
        + F.lit(0.5)
    ) / F.lit(float(1 << 53))
    return -F.log(-F.log(u))


def dsir_resample(
    docs: DataFrame,
    log_ratios: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    temperature: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Select k documents ~ importance weights without replacement via
    the Gumbel top-k identity: the k largest (log w / temperature +
    Gumbel noise) keys are an exact sample from the softmax of the
    weights. temperature→0 approaches deterministic top-k by weight;
    1.0 is the paper's sampled selection. Deterministic in `seed`."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    weights = dsir_log_weights(docs, log_ratios, id_col, text_col, buckets)
    keyed = docs.join(weights, id_col).withColumn(
        "_key",
        F.col("log_weight") / F.lit(temperature) + _gumbel(id_col, seed),
    )
    return keyed.orderBy(F.desc("_key")).limit(k).drop("_key")
