"""Distributed linear quality classifier (logistic regression).

The standard curation component this repo was missing: corpora are
filtered by a cheap linear classifier over handcrafted features
(fasttext/DataComp-style quality scoring — public practice). Training
is full-batch gradient descent expressed as DataFrame aggregates:

- driver-side state is exactly the (d+1)-float coefficient vector —
  bounded regardless of corpus size, like kmeans_fit
- each iteration is ONE scan: the sigmoid, residual, and per-feature
  gradient terms are column expressions (codegen'd, no Python), and
  the d+1 gradient sums partial-aggregate map-side before a single
  reduce
- features are standardized once up front (one aggregate) so a fixed
  learning rate converges; the returned model folds the
  standardization back into raw-feature space, making scoring a pure
  column expression anyone can apply without the training stats

Determinism: float addition order inside Spark partial aggregates is
not guaranteed, so coefficients match an independent NumPy
implementation to ~1e-9 (asserted in tests), not bit-exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LinearModel:
    """w·x + b in RAW feature space; predict with `score_col`."""

    feature_cols: list[str]
    weights: list[float]
    bias: float
    train_loss: float  # final logistic loss (for convergence checks)

    def score_col(self) -> Column:
        """P(label=1 | x) as a pure column expression — apply to any
        DataFrame with the same feature columns; no UDF, no model
        object on the executors."""
        z = F.lit(self.bias)
        for c, w in zip(self.feature_cols, self.weights):
            z = z + F.col(c).cast("double") * F.lit(w)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 100,
    l2: float = 0.0,
) -> LinearModel:
    """Full-batch logistic regression by gradient descent.

    Scale shape: per iteration one job — project sigmoid/residual
    columns, aggregate d+1 sums (map-side combine), collect ONE row of
    d+2 doubles. 100 iterations at 100 TB is 100 scans of the feature
    projection (columnar, pruned to d columns); cache the projected
    frame when iterating interactively.
    """
    d = len(feature_cols)
    y = F.col(label_col).cast("double")

    # standardize once: fixed lr behaves across feature scales
    stats = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"m{j}") for j, c in enumerate(feature_cols)],
        *[F.stddev_pop(F.col(c).cast("double")).alias(f"s{j}") for j, c in enumerate(feature_cols)],
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = float(stats["n"])
    if n == 0:
        # NULL aggregates made float(None) raise an opaque TypeError
        # below (r6 review); fail at the boundary with the real reason
        raise ValueError("cannot fit a classifier on an empty training set")
    mean = [float(stats[f"m{j}"] or 0.0) for j in range(d)]
    std = [float(stats[f"s{j}"] or 0.0) or 1.0 for j in range(d)]

    w = [0.0] * d
    b = 0.0
    loss = float("inf")
    for _ in range(iters):
        z = F.lit(b)
        for j, c in enumerate(feature_cols):
            zs = (F.col(c).cast("double") - F.lit(mean[j])) / F.lit(std[j])
            z = z + zs * F.lit(w[j])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = p - y  # residual
        agg = df.agg(
            *[
                F.sum(
                    r * (F.col(c).cast("double") - F.lit(mean[j])) / F.lit(std[j])
                ).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ],
            F.sum(r).alias("gb"),
            # logistic loss via the numerically-stable softplus form
            F.sum(
                F.when(z > 0, z - y * z + F.log1p(F.exp(-z)))
                .otherwise(-y * z + F.log1p(F.exp(z)))
            ).alias("loss"),
        ).first()
        loss = float(agg["loss"]) / n  # loss at the PRE-update weights
        w = [w[j] - lr * (float(agg[f"g{j}"]) / n + l2 * w[j]) for j in range(d)]
        b -= lr * float(agg["gb"]) / n

    # one final pass so train_loss is the loss AT THE RETURNED weights —
    # the in-loop value lags one update behind (r6 review: a parity
    # check against an independent implementation's loss at the same
    # coefficients mismatched)
    z = F.lit(b)
    for j, c in enumerate(feature_cols):
        zs = (F.col(c).cast("double") - F.lit(mean[j])) / F.lit(std[j])
        z = z + zs * F.lit(w[j])
    final = df.agg(
        F.sum(
            F.when(z > 0, z - y * z + F.log1p(F.exp(-z)))
            .otherwise(-y * z + F.log1p(F.exp(z)))
        ).alias("loss")
    ).first()
    loss = float(final["loss"]) / n

    # fold standardization into raw space: w_raw = w/std, b_raw = b - Σ w·m/s
    w_raw = [w[j] / std[j] for j in range(d)]
    b_raw = b - sum(w[j] * mean[j] / std[j] for j in range(d))
    return LinearModel(list(feature_cols), w_raw, b_raw, loss)


def quality_classifier(
    docs: DataFrame,
    label_col: str,
    lr: float = 1.0,
    iters: int = 100,
    id_col: str = "doc_id",
) -> tuple[LinearModel, DataFrame]:
    """Train a document-quality classifier on the standard text
    features (llm.text.doc_features) and return (model, scored docs).
    The score is a column expression over the same single-scan feature
    set — at 100 TB, scoring a corpus is one pass with no shuffle."""
    from . import text

    feats = text.doc_features(docs, id_col=id_col).join(
        docs.select(id_col, label_col), id_col
    )
    feature_cols = ["n_chars", "n_words", "avg_word_len", "stopword_ratio", "n_punct"]
    # materialize the d+2-column training projection ONCE: logreg_fit
    # issues ~iters+1 aggregates, and an un-snapshotted plan would
    # replay the full doc_features projection (word split, language
    # scores, md5 fingerprints the trainer never reads) plus the join
    # per iteration. localCheckpoint is reference-counted and freed
    # with the frame (no CacheManager pin); the returned scored frame
    # stays lazy — scoring remains one un-materialized pass.
    train = feats.select(label_col, *feature_cols).localCheckpoint()
    model = logreg_fit(train, feature_cols, label_col, lr=lr, iters=iters)
    return model, feats.withColumn("quality_score", model.score_col())
