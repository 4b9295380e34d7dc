"""Distributed logistic-regression quality classifier (llm/classifier.py).

Ground truth: an INDEPENDENT NumPy implementation of the identical
full-batch gradient descent (same init, lr, standardization) — Spark
coefficients must match to float-sum tolerance, and the learned
separator must classify a linearly-separable planted corpus
perfectly.
"""

from __future__ import annotations

import numpy as np
import pytest

from parseable_spark.llm.classifier import logreg_fit, quality_classifier

N = 400


def _planted():
    """Deterministic features; label = [2*x1 - x2 + 0.5 > 0]."""
    i = np.arange(N)
    x1 = ((i * 37) % 100) / 10.0  # 0..9.9, pseudo-shuffled
    x2 = ((i * 61) % 140) / 7.0  # 0..19.86
    y = (2.0 * x1 - x2 + 0.5 > 0).astype(float)
    return x1, x2, y


def _numpy_gd(X, y, lr, iters):
    """Independent reference: standardized full-batch GD, coefficients
    folded back to raw space."""
    mean, std = X.mean(axis=0), X.std(axis=0)
    std[std == 0] = 1.0
    Z = (X - mean) / std
    n, d = Z.shape
    w, b = np.zeros(d), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        r = p - y
        w -= lr * (Z.T @ r) / n
        b -= lr * r.sum() / n
    return w / std, b - float((w / std) @ mean)


@pytest.fixture(scope="module")
def planted_df(spark):
    x1, x2, y = _planted()
    rows = [(int(i), float(a), float(b), float(c)) for i, (a, b, c) in enumerate(zip(x1, x2, y))]
    df = spark.createDataFrame(rows, "id bigint, x1 double, x2 double, y double").cache()
    yield df
    # leave the CacheManager clean for the suite's no-cached-RDDs checks
    df.unpersist(blocking=True)


class TestLogregFit:
    def test_matches_independent_numpy_gd(self, planted_df):
        x1, x2, y = _planted()
        X = np.stack([x1, x2], axis=1)
        ref_w, ref_b = _numpy_gd(X, y, lr=1.0, iters=80)
        model = logreg_fit(planted_df, ["x1", "x2"], "y", lr=1.0, iters=80)
        assert np.allclose(model.weights, ref_w, atol=1e-8)
        assert abs(model.bias - ref_b) < 1e-8
        assert model.train_loss < 0.2  # converged well below chance (ln 2 ≈ 0.69)

    def test_learned_separator_recovers_planted_rule(self, planted_df):
        """>=99% training accuracy (points sitting almost exactly on
        the planted hyperplane need unbounded iterations for logistic
        GD to clear — margin, not correctness) and the separator
        direction matches the rule."""
        from pyspark.sql import functions as F

        model = logreg_fit(planted_df, ["x1", "x2"], "y", lr=1.0, iters=150)
        scored = planted_df.withColumn("p", model.score_col())
        wrong = scored.filter(
            ((F.col("p") >= 0.5) & (F.col("y") == 0.0))
            | ((F.col("p") < 0.5) & (F.col("y") == 1.0))
        ).count()
        assert wrong <= N * 0.01
        # direction of the separator matches the planted rule 2*x1 - x2
        w1, w2 = model.weights
        assert w1 > 0 > w2
        assert abs((w1 / -w2) - 2.0) < 0.4

    def test_score_is_pure_column_expression(self, planted_df):
        model = logreg_fit(planted_df, ["x1", "x2"], "y", lr=1.0, iters=5)
        plan = (
            planted_df.withColumn("p", model.score_col())
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan  # no UDF: scoring is codegen'd

    def test_l2_shrinks_weights(self, planted_df):
        plain = logreg_fit(planted_df, ["x1", "x2"], "y", lr=1.0, iters=60)
        ridge = logreg_fit(planted_df, ["x1", "x2"], "y", lr=1.0, iters=60, l2=0.5)
        assert np.linalg.norm(ridge.weights) < np.linalg.norm(plain.weights)


def test_quality_classifier_end_to_end(spark):
    """Train on the documents fixture with labels planted from a known
    linear rule over the extracted features; the model recovers it."""
    from pyspark.sql import functions as F

    from parseable_spark.llm import text
    from parseable_spark.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    feats = text.doc_features(docs)
    labeled = docs.join(
        feats.select(
            "doc_id",
            (F.col("n_words") > 40).cast("double").alias("label"),
        ),
        "doc_id",
    )
    model, scored = quality_classifier(labeled, "label", lr=1.0, iters=120)
    acc = (
        scored.filter(
            ((F.col("quality_score") >= 0.5) & (F.col("label") == 1.0))
            | ((F.col("quality_score") < 0.5) & (F.col("label") == 0.0))
        ).count()
        / scored.count()
    )
    assert acc > 0.97  # the rule is a threshold on one feature
