"""Product quantization (llm/pq.py) vs an independent numpy reference.

Same proof pattern as test_semantic_dedup/test_classifier: the Spark
implementation must match a from-scratch numpy PQ (identical
deterministic init, Lloyd's update, and tie-breaks) — codebooks to
1e-8, codes exactly — and the ADC search must rank like numpy's ADC.
Recall is then measured against exact L2 ground truth on the real
testdata embeddings.
"""

from __future__ import annotations

import numpy as np
import pytest

from parseable_spark.llm import pq as P
from tests.conftest import SF_SMALL

M, K = 8, 8  # 64-dim → 8 subspaces x 8 dims, 8 centroids each


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    rows = df.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64)
    return df, ids, X


def numpy_pq_fit(X, m, k, max_iter=10, tol=1e-9):
    n, d = X.shape
    sub = d // m
    books = [
        [list(X[i, j * sub : (j + 1) * sub]) for i in range(k)] for j in range(m)
    ]
    for _ in range(max_iter):
        shift = 0.0
        nxt = []
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            C = np.array(books[j])
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            # argmin with low-cid tie-break == np.argmin (first minimum)
            code = d2.argmin(axis=1)
            nb = []
            for c in range(k):
                mask = code == c
                nb.append(
                    list(Xj[mask].mean(axis=0)) if mask.any() else books[j][c]
                )
            shift = max(
                shift,
                max(
                    abs(a - b)
                    for old, new in zip(books[j], nb)
                    for a, b in zip(old, new)
                ),
            )
            nxt.append(nb)
        books = nxt
        if shift < tol:
            break
    return books


def numpy_encode(X, books):
    m = len(books)
    sub = len(books[0][0])
    codes = np.empty((X.shape[0], m), dtype=int)
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        C = np.array(books[j])
        codes[:, j] = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    return codes


@pytest.fixture(scope="module")
def fitted(spark, emb):
    df, ids, X = emb
    books = P.pq_fit(df, m=M, k=K, max_iter=5)
    ref = numpy_pq_fit(X, M, K, max_iter=5)
    return books, ref


def test_fit_matches_numpy(fitted):
    books, ref = fitted
    assert len(books) == M and all(len(b) == K for b in books)
    for bj, rj in zip(books, ref):
        for bc, rc in zip(bj, rj):
            assert np.allclose(bc, rc, atol=1e-8), (bc, rc)


def test_encode_matches_numpy(emb, fitted):
    df, ids, X = emb
    books, _ = fitted
    got = {
        r["vec_id"]: list(r["codes"])
        for r in P.pq_encode(df, books).collect()
    }
    want = numpy_encode(X, books)
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == list(want[i]), vid
    # compression: m small ints per vector instead of d floats
    assert all(len(c) == M and max(c) < K for c in got.values())


def test_adc_topk_matches_numpy_and_recalls(emb, fitted):
    df, ids, X = emb
    books, _ = fitted
    q = list(X[0])
    codes_df = P.pq_encode(df, books)
    got = P.pq_topk(codes_df, books, q, k=10).collect()

    codes = numpy_encode(X, books)
    table = np.array(P.adc_table(q, books))
    approx = np.array(
        [sum(table[j, codes[i, j]] for j in range(M)) for i in range(len(ids))]
    )
    order = sorted(range(len(ids)), key=lambda i: (round(approx[i], 6), ids[i]))
    want = [(int(ids[i]), round(float(approx[i]), 6)) for i in order[:10]]
    assert [(r["vec_id"], r["approx_d2"]) for r in got] == want

    # recall@10 vs exact L2 on the full corpus: PQ is lossy and the
    # testdata embeddings are near-isotropic (the documented worst case
    # for space-partitioned/quantized ANN — see SCALE.md quality probe),
    # yet it must beat random by an order of magnitude (random ≈ 10/500
    # = 0.2 expected overlap; measured 0.2-0.4 per query at m=8, k=8)
    exact = ((X - np.array(q)) ** 2).sum(axis=1)
    true10 = {int(ids[i]) for i in np.argsort(exact, kind="stable")[:10]}
    approx_ids = {r["vec_id"] for r in got}
    assert len(true10 & approx_ids) >= 2


def test_ivf_pq_prunes_to_probed_cells(spark, emb, fitted):
    from parseable_spark.llm.semantic import kmeans_assign, kmeans_fit

    df, ids, X = emb
    books, _ = fitted
    coarse = kmeans_fit(df, k=4, max_iter=3)
    cells = kmeans_assign(df, coarse).select("vec_id", "cluster")
    codes = P.pq_encode(df, books).join(cells, "vec_id").withColumnRenamed(
        "cluster", "cell"
    )
    q = list(X[3])
    got = P.ivf_pq_topk(codes, coarse, books, q, nprobe=2, k=5)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    # every result lies in one of the two probed cells
    probed = sorted(
        P._l2sq_py(q, cv) for _, cv in coarse
    )[:2]
    allowed = {
        cid
        for cid, cv in coarse
        if P._l2sq_py(q, cv) in probed
    }
    assert {r["cell"] for r in rows} <= allowed
    # and the plan contains the IN filter (partition-prunable shape)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan


def test_bad_inputs():
    with pytest.raises(ValueError):
        P.adc_table([0.0] * 3, [[[0.0, 0.0]]])  # dim mismatch


def test_codes_partitioned_by_cell_prune_and_codegen(spark, emb, fitted, tmp_path):
    """The 100 TB claims, proven on the plan: (a) PQ codes written
    partitioned by cell are PRUNED at the source by the nprobe filter
    (PartitionFilters, not a post-scan filter), and (b) the ADC score
    is pure codegen — no Python evaluation anywhere."""
    from pyspark.sql import functions as F

    from parseable_spark.llm.semantic import kmeans_assign, kmeans_fit

    df, ids, X = emb
    books, _ = fitted
    coarse = kmeans_fit(df, k=4, max_iter=2)
    cells = kmeans_assign(df, coarse).select(
        "vec_id", F.col("cluster").alias("cell")
    )
    codes = P.pq_encode(df, books).join(cells, "vec_id")
    path = str(tmp_path / "pq_codes")
    codes.write.partitionBy("cell").parquet(path)

    stored = spark.read.parquet(path)
    q = list(X[7])
    top = P.ivf_pq_topk(stored, coarse, books, q, nprobe=2, k=5)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    after = plan.split("PartitionFilters: [", 1)[1][:120]
    assert "cell" in after and "IN (" in after.upper(), after
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    rows = top.collect()
    assert 0 < len(rows) <= 5 and len({r["cell"] for r in rows}) <= 2


def test_batched_topk_equals_per_query_loop(spark, emb, fitted):
    """pq_topk_batch must reproduce pq_topk exactly for every query in
    the batch — same ids, distances, and order — in ONE job."""
    from pyspark.sql import functions as F

    df, ids, X = emb
    books, _ = fitted
    codes = P.pq_encode(df, books).localCheckpoint()
    qids = [0, 7, 42, 311]
    queries = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = P.pq_topk_batch(codes, books, queries, k=8)
    rows = batch.collect()
    assert {r["query_id"] for r in rows} == set(qids)
    for qid in qids:
        got = sorted(
            [
                (r["rank"], r["vec_id"], r["approx_d2"])
                for r in rows
                if r["query_id"] == qid
            ]
        )
        want = [
            (i + 1, r["vec_id"], r["approx_d2"])
            for i, r in enumerate(P.pq_topk(codes, books, list(X[qid]), k=8).collect())
        ]
        assert got == want, qid
    # one job, JVM only: the scored stream contains no Python eval
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
