"""Semantic clustering + SemDeDup (llm/semantic.py).

Validation strategy: a deterministic planted-cluster corpus (4
well-separated directions + tiny per-point jitter + exact-ish
near-dup copies), with an INDEPENDENT numpy implementation of the
same Lloyd's iteration as ground truth — the Spark path must agree
exactly on assignments and match centroids to float tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

from parseable_spark.llm import semantic

DIM = 8
N_PER = 12


def _corpus():
    """[(vec_id, vector)] — deterministic, no RNG. Cluster c lives in
    the (e_c, e_{c+4}) plane — the four planes are mutually orthogonal,
    so cross-cluster cosine is exactly 0. Within a cluster, point i
    sits at angle (i - 6) * 0.1 rad: distinct originals are >= 0.1 rad
    apart (cos <= 0.995), while the planted copies (id + 1000, +0.001
    perturbation) are ~0.0007 rad from their original (cos > 0.9999) —
    clean margins on both sides of the 0.999 dedup threshold. Ids
    interleave clusters so the deterministic lowest-id init picks one
    seed per planted group (kmeans_fit documents k-means++ as the
    production init; plain Lloyd's needs a spread seed)."""
    rows = []
    for c in range(4):
        for i in range(N_PER):
            theta = (i - 6) * 0.1
            v = np.zeros(DIM)
            v[c] = np.cos(theta)
            v[c + 4] = np.sin(theta)
            vid = i * 4 + c
            rows.append((vid, v))
    dups = []
    for vid, v in rows:
        if vid % 10 == 0:
            w = v.copy()
            w[(vid + 3) % DIM] += 0.001
            dups.append((vid + 1000, w / np.linalg.norm(w)))
    return rows + dups


def _numpy_lloyds(X, ids, k, max_iter=10, tol=1e-6):
    """Independent reference: same deterministic init (k lowest ids),
    cosine assignment with min-id tie-break via round-6 sims, mean
    update, empty clusters keep previous centroid."""
    order = np.argsort(ids)
    cents = X[order[:k]].copy()
    for _ in range(max_iter):
        sims = np.round(
            (X @ cents.T)
            / (np.linalg.norm(X, axis=1, keepdims=True) * np.linalg.norm(cents, axis=1)),
            6,
        )
        assign = np.argmax(sims, axis=1)  # ties -> lowest cid, same as Spark
        new = cents.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        shift = np.abs(new - cents).max()
        cents = new
        if shift < tol:
            break
    return cents, assign


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = [(int(i), [float(x) for x in v]) for i, v in _corpus()]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache()
    yield df
    # leave the CacheManager clean for the suite's no-cached-RDDs checks
    df.unpersist(blocking=True)


class TestKmeans:
    def test_matches_independent_numpy_reference(self, emb_df):
        corpus = _corpus()
        ids = np.array([i for i, _ in corpus])
        X = np.array([v for _, v in corpus])
        # float32 storage: reference must see the same rounded values
        X = X.astype(np.float32).astype(np.float64)
        ref_cents, ref_assign = _numpy_lloyds(X, ids, k=4)

        cents = semantic.kmeans_fit(emb_df, k=4, max_iter=10)
        got = {
            r["vec_id"]: r["cluster"]
            for r in semantic.kmeans_assign(emb_df, cents).collect()
        }
        want = {int(i): int(c) for i, c in zip(ids, ref_assign)}
        assert got == want
        for cid, cv in cents:
            assert np.allclose(cv, ref_cents[cid], atol=1e-9)

    def test_clusters_recover_planted_structure(self, emb_df):
        cents = semantic.kmeans_fit(emb_df, k=4, max_iter=10)
        assign = {
            r["vec_id"]: r["cluster"]
            for r in semantic.kmeans_assign(emb_df, cents).collect()
        }
        # every planted group lands in one cluster, groups in distinct ones
        labels = []
        for c in range(4):
            grp = {assign[i * 4 + c] for i in range(N_PER)}
            assert len(grp) == 1
            labels.append(grp.pop())
        assert len(set(labels)) == 4
        # near-dup copies land with their originals
        for vid in range(0, 4 * N_PER, 10):
            assert assign[vid + 1000] == assign[vid]

    def test_no_python_udf_in_plan(self, emb_df):
        cents = semantic.kmeans_fit(emb_df, k=4, max_iter=2)
        plan = (
            semantic.kmeans_assign(emb_df, cents)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "Broadcast" in plan  # codebook broadcast, not shuffled


class TestSemanticDedup:
    def test_planted_duplicates_flagged(self, emb_df):
        out = semantic.semantic_dedup(emb_df, k=4, threshold=0.999).collect()
        by_id = {r["vec_id"]: r for r in out}
        # every planted copy is flagged and points at its original
        for vid in range(0, 4 * N_PER, 10):
            dup = by_id[vid + 1000]
            assert dup["is_dup"]
            assert dup["dup_of"] == vid
            assert not by_id[vid]["is_dup"]  # min id kept
        # jittered distinct points are not flagged
        flagged = {r["vec_id"] for r in out if r["is_dup"]}
        assert flagged == {vid + 1000 for vid in range(0, 4 * N_PER, 10)}

    def test_kept_set_has_no_dup_pair(self, emb_df):
        """Brute-force check: no kept pair in the same cluster is above
        the threshold."""
        out = semantic.semantic_dedup(emb_df, k=4, threshold=0.999).collect()
        corpus = dict(_corpus())
        kept = [(r["vec_id"], r["cluster"]) for r in out if not r["is_dup"]]
        for i, (ida, ca) in enumerate(kept):
            for idb, cb in kept[i + 1 :]:
                if ca != cb:
                    continue
                va, vb = corpus[ida], corpus[idb]
                cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                assert cos < 0.999, (ida, idb, cos)

    def test_cluster_cap_star_guard(self, emb_df):
        """With a tiny cap every cluster goes through the star path:
        output stays bounded (<= members-1 pairs per cluster) and every
        planted duplicate of the min-id member is still caught."""
        out = semantic.semantic_dedup(emb_df, k=4, threshold=0.999, cluster_cap=5)
        rows = out.collect()
        # vec 1000 duplicates vec 0 which IS a min-id member: still caught
        by_id = {r["vec_id"]: r for r in rows}
        assert by_id[1000]["is_dup"] and by_id[1000]["dup_of"] == 0
        # deterministic: same result on a second run
        again = {r["vec_id"]: (r["is_dup"], r["dup_of"]) for r in
                 semantic.semantic_dedup(emb_df, k=4, threshold=0.999, cluster_cap=5).collect()}
        assert again == {r["vec_id"]: (r["is_dup"], r["dup_of"]) for r in rows}

    def test_runs_on_fixture_embeddings(self, spark):
        """End-to-end on the driver-generated embeddings table."""
        from parseable_spark.tables import load_table
        from tests.conftest import SF_SMALL

        emb = load_table(spark, SF_SMALL, "embeddings")
        out = semantic.semantic_dedup(emb, k=8, threshold=0.99, max_iter=3)
        rows = out.collect()
        assert len(rows) == emb.count()  # one verdict per vector
        assert {r["cluster"] for r in rows} <= set(range(8))


def test_ivf_ann_accepts_trained_codebook(emb_df):
    """ivf_ann with a kmeans_fit codebook returns valid top-k rows and
    assigns cells from the trained centroids (production path measured
    in tools/quality_probe.py)."""
    from parseable_spark.llm import similarity

    cents = semantic.kmeans_fit(emb_df, k=4, max_iter=3)
    q = [r["embedding"] for r in emb_df.filter("vec_id = 0").collect()][0]
    rows = similarity.ivf_ann(
        emb_df, [float(x) for x in q], k=5, nprobe=2, centroids=cents
    ).collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["vec_id"] == 0  # the query vector itself tops its cell
    assert all(r["cell"] in {c for c, _ in cents} for r in rows)


class TestParagraphDedup:
    """Cross-document paragraph dedup (llm/dedup.py paragraph_dedup —
    the RefinedWeb/Falcon boilerplate-removal recipe)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        boiler = "subscribe to our newsletter for more updates every week"
        rows = [
            (0, f"unique opening zero. {boiler}. unique closing zero."),
            (1, f"{boiler}. completely different body text here one."),
            (2, "no boilerplate in this document at all two."),
            (3, f"another unique text three. {boiler}."),
            # within-doc repetition only: NOT cross-doc boilerplate
            (4, "repeated phrase inside four. repeated phrase inside four."),
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_boilerplate_removed_everywhere(self, corpus):
        from parseable_spark.llm import dedup

        out = {
            r["doc_id"]: r
            for r in dedup.paragraph_dedup(
                corpus, sep=r"\.\s*", min_words=3, max_copies=1
            ).collect()
        }
        # the boilerplate sentence appears in docs 0/1/3 -> removed from ALL
        for did in (0, 1, 3):
            assert "subscribe" not in out[did]["clean_text"], did
            assert out[did]["n_dup_paragraphs"] == 1
        # unique sentences survive, in original order (separator chars
        # are consumed by the split — spans rejoin with single spaces)
        assert out[0]["clean_text"] == "unique opening zero unique closing zero"
        assert out[2]["n_dup_paragraphs"] == 0
        assert "no boilerplate" in out[2]["clean_text"]
        # within-doc repetition is NOT flagged (distinct-doc counting)
        assert out[4]["n_dup_paragraphs"] == 0

    def test_window_mode_on_separatorless_corpus(self, spark):
        """The driver's synthetic docs have no punctuation: fixed
        word-window spans segment them; planting the same 6-word span
        in three docs flags exactly those spans."""
        from parseable_spark.llm import dedup

        span = "alpha beta gamma delta epsilon zeta"
        rows = [
            (0, f"{span} one two three four five six"),
            (1, f"{span} seven eight nine ten eleven twelve"),
            (2, "thirteen fourteen fifteen sixteen seventeen eighteen totally unique"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            r["doc_id"]: r
            for r in dedup.paragraph_dedup(df, window=6, min_words=3).collect()
        }
        assert out[0]["n_dup_paragraphs"] == 1 and out[1]["n_dup_paragraphs"] == 1
        assert "alpha" not in out[0]["clean_text"]
        assert out[2]["n_dup_paragraphs"] == 0

    def test_runs_on_fixture_documents(self, spark):
        from parseable_spark.llm import dedup
        from parseable_spark.tables import load_table
        from tests.conftest import SF_SMALL

        docs = load_table(spark, SF_SMALL, "documents")
        out = dedup.paragraph_dedup(docs, window=20)
        assert out.count() == docs.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
