"""Approximation-quality probe: ANN recall@k + LSH dedup candidate recall.

Speed without recall is meaningless for approximate operators, so this
measures both families against exact ground truth:

1. ANN recall@k — for N query vectors, the fraction of brute-force
   exact top-k neighbors each approximate method (sign-LSH bucket,
   flat IVF, hierarchical IVF) recovers, plus the fraction of the
   corpus each method actually scans (the speed story at 100 TB is the
   pruning fraction — partition pruning on the bucket/cell key).
2. LSH dedup recall — candidate pairs from banded MinHash vs the exact
   set of pairs with n-gram Jaccard >= threshold (ground truth by
   all-pairs join, affordable at probe scale only). Precision of the
   post-verification output is 1.0 by construction (candidates are
   exactly verified); what LSH can lose is recall, so that is what we
   measure.

Prints one JSON line per probe + a summary. Run:
  python tools/quality_probe.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ann_recall(spark, sf_dir: str, n_queries: int, k: int = 10) -> dict:
    from pyspark.sql import functions as F

    from parseable_spark.llm import similarity
    from parseable_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_total = emb.count()
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") % 97 == 3).limit(n_queries).collect()
    }

    from parseable_spark.llm import semantic

    # trained codebook (production path) vs the deterministic
    # first-N-ids codebook the oracle-checkable queries use
    km16 = semantic.kmeans_fit(emb, k=16, max_iter=5)

    from parseable_spark.llm import pq as pqmod

    # PQ artifacts built once (the persisted-index story): m=8 subspaces,
    # k=16 codes → 8 small ints per vector instead of 64 floats
    books = pqmod.pq_fit(emb, m=8, k=16, max_iter=5)
    codes = pqmod.pq_encode(emb, books).localCheckpoint()
    codes_with_cell = (
        codes.join(
            semantic.kmeans_assign(emb, km16).select(
                "vec_id", F.col("cluster").alias("cell")
            ),
            "vec_id",
        ).localCheckpoint()
    )

    methods = {
        "lsh_bucket": lambda v: similarity.bucketed_ann(emb, v, k=k),
        "pq_adc_m8k16": lambda v: pqmod.pq_topk(codes, books, v, k=k),
        "ivfpq_kmeans_nprobe4": lambda v: pqmod.ivf_pq_topk(
            codes_with_cell, km16, books, v, nprobe=4, k=k
        ),
        "ivf_flat_nprobe2": lambda v: similarity.ivf_ann(
            emb, v, k=k, n_centroids=16, nprobe=2
        ),
        "ivf_kmeans_nprobe2": lambda v: similarity.ivf_ann(
            emb, v, k=k, n_centroids=16, nprobe=2, centroids=km16
        ),
        "ivf_flat_nprobe4": lambda v: similarity.ivf_ann(
            emb, v, k=k, n_centroids=16, nprobe=4
        ),
        "ivf_hier_nprobe2": lambda v: similarity.ivf_ann_hierarchical(
            emb, v, k=k, n_centroids=16, n_coarse=4, nprobe=2
        ),
    }
    # scanned fraction per method (pruning factor at scale):
    scanned = {
        "lsh_bucket": 1 / 256,  # 8 sign planes
        # PQ rows scan every row but at 8 code-bytes instead of 256
        # vector-bytes — the fraction shown is the BYTE fraction; the
        # IVF-PQ row prunes rows (nprobe/16) on top of the compression
        "pq_adc_m8k16": 1 / 32,
        "ivfpq_kmeans_nprobe4": (4 / 16) * (1 / 32),
        "ivf_flat_nprobe2": 2 / 16,
        "ivf_kmeans_nprobe2": 2 / 16,  # nominal; trained cells are uneven
        "ivf_flat_nprobe4": 4 / 16,
        "ivf_hier_nprobe2": 2 / 16,
    }
    recalls: dict[str, list[float]] = {m: [] for m in methods}
    for _qid, vec in qvecs.items():
        exact = {r["vec_id"] for r in similarity.brute_force_topk(emb, vec, k=k).collect()}
        for m, fn in methods.items():
            got = {r["vec_id"] for r in fn(vec).collect()}
            recalls[m].append(len(exact & got) / len(exact))
    out = {
        "probe": "ann_recall_at_k",
        "k": k,
        "n_queries": len(qvecs),
        "n_vectors": n_total,
        "methods": {
            m: {
                "recall": round(sum(v) / len(v), 3),
                "scan_fraction": round(scanned[m], 4),
            }
            for m, v in recalls.items()
        },
    }
    print(json.dumps(out))
    return out


def lsh_dedup_recall(spark, sf_dir: str, threshold: float = 0.2) -> dict:
    from pyspark.sql import functions as F

    from parseable_spark.llm import dedup
    from parseable_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # exact ground truth: all-pairs n-gram jaccard (probe scale only!)
    sets = (
        dedup.shingle_rows(docs)
        .groupBy(F.col("doc_id").alias("sid"))
        .agg(F.collect_set("shingle").alias("sset"))
        .localCheckpoint()
    )
    a = sets.select(F.col("sid").alias("id_a"), F.col("sset").alias("set_a"))
    b = sets.select(F.col("sid").alias("id_b"), F.col("sset").alias("set_b"))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b"))
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )
    truth_pairs = {(r["id_a"], r["id_b"]) for r in truth.collect()}

    cands = dedup.minhash_lsh_candidates(docs)
    verified = dedup.jaccard_verify(docs, cands, threshold=threshold)
    got_pairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}

    recall = len(truth_pairs & got_pairs) / max(len(truth_pairs), 1)
    # precision is 1.0 by construction: every emitted pair passed exact
    # verification at the same threshold
    assert got_pairs <= truth_pairs, "verified pair not in ground truth?!"
    out = {
        "probe": "lsh_dedup_recall",
        "jaccard_threshold": threshold,
        "true_pairs": len(truth_pairs),
        "recovered_pairs": len(got_pairs),
        "recall": round(recall, 3),
        "precision": 1.0,
    }
    print(json.dumps(out))
    return out


def phash_quality(spark, n_images: int = 300) -> dict:
    """Recall/precision of banded pHash near-dup detection against
    PLANTED ground truth (r4): n_images distinct base pictures, each
    with one perturbed twin (block edit + JPEG-style requantization
    noise), mixed with unrelated images. A detected pair is true iff
    it links a base to its own twin. Run at several perturbation
    strengths so the operating curve is visible."""
    import numpy as np
    import pandas as pd

    from parseable_spark.llm import imagehash
    from parseable_spark.llm.multimodal import MEDIA_SCHEMA, encode_bmp_pixels

    def img(seed):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
        return np.kron(base, np.ones((8, 8, 1), dtype=np.uint8)).astype(np.uint8)

    out = {}
    for blocks in (1, 2, 4):  # perturbation strength: inverted 8x8 blocks
        rows = []
        for i in range(n_images):
            a = img(i)
            tw = a.copy()
            rng = np.random.default_rng(10_000 + i)
            for _ in range(blocks):
                r0 = int(rng.integers(0, tw.shape[0] // 8)) * 8
                c0 = int(rng.integers(0, tw.shape[1] // 8)) * 8
                tw[r0 : r0 + 8, c0 : c0 + 8] = 255 - tw[r0 : r0 + 8, c0 : c0 + 8]
            rows.append({"media_id": 2 * i, "payload": bytearray(encode_bmp_pixels(a))})
            rows.append({"media_id": 2 * i + 1, "payload": bytearray(encode_bmp_pixels(tw))})
        pdf = pd.DataFrame(rows)
        pdf["media_type"] = "image"
        pdf["width"] = 0; pdf["height"] = 0; pdf["duration_ms"] = 0
        media = spark.createDataFrame(pdf[[f.name for f in MEDIA_SCHEMA.fields]], MEDIA_SCHEMA)
        hashes = imagehash.image_phashes(media).localCheckpoint()
        pairs = {
            (r["id_a"], r["id_b"])
            for r in imagehash.near_image_dups(hashes, max_distance=6).collect()
        }
        truth = {(2 * i, 2 * i + 1) for i in range(n_images)}
        tp = len(pairs & truth)
        recall = tp / len(truth)
        precision = tp / len(pairs) if pairs else 1.0
        out[f"blocks_{blocks}"] = {
            "recall": round(recall, 3),
            "precision": round(precision, 3),
            "pairs_found": len(pairs),
        }
    print(json.dumps({"metric": "phash_quality", "strengths": out}))
    return out


def audio_quality(spark, n_clips: int = 200) -> dict:
    """Recall/precision of banded audio-fingerprint near-dup detection
    against planted ground truth (r4): n_clips distinct harmonic clips,
    each with a noisy twin, at several noise levels."""
    import struct

    import numpy as np
    import pandas as pd

    from parseable_spark.llm import audiohash
    from parseable_spark.llm.multimodal import MEDIA_SCHEMA

    def wav(sig):
        pcm = np.clip(sig, -32768, 32767).astype("<i2").tobytes()
        return (
            struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
                8000, 16000, 2, 16, b"data", len(pcm),
            )
            + pcm
        )

    def clip(i, noise_seed=None, noise=0.0):
        # spectrally DISTINCT distractors: per-clip random harmonic
        # amplitude pattern + fundamental (nearby pure-harmonic stacks
        # with identical rolloff are perceptually near-identical and
        # would be counted as false positives unfairly)
        t = np.arange(12000)
        rng = np.random.default_rng(i)
        f0 = float(rng.uniform(120, 900))
        amps = rng.uniform(500, 6000, 6)
        chirp = float(rng.uniform(0.05, 0.3))
        sig = sum(
            amps[k]
            * np.sin(2 * np.pi * f0 * (k + 1) * t / 8000 * (1 + chirp * t / 12000))
            for k in range(6)
        )
        if noise_seed is not None:
            sig = sig + np.random.default_rng(10_000 + noise_seed).normal(
                0, 3000 * noise, t.size
            )
        return sig

    out = {}
    for noise in (0.1, 0.3, 0.5):
        rows = []
        for i in range(n_clips):
            rows.append({"media_id": 2 * i, "payload": bytearray(wav(clip(i)))})
            rows.append(
                {
                    "media_id": 2 * i + 1,
                    "payload": bytearray(wav(clip(i, noise_seed=i, noise=noise))),
                }
            )
        pdf = pd.DataFrame(rows)
        pdf["media_type"] = "audio"
        pdf["width"] = 0; pdf["height"] = 0; pdf["duration_ms"] = 0
        media = spark.createDataFrame(
            pdf[[f.name for f in MEDIA_SCHEMA.fields]], MEDIA_SCHEMA
        )
        hashes = audiohash.audio_fingerprints(media).localCheckpoint()
        pairs = {
            (r["id_a"], r["id_b"])
            for r in audiohash.near_audio_dups(hashes, max_distance=6).collect()
        }
        truth = {(2 * i, 2 * i + 1) for i in range(n_clips)}
        tp = len(pairs & truth)
        out[f"noise_{noise}"] = {
            "recall": round(tp / len(truth), 3),
            "precision": round(tp / len(pairs), 3) if pairs else 1.0,
            "pairs_found": len(pairs),
        }
    print(json.dumps({"metric": "audio_quality", "strengths": out}))
    return out


def main() -> None:
    from parseable_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("quality-probe")
    ann = ann_recall(spark, sf_dir, n_queries)
    lsh = lsh_dedup_recall(spark, sf_dir)
    ph = phash_quality(spark)
    au = audio_quality(spark)
    print(
        json.dumps(
            {
                "metric": "quality_probe",
                "sf_dir": sf_dir,
                "ann": ann["methods"],
                "lsh_dedup": {"recall": lsh["recall"], "precision": lsh["precision"]},
                "phash": ph,
                "audio": au,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
