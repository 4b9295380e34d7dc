"""Perceptual image hashing (pHash) and image dedup over media columns.

The classic public pHash recipe: downscale to 32×32 grayscale, 2-D
DCT-II, keep the low-frequency 8×8 block, threshold each coefficient
against the median (DC excluded from the median so a brightness
offset cannot flip every bit) → a 64-bit fingerprint whose Hamming
distance tracks perceptual difference. Re-encodes of the same picture
(JPEG at a different quality, BMP vs JPEG) collide or land within a
few bits; different pictures land ~32 bits apart.

Dedup shapes, mirroring the text-side split in dedup.py:
- exact perceptual dup: groupBy(phash) — one shuffle, no pairs
  (simhash16's shape).
- near-dup within Hamming ≤ t: split the 64 bits into `bands` blocks
  and band on every PAIR of blocks (superblock keys, 2×width bits);
  by pigeonhole any pair within t ≤ bands-2 bits shares ≥1 exact
  block-pair, so candidates come from a self-join on
  (band_idx, band_bits) — LSH-style one-shuffle candidate generation,
  verified exactly with a JVM-side popcount on XOR. No all-pairs work
  anywhere; identical hashes collapse to a representative first and
  flooded buckets degrade to star topology (linear output).

The decode runs inside one Arrow-batched mapInPandas over the real
codecs (BMP/baseline-JPEG/MPEG-1 I-frame via
multimodal.decode_image_pixels); the hash itself is ~100 numpy ops
per image, negligible next to the decode.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), True),
    ]
)

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (the jpeg.py 8×8 construction at 32)."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        basis = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
        basis[0] *= np.sqrt(1 / n)
        basis[1:] *= np.sqrt(2 / n)
        _DCT32 = basis
    return _DCT32


def phash64(px: np.ndarray) -> int:
    """(H, W, 3) RGB uint8 → 64-bit perceptual hash (as a signed
    int64 so it round-trips Spark's LongType)."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    rows = (np.arange(32) * h // 32).astype(np.int64)
    cols = (np.arange(32) * w // 32).astype(np.int64)
    small = gray[rows][:, cols]
    d = _dct_matrix(32)
    coef = d @ small @ d.T
    block = coef[:8, :8].flatten()
    median = np.median(block[1:])  # DC excluded: brightness-shift safe
    bits = block > median
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    # wrap to signed int64
    return int(np.int64(np.uint64(val)))


def image_phashes(media: DataFrame) -> DataFrame:
    """(media_id, phash) for every image row — decode with the real
    codecs inside one Arrow-batched mapInPandas, modality-pruned so
    audio/video never reach Python."""
    from collections.abc import Iterator

    import pandas as pd

    from parseable_spark.llm.multimodal import decode_image_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        phash64(decode_image_pixels(p)) if p else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=PHASH_SCHEMA)
    )


def exact_image_dups(hashes: DataFrame, sample_cap: int = 16) -> DataFrame:
    """Groups of perceptually-identical images: (phash, n_copies,
    rep_id, member_ids). One shuffle on the 64-bit hash — the
    `exact_dedup` shape over pixels instead of bytes.

    `member_ids` is a CAPPED sample (first `sample_cap` ids in id
    order), not the full membership: a mega-group — 10 M copies of a
    blank tracking pixel — must not materialize one row holding a
    10 M-element array. `n_copies` is always the true count; callers
    needing full membership join `hashes` back on phash (streamed, no
    single giant row)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("phash")
    sized = (
        hashes.filter(F.col("phash").isNotNull())
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn(
            "_rn", F.row_number().over(w.orderBy("media_id"))
        )
    )
    # groupBy lands on the window's phash partitioning — no 2nd shuffle
    return (
        sized.filter(F.col("_rn") <= sample_cap)
        .groupBy("phash")
        .agg(
            F.first("n_copies").alias("n_copies"),
            F.min("media_id").alias("rep_id"),
            F.array_sort(F.collect_list("media_id")).alias("member_ids"),
        )
        .filter(F.col("n_copies") > 1)
    )


def _banded_hash_pairs(
    distinct_hashes: DataFrame,
    max_distance: int,
    bands: int,
    bucket_cap: int,
) -> DataFrame:
    """Hamming-ball pairs over DISTINCT (phash, rep_id) rows via
    SUPERBLOCK banding: split the hash into `bands` base blocks, band
    on every PAIR of blocks concatenated (C(bands,2) keys of 2×width
    bits). If two hashes differ by ≤ bands-2 bits, at least two blocks
    are untouched on both, so some block-pair matches exactly —
    pigeonhole-complete, verified by a JVM popcount.

    Why pairs and not single blocks (the r4 shape): single 8-bit
    blocks have a 256-value key space, so at ≥~20k distinct hashes
    EVERY band bucket floods (measured: median bucket 78 at 20k) —
    quadratic candidates unguarded, collapsed recall guarded. The
    16-bit pair keys give 65 536 values per band; buckets stay sparse
    to tens of millions of distinct hashes, the Manku et al. (WWW'07)
    multi-table design. Cost: 28 banding rows per hash instead of 8 —
    bought back ~256× in candidate-pair volume at scale.

    The text-LSH giant-bucket star guard (dedup.py:128) still backstops
    adversarial key floods: a bucket holding more than `bucket_cap`
    distinct hashes pairs members with the bucket's min-rep only
    (linear output). HONEST LIMIT of the star path: the downstream
    `distance <= max_distance` filter applies to the star edges too,
    so within a flooded bucket only members inside the rep's Hamming
    ball stay connected — two true near-dups both far from the rep
    lose their edge (the same degradation the text guard has when
    jaccard_verify rejects a rep pair). Flood buckets are
    overwhelmingly boilerplate clusters whose members are all near the
    rep, which is why the trade is acceptable; it is a recall
    degradation, not a correctness bug, and quality probes measure
    it."""
    width = 64 // bands
    mask = (1 << width) - 1
    from pyspark.sql.window import Window

    block = [
        F.shiftrightunsigned("phash", i * width).bitwiseAND(F.lit(mask))
        for i in range(bands)
    ]
    pairs_ij = [(i, j) for i in range(bands) for j in range(i + 1, bands)]
    banded = distinct_hashes.select(
        "rep_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("band_idx"),
                        (
                            block[i] * F.lit(mask + 1) + block[j]
                        ).alias("band_bits"),
                    )
                    for p, (i, j) in enumerate(pairs_ij)
                ]
            )
        ).alias("b"),
    ).select("rep_id", "phash", "b.band_idx", "b.band_bits")
    sized = banded.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_bits"))
    )
    # snapshot: the self-join would otherwise replay the upstream DAG
    # (typically a full codec decode) once per branch; eager
    # localCheckpoint is freed with the result, no CacheManager pin
    sized = sized.localCheckpoint()
    dist = F.bit_count(F.col("l.phash").bitwiseXOR(F.col("r.phash"))).alias(
        "distance"
    )
    small = sized.filter(F.col("bsz") <= bucket_cap).drop("bsz")
    pairs_small = (
        small.alias("l")
        .join(
            small.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col("l.rep_id") < F.col("r.rep_id")),
        )
        .select(
            F.col("l.phash").alias("phash_a"),
            F.col("r.phash").alias("phash_b"),
            dist,
        )
    )
    giant = sized.filter(F.col("bsz") > bucket_cap).drop("bsz")
    reps = (
        giant.groupBy("band_idx", "band_bits")
        .agg(F.min_by(F.struct("rep_id", "phash"), "rep_id").alias("m"))
        .select("band_idx", "band_bits", F.col("m.rep_id").alias("brep_id"),
                F.col("m.phash").alias("brep_hash"))
    )
    pairs_giant = (
        giant.alias("l")
        .join(F.broadcast(reps), ["band_idx", "band_bits"])
        .filter(F.col("l.rep_id") > F.col("brep_id"))
        .select(
            F.col("brep_hash").alias("phash_a"),
            F.col("l.phash").alias("phash_b"),
            F.bit_count(
                F.col("brep_hash").bitwiseXOR(F.col("l.phash"))
            ).alias("distance"),
        )
    )
    return (
        pairs_small.union(pairs_giant)
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )


def near_image_dups(
    hashes: DataFrame,
    max_distance: int = 6,
    bands: int = 8,
    group_cap: int = 64,
    bucket_cap: int = 64,
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_distance: (id_a, id_b,
    distance) with id_a < id_b, deduped across bands.

    Flood-guarded (the text-LSH lessons of dedup.py:128 applied to the
    perceptual join — blank/placeholder images are THE most duplicated
    objects in a web scrape, and an unguarded banded self-join over 10 M
    copies of one tracking pixel emits 5·10¹³ candidate rows from one
    key):

    1. identical phashes collapse to ONE representative before banding
       (the exact-dup groups never enter the pair join at member level);
    2. the banded join over distinct hashes carries the `bucket_cap`
       star guard — flooded band buckets pair members with the bucket
       rep only;
    3. pairs expand back to members with a `group_cap` star policy:
       groups of ≤ group_cap identical images expand fully (exact
       member-level semantics, unchanged vs the unguarded join), larger
       groups are represented by rep-to-member star edges (distance 0)
       plus the rep's cross-group pairs — output linear in group size,
       connectivity identical for connected-components clustering.

    64 must divide into `bands` equal blocks; superblock completeness
    needs max_distance ≤ bands - 2 (t bit flips can dirty at most t
    blocks, and a matching PAIR of clean blocks must survive)."""
    if 64 % bands:
        raise ValueError("bands must divide 64")
    if max_distance > bands - 2:
        raise ValueError(
            "completeness requires max_distance <= bands - 2 "
            f"(got {max_distance} > {bands - 2})"
        )
    hashes = hashes.select("media_id", "phash").filter(
        F.col("phash").isNotNull()
    )
    groups = hashes.groupBy("phash").agg(
        F.min("media_id").alias("rep_id"),
        F.count(F.lit(1)).cast("bigint").alias("gsz"),
    )
    # snapshot once: members/distinct-hash branches below otherwise
    # replay the upstream decode per consumer
    groups = groups.localCheckpoint()
    members = hashes.join(groups, "phash")  # (phash, media_id, rep_id, gsz)

    # cross-group pairs at distinct-hash level, then expanded: small
    # groups contribute every member, giant groups their rep only
    hash_pairs = _banded_hash_pairs(
        groups.select("rep_id", "phash"), max_distance, bands, bucket_cap
    )
    kept = members.filter(
        (F.col("gsz") <= group_cap) | (F.col("media_id") == F.col("rep_id"))
    ).select("phash", "media_id")
    cross = (
        hash_pairs.join(
            kept.withColumnRenamed("media_id", "ma"),
            F.col("phash_a") == F.col("phash"),
        )
        .drop("phash")
        .join(
            kept.withColumnRenamed("media_id", "mb"),
            F.col("phash_b") == F.col("phash"),
        )
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "distance",
        )
    )

    # within-group pairs (distance 0): full clique while ≤ group_cap,
    # star through the min-id rep beyond it
    small_m = members.filter(F.col("gsz") <= group_cap).select(
        "phash", "media_id"
    )
    intra_small = (
        small_m.alias("l")
        .join(
            small_m.alias("r"),
            (F.col("l.phash") == F.col("r.phash"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("id_a"),
            F.col("r.media_id").alias("id_b"),
            F.lit(0).alias("distance"),
        )
    )
    intra_giant = members.filter(
        (F.col("gsz") > group_cap) & (F.col("media_id") != F.col("rep_id"))
    ).select(
        F.col("rep_id").alias("id_a"),
        F.col("media_id").alias("id_b"),
        F.lit(0).alias("distance"),
    )
    return cross.union(intra_small).union(intra_giant).distinct()


VFRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), True),
        StructField("phash", LongType(), True),
    ]
)


def video_frame_phashes(media: DataFrame) -> DataFrame:
    """(media_id, frame_idx, phash) — one row per keyframe of every
    video, demuxed container-agnostically (AVI/MPEG-1/BMP-stream via
    multimodal.split_video_frames) and hashed with the image pHash.
    Cardinality-changing mapInPandas (one input row → n frames),
    modality-pruned to video rows."""
    from collections.abc import Iterator

    import pandas as pd

    from parseable_spark.llm.multimodal import (
        decode_image_pixels,
        split_video_frames,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not payload:
                    continue
                frames, _ms = split_video_frames(payload)
                for i, fp in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(phash64(decode_image_pixels(fp)))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "phash": hashes}
            )

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=VFRAME_SCHEMA)
    )


def near_video_dups(
    frame_hashes: DataFrame,
    min_shared_frames: int = 2,
    hub_cap: int = 64,
) -> DataFrame:
    """Video pairs sharing ≥ min_shared_frames identical keyframe
    hashes: (id_a, id_b, n_shared). The join key is the frame phash —
    one shuffle, no pairwise scan of videos.

    `hub_cap` is the flood guard (the LSH giant-bucket lesson,
    dedup.py:149): a frame hash present in more than hub_cap distinct
    videos — black frames, title cards — would emit O(n²) pairs from
    one key, so those hashes are dropped from pairing. Matching
    through hub frames alone is evidence of a shared template, not a
    duplicate video."""
    per_video = frame_hashes.select("media_id", "phash").distinct()
    freq = per_video.groupBy("phash").agg(
        F.count(F.lit(1)).alias("_n_videos")
    )
    rare = per_video.join(
        freq.filter(F.col("_n_videos") <= hub_cap).select("phash"),
        "phash",
        "left_semi",
    )
    left = rare.alias("l")
    right = rare.alias("r")
    return (
        left.join(
            right,
            (F.col("l.phash") == F.col("r.phash"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .groupBy(
            F.col("l.media_id").alias("id_a"),
            F.col("r.media_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_frames)
    )
