"""Deduplication operators for document corpora.

Design for 100 TB: every variant avoids the O(n²) all-pairs comparison.
- exact: hash-groupBy on a content digest (one shuffle on the digest).
- MinHash+LSH: shingle → K minhashes → B bands → shuffle on
  (band_idx, band_hash) so only colliding docs meet in a join; the
  candidate set is tiny relative to n².
- SimHash: 16-bit locality-sensitive fingerprint; duplicates collide on
  the fingerprint itself (groupBy, no pairwise work).
- n-gram Jaccard: exact verification, run only on LSH candidates.

Hash function is md5 (hex) everywhere — deterministic and available
bit-identically in every engine, which makes the whole pipeline
oracle-checkable (no RNG, no seed files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_words(text: Column) -> Column:
    """Lowercase, whitespace-split word array."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles; empty array when the doc is shorter than n words."""
    w = normalized_words(text)
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "),
    )
    return F.when(F.size(w) >= n, shingles).otherwise(F.array().cast("array<string>"))


def shingle_rows(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) rows via posexplode + lead windows.

    Row-based on purpose: nested higher-order-function expressions
    (transform over slice over split) are interpreted by Spark — no
    whole-stage codegen, no common-subexpression elimination — so the
    split would re-execute per array element. Exploding once and
    building shingles with lead() keeps every operator codegen'd and
    scales linearly in corpus size (one shuffle on the doc id).
    """
    from pyspark.sql.window import Window

    words = docs.select(
        F.col(id_col),
        F.posexplode(normalized_words(F.col(text_col))).alias("pos", "w"),
    ).filter(F.length("w") > 0)
    win = Window.partitionBy(id_col).orderBy("pos")
    with_leads = words.select(
        F.col(id_col),
        F.col("w").alias("w0"),
        *[F.lead("w", i).over(win).alias(f"w{i}") for i in range(1, n)],
    )
    return with_leads.filter(F.col(f"w{n-1}").isNotNull()).select(
        F.col(id_col),
        F.concat_ws(" ", *[f"w{i}" for i in range(n)]).alias("shingle"),
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """K min-hashes from ONE md5 per shingle: h_k(s) = hex window
    [4k+1, 4k+4] of md5(s), lexicographic min per doc. 16-bit hash
    space per row is plenty for banding (false positives are removed by
    exact Jaccard verification); one digest per shingle instead of K
    keeps the scan cheap. groupBy-min is a codegen'd partial aggregate.
    """
    if not 1 <= num_hashes <= 8:
        # md5 hex is 32 chars = eight 4-char windows; substring past
        # char 32 silently yields '' for every document, which would
        # put the whole corpus in one bucket for the affected bands
        raise ValueError(
            f"num_hashes must be in [1, 8] (one md5 = eight 16-bit "
            f"windows), got {num_hashes}"
        )
    h = F.md5(F.col("shingle"))
    return shingles.groupBy(id_col).agg(
        *[F.min(F.substring(h, 1 + 4 * k, 4)).alias(f"mh{k}") for k in range(num_hashes)]
    )


def lsh_bands(num_hashes: int = 8, rows_per_band: int = 2) -> list[Column]:
    """Band hashes over an existing mh0..mh{K-1} signature."""
    bands = []
    for b in range(num_hashes // rows_per_band):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(F.md5(F.concat(*cols)).alias(f"band{b}"))
    return bands


def banded_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band_idx, band_hash): the melted LSH banding of a corpus —
    the shared front half of every MinHash pipeline (full and
    incremental)."""
    num_bands = num_hashes // rows_per_band
    sig = minhash_signatures(
        shingle_rows(docs, id_col, text_col, shingle_n), id_col, num_hashes
    )
    banded = sig.select(F.col(id_col), *lsh_bands(num_hashes, rows_per_band))
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash"))
                    for b in range(num_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band_idx", "b.band_hash")


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    bucket_cap: int = 64,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash.

    Pass `banded` (from `banded_rows`) to reuse bands a caller already
    computed — the shingle→minhash scan is the expensive kernel and
    callers like the streaming curator consume the same bands three
    times per batch (in-batch candidates, history probe, index fold).

    One shuffle on band hash; no all-pairs join. Band-hash key
    cardinality grows with corpus size, so partitions stay balanced —
    EXCEPT when the corpus is duplicate-dense: a band bucket holding all
    s copies of a flooded document emits s(s-1)/2 pairs from one task
    (quadratic output AND single-task skew; SCALE.md's high-duplicate
    probe measured ratio 8.66 at x16 from exactly this).

    The guard: buckets with more than `bucket_cap` members switch from
    the full pair join to a star topology — every member pairs with the
    bucket's min-id representative only. That bounds a bucket's output
    at s-1 pairs (linear), keeps the work a broadcast-join map pass, and
    preserves what downstream needs: connectivity for
    connected_components (the star spans the whole bucket, so the
    cluster is identical), and verifiability for jaccard_verify (each
    member is still checked against a true near-duplicate). Trade-off:
    within a giant bucket, member↔member pairs other than via the rep
    are not emitted — for dedup that is immaterial (giant buckets are
    duplicate floods by construction; transitivity through the rep
    recovers the cluster). Deterministic (min-id rep, no RNG), so the
    output is stable run-to-run at any cap.
    """
    melted = (
        banded.select(id_col, "band_idx", "band_hash")
        if banded is not None
        else banded_rows(docs, id_col, text_col, num_hashes, rows_per_band, shingle_n)
    )
    from pyspark.sql.window import Window

    # Bucket size via an unordered partitioned window — same shuffle key
    # as the self-join below, so AQE lines the exchanges up.
    sized = melted.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_hash"))
    )
    # materialize the signature table: the self-join would otherwise
    # recompute the whole shingle→minhash DAG once per join branch (at
    # warehouse scale this is a persisted signatures table).
    # localCheckpoint (eager) instead of persist(): the snapshot is
    # reference-counted by ContextCleaner and freed when the returned
    # DataFrame is dropped — persist() would pin a CacheManager entry
    # until an unpersist no lazy consumer can issue, accumulating cached
    # lineage in a long-lived service (VERDICT r2 wrong-3).
    sized = sized.localCheckpoint()
    small = sized.filter(F.col("bsz") <= bucket_cap).drop("bsz")
    a = small.alias("a")
    b = small.alias("b")
    pairs_small = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    giant = sized.filter(F.col("bsz") > bucket_cap).drop("bsz")
    reps = giant.groupBy("band_idx", "band_hash").agg(F.min(id_col).alias("rep"))
    pairs_giant = (
        giant.join(reps, ["band_idx", "band_hash"])
        .filter(F.col(id_col) > F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    # materialize the (small) pair list: every consumer — verification's
    # two set joins, clustering's edge expansion — re-reads pairs
    # without replaying the banding DAG, and the snapshot is freed with
    # the result (no CacheManager pin)
    return pairs_small.union(pairs_giant).distinct().localCheckpoint()


def jaccard_verify(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.4,
    ndigits: int = 6,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (id_a, id_b, jaccard)."""
    # shingle sets are only needed for docs that appear in a candidate
    # pair — at 100 TB the candidates are a tiny fraction of the corpus,
    # so the member semi-join lands on the DOCS side, BEFORE the
    # shingle explode+window: r11 found the old placement (after the
    # window) re-paid the full-corpus posexplode + doc-key shuffle a
    # second time just to throw the non-members away — the semi-join
    # commutes with per-doc shingling, so pruning first makes the whole
    # verify pass candidate-sized (measured sf0.1: q25 2.07 → 1.69 s;
    # at corpus scale it removes a second full-corpus token shuffle).
    members = (
        candidates.select(F.col("id_a").alias("sid"))
        .unionAll(candidates.select(F.col("id_b").alias("sid")))
        .distinct()
    )
    member_docs = docs.join(
        members, F.col(id_col) == F.col("sid"), "left_semi"
    )
    sets = (
        shingle_rows(member_docs, id_col, text_col, shingle_n)
        .groupBy(F.col(id_col).alias("sid"))
        .agg(F.collect_set("shingle").alias("sset"))
        # joined twice (id_a side + id_b side); eager localCheckpoint —
        # freed with the result, no CacheManager pin (see
        # minhash_lsh_candidates)
        .localCheckpoint()
    )
    j = (
        candidates.join(sets.withColumnRenamed("sid", "id_a").withColumnRenamed("sset", "set_a"), "id_a")
        .join(sets.withColumnRenamed("sid", "id_b").withColumnRenamed("sset", "set_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("set_a", "set_b"))
                / F.size(F.array_union("set_a", "set_b")),
                ndigits,
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def build_lsh_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    banded: DataFrame | None = None,
) -> DataFrame:
    """The persistable LSH signature index of a corpus:
    (id, band_idx, band_hash, bsz, rep_id) — banded minhash rows plus
    each bucket's size and min-id representative, precomputed at build
    time so incremental runs never re-aggregate the historical corpus.

    At 100 TB this is THE dedup artifact to keep: ~num_bands narrow
    rows per document. The persisted form lives in
    `streaming/dedup_index.py` (partitioned by pmod(band_hash, N),
    band_hash-sorted small row groups) so an increment's probe
    partition- and row-group-prunes instead of scanning the index.
    Pass `banded` to reuse bands already computed for the same docs.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("band_idx", "band_hash")
    melted = (
        banded.select(id_col, "band_idx", "band_hash")
        if banded is not None
        else banded_rows(docs, id_col, text_col, num_hashes, rows_per_band, shingle_n)
    )
    return (
        melted
        .withColumn("bsz", F.count(F.lit(1)).over(w))
        .withColumn("rep_id", F.min(id_col).over(w))
    )


def incremental_lsh_candidates(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    bucket_cap: int = 64,
    new_banded: DataFrame | None = None,
    include_new_new: bool = True,
) -> DataFrame:
    """Candidate pairs for a corpus INCREMENT against a prebuilt
    `build_lsh_index` — the production shape for rolling ingestion:
    signatures of the historical corpus are read, never recomputed, and
    only pairs involving a new document are emitted (old↔old pairs were
    already found when the index was built).

    Output (id_a < id_b): new↔new pairs via the same banded self-join +
    giant-bucket star guard as `minhash_lsh_candidates`, plus new↔old
    pairs via a probe join of the increment's bands against the index —
    the new side of that join is the small side (broadcast). Pass the
    PRUNED index slice for `index` when it is persisted:
    `StreamingDedupIndex.probe_index` partition-prunes to the
    increment's band_pt dirs and row-group-prunes via chunked band_hash
    IN pushdown, so the probe reads O(increment) index bytes, not
    O(history). Index buckets past `bucket_cap` pair
    each new doc against the bucket's stored representative only —
    bounded output, connectivity through the rep preserved, same
    trade-off as the intra-corpus guard.
    """
    if new_banded is None:
        new_banded = banded_rows(
            new_docs, id_col, text_col, num_hashes, rows_per_band, shingle_n
        ).localCheckpoint()  # consumed by three branches; freed with result

    # -- new ↔ new: literally the full pipeline's guarded self-join,
    # reused via banded= (a drifted inline copy of the star guard had
    # lost the pre-join snapshot, replaying the banding DAG per side).
    # Callers that already ran their own in-batch stage (the streaming
    # curator's stage 4) pass include_new_new=False — recomputing the
    # self-join here only to discard its pairs downstream re-paid the
    # batch's most expensive kernel every micro-batch (r7 review).
    if include_new_new:
        nn = minhash_lsh_candidates(
            new_docs,
            id_col,
            text_col,
            num_hashes,
            rows_per_band,
            shingle_n,
            bucket_cap=bucket_cap,
            banded=new_banded,
        )
    else:
        nn = new_banded.select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b")
        ).limit(0)

    # -- new ↔ old (probe the index; new side broadcast) ---------------
    probe = F.broadcast(
        new_banded.select(
            F.col(id_col).alias("new_id"), "band_idx", "band_hash"
        )
    )
    idx_small = index.filter(F.col("bsz") <= bucket_cap)
    no_small = idx_small.join(probe, ["band_idx", "band_hash"]).select(
        F.least(F.col(id_col), F.col("new_id")).alias("id_a"),
        F.greatest(F.col(id_col), F.col("new_id")).alias("id_b"),
    )
    # giant index buckets: one stored rep row per bucket meets the probe
    idx_giant_reps = (
        index.filter(F.col("bsz") > bucket_cap)
        .filter(F.col(id_col) == F.col("rep_id"))
        .select("band_idx", "band_hash", id_col)
    )
    no_giant = idx_giant_reps.join(probe, ["band_idx", "band_hash"]).select(
        F.least(F.col(id_col), F.col("new_id")).alias("id_a"),
        F.greatest(F.col(id_col), F.col("new_id")).alias("id_b"),
    )

    return (
        nn.union(no_small)
        .union(no_giant)
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
        .localCheckpoint()
    )


def merge_lsh_index(
    index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    new_banded: DataFrame | None = None,
) -> DataFrame:
    """Fold an increment into the index: union the increment's banded
    rows and refresh bsz/rep_id per bucket. One shuffle over narrow
    index rows (no text rescan of the historical corpus); in a
    warehouse this is the nightly index-compaction job. Pass
    `new_banded` (from `banded_rows`) to reuse bands already computed
    for `incremental_lsh_candidates` instead of re-scanning the
    increment's text."""
    from pyspark.sql.window import Window

    if new_banded is None:
        new_banded = banded_rows(
            new_docs, id_col, text_col, num_hashes, rows_per_band, shingle_n
        )
    else:
        new_banded = new_banded.select(id_col, "band_idx", "band_hash")
    w = Window.partitionBy("band_idx", "band_hash")
    return (
        index.select(id_col, "band_idx", "band_hash")
        .union(new_banded)
        .withColumn("bsz", F.count(F.lit(1)).over(w))
        .withColumn("rep_id", F.min(id_col).over(w))
    )


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content digest: keep min-id doc per digest."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


# --- SimHash ---------------------------------------------------------------
_HEX = "0123456789abcdef"


def _nibble(c: Column) -> Column:
    return F.instr(F.lit(_HEX), c) - 1


def word_hash16(word: Column) -> Column:
    """16-bit word hash from the first 4 hex chars of md5(word)."""
    h = F.md5(word)
    return (
        _nibble(F.substring(h, 1, 1)) * 4096
        + _nibble(F.substring(h, 2, 1)) * 256
        + _nibble(F.substring(h, 3, 1)) * 16
        + _nibble(F.substring(h, 4, 1))
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash per document (id, simhash).

    Explode words → per-word 16-bit hash → per-bit ±1 majority vote →
    reassemble. One shuffle (groupBy id); entirely JVM-side expressions.
    """
    words = docs.select(
        F.col(id_col), F.explode(normalized_words(F.col(text_col))).alias("w")
    ).filter(F.length("w") > 0)
    hashed = words.select(id_col, word_hash16(F.col("w")).alias("h"))
    votes = [
        F.sum(
            F.when(((F.col("h") / (1 << j)).cast("bigint") % 2) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster near-duplicate pairs into dedup groups: (node, cluster_id)
    with cluster_id = min node id in the connected component.

    Iterative min-label propagation with POINTER JUMPING — each round
    every node takes the minimum of its own label, its neighbors'
    labels, and its label's label (path halving), so convergence is
    O(log diameter) rounds: 20 iterations cover components of diameter
    ~2^20, not 20 (r6 review: a 22-hop chain of incrementally-edited
    boilerplate previously exhausted the plain propagation's budget
    and SILENTLY returned split clusters). If the budget is still
    exhausted while labels are changing, raise — wrong labels must
    never be returned quietly. Each round is two joins + a groupBy on
    the edge list — no driver materialization of the graph, so it
    scales to billions of pairs; localCheckpoint() truncates the
    growing lineage per round.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("nlabel")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nlabel").alias("minn"))
        )
        stepped = labels.join(neighbor_min, "u", "left").select(
            "u",
            F.least(F.col("label"), F.coalesce("minn", "label")).alias("label"),
        )
        # pointer jumping: label[u] <- min(label[u], label[label[u]]) —
        # the min id races down long chains exponentially instead of
        # one hop per round
        ptr = stepped.select(
            F.col("u").alias("_pu"), F.col("label").alias("_pl")
        )
        new_labels = (
            stepped.join(ptr, stepped["label"] == ptr["_pu"], "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("_pl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (component diameter > ~2^iterations) — raise "
            "max_iterations; refusing to return split clusters silently"
        )
    edges.unpersist()
    return labels.select(F.col("u").alias("node"), F.col("label").alias("cluster_id"))


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Cluster verified near-dup pairs and keep the BEST-scoring member
    of each cluster (ties → min id), not the min-id one — production
    pipelines keep the longest / highest-quality duplicate, since the
    min-id member of a boilerplate cluster is an arbitrary draw (the
    RefinedWeb/FineWeb keep-policy, applied after jaccard_verify or
    semantic candidates).

    Returns docs + (cluster_id, is_kept): singletons (no pair) keep
    themselves with cluster_id = own id. Plan: the min-label clustering
    (bounded rounds over the pair list), one aggregate picking each
    cluster's max-(score, -id) representative via max_by (partial,
    map-side combined), one broadcast-size join back — the corpus is
    scanned once and never shuffled on anything but its id. Pass
    ``labels`` (node, cluster_id) to reuse an already-computed
    clustering instead of re-running label propagation.
    """
    if labels is None:
        labels = connected_components(pairs, max_iterations=max_iterations)
    scored = docs.join(
        labels.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    # representative = max score, ties → min id. Two narrow partial
    # aggregates instead of a negated-id struct trick so string ids
    # work too (the curator supports string-id corpora).
    narrow = scored.select("cluster_id", id_col, score_col)
    best = narrow.groupBy("cluster_id").agg(F.max(score_col).alias("_best_s"))
    reps = (
        narrow.join(best, "cluster_id")
        .filter(F.col(score_col) == F.col("_best_s"))
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias("rep_id"))
    )
    return (
        scored.join(reps, "cluster_id")
        .withColumn("is_kept", F.col(id_col) == F.col("rep_id"))
        .drop("rep_id")
    )


def paragraph_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    window: int = 20,
    min_words: int = 3,
) -> DataFrame:
    """(id, para_idx, para, para_hash) rows: one row per paragraph.

    Two segmentations: `sep` (regex — newlines/sentence boundaries for
    natural text) or fixed `window`-word spans when the corpus has no
    separators (the driver's synthetic docs). Paragraphs are
    whitespace-normalized + lowercased before hashing so formatting
    differences don't defeat the match."""
    if sep is not None:
        paras = docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("para_idx", "para"),
        )
    else:
        w = normalized_words(F.col(text_col))
        paras = docs.select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(
                            F.ceil(F.size(w) / window).cast("int") - 1, F.lit(0)
                        ),
                    ),
                    lambda i: F.array_join(F.slice(w, i * window + 1, window), " "),
                )
            ).alias("para_idx", "para"),
        )
    norm = F.regexp_replace(F.trim(F.lower(F.col("para"))), r"\s+", " ")
    return (
        paras.withColumn("para", norm)
        .filter(F.size(F.split(F.col("para"), " ")) >= min_words)
        .withColumn("para_hash", F.md5(F.col("para")))
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    window: int = 20,
    min_words: int = 3,
    max_copies: int = 1,
) -> DataFrame:
    """Cross-document paragraph-level dedup (the RefinedWeb/Falcon
    recipe, public): a paragraph appearing in more than `max_copies`
    documents corpus-wide is boilerplate — remove EVERY occurrence
    (matching that recipe; headers/footers/license blocks should not
    survive anywhere) and rebuild each document from its kept
    paragraphs in original order.

    Returns (id, n_paragraphs, n_dup_paragraphs, dup_ratio,
    clean_text). Scale shape: one explode, one hash aggregate on the
    paragraph digest (key cardinality ~ distinct paragraphs, balanced),
    a broadcast-or-shuffle join back on the digest, and one per-doc
    rebuild aggregate — no pairwise comparison anywhere; the span
    window bounds every row's width."""
    paras = paragraph_rows(docs, id_col, text_col, sep, window, min_words)
    # distinct-document counts per paragraph digest: a paragraph
    # repeated WITHIN one doc is repetition (llm.text.repetition
    # filters), not cross-doc boilerplate
    copies = paras.groupBy("para_hash").agg(
        F.count_distinct(id_col).alias("n_docs_with")
    )
    # same broadcast hazard as duplicate_spans: `copies` has one row
    # per distinct paragraph (corpus-scale); keep the join spillable
    tagged = paras.join(copies.hint("shuffle_merge"), "para_hash").withColumn(
        "is_dup", F.col("n_docs_with") > max_copies
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paragraphs"),
            F.sum(F.col("is_dup").cast("bigint")).alias("n_dup_paragraphs"),
            F.round(
                F.sum(F.col("is_dup").cast("double")) / F.count(F.lit(1)), 6
            ).alias("dup_ratio"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_dup"),
                                F.struct("para_idx", "para"),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_copies: int = 1,
) -> DataFrame:
    """Corpus-repeated SPANS inside documents (the ExactSubstr-dedup
    primitive from the public "Deduplicating Training Data Makes
    Language Models Better" recipe, Lee et al. 2021 — there built with
    a monolithic suffix array; here re-expressed Spark-first at token
    granularity): every maximal token range covered by a
    `min_tokens`-token sequence that appears in more than `max_copies`
    distinct documents.

    Returns (id, span_start, span_end) — token positions, end
    exclusive, overlapping windows merged per document.

    Scale shape: one explode to token rows, one per-doc window
    producing a 64-bit rolling shingle key (collect_list of token
    hashes over a ROWS frame → xxhash64: O(n·L) longs, all JVM-side —
    the explode+window plan that beat HOF slicing in the r3 probe), one
    hash aggregate on the shingle key (count_distinct docs), a semi
    join back, and a gaps-and-islands merge per doc. No pairwise work
    anywhere; a true suffix-array pass (repeat length unbounded, byte
    granularity) stays a per-shard single-node job by construction —
    this is the distributable fixed-L variant. 64-bit keys mean hash
    collisions mark a false span at ~2^-64 per pair — acceptable for
    corpus curation (document-level dedup above is digest-exact)."""
    from pyspark.sql.window import Window

    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2")
    toks = docs.select(
        F.col(id_col), F.posexplode(normalized_words(F.col(text_col))).alias("pos", "w")
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, min_tokens - 1)
    )
    sh = toks.select(
        F.col(id_col),
        "pos",
        F.xxhash64(F.collect_list(F.xxhash64("w")).over(frame)).alias("sh"),
        F.count(F.lit(1)).over(frame).alias("_width"),
    ).filter(F.col("_width") == min_tokens)
    dup_keys = (
        sh.groupBy("sh")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") > max_copies)
        .select("sh")
    )
    # merge hint: dup_keys is corpus-scale in the worst case (every
    # repeated shingle key), and AQE's post-aggregate size estimate
    # under-guesses it — an attempted broadcast OOM'd the x64 memory
    # probe under a 1 GB heap. Sort-merge is fully spillable.
    hits = sh.join(dup_keys.hint("shuffle_merge"), "sh", "left_semi").select(
        F.col(id_col), "pos", (F.col("pos") + min_tokens).alias("end")
    )
    # gaps-and-islands merge of overlapping [pos, end) windows per doc
    order = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max("end").over(order.rowsBetween(Window.unboundedPreceding, -1))
    islands = hits.withColumn(
        "_new", (F.col("pos") > F.coalesce(prev_max_end, F.lit(-1))).cast("bigint")
    ).withColumn(
        "_island",
        F.sum("_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            F.max("end").cast("bigint").alias("span_end"),
        )
        .drop("_island")
    )


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_copies: int = 1,
) -> DataFrame:
    """Remove every corpus-repeated span (duplicate_spans) from every
    document — the RefinedWeb-style "remove all occurrences" policy,
    matching paragraph_dedup — and rebuild the text from the kept
    tokens in order. Returns (id, n_tokens, n_dup_tokens,
    dup_token_frac, clean_text).

    The join back attaches each doc's (few, merged) spans as ONE array
    per doc, so the per-token duplicate test is an `exists` over a
    small array — no token×span row blowup."""
    spans = duplicate_spans(docs, id_col, text_col, min_tokens, max_copies)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = docs.select(
        F.col(id_col), F.posexplode(normalized_words(F.col(text_col))).alias("pos", "w")
    )
    tagged = toks.join(per_doc.hint("shuffle_merge"), id_col, "left").withColumn(
        "_dup",
        F.coalesce(
            F.exists(
                "_spans",
                lambda s: (F.col("pos") >= s["span_start"])
                & (F.col("pos") < s["span_end"]),
            ),
            F.lit(False),
        ),
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("_dup").cast("bigint")).alias("n_dup_tokens"),
        F.round(F.sum(F.col("_dup").cast("double")) / F.count(F.lit(1)), 6).alias(
            "dup_token_frac"
        ),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(~F.col("_dup"), F.struct("pos", "w")))
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("clean_text"),
    )


def contamination(
    train_docs: DataFrame,
    bench_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: per training doc, how many
    distinct n-gram shingles it shares with the benchmark corpus.

    Scale shape: the benchmark side (eval sets) is tiny next to 100 TB
    of training data, so its distinct shingle set is broadcast — the
    training scan stays shuffle-free up to the final per-doc distinct
    count (one hash aggregate on (id, shingle), map-side partials).
    Emits only contaminated docs; join with left_anti to get the clean
    set.
    """
    bench_sh = (
        shingle_rows(bench_docs, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    hits = shingle_rows(train_docs, id_col, text_col, n).join(
        F.broadcast(bench_sh), "shingle"
    )
    return hits.groupBy(id_col).agg(
        F.count_distinct("shingle").alias("n_contaminated")
    )
