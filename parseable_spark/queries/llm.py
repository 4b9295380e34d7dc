"""LLM-pipeline queries: dedup, similarity, text analysis — oracle-paired.

Hash function md5 makes MinHash/SimHash/fingerprints bit-identical
across Spark and DuckDB, so even the locality-sensitive pipelines are
exact-oracle-checked (no RNG anywhere).

Registry layout note (round 3): per-document features that share one
scan are combined (q31 = quality + language-ID + tokens + fingerprints
+ TF-IDF keywords; q24 = exact-dedup groups + SimHash; q25 = LSH
candidates + Jaccard verification) so every operator family fits the
driver's 50-entry correctness window. r2→r3 mapping in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import bloom, dedup, multimodal, sampling, similarity, text
from ..tables import fan_out, load_table
from . import register

# DuckDB word/shingle helpers (oracle side)
_DUCK_WORDS = r"regexp_split_to_array(trim(lower(text)), '\s+')"
_DUCK_SHINGLES = (
    "list_transform(range(1, len(w)-1), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
)

_DUCK_SIG = f"""
    docs_w AS (
        SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
    ),
    docs_sh AS (
        SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM docs_w WHERE len(w) >= 3
    ),
    sig AS (
        SELECT doc_id,
            {", ".join(f"list_min(list_transform(shingles, s -> substring(md5(s), {1 + 4*k}, 4))) AS mh{k}" for k in range(8))}
        FROM docs_sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, md5(mh{2*b} || mh{2*b+1}) AS band_hash FROM sig" for b in range(4))}
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    )
"""

_DUCK_JACCARD = """round(len(list_intersect(a.sset, b.sset))
                 / len(list_distinct(list_concat(a.sset, b.sset))), 6)"""


def _simhash_ctes() -> str:
    """CTE block `words, hashed, votes, sim` — sim = (doc_id, simhash)."""
    nib = lambda k: f"(strpos('0123456789abcdef', substring(md5(w), {k}, 1)) - 1)"  # noqa: E731
    h = f"({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"
    votes = ", ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(16)
    )
    bits = " + ".join(f"CASE WHEN v{j} >= 0 THEN {1 << j} ELSE 0 END" for j in range(16))
    return f"""
        words AS (
            SELECT doc_id, unnest({_DUCK_WORDS}) AS w FROM documents
        ),
        hashed AS (
            SELECT doc_id, {h} AS h FROM words WHERE length(w) > 0
        ),
        votes AS (
            SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
        ),
        sim AS (
            SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes
        )
    """


@register(
    "q14_repetition_filters",
    r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    toks AS (
        SELECT doc_id, 'u' AS kind, unnest(w) AS tok FROM w
        UNION ALL
        SELECT doc_id, 'b' AS kind,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i+1])) AS tok
        FROM w
    ),
    c AS (
        SELECT doc_id, kind, tok, count(*) AS c
        FROM toks GROUP BY doc_id, kind, tok
    ),
    s AS (
        SELECT doc_id,
               max(CASE WHEN kind = 'u' THEN c END) AS top_wc,
               sum(CASE WHEN kind = 'u' THEN c END) AS nw,
               count(CASE WHEN kind = 'u' THEN 1 END) AS n_distinct,
               max(CASE WHEN kind = 'b' THEN c END) AS top_bc,
               sum(CASE WHEN kind = 'b' THEN c END) AS nb
        FROM c GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           round(top_wc / nw, 6) AS top_word_frac,
           round(1 - n_distinct / nw, 6) AS dup_word_frac,
           round(top_bc / nb, 6) AS top_bigram_frac,
           (round(top_wc / nw, 6) <= 0.2
            AND round(1 - n_distinct / nw, 6) <= 0.6
            AND coalesce(round(top_bc / nb, 6) <= 0.18, TRUE)) AS repetition_ok
    FROM s
    """,
    doc=(
        "Gopher-style repetition quality filters (top-word / dup-word / "
        "top-bigram fractions + gate). One corpus pass: unigram and bigram "
        "tokens emitted from the same exploded rows, two codegen'd hash "
        "aggregates — no O(n^2) per-doc lambdas. (r2 name: q54.)"
    ),
)
def q14_repetition_filters(spark, sf_dir):
    # fan_out: the sf parquet is one unsplittable row group, so the
    # split+posexplode stage otherwise runs as ONE task (guide §2.5);
    # measured sf0.1 0.65 → 0.41 s, output identical. No-op on
    # many-file / large inputs.
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    return text.repetition_features(docs)


@register(
    "q16_sampling_suite",
    """
    WITH flags AS (
        SELECT source, n_chars,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                         CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
                              THEN '80' ELSE '20' END
                    THEN 1 END AS kept,
               CASE WHEN row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 3
                    THEN 1 END AS top3
        FROM documents
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(kept) AS BIGINT) AS n_kept,
           CAST(count(top3) AS BIGINT) AS n_top3
    FROM flags GROUP BY source, split
    """,
    doc=(
        "Deterministic sampling suite, all keyed on md5(doc_id) — no RNG, "
        "reproducible across engines/retries/repartitioning: (1) "
        "stratified hash sampling (rate 0.5 for src0-3, 0.125 rest, "
        "quantized /256; scan-local predicate), (2) k-per-group hash "
        "reservoir (3 smallest digests per source; one window shuffle), "
        "(3) disjoint+exhaustive 80/10/10 train/val/test split "
        "(leak-safe: a doc can never migrate between splits). Summarized "
        "per (source, split) cell. (r2 names: q55 + q58 + q61.)"
    ),
)
def q16_sampling_suite(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = sampling.hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    kept = sampling.hash_sample(
        docs,
        strata_col="source",
        strata_rates={f"src{i}": 0.5 for i in range(4)},
        default_rate=0.125,
    ).select("doc_id", F.lit(1).alias("_kept"))
    top = sampling.per_group_sample(docs, k=3, group_col="source").select(
        "doc_id", F.lit(1).alias("_top3")
    )
    return (
        base.join(kept, "doc_id", "left")
        .join(top, "doc_id", "left")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count("_kept").alias("n_kept"),
            F.count("_top3").alias("n_top3"),
        )
    )


@register(
    "q17_contamination",
    r"""
    WITH w AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
        FROM w WHERE len(w) >= 3
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
    SELECT t.doc_id,
           CAST(count(DISTINCT t.shingle) AS BIGINT) AS n_contaminated
    FROM sh t JOIN bench b ON t.shingle = b.shingle
    WHERE t.source <> 'src0'
    GROUP BY t.doc_id
    """,
    doc=(
        "Benchmark-contamination check: training docs sharing 3-gram "
        "shingles with the benchmark corpus (source=src0), per-doc distinct "
        "overlap count. Benchmark shingle set is broadcast — the 100 TB "
        "training scan never shuffles until the per-doc count. "
        "(r2 name: q56.)"
    ),
)
def q17_contamination(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )


@register(
    "q24_dedup_exact_simhash",
    f"""
    WITH {_simhash_ctes()},
    g AS (
        SELECT md5(text) AS digest, min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)
    )
    SELECT d.doc_id, md5(d.text) AS digest, g.keep_id, g.n_copies, s.simhash,
           d.text IN (SELECT text FROM documents WHERE doc_id % 8 = 0)
               AS in_history
    FROM documents d
    JOIN g ON md5(d.text) = g.digest
    JOIN sim s ON s.doc_id = d.doc_id
    """,
    doc=(
        "Hash-based dedup fingerprints, both kinds, per doc: exact "
        "content-digest groups (keep-min-id + copy count; one shuffle on "
        "digest) and the 16-bit SimHash (per-word hash → per-bit majority "
        "vote; near-dups collide on the fingerprint, no pairwise work). "
        "Since r5 the row also hash-gates the sharded Bloom history gate "
        "(llm/bloom.py): in_history probes a filter built over the "
        "doc_id%8==0 slice; the oracle is the EXACT membership anti-join, "
        "so the hash match proves the gate's no-false-negative contract "
        "AND zero false positives at this geometry (16 shards x 8 MiBit "
        "x 7 hashes for <=10k history keys: per-probe FPP ~1e-23, so the "
        "exact equivalence is deterministic on any driver SF). "
        "(r2 names: q24 + q27; r4 verdict next-8.)"
    ),
)
def q24_dedup_exact_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select("doc_id", "text", F.md5("text").alias("digest"))
    groups = dedup.exact_dedup(docs)
    sims = dedup.simhash16(docs)
    geo = {"num_shards": 16, "bits_per_shard": 1 << 23, "num_hashes": 7}
    history = bloom.bloom_build(
        docs.filter(F.col("doc_id") % 8 == 0), "text", **geo
    )
    gated = bloom.bloom_probe(per_doc, history, "text", **geo)
    return (
        gated.join(groups, "digest")
        .join(sims, "doc_id")
        .select(
            "doc_id",
            "digest",
            "keep_id",
            "n_copies",
            "simhash",
            F.col("maybe_member").alias("in_history"),
        )
    )


@register(
    "q25_dedup_minhash_verified",
    f"""
    WITH {_DUCK_SIG},
    sets AS (
        SELECT doc_id AS sid, list_distinct({_DUCK_SHINGLES}) AS sset
        FROM docs_w WHERE len(w) >= 3
    )
    SELECT c.id_a, c.id_b,
           {_DUCK_JACCARD} AS jaccard,
           {_DUCK_JACCARD} >= 0.2 AS is_dup
    FROM candidates c
    JOIN sets a ON c.id_a = a.sid
    JOIN sets b ON c.id_b = b.sid
    """,
    doc=(
        "Full near-dup pipeline in one result: MinHash(8) + LSH(4 bands "
        "x 2) candidate pairs — shuffle on band hash, no all-pairs join "
        "— then exact n-gram Jaccard on the candidates only, with the "
        ">=0.2 verification verdict as a flag so both the candidate set "
        "and the verified set are hash-checked. NOTE: the giant-bucket "
        "star guard (bucket_cap) is DISABLED here to match the all-pairs "
        "DuckDB oracle; the deployable capped shape is benched as "
        "q25_dedup_minhash_production — do not copy this query to a "
        "duplicate-flooded corpus without the cap. (r2 names: q25 + q26.)"
    ),
)
def q25_dedup_minhash_verified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # the oracle's CTE enumerates ALL bucket pairs, so the oracle-checked
    # query runs uncapped for semantic equality at ANY corpus (the
    # production default bucket_cap=64 would diverge on a >64-copy
    # duplicate flood — review finding); the guard stays the default
    # everywhere else and is probed/tested on its own
    cands = dedup.minhash_lsh_candidates(docs, bucket_cap=10**9)
    scored = dedup.jaccard_verify(docs, cands, threshold=0.0)
    return scored.withColumn("is_dup", F.col("jaccard") >= 0.2)


@register(
    "q26_sequence_packing",
    """
    WITH t AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS digest,
               strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS shard
        FROM documents
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(floor((sum(n_chars) OVER (
                    PARTITION BY shard ORDER BY digest, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_chars) / 2000) AS BIGINT) AS batch_id
    FROM t
    """,
    doc=(
        "Deterministic sequence packing for training batches: shard by a "
        "digest nibble (16-way), order each shard by the digest "
        "(pseudo-random but reproducible), assign batch ids by cumulative "
        "char budget (2000). One window shuffle on the shard key; shards "
        "are independent, so n_shards is the parallelism knob at 100 TB. "
        "Same corpus -> same batches across engines and reruns. "
        "(r2 name: q62.)"
    ),
)
def q26_sequence_packing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.pack_sequences(
        docs, tokens_col="n_chars", budget=2000, n_shards=16
    ).select("doc_id", F.col("shard").cast("int").alias("shard"), "batch_id")


@register(
    "q27_document_chunking",
    r"""
    WITH w AS (
        -- empty/whitespace-only docs produce no words and hence no
        -- chunks, matching the implementation's length(w)>0 gate
        -- (review finding: the unfiltered split yields [''] and a
        -- phantom single-chunk row)
        SELECT doc_id,
               list_filter(
                   regexp_split_to_array(trim(lower(text)), '\s+'),
                   x -> len(x) > 0
               ) AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               unnest(range(0, CAST(ceil(len(w) / 24.0) AS BIGINT))) AS chunk_id,
               w
        FROM w
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(w[chunk_id*24 + 1 : chunk_id*24 + 32]) AS BIGINT) AS n_tokens,
           array_to_string(w[chunk_id*24 + 1 : chunk_id*24 + 32], ' ') AS chunk_text
    FROM chunks
    """,
    doc=(
        "Pre-embedding document chunking: overlapping word windows "
        "(W=32, stride=24). Each word emits its covering chunk ids "
        "(constant <=ceil(W/S) fan-out) and chunks reassemble in one "
        "(doc, chunk) hash aggregate — no per-chunk full-array carry, "
        "one bounded-width shuffle at 100 TB. (r2 name: q64.)"
    ),
)
def q27_document_chunking(spark, sf_dir):
    return text.chunk_documents(
        load_table(spark, sf_dir, "documents"), window=32, stride=24
    )


def _duck_cos(a: str, b: str, nd: int) -> str:
    return f"""round(
        list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))
        / (sqrt(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, len({b})+1), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE)))),
    {nd})"""


# the fixed-name variant the ANN oracles interpolate (single source of
# truth: any precision/fold change edits _duck_cos once — review finding)
_DUCK_COSINE = _duck_cos("e", "qv", 4)


def _query_vec(spark, sf_dir) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    return list(emb.filter("vec_id = 0").select("embedding").first()[0])


@register(
    "q28_knn_bruteforce",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT vec_id, {_DUCK_COSINE} AS cosine_sim
        FROM (SELECT vec_id, embedding AS e FROM embeddings), q
    )
    SELECT vec_id, cosine_sim FROM scored ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """,
    doc="Brute-force cosine top-k: broadcast query vector, JVM-side sequential fold, no Python in the scan.",
)
def q28_knn_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)


@register(
    "q29_ann_lsh_bucket",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    bucketed AS (
        SELECT vec_id, embedding AS e,
               {" || ".join(f"(CASE WHEN embedding[{i+1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS bucket
        FROM embeddings
    ),
    qb AS (
        SELECT {" || ".join(f"(CASE WHEN qv[{i+1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS bucket FROM q
    )
    SELECT vec_id, {_DUCK_COSINE} AS cosine_sim
    FROM bucketed, q, qb
    WHERE bucketed.bucket = qb.bucket
    ORDER BY cosine_sim DESC, vec_id LIMIT 5
    """,
    doc="ANN probe via sign-LSH bucket: scan restricted to the query's bucket (~n/256 rows); bucket id doubles as a partition key at scale.",
)
def q29_ann_lsh_bucket(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.bucketed_ann(emb, _query_vec(spark, sf_dir), k=5)


@register(
    "q30_embedding_near_dups",
    f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               {" || ".join(f"(CASE WHEN embedding[{i+1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_duck_cos('a.embedding', 'b.embedding', 4)} AS cosine_sim
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE NOT isnan({_duck_cos('a.embedding', 'b.embedding', 4)})
      AND {_duck_cos('a.embedding', 'b.embedding', 4)} >= 0.3
    """,
    doc="Embedding-cosine near-dup pairs via bucketed self-join (LSH bucket join key — no all-pairs).",
)
def q30_embedding_near_dups(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # bucket_cap=None: the oracle's SQL mirror is the exact all-pairs
    # bucketed join; the production default (cap=64 star guard) is the
    # deployable shape — same documented divergence as q25.
    return similarity.embedding_near_dups(emb, threshold=0.3, bucket_cap=None)


def _text_features_oracle() -> str:
    stop = ",".join(f"'{s}'" for s in text.STOPWORDS)
    scores = {
        lang: "len(list_filter(w, x -> list_contains(["
        + ",".join(f"'{m}'" for m in markers)
        + "], x)))"
        for lang, markers in text.LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    # the `= 0 → 'und'` branch mirrors _lang_pred: zero marker hits in
    # every language is undetermined, not the first CASE language
    case = (
        "CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
        + f"WHEN {best} = 0 THEN 'und' "
        + " ".join(
            f"WHEN {scores[lang]} = {best} THEN '{lang}'"
            for lang in text.LANG_MARKERS
        )
        + " ELSE 'und' END"
    )
    score_cols = ", ".join(
        f"CAST({scores[lang]} AS BIGINT) AS score_{lang}" for lang in text.LANG_MARKERS
    )
    return rf"""
    WITH base AS (
        SELECT doc_id, text, {_DUCK_WORDS} AS w,
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
        FROM documents
    ),
    feat AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(w) AS BIGINT) AS n_words,
               round(length(regexp_replace(text, '\s', '', 'g')) / len(w), 4) AS avg_word_len,
               round(len(list_filter(w, x -> list_contains([{stop}], x))) / len(w), 4) AS stopword_ratio,
               CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
               (len(w) >= 5
                AND len(list_filter(w, x -> list_contains([{stop}], x))) / len(w) >= 0.05
                AND length(text) >= 64) AS quality_ok,
               {score_cols},
               {case} AS pred_lang,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
               md5(norm) AS fp_full,
               md5(substring(norm, 1, 64)) AS fp_prefix,
               CAST(length(norm) // 100 AS BIGINT) AS len_bucket
        FROM base
    ),
    terms AS (
        SELECT doc_id, unnest(w) AS term FROM base
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM terms WHERE length(term) > 0 GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(nn.n_docs / dfreq.df), 4) AS tfidf
        FROM tf JOIN dfreq USING (term), nn
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        FROM scored
    ),
    kw AS (
        SELECT doc_id,
               max(CASE WHEN rank = 1 THEN term END) AS kw1,
               max(CASE WHEN rank = 2 THEN term END) AS kw2,
               max(CASE WHEN rank = 3 THEN term END) AS kw3
        FROM ranked WHERE rank <= 3 GROUP BY doc_id
    )
    SELECT f.*, kw.kw1, kw.kw2, kw.kw3
    FROM feat f LEFT JOIN kw USING (doc_id)
    """


@register(
    "q31_text_features",
    _text_features_oracle(),
    doc=(
        "Per-document text analysis, one scan: quality scoring "
        "(length/word/stopword/punctuation + gate), marker-word "
        "language-ID with deterministic tie-break, BPE-ish token count, "
        "document fingerprints (normalized digest + prefix + length "
        "bucket) — all column expressions sharing one materialized word "
        "array (text.doc_features) — plus top-3 TF-IDF keywords pivoted "
        "to columns (tf/df hash aggregates, broadcast df table, per-doc "
        "top-k window). (r2 names: q31 + q32 + q33 + q34 + q63.)"
    ),
)
def q31_text_features(spark, sf_dir):
    # fan_out: doc_features is a pure projection, so ALL its regex/HOF
    # work runs inside the scan stage — one task on a single-row-group
    # file (guide §2.5). Measured sf0.1: q31 1.72 → 1.00 s, identical
    # output. No-op on many-file / large inputs.
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    feats = text.doc_features(docs)
    # aggregate-path top-3 (tfidf_keywords): ~25% faster than the
    # ROW_NUMBER window at sf0.1, identical output (probe in SCALE.md)
    kw = text.tfidf_keywords(docs, k=3, ndigits=4)
    return feats.join(kw, "doc_id", "left")


@register(
    "q32_pii_redaction",
    r"""
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS n_emails,
           CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS n_ips,
           CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS n_phones,
           0 AS n_pii_after_redact,
           length(text) + CASE WHEN doc_id % 4 = 0
               THEN length(' contact [EMAIL] from [IP] tel [PHONE]') ELSE 0 END
               AS redacted_len
    FROM documents
    """,
    doc=(
        "PII detection + redaction (emails / IPv4 / phones) as pure column "
        "expressions (regexp_count/regexp_replace, codegen'd). PII is "
        "deterministically planted on every 4th doc so the oracle verifies "
        "detection counts, redacted length, zero residual PII after "
        "redaction, and zero false positives on the clean remainder. "
        "(r2 name: q65.)"
    ),
)
def q32_pii_redaction(spark, sf_dir):
    docs = text.plant_pii(load_table(spark, sf_dir, "documents"))
    return text.pii_features(docs)




@register(
    "q33_ann_ivf_hierarchical",
    f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    coarse AS (
        SELECT vec_id AS gid, embedding AS gv FROM embeddings WHERE vec_id < 4
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cent_group AS (
        SELECT cid, cv, gid FROM (
            SELECT cid, cv, gid,
                   row_number() OVER (
                       PARTITION BY cid
                       ORDER BY {_duck_cos('cv', 'gv', 6)} DESC, gid
                   ) AS rn
            FROM cents CROSS JOIN coarse
        ) WHERE rn = 1
    ),
    vec_group AS (
        SELECT vec_id, e, gid FROM (
            SELECT vec_id, e, gid,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY {_duck_cos('e', 'gv', 6)} DESC, gid
                   ) AS rn
            FROM (SELECT vec_id, embedding AS e FROM embeddings) CROSS JOIN coarse
        ) WHERE rn = 1
    ),
    assign AS (
        SELECT vec_id, e, cell FROM (
            SELECT v.vec_id, v.e, c.cid AS cell,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_duck_cos('v.e', 'c.cv', 6)} DESC, c.cid
                   ) AS rn
            FROM vec_group v JOIN cent_group c USING (gid)
        ) WHERE rn = 1
    ),
    probe AS (
        SELECT cid FROM cents, q
        ORDER BY {_duck_cos('cv', 'qv', 6)} DESC, cid LIMIT 2
    )
    SELECT a.vec_id, a.cell, {_duck_cos('e', 'qv', 4)} AS cosine_sim
    FROM assign a JOIN probe p ON a.cell = p.cid, q
    ORDER BY cosine_sim DESC, a.vec_id LIMIT 5
    """,
    doc=(
        "IVF with two-level hierarchical cell assignment — the "
        "large-codebook scale path: each vector argmaxes over n_coarse "
        "groups then only that group's fine centroids (~2*sqrt(C) cosines "
        "per vector vs C flat; 512 vs 65536 at C=65k). Both assignment "
        "stages are broadcast joins + map-side struct-argmax; cell id is "
        "the partition key at scale. (r2 name: q67.)"
    ),
)
def q33_ann_ivf_hierarchical(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_hierarchical(
        emb, _query_vec(spark, sf_dir), k=5, n_centroids=16, n_coarse=4, nprobe=2
    )


@register(
    "q35_multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CASE WHEN doc_id % 3 = 0 THEN doc_id % 31 + 1 END AS width,
           CASE WHEN doc_id % 3 = 0 THEN doc_id % 23 + 1 END AS height,
           CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(doc_id % 256 AS DOUBLE) END AS mean_r,
           CASE WHEN doc_id % 3 = 0 THEN CAST(7 * doc_id % 256 AS DOUBLE)
                WHEN doc_id % 3 = 2 THEN CAST(doc_id % 256 AS DOUBLE) END AS mean_g,
           CASE WHEN doc_id % 3 = 0 THEN CAST(13 * doc_id % 256 AS DOUBLE)
                WHEN doc_id % 3 = 2 THEN CAST(doc_id % 256 AS DOUBLE) END AS mean_b,
           CASE WHEN doc_id % 3 = 1 THEN 8000 END AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN (doc_id % 50 + 1) * 80 END AS n_samples,
           CASE WHEN doc_id % 3 = 1 THEN CAST((doc_id % 100) * 300 + 100 AS DOUBLE) END AS rms,
           CASE WHEN doc_id % 3 = 1 THEN CAST((doc_id % 100) * 300 + 100 AS DOUBLE) END AS peak,
           CASE WHEN doc_id % 3 = 2 THEN doc_id % 5 + 2 END AS n_frames
    FROM documents
    """,
    doc=(
        "Multimodal feature extraction with REAL pure-Python decoders: "
        "24bpp BMP (struct header + numpy pixel means), 16-bit PCM WAV "
        "(RIFF chunk walk, RMS/peak), concatenated-BMP video (per-frame "
        "parse). Payloads are synthesized so ground truth is analytic in "
        "doc_id — the oracle verifies the decoded VALUES. Arrow-batched "
        "mapInPandas; swap the kernel for PIL/ffmpeg for compressed formats."
    ),
)
def q35_multimodal_features(spark, sf_dir):
    media = multimodal.synthesize_real_media(load_table(spark, sf_dir, "documents"))
    return multimodal.extract_real_features(media)


@register(
    "q40_ann_ivf",
    f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    probe AS (
        SELECT cid FROM cents, q
        ORDER BY {_duck_cos('cv', 'qv', 6)} DESC, cid LIMIT 2
    ),
    assign AS (
        SELECT vec_id, e, cid AS cell,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY {_duck_cos('e', 'cv', 6)} DESC, cid
               ) AS rn
        FROM (SELECT vec_id, embedding AS e FROM embeddings) CROSS JOIN cents
    )
    SELECT a.vec_id, a.cell, {_duck_cos('e', 'qv', 4)} AS cosine_sim
    FROM assign a JOIN probe p ON a.cell = p.cid, q
    WHERE a.rn = 1
    ORDER BY cosine_sim DESC, a.vec_id LIMIT 5
    """,
    doc="IVF-style ANN: broadcast coarse codebook, map-side argmax cell assignment, nprobe-cell exact search (cell id = partition key at scale).",
)
def q40_ann_ivf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_ann(
        emb, _query_vec(spark, sf_dir), k=5, n_centroids=16, nprobe=2
    )


@register(
    "q42_multimodal_frames",
    """
    WITH f AS (
        SELECT doc_id, unnest(generate_series(0, doc_id % 5 + 1)) AS i
        FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id AS media_id, i AS frame_idx, i * 1000 AS ts_ms,
           CAST((doc_id + 17 * i) % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id + 29 * i) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id + 31 * i) % 256 AS DOUBLE) AS mean_b
    FROM f
    """,
    doc=(
        "Video frame sampling with REAL per-frame decode: the "
        "concatenated-BMP stream is split by header file-size fields, the "
        "frame covering each sample timestamp is BMP-parsed for its pixel "
        "means. Modality pruning keeps images/audio out of the Python "
        "stage; oracle verifies per-frame decoded values analytically."
    ),
)
def q42_multimodal_frames(spark, sf_dir):
    media = multimodal.synthesize_real_media(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_frames_real(media, every_ms=1000)


@register(
    "q44_log_templates",
    """
    SELECT 'user <NUM> completed ' || event_type || ' in <NUM> ms' AS template,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
    doc=(
        "Drain-lite log-template mining: mask numbers/hex/quoted strings "
        "out of each message, group by template — one regexp projection + "
        "one hash aggregate, no pairwise work. Messages are synthesized "
        "deterministically from events rows, so the oracle predicts the "
        "mined templates exactly (the masking regexes are genuinely "
        "exercised on the Spark side). (r2 name: q70.)"
    ),
)
def q44_log_templates(spark, sf_dir):
    return text.log_templates(load_table(spark, sf_dir, "events"))


def _curation_quality_oracle() -> str:
    stop = ",".join(f"'{s}'" for s in text.STOPWORDS)
    scores = {
        lang: "len(list_filter(w, x -> list_contains(["
        + ",".join(f"'{m}'" for m in markers)
        + "], x)))"
        for lang, markers in text.LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in text.LANG_MARKERS) + ")"
    case = (
        "CASE WHEN has_cjk THEN 'zh' "
        + f"WHEN {best} = 0 THEN 'und' "  # zero marker hits — see _lang_pred
        + " ".join(
            f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in text.LANG_MARKERS
        )
        + " ELSE 'und' END"
    )
    score_cols = ", ".join(f"{sql} AS score_{lang}" for lang, sql in scores.items())
    return rf"""
    WITH base AS (
        SELECT doc_id, text, {_DUCK_WORDS} AS w FROM documents
    ),
    feat AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(w) AS BIGINT) AS n_words,
               len(list_filter(w, x -> list_contains([{stop}], x))) AS stop_hits,
               md5(text) AS digest,
               regexp_matches(text, '[一-鿿]') AS has_cjk,
               {score_cols}
        FROM base
    ),
    gated AS (
        SELECT * FROM feat
        WHERE n_words >= 5 AND stop_hits / n_words >= 0.05 AND n_chars >= 64
    ),
    lang AS (
        SELECT doc_id, n_chars, n_words, digest, {case} AS pred_lang FROM gated
    ),
    cur AS (
        SELECT doc_id, n_chars, n_words, pred_lang
        FROM (SELECT *, row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
              FROM lang)
        WHERE rn = 1
    ),
    lmw AS (
        SELECT doc_id, unnest({_DUCK_WORDS}) AS word FROM documents
    ),
    lmw2 AS (SELECT doc_id, word FROM lmw WHERE length(word) > 0),
    lmf AS (SELECT word, count(*) AS cnt FROM lmw2 GROUP BY word),
    lmt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM lmf),
    lm AS (
        SELECT doc_id, round(avg(ln(cnt / total)), 4) AS lm_score
        FROM lmw2 JOIN lmf USING (word), lmt
        GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_chars, c.n_words, c.pred_lang, lm.lm_score
    FROM cur c JOIN lm USING (doc_id)
    """


@register(
    "q48_curation_quality",
    _curation_quality_oracle(),
    doc=(
        "End-to-end training-data curation: quality gate + language ID in "
        "one projection pass (single scan), exact dedup via a digest "
        "window, then the corpus-LM quality score (CCNet-style avg log "
        "unigram frequency; one word-count aggregate builds the LM, one "
        "word-keyed join scores — no forced broadcast, a 100 TB Zipf "
        "vocab does not reliably fit) joined onto the survivors. "
        "(r2 names: q51 + q66.)"
    ),
)
def q48_curation_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cur = text.curate(docs)
    lm = text.lm_quality_score(docs)
    return cur.join(lm, "doc_id")


@register(
    "q49_distributed_ingest",
    """
    SELECT CAST(doc_id AS DOUBLE) AS id,
           lang,
           CAST(n_chars AS DOUBLE) AS size,
           source AS origin_name
    FROM documents
    """,
    doc=(
        "Distributed ingest: two-phase mapInPandas normalization "
        "(infer+commit, then typed rows) over raw JSON lines derived from "
        "documents. Value-checked: the oracle predicts the normalized "
        "output (JSON numbers → double, nested origin.name flattened to "
        "origin_name); tests additionally assert hash-equality with the "
        "single-node prepare_batch path on identical input."
    ),
)
def q49_distributed_ingest(spark, sf_dir):
    from datetime import datetime

    from ..ingest import schema as sc
    from ..ingest.distributed import infer_schema_distributed, normalize_distributed
    from ..ingest.events import StreamConfig

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        F.to_json(
            F.struct(
                F.col("doc_id").alias("id"),
                F.col("lang"),
                F.col("n_chars").alias("size"),
                F.struct(F.col("source").alias("name")).alias("origin"),
            )
        ).alias("value")
    ).repartition(8)
    cfg = StreamConfig(name="docs_ingest")
    reg = sc.SchemaRegistry()
    infer_schema_distributed(raw, reg, cfg)
    out = normalize_distributed(
        spark, raw, reg, cfg, p_timestamp=datetime(2026, 1, 1)
    )
    return out.select("id", "lang", "size", "origin_name")


@register(
    "q50_dedup_clusters",
    f"""
    WITH RECURSIVE {_DUCK_SIG},
    sets AS (
        SELECT doc_id AS sid, list_distinct({_DUCK_SHINGLES}) AS sset
        FROM docs_w WHERE len(w) >= 3
    ),
    vp AS (
        SELECT c.id_a, c.id_b
        FROM candidates c
        JOIN sets a ON c.id_a = a.sid
        JOIN sets b ON c.id_b = b.sid
        WHERE round(len(list_intersect(a.sset, b.sset))
                    / len(list_distinct(list_concat(a.sset, b.sset))), 6) >= 0.2
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM vp
        UNION ALL SELECT id_b, id_a FROM vp
    ),
    reach AS (
        SELECT u AS node, u AS r FROM edges
        UNION
        SELECT e.u AS node, re.r FROM edges e JOIN reach re ON re.node = e.v
    ),
    clus AS (
        SELECT node, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    ),
    ranked AS (
        SELECT c.cluster_id, c.node,
               row_number() OVER (
                   PARTITION BY c.cluster_id
                   ORDER BY length(d.text) DESC, c.node ASC
               ) AS rn
        FROM clus c JOIN documents d ON d.doc_id = c.node
    )
    SELECT c.node, c.cluster_id, b.node AS keep_best_id
    FROM clus c
    JOIN (SELECT cluster_id, node FROM ranked WHERE rn = 1) b
      ON b.cluster_id = c.cluster_id
    """,
    doc="Dedup clustering + keep policy: LSH candidates → Jaccard verify → connected components (iterative min-label propagation vs DuckDB transitive-closure recursive CTE); cluster_id = canonical (min) doc; keep_best_id = the RefinedWeb/FineWeb best-member policy (dedup_keep_best: max quality score — text length here — ties → min id), hash-gated per VERDICT r5 next-7.",
)
def q50_dedup_clusters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_verify(
        docs, dedup.minhash_lsh_candidates(docs, bucket_cap=10**9), threshold=0.2
    )
    clusters = dedup.connected_components(pairs)
    # keep policy through the PRODUCTION function (not re-derived
    # inline), with the clustering shared — the driver hash then gates
    # dedup_keep_best's argmax semantics end-to-end
    kb = dedup.dedup_keep_best(
        docs.withColumn("q_score", F.length("text")),
        pairs,
        "q_score",
        labels=clusters,
    )
    keep = kb.filter(F.col("is_kept")).select(
        "cluster_id", F.col("doc_id").alias("keep_best_id")
    )
    return clusters.join(keep, "cluster_id").select(
        "node", "cluster_id", "keep_best_id"
    )
