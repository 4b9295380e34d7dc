"""End-to-end corpus curation: the full training-data job, composed.

One operator that chains the pipeline a real pretraining-data run
executes — (optional) Bloom history gate → exact dedup → quality gate
→ (optional) perplexity filter under a target-corpus LM → verified
near-dup removal → (optional) repeated-span strip → PII redaction →
(optional) semantic dedup over embeddings → (optional)
temperature-mixture downsampling — and returns, besides
the surviving corpus, a per-document AUDIT TABLE saying why each
dropped document was dropped. Curation without the audit trail is
undebuggable at 100 TB; the decisions table is the artifact data
engineers actually inspect ("why did my domain shrink 40%?").

Composition rules:
- every stage only sees survivors of the previous stages, so the
  expensive stages (LSH banding, semantic pair joins) run on the
  already-thinned corpus — order is cheapest-and-broadest first;
- drop reasons are exclusive by construction: each stage only
  examines survivors, so a document that is both an exact duplicate
  and low quality reports ``exact_duplicate`` (the earlier stage);
- all stages inherit the determinism of their operators (digest
  min-id canonicals, hash sampling, id tie-breaks) — same corpus in,
  same corpus out, across runs and engines.

The returned plan is lazy end to end except the bounded driver states
its stages already carry (k-means centroids, mixture domain counts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import text as T

# drop-reason vocabulary, in stage order (stages see only survivors of
# earlier stages, so each document carries at most one reason)
REASONS = [
    "in_history",
    "exact_duplicate",
    "low_quality",
    "high_perplexity",
    "near_duplicate",
    "semantic_duplicate",
    "mixture_downsampled",
]


@dataclass
class CurationResult:
    kept: DataFrame  # surviving docs, PII-redacted text
    decisions: DataFrame  # (id, kept, drop_reason)
    summary: dict[str, Any] = field(default_factory=dict)


def _drops(df: DataFrame, id_col: str, reason: str) -> DataFrame:
    return df.select(F.col(id_col), F.lit(reason).alias("drop_reason"))


def curate_corpus(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_words: int = 5,
    min_chars: int = 64,
    min_stopword_ratio: float = 0.05,
    near_dup_threshold: float = 0.4,
    near_dup_keep: str = "min_id",
    semantic_threshold: float = 0.95,
    semantic_k: int = 8,
    domain_col: str | None = None,
    mixture_temperature: float = 1.0,
    mixture_target_rows: int | None = None,
    history_bloom: DataFrame | None = None,
    bloom_geometry: dict[str, int] | None = None,
    lm_counts: DataFrame | None = None,
    max_pseudo_ppl: float | None = None,
    strip_spans_min_tokens: int | None = None,
    compute_summary: bool = True,
) -> CurationResult:
    """Run the full curation chain; see module docstring.

    `embeddings` (id-aligned with `docs` via vec_id_col == id_col
    values) enables the semantic-dedup stage; `domain_col` (a column
    of `docs`) enables mixture downsampling. Round-4 optional stages:
    `history_bloom` (a `bloom.bloom_build` index over previously
    ingested corpora, geometry in `bloom_geometry`) gates the batch
    against rolling history first; `lm_counts` + `max_pseudo_ppl`
    (an `lm.ngram_counts` model trained on a TARGET corpus) adds the
    CCNet perplexity filter; `strip_spans_min_tokens` rewrites
    survivors through `dedup.strip_duplicate_spans` (text becomes the
    normalized token stream with corpus-repeated runs removed — the
    tokenizer-facing representation).
    """
    # validate EVERY parameter before the first corpus-scale job: at
    # the 100 TB design point a typo'd option must raise in
    # microseconds, not after hours of eager LSH/banding compute
    # (r6 review — near_dup_keep was checked after the verify stage
    # had already executed via its internal localCheckpoints)
    if near_dup_keep not in ("min_id", "best_quality"):
        raise ValueError(
            f"near_dup_keep must be 'min_id' or 'best_quality', got {near_dup_keep!r}"
        )
    if (lm_counts is None) != (max_pseudo_ppl is None):
        # half-configured stage: silently skipping it let
        # high-perplexity junk through while the audit showed zero
        # high_perplexity drops (r6 review; same contract as the
        # mandatory bloom_geometry below)
        raise ValueError(
            "the perplexity filter needs BOTH lm_counts and "
            "max_pseudo_ppl (got exactly one)"
        )
    base = docs
    drops: list[DataFrame] = []

    # 0. (optional) Bloom history gate — membership against everything
    # already ingested, BEFORE any in-batch work: definite-new rows
    # survive; a maybe-member hit means "already in the corpus" at the
    # filter's FPP (the curation-safe drop direction)
    if history_bloom is not None:
        from . import bloom as B

        # geometry is MANDATORY with a history filter: probing bitmaps
        # built under any other (num_shards, bits_per_shard,
        # num_hashes) silently mis-reads them and virtually every true
        # duplicate tests definitely-new — the exact failure
        # StreamingBloomGate pins geometry on disk to prevent
        if bloom_geometry is None:
            raise ValueError(
                "history_bloom requires bloom_geometry (the exact "
                "num_shards/bits_per_shard/num_hashes the index was "
                "built with); probing under mismatched geometry "
                "silently defeats the gate"
            )
        tagged = B.bloom_probe(base, history_bloom, text_col, **bloom_geometry)
        # drop-id sets are aggregate/filter-derived and corpus-scale
        # under floods: AQE's post-filter size misestimate picked
        # BroadcastHashJoin for exactly this shape and OOM'd (memory
        # probe; dedup.py:639 precedent) — hint every join-back
        hist_ids = tagged.filter(F.col("maybe_member")).select(id_col)
        drops.append(_drops(hist_ids, id_col, "in_history"))
        base = base.join(hist_ids.hint("shuffle_merge"), id_col, "left_anti")

    # 1. exact dedup — md5 digest, min-id canonical (one narrow shuffle)
    exact = D.exact_dedup(base, id_col, text_col)  # (digest, keep_id, n)
    digests = base.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
    dup_ids = (
        digests.join(exact.hint("shuffle_merge"), "digest")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(id_col)
    )
    drops.append(_drops(dup_ids, id_col, "exact_duplicate"))
    base = base.join(dup_ids.hint("shuffle_merge"), id_col, "left_anti")

    # 2. quality gate — single projection pass over survivors
    q = T.quality_features(base, id_col, text_col)
    bad = q.filter(
        (F.col("n_words") < min_words)
        | (F.col("n_chars") < min_chars)
        | (F.col("stopword_ratio") < min_stopword_ratio)
    ).select(id_col)
    drops.append(_drops(bad, id_col, "low_quality"))
    base = base.join(bad.hint("shuffle_merge"), id_col, "left_anti")

    # 2b. (optional) CCNet perplexity filter under the target-corpus LM
    if lm_counts is not None and max_pseudo_ppl is not None:
        from . import lm as L

        scored = L.stupid_backoff_scores(base, lm_counts, id_col, text_col)
        ppl_bad = scored.filter(F.col("pseudo_ppl") > max_pseudo_ppl).select(id_col)
        drops.append(_drops(ppl_bad, id_col, "high_perplexity"))
        base = base.join(ppl_bad.hint("shuffle_merge"), id_col, "left_anti")

    # 3. verified near-dups — LSH candidates + exact Jaccard.
    # near_dup_keep="min_id" (default): drop the larger id of each
    # verified pair — cheapest, one distinct. "best_quality": cluster
    # the pairs and keep each cluster's LONGEST member (n_chars, ties →
    # min id) — the RefinedWeb/FineWeb keep policy; costs the bounded
    # min-label clustering rounds, hence opt-in.
    cands = D.minhash_lsh_candidates(base, id_col, text_col)
    verified = D.jaccard_verify(
        base, cands, id_col, text_col, threshold=near_dup_threshold
    )
    if near_dup_keep == "min_id":
        near_ids = verified.select(F.col("id_b").alias(id_col)).distinct()
    else:  # "best_quality" — validated at entry
        scores = T.quality_features(base, id_col, text_col).select(
            F.col(id_col), F.col("n_chars").cast("double").alias("_q")
        )
        labeled = D.dedup_keep_best(
            scores, verified.select("id_a", "id_b"), "_q", id_col
        )
        near_ids = labeled.filter(~F.col("is_kept")).select(id_col)
    drops.append(_drops(near_ids, id_col, "near_duplicate"))
    base = base.join(near_ids.hint("shuffle_merge"), id_col, "left_anti")

    # 3b. (optional) repeated-span strip — rewrite, not drop: text
    # becomes the normalized token stream with every corpus-repeated
    # >=L-token run removed (survivor-only, so the shingle aggregate
    # runs on the thinned corpus)
    if strip_spans_min_tokens is not None:
        stripped = D.strip_duplicate_spans(
            base, id_col, text_col, min_tokens=strip_spans_min_tokens
        )
        # LEFT join: strip_duplicate_spans emits no row for documents
        # with zero normalized tokens (whitespace/punctuation-only
        # text), and an inner join would silently drop them with no
        # audit entry — they survive as the empty token stream instead
        base = (
            base.drop(text_col)
            .join(
                stripped.select(id_col, F.col("clean_text").alias(text_col)),
                id_col,
                "left",
            )
            .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        )

    # 4. PII redaction — rewrite in place, not drop (the same codegen'd
    # regex chain pii_features verifies leaves zero residual)
    base = base.withColumn(
        text_col,
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), T.EMAIL_RE, "[EMAIL]"),
                T.IPV4_RE,
                "[IP]",
            ),
            T.PHONE_RE,
            "[PHONE]",
        ),
    )

    # 5. semantic dedup over embeddings (survivor-aligned). The
    # survivor-vector slice is SNAPSHOTTED first: kmeans_fit drives
    # ~max_iter+2 separate actions, and each would otherwise replay
    # the whole upstream curation lineage (bloom probe, dedup
    # aggregates, quality regexes, LM pivot) per iteration — ~13×
    # the corpus scan cost (r6 review; classifier.py documents the
    # same hazard for logreg_fit). The slice is narrow (id + vector).
    if embeddings is not None:
        from . import semantic as S

        surv_vecs = embeddings.join(
            base.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
        ).localCheckpoint()
        if not surv_vecs.head(1):
            # nothing embedded survived (or ids don't align) — a
            # zero-row k-means crashed with an opaque ValueError
            sem_ids = surv_vecs.select(F.col(vec_id_col).alias(id_col))
        else:
            sem = S.semantic_dedup(
                surv_vecs,
                k=semantic_k,
                threshold=semantic_threshold,
                id_col=vec_id_col,
                vec_col=vec_col,
            )
            sem_ids = sem.filter(F.col("is_dup")).select(
                F.col(vec_id_col).alias(id_col)
            )
        drops.append(_drops(sem_ids, id_col, "semantic_duplicate"))
        base = base.join(sem_ids.hint("shuffle_merge"), id_col, "left_anti")

    # 6. temperature-mixture downsampling by domain
    if domain_col is not None:
        from .sampling import mixture_sample

        kept_mix = mixture_sample(
            base,
            domain_col,
            temperature=mixture_temperature,
            target_rows=mixture_target_rows,
            id_col=id_col,
        )
        mixed_out = base.join(kept_mix.select(id_col), id_col, "left_anti").select(
            id_col
        )
        drops.append(_drops(mixed_out, id_col, "mixture_downsampled"))
        base = kept_mix

    # audit table: each stage only sees survivors of the previous
    # stages, so the per-stage drop sets are disjoint by construction —
    # a plain union IS the first-match-reason table
    dropped = None
    for d in drops:
        dropped = d if dropped is None else dropped.unionByName(d)
    decisions = (
        docs.select(id_col)
        .join(dropped, id_col, "left")
        .select(
            id_col,
            F.col("drop_reason").isNull().alias("kept"),
            "drop_reason",
        )
    )

    summary: dict[str, Any] = {}
    if compute_summary:
        # snapshot the (narrow: id, kept, reason) audit table before
        # aggregating it: the summary collect() executes the whole
        # curation lineage — bloom probe, quality features, LM scoring,
        # PII regexes — and without the checkpoint the caller's first
        # read of `decisions` would execute it all AGAIN. kept's text
        # is stage-mutated (span strip, redaction) so its lineage is
        # deliberately left lazy: one pass when the caller writes it.
        decisions = decisions.localCheckpoint()
        rows = decisions.groupBy("drop_reason").count().collect()
        summary = {
            (r["drop_reason"] or "kept"): r["count"] for r in rows
        }
    return CurationResult(kept=base, decisions=decisions, summary=summary)
