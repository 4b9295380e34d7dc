"""Distributed n-gram language model: stupid-backoff training and
document perplexity scoring.

The public recipe pair this implements:

- Brants et al. 2007 ("Large Language Models in Machine Translation")
  trained stupid-backoff n-gram LMs on trillions of tokens with
  MapReduce — counts are the only sufficient statistic, so training is
  one distributed aggregate and the "model" is a DataFrame of
  (gram, n, cnt) rows that never has to fit anywhere.
- CCNet (Wenzek et al. 2020) filters a raw web crawl by perplexity
  under an LM trained on a TARGET corpus (Wikipedia): train on clean,
  score the crawl, keep the low-perplexity head/middle. The existing
  `text.lm_quality_score` scores a corpus under its own unigram
  distribution; this module is the train/score split that curation at
  100 TB actually runs.

Scale shape, end to end:
- training: one scan of the target corpus emitting all 1..order grams
  from one projection (no per-order rescan), one hash aggregate on the
  gram key (map-side combined). Pruning rare grams (`min_count`)
  happens inside the aggregate's output, which is what keeps a web-
  scale LM's tail from dominating the table.
- scoring: token rows are MELTED to (role, gram) probes — 5 narrow
  rows per token for a trigram model — so the LM lookup is ONE join on
  the gram key regardless of model order, not one join per backoff
  level. Then one per-(doc, pos) pivot aggregate and one per-doc
  average. No windows over the LM, no driver state, no Python.

Stupid backoff (not Kneser–Ney) is deliberate: its score needs only
raw counts, so it distributes exactly; the published result is that at
web scale the quality gap to KN vanishes while training stays a single
aggregate. Scores are therefore "pseudo-perplexity" (not normalized) —
monotone in model fit, which is all a filter threshold needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parseable_spark.llm.dedup import normalized_words

BACKOFF_ALPHA = 0.4  # the published stupid-backoff constant


def ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    order: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Train the LM: (gram, n, cnt) counts for every 1..order word
    n-gram of the corpus, one scan + one aggregate. Gram strings are
    space-joined words, so the string itself encodes the order
    (unigrams contain no space) and `n` is carried for pruning
    policies that differ by order.

    Grams are built from lag columns over a per-doc window, not from
    `word_shingles` HOFs: nested transform/slice lambdas run
    interpreted and measured 5.7× slower at sf0.1 (5.91 s → 1.04 s,
    identical output — SCALE.md); the window's doc-key shuffle is
    narrow token rows and the concat stays codegen."""
    if order < 1:
        raise ValueError("order must be >= 1")
    # doc key BEFORE the explode (a generator re-evaluates per output
    # row, which would give every token its own id and null lags)
    toks = docs.select(F.monotonically_increasing_id().alias("_doc"), text_col).select(
        "_doc",
        F.posexplode(
            F.filter(normalized_words(F.col(text_col)), lambda w: F.length(w) > 0)
        ).alias("pos", "w"),
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    toks = toks.select(
        "pos", "w", *[F.lag("w", d).over(w).alias(f"_l{d}") for d in range(1, order)]
    )
    grams = []
    for k in range(1, order + 1):
        parts = [F.col(f"_l{d}") if d else F.col("w") for d in range(k - 1, -1, -1)]
        g = F.concat_ws(" ", *parts) if k > 1 else parts[0]
        cond = F.col(f"_l{k - 1}").isNotNull() if k > 1 else F.lit(True)
        grams.append(F.when(cond, F.struct(F.lit(k).alias("n"), g.alias("gram"))))
    rows = toks.select(
        F.explode(F.filter(F.array(*grams), lambda s: s.isNotNull())).alias("g")
    ).select("g.n", "g.gram")
    counts = rows.groupBy("n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    return counts


def _melt_probes(
    toks: DataFrame, id_col: str, order: int
) -> tuple[DataFrame, list[str]]:
    """Per-token probe rows (id, pos, role, gram): for each backoff
    level L in order..1, the L-gram ending at the token and its (L-1)-
    gram context. Roles: g{L} and c{L} (c1 is the empty context =
    corpus total, resolved without a probe)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    # materialize the lag columns in their own projection: a generator
    # (explode) cannot host window expressions in the same operator
    toks = toks.select(
        id_col,
        "pos",
        "w",
        *[F.lag("w", d).over(w).alias(f"_lag{d}") for d in range(1, order)],
    )
    lags = {0: F.col("w")}
    for d in range(1, order):
        lags[d] = F.col(f"_lag{d}")

    def gram(length: int) -> Column:
        parts = [lags[d] for d in range(length - 1, -1, -1)]
        return F.concat_ws(" ", *parts) if length > 1 else parts[0]

    def ctx(length: int) -> Column:
        # the (length-1)-gram ENDING AT THE PREVIOUS token: w_{i-L+1}..w_{i-1}
        parts = [lags[d] for d in range(length - 1, 0, -1)]
        return F.concat_ws(" ", *parts) if length > 2 else parts[0]

    probes = []
    roles = []
    for length in range(order, 0, -1):
        has_ctx = (
            lags[length - 1].isNotNull() if length > 1 else F.lit(True)
        )
        probes.append(
            F.when(has_ctx, F.struct(F.lit(f"g{length}").alias("role"), gram(length).alias("gram")))
        )
        roles.append(f"g{length}")
        if length > 1:
            probes.append(
                F.when(
                    has_ctx,
                    F.struct(F.lit(f"c{length}").alias("role"), ctx(length).alias("gram")),
                )
            )
            roles.append(f"c{length}")
    melted = toks.select(
        id_col,
        "pos",
        F.explode(
            F.filter(F.array(*probes), lambda s: s.isNotNull())
        ).alias("p"),
    ).select(id_col, "pos", "p.role", "p.gram")
    return melted, roles


def stupid_backoff_scores(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int | None = None,
    alpha: float = BACKOFF_ALPHA,
    ndigits: int = 4,
) -> DataFrame:
    """Score documents under a trained `ngram_counts` LM:
    (id, n_tokens, log_score, pseudo_ppl).

    Per token, the stupid-backoff score with the LONGEST available
    context (documents shorter than the model order just start at a
    lower level): S = cnt(gram_L)/cnt(context_L) at the deepest level
    L with cnt(gram_L) > 0, discounted by alpha per level skipped.
    The unigram floor is add-one smoothed over the training vocab so
    OOV tokens score finitely: (c1+1)/(total+V).

    log_score = mean log10 S; pseudo_ppl = 10**(-log_score).

    `order` must not exceed the LM's trained order: probing grams an
    order-2 model never stored makes every token with enough context
    hit the alpha discount, inflating pseudo_ppl ~(1/alpha)x and
    silently dropping most of a corpus under a calibrated threshold
    (curate_corpus/StreamingCurator call with the default order=3).
    Pass order=None to use the LM's own max n.
    """
    lm_order = lm.agg(F.max("n")).first()[0]
    if lm_order is None:
        raise ValueError("empty LM counts table")
    if order is None:
        order = int(lm_order)
    elif order > lm_order:
        raise ValueError(
            f"order={order} exceeds the LM's trained order {lm_order}; "
            f"score with order<={lm_order} (or retrain the LM)"
        )
    uni = lm.filter(F.col("n") == 1)
    totals = uni.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(normalized_words(F.col(text_col)), lambda w: F.length(w) > 0)
        ).alias("pos", "w"),
    )
    melted, _ = _melt_probes(toks, id_col, order)
    # after the LM join, fill unseen grams with cnt=0 BEFORE the pivot:
    # a pivot null then means "level not probed" (document shorter than
    # the context — start at a lower level, NO discount), while 0 means
    # "probed and unseen" (a genuine backoff event — alpha applies).
    looked = (
        melted.join(lm.select("gram", "cnt"), "gram", "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(id_col, "pos")
        .pivot("role", [f"g{k}" for k in range(1, order + 1)] + [f"c{k}" for k in range(2, order + 1)])
        .agg(F.first("cnt"))
    )
    score: Column = (F.col("g1") + F.lit(1)) / (F.col("_total") + F.col("_vocab"))
    for length in range(2, order + 1):
        g, c = F.col(f"g{length}"), F.col(f"c{length}")
        score = (
            F.when(g.isNull(), score)  # level not probed: short doc
            .when((g > 0) & (c > 0), g / c)
            .otherwise(F.lit(alpha) * score)  # unseen gram/context: back off
        )
    return (
        looked.crossJoin(F.broadcast(totals))
        .select(F.col(id_col), F.log10(score).alias("_ls"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("_ls"), ndigits).alias("log_score"),
            F.round(F.pow(F.lit(10.0), -F.avg("_ls")), ndigits).alias("pseudo_ppl"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    lm: DataFrame,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 3,
) -> DataFrame:
    """CCNet's keep rule: documents whose pseudo-perplexity under the
    target-corpus LM is at most `max_ppl` (empty docs drop — they have
    no tokens to score). Join-back keeps every original column and
    attaches the score columns for auditability."""
    scored = stupid_backoff_scores(docs, lm, id_col, text_col, order)
    return docs.join(
        scored.filter(F.col("pseudo_ppl") <= max_ppl), id_col, "inner"
    )
