"""Distributed BPE tokenizer training + token accounting.

Byte-pair encoding the way Sennrich et al. ("Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 — public)
actually train it: merges are learned from the WORD VOCABULARY with
counts, not from the raw corpus. That factorization is what makes BPE
training scale — the corpus contributes exactly one distributed
aggregate (word → count, cardinality = vocabulary, tiny next to a
100 TB corpus), and the merge loop runs driver-side over that bounded
table. No iteration ever rescans the corpus.

Pieces:
- `word_vocab`    — one groupBy(word) count, top-N by (count desc,
  word asc) for determinism; the only distributed step.
- `bpe_train`     — Sennrich merge loop over the vocab dict: count
  symbol-pair frequencies weighted by word count, merge the most
  frequent pair (lexicographic tie-break — deterministic, no RNG),
  repeat `num_merges` times or until no pair repeats.
- `bpe_segments`  — apply learned merges to one word (driver/test
  utility, also the exact OOV segmenter).
- `bpe_token_counts` — per-document token counts under the trained
  merges: explode words once, broadcast-join the word → n_tokens
  table for vocabulary words, char-count fallback for OOV (exact for
  every in-vocabulary word; OOV words are by construction rare — the
  vocab covers the corpus's head — and char count is BPE's
  no-merge-applies upper bound). Stays entirely JVM-side: one explode,
  one broadcast join, one sum aggregate; no UDF.

End-of-word marker: the classic '</w>' suffix on the final character,
so merges distinguish word-final from word-internal units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_words

EOW = "</w>"


def word_vocab(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 30000,
) -> list[tuple[str, int]]:
    """(word, count) for the top_n most frequent normalized words —
    the bounded training table. Deterministic order: count desc, word
    asc."""
    rows = (
        docs.select(F.explode(normalized_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(top_n)
        .collect()
    )
    return [(r["w"], int(r["n"])) for r in rows]


def _symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def bpe_train(
    vocab: list[tuple[str, int]],
    num_merges: int = 200,
) -> list[tuple[str, str]]:
    """Learn up to `num_merges` merge rules from a (word, count) vocab.
    Driver-side state: the vocab dict (bounded by word_vocab's top_n)
    and the merge list. Stops early when no symbol pair occurs twice."""
    table: dict[tuple[str, ...], int] = {}
    for w, n in vocab:
        s = _symbols(w)
        if s:
            table[s] = table.get(s, 0) + int(n)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in table.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats; further merges are noise
        (a, b), _n = best
        merges.append((a, b))
        new_table: dict[tuple[str, ...], int] = {}
        for syms, n in table.items():
            t = tuple(_apply_merge(list(syms), a, b))
            new_table[t] = new_table.get(t, 0) + n
        table = new_table
    return merges


def _apply_merge(syms: list, a: str, b: str) -> list:
    """One left-to-right scan merging every non-overlapping (a, b) pair
    — THE merge semantics, shared by training's table rewrite and
    bpe_segments so the two can never diverge (a fix applied to one
    copy and not the other would silently break the 'exact for
    in-vocabulary words' encode guarantee)."""
    out: list = []
    i = 0
    merged = a + b
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_segments(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges (in training order) to one word."""
    syms = list(_symbols(word))
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
        if len(syms) == 1:
            break
    return syms


def bpe_token_counts(
    docs: DataFrame,
    vocab: list[tuple[str, int]],
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens): per-document token count under the trained
    tokenizer. Exact for in-vocabulary words (broadcast word →
    n_tokens table); OOV words count as characters (the no-merge upper
    bound). One explode + broadcast join + sum; no Python in the
    plan."""
    spark = docs.sparkSession
    tok_table = spark.createDataFrame(
        [(w, len(bpe_segments(w, merges))) for w, _ in vocab],
        "w string, n_tok int",
    )
    words = docs.select(
        F.col(id_col), F.explode(normalized_words(F.col(text_col))).alias("w")
    ).filter(F.length("w") > 0)
    return (
        words.join(F.broadcast(tok_table), "w", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tok"), F.length("w")).alias("n_tok"),
        )
        .groupBy(id_col)
        .agg(F.sum("n_tok").cast("bigint").alias("bpe_tokens"))
    )


def bpe_symbol_table(
    vocab: list[tuple[str, int]], merges: list[tuple[str, str]]
) -> list[tuple[str, int]]:
    """Deterministic symbol → token-id table for a trained tokenizer:
    every single character seen in the vocab (word-internal and
    word-final '</w>' variants — the OOV floor) plus every symbol a
    merge can produce. Ids are assigned by sorted symbol string, so
    the same (vocab, merges) yields the same ids on any engine."""
    symbols: set[str] = set()
    for w, _ in vocab:
        for s in _symbols(w):
            base = s[: -len(EOW)] if s.endswith(EOW) else s
            symbols.add(base)  # word-internal variant
            symbols.add(base + EOW)  # word-final variant
    for a, b in merges:
        symbols.add(a + b)
    return [(s, i) for i, s in enumerate(sorted(symbols))]


def bpe_encode(
    docs: DataFrame,
    vocab: list[tuple[str, int]],
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus: (id, token_ids array<int>, n_tokens) —
    the sequences a training-shard writer actually emits, feeding
    straight into `sampling.pack_sequences` via n_tokens.

    Scale split: in-vocabulary words (the corpus head by construction)
    take the JVM path — one broadcast join against the word → ids
    table precomputed driver-side from the bounded vocab. Only OOV
    word OCCURRENCES cross into Python, through one Arrow-batched
    applyInPandas keyed by the word so each distinct OOV word is
    segmented once per partition-group, not once per occurrence.
    Symbols outside the table (characters never seen in training) map
    to id -1, the conventional unk sentinel.

    Reassembly is a per-doc aggregate: array_sort(collect_list(struct
    (pos, ids))) then flatten — one shuffle on the doc key.
    """
    import pandas as pd

    spark = docs.sparkSession
    sym_id = dict(bpe_symbol_table(vocab, merges))
    word_ids = [
        (w, [sym_id[s] for s in bpe_segments(w, merges)]) for w, _ in vocab
    ]
    id_table = spark.createDataFrame(word_ids, "w string, _ids array<int>")

    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(normalized_words(F.col(text_col)), lambda w: F.length(w) > 0)
        ).alias("pos", "w"),
    ).join(F.broadcast(id_table), "w", "left")
    # snapshot: hit and miss are two consumers of the same plan, and
    # Spark does not dedupe common subplans — without this the corpus
    # scan + explode + broadcast join ran twice per encode job
    words = words.localCheckpoint()
    hit = words.filter(F.col("_ids").isNotNull())
    miss = words.filter(F.col("_ids").isNull()).drop("_ids")

    def segment_oov(pdf: pd.DataFrame) -> pd.DataFrame:
        # one group = one distinct OOV word; segment once, fan out
        ids = [sym_id.get(s, -1) for s in bpe_segments(pdf["w"].iloc[0], merges)]
        pdf = pdf.copy()
        pdf["_ids"] = [ids] * len(pdf)
        return pdf

    oov = miss.groupBy("w").applyInPandas(segment_oov, schema=hit.schema)
    return (
        hit.unionByName(oov)
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_ids"))),
                    lambda s: s["_ids"],
                )
            ).alias("token_ids")
        )
        .withColumn("n_tokens", F.size("token_ids").cast("bigint"))
    )


def bpe_decode_ids(ids: list[int], symbol_table: list[tuple[str, int]]) -> str:
    """Inverse of `bpe_encode` for audit/round-trip tests: token ids →
    normalized text (unknown-id sentinel renders as the empty string,
    '</w>' markers become word boundaries)."""
    by_id = {i: s for s, i in symbol_table}
    joined = "".join(by_id.get(i, "") for i in ids)
    return joined.replace(EOW, " ").strip()
