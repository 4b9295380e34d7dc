"""BPE tokenizer training (llm/bpe.py) vs an independent reference.

The distributed step (word_vocab) is checked against a driver-side
count; the merge loop is checked against an independently-written
Sennrich implementation AND against the canonical worked example from
the paper; token counting is checked for exactness on a fully
in-vocabulary corpus.
"""

from __future__ import annotations

from collections import Counter

from parseable_spark.llm import bpe as B
from tests.conftest import SF_SMALL


def ref_bpe(vocab, num_merges):
    """Independent Sennrich loop (dict-of-tuples, same tie-breaks)."""
    table = Counter()
    for w, n in vocab:
        chars = list(w)
        chars[-1] += B.EOW
        table[tuple(chars)] += n
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in table.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += n
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(best)
        a, b = best
        nt = Counter()
        for syms, n in table.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nt[tuple(out)] += n
        table = nt
    return merges


def test_paper_example():
    """The ACL-2016 worked example: {low, lower, newest, widest} —
    'es' then 'est' dominate via newest+widest counts."""
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B.bpe_train(vocab, num_merges=4)
    assert merges == ref_bpe(vocab, 4)
    assert merges[0] == ("e", "s") and merges[1] == ("es", "t" + B.EOW)
    # applying the merges segments as the paper does
    assert B.bpe_segments("newest", merges)[-1] == "est" + B.EOW


def test_train_matches_independent_reference_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    vocab = B.word_vocab(docs, top_n=500)
    # the distributed vocab equals a driver-side recount
    texts = [r["text"] for r in docs.collect()]
    cnt = Counter(w for t in texts for w in t.strip().lower().split() if w)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    assert vocab == want

    merges = B.bpe_train(vocab, num_merges=120)
    assert merges == ref_bpe(vocab, 120)
    assert 0 < len(merges) <= 120
    # merges are deterministic across runs
    assert merges == B.bpe_train(vocab, num_merges=120)


def test_token_counts_exact_for_in_vocab_corpus(spark):
    rows = [
        (1, "the lowest estimate"),
        (2, "the the newest newest widest"),
        (3, "lowest"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    vocab = B.word_vocab(df, top_n=100)
    merges = B.bpe_train(vocab, num_merges=50)
    got = {r["doc_id"]: r["bpe_tokens"] for r in B.bpe_token_counts(df, vocab, merges).collect()}
    want = {
        i: sum(len(B.bpe_segments(w, merges)) for w in t.lower().split())
        for i, t in rows
    }
    assert got == want
    # plan is JVM-only (broadcast join + agg, no Python eval)
    plan = (
        B.bpe_token_counts(df, vocab, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "BroadcastHashJoin" in plan


class TestEncode:
    """bpe_encode: full corpus tokenization to token-id sequences."""

    ROWS = [
        (1, "the lowest estimate"),
        (2, "the newest newest widest"),
        (3, "zzquux lowest"),  # zzquux is OOV at top_n below
        (4, "qqq"),  # entirely OOV, chars unseen in training
    ]

    def _fit(self, spark):
        df = spark.createDataFrame(self.ROWS[:2], "doc_id bigint, text string")
        vocab = B.word_vocab(df, top_n=100)
        merges = B.bpe_train(vocab, num_merges=50)
        return vocab, merges

    def test_matches_driver_side_segmenter(self, spark):
        vocab, merges = self._fit(spark)
        sym = dict(B.bpe_symbol_table(vocab, merges))
        df = spark.createDataFrame(self.ROWS, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in B.bpe_encode(df, vocab, merges).collect()}
        for i, t in self.ROWS:
            want = [
                sym.get(s, -1)
                for w in t.lower().split()
                for s in B.bpe_segments(w, merges)
            ]
            assert list(got[i]["token_ids"]) == want, i
            assert got[i]["n_tokens"] == len(want)

    def test_round_trip(self, spark):
        """Exact decode for text whose CHARACTERS are covered by
        training — including an OOV word ('towel') that exercises the
        Python segmentation path. Unseen chars are unk by design and
        cannot round-trip (covered by test_unseen_chars_are_unk)."""
        vocab, merges = self._fit(spark)
        table = B.bpe_symbol_table(vocab, merges)
        rows = self.ROWS[:2] + [(3, "towel estimate")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in B.bpe_encode(df, vocab, merges).collect()}
        for i, t in rows:
            assert B.bpe_decode_ids(list(got[i]["token_ids"]), table) == t.lower()

    def test_unseen_chars_are_unk(self, spark):
        vocab, merges = self._fit(spark)
        df = spark.createDataFrame(self.ROWS, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in B.bpe_encode(df, vocab, merges).collect()}
        assert all(i == -1 for i in got[4]["token_ids"])  # q never trained

    def test_feeds_pack_sequences(self, spark):
        from parseable_spark.llm.sampling import pack_sequences

        vocab, merges = self._fit(spark)
        df = spark.createDataFrame(self.ROWS, "doc_id bigint, text string")
        enc = B.bpe_encode(df, vocab, merges)
        packed = pack_sequences(enc, "n_tokens", budget=8, n_shards=2)
        assert packed.count() == 4
        assert {"batch_id", "shard", "token_ids"} <= set(packed.columns)

    def test_symbol_table_deterministic(self, spark):
        vocab, merges = self._fit(spark)
        assert B.bpe_symbol_table(vocab, merges) == B.bpe_symbol_table(vocab, merges)
        ids = [i for _, i in B.bpe_symbol_table(vocab, merges)]
        assert ids == list(range(len(ids)))
