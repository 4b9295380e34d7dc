"""Round-11 optimization probes — A/B each candidate change at sf0.1.

Each probe asserts result-equality between the current shape (A) and
the candidate (B) before timing (warm + best-of-3 through the noop
sink, same methodology as bench.py).

Probes:
  verify-semi   jaccard_verify: semi-join candidate members BEFORE the
                shingle explode+window instead of after (guide §2.3/2.4
                — don't compute shingles for docs no candidate needs).
  tfidf-reuse   _tfidf_scored: localCheckpoint tf so the df-side does
                not replay the explode+count subtree (plan dedup).
  fanout        under-parallel single-file scans: hash-repartition to
                defaultParallelism before CPU-heavy map work
                (guide §2.5 input skew, unsplittable input).

Usage: python tools/r11_probe.py <probe> [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from parseable_spark.llm import dedup, text
from parseable_spark.session import get_spark
from parseable_spark.tables import load_table


def bench(name, fn, n=3):
    fn().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s")
    return best


def assert_equal(a_df, b_df, label):
    d1 = a_df.exceptAll(b_df).count()
    d2 = b_df.exceptAll(a_df).count()
    ok = d1 == 0 and d2 == 0
    print(f"{label} equal: {ok} (a-b={d1}, b-a={d2})")
    if not ok:
        raise SystemExit(f"{label}: NOT EQUAL — candidate rejected")


def jaccard_verify_semi_first(docs, candidates, threshold, ndigits=6):
    """Candidate B: prune docs to candidate members BEFORE shingling."""
    members = (
        candidates.select(F.col("id_a").alias("sid"))
        .unionAll(candidates.select(F.col("id_b").alias("sid")))
        .distinct()
    )
    member_docs = docs.join(
        F.broadcast(members), F.col("doc_id") == F.col("sid"), "left_semi"
    )
    sets = (
        dedup.shingle_rows(member_docs)
        .groupBy(F.col("doc_id").alias("sid"))
        .agg(F.collect_set("shingle").alias("sset"))
        .localCheckpoint()
    )
    j = (
        candidates.join(
            sets.withColumnRenamed("sid", "id_a").withColumnRenamed("sset", "set_a"),
            "id_a",
        )
        .join(
            sets.withColumnRenamed("sid", "id_b").withColumnRenamed("sset", "set_b"),
            "id_b",
        )
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


def probe_verify_semi(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def run_a():
        cands = dedup.minhash_lsh_candidates(docs, bucket_cap=10**9)
        scored = dedup.jaccard_verify(docs, cands, threshold=0.0)
        return scored.withColumn("is_dup", F.col("jaccard") >= 0.2)

    def run_b():
        cands = dedup.minhash_lsh_candidates(docs, bucket_cap=10**9)
        scored = jaccard_verify_semi_first(docs, cands, threshold=0.0)
        return scored.withColumn("is_dup", F.col("jaccard") >= 0.2)

    assert_equal(run_a(), run_b(), "q25 semi-first")
    bench("A verify (full-corpus shingle pass)", run_a)
    bench("B verify (member-pruned shingle)  ", run_b)


def tfidf_scored_reuse(docs, id_col="doc_id", text_col="text", ndigits=4):
    n_docs = docs.agg(F.countDistinct(id_col).cast("double").alias("_n_docs"))
    terms = docs.select(
        F.col(id_col), F.explode(dedup.normalized_words(F.col(text_col))).alias("term")
    ).filter(F.length("term") > 0)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint()  # df-side reuses this instead of replaying
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), ndigits
            ).alias("tfidf"),
        )
    )


def kw_from_scored(scored, id_col="doc_id", k=3):
    top = scored.groupBy(id_col).agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("tfidf")).alias("neg"), F.col("term")))
            ),
            1,
            k,
        ).alias("_t")
    )
    return top.select(
        id_col,
        *[F.col("_t").getItem(i).getField("term").alias(f"kw{i+1}") for i in range(k)],
    )


def probe_tfidf(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def run_a():
        feats = text.doc_features(docs)
        kw = text.tfidf_keywords(docs, k=3, ndigits=4)
        return feats.join(kw, "doc_id", "left")

    def run_b():
        feats = text.doc_features(docs)
        kw = kw_from_scored(tfidf_scored_reuse(docs))
        return feats.join(kw, "doc_id", "left")

    assert_equal(run_a(), run_b(), "q31 tf-reuse")
    bench("A tfidf (tf subtree replayed)", run_a)
    bench("B tfidf (tf checkpointed)    ", run_b)


def probe_fanout(spark, sf_dir):
    cores = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")

    # --- q31 feats projection ------------------------------------------
    def feats_a():
        return text.doc_features(docs)

    def feats_b():
        return text.doc_features(docs.repartition(cores, "doc_id"))

    assert_equal(feats_a(), feats_b(), "doc_features fanout")
    bench("A doc_features 1-task scan ", feats_a)
    bench("B doc_features fanned out  ", feats_b)

    # --- q01 aggregate --------------------------------------------------
    from parseable_spark.queries.relational import q01_pricing_summary

    def q01_b():
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            li.repartition(cores, "l_orderkey")
            .filter(
                F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1999-12-01 00:00:00'")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
                F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    bench("A q01 1-task scan+agg      ", lambda: q01_pricing_summary(spark, sf_dir))
    bench("B q01 fanned out           ", q01_b)

    # --- q12 join chain ---------------------------------------------------
    from parseable_spark.queries.relational import q12_local_supplier_volume

    bench("A q12 as-is                ", lambda: q12_local_supplier_volume(spark, sf_dir))


def main():
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("r11-probe")
    {
        "verify-semi": probe_verify_semi,
        "tfidf-reuse": probe_tfidf,
        "fanout": probe_fanout,
        "fanout2": probe_fanout2,
    }[probe](spark, sf_dir)
    spark.stop()




def probe_fanout2(spark, sf_dir):
    import time as _t

    cores = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")

    t0 = _t.perf_counter()
    p = docs.rdd.getNumPartitions()
    t1 = _t.perf_counter()
    print(f"guard .rdd.getNumPartitions(): {p} partitions, {(t1-t0)*1000:.1f} ms")
    t0 = _t.perf_counter()
    nf = len(docs.inputFiles())
    t1 = _t.perf_counter()
    print(f"guard .inputFiles(): {nf} files, {(t1-t0)*1000:.1f} ms")

    fdocs = docs.repartition(cores, "doc_id")

    def q31(d):
        feats = text.doc_features(d)
        kw = text.tfidf_keywords(d, k=3, ndigits=4)
        return feats.join(kw, "doc_id", "left")

    def q14(d):
        return text.repetition_features(d)

    def q17(d):
        return dedup.contamination(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
        )

    def q25(d):
        cands = dedup.minhash_lsh_candidates(d, bucket_cap=10**9)
        scored = dedup.jaccard_verify(d, cands, threshold=0.0)
        return scored.withColumn("is_dup", F.col("jaccard") >= 0.2)

    for name, fn in (("q31", q31), ("q14", q14), ("q17", q17), ("q25", q25)):
        assert_equal(fn(docs), fn(fdocs), f"{name} fanout")
        bench(f"A {name} 1-task scan", lambda fn=fn: fn(docs))
        bench(f"B {name} fanned     ", lambda fn=fn: fn(fdocs))

if __name__ == "__main__":
    main()
