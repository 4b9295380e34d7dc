"""Epoch-shuffle sampler (llm/sampling.py epoch_shuffle): seeded
deterministic global shuffle into exact shard partitions.
"""

from __future__ import annotations


class TestEpochShuffle:
    def _docs(self, spark, n=200):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame({"doc_id": [f"d{i}" for i in range(n)], "v": range(n)})
        )

    def test_lossless_and_deterministic(self, spark):
        from parseable_spark.llm.sampling import epoch_shuffle

        docs = self._docs(spark)
        a = epoch_shuffle(docs, seed=1, n_shards=8)
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in docs.collect()
        )
        assert [r["doc_id"] for r in a.collect()] == [
            r["doc_id"] for r in epoch_shuffle(docs, seed=1, n_shards=8).collect()
        ]

    def test_seed_changes_order(self, spark):
        from parseable_spark.llm.sampling import epoch_shuffle

        docs = self._docs(spark)
        o1 = [r["doc_id"] for r in epoch_shuffle(docs, 1, 8).collect()]
        o2 = [r["doc_id"] for r in epoch_shuffle(docs, 2, 8).collect()]
        assert o1 != o2 and sorted(o1) == sorted(o2)

    def test_exact_output_partitioning(self, spark):
        from parseable_spark.llm.sampling import epoch_shuffle
        from pyspark.sql import functions as F

        out = epoch_shuffle(self._docs(spark), seed=3, n_shards=8)
        assert out.rdd.getNumPartitions() == 8
        # each partition holds whole shards, sorted by (ord, doc_id)
        rows = out.withColumn("pid", F.spark_partition_id()).collect()
        by_pid = {}
        for r in rows:
            by_pid.setdefault(r["pid"], []).append(r)
        for pid, rs in by_pid.items():
            keys = [(r["shard"], r["ord"], r["doc_id"]) for r in rs]
            assert keys == sorted(keys)

    def test_one_shard_per_partition(self, spark):
        """Range partitioning gives the advertised 1:1 shard→partition
        layout; hash partitioning collided shards balls-in-bins style
        (~1/e of output partitions empty, others holding 2-3 shards)."""
        from parseable_spark.llm.sampling import epoch_shuffle
        from pyspark.sql import functions as F

        out = epoch_shuffle(self._docs(spark, n=800), seed=5, n_shards=8)
        pairs = (
            out.withColumn("pid", F.spark_partition_id())
            .select("pid", "shard")
            .distinct()
            .collect()
        )
        shards_per_pid: dict[int, set] = {}
        for r in pairs:
            shards_per_pid.setdefault(r["pid"], set()).add(r["shard"])
        # every populated partition holds exactly one shard, and all 8
        # shards land in distinct partitions (no empties at n=800)
        assert all(len(s) == 1 for s in shards_per_pid.values())
        assert len(shards_per_pid) == 8

    def test_validation(self, spark):
        import pytest
        from parseable_spark.llm.sampling import epoch_shuffle

        with pytest.raises(ValueError):
            epoch_shuffle(self._docs(spark), seed=0, n_shards=0)
