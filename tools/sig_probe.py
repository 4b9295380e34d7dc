"""Signature-index probe scaling: bytes read per FIXED probe batch as
index history grows — the r7 judge's done-bar for the streaming LSH
scale fix ("per-batch signature-scan bytes sublinear in history").

Builds a synthetic banded-signature index directly in
StreamingDedupIndex's partitioned layout (band_pt dirs, band_hash-
sorted files, small row groups) at several history sizes spanning
>=16x, then probes each with the SAME fixed batch through
``probe_index`` in both modes:

- plain:   partition pruning only (the pre-r7 behavior is a full flat
           scan; plain here is already band_pt-pruned)
- chunked: partition pruning + chunked band_hash IN pushdown
           (row-group pruning on the sorted files)

A flat chunked row while the plain row grows ~linearly is the
evidence; the adaptive gate in probe_index picks per batch based on
touched bytes (see SCALE.md r7 for the crossover math).

Usage:
    python tools/sig_probe.py [log2_min log2_max]   # default 21 25
    python tools/sig_probe.py --flood [log2h]       # over-cap fallback
        # measurement (r7 judge next-3): a probe batch holding MORE
        # distinct band keys than probe_key_cap falls back to
        # partition-pruned full reads exactly when partitions are
        # fattest. Compares that fallback against a FORCED chunked
        # probe (cap lifted) on the same flood batch: bytes, wall
        # seconds, and planning seconds — the chunked path's cost is
        # dominated by pushing tens of thousands of IN literals
        # through py4j/Catalyst, which is what the cap exists to avoid.

Run on a QUIET box.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lo = int(args[0]) if args else 21
    hi = int(args[1]) if len(args) > 1 else 25

    from pyspark.sql import functions as F

    from parseable_spark.session import get_spark
    from parseable_spark.streaming.dedup_index import StreamingDedupIndex

    spark = get_spark("sig-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM-process rchar, NOT Hadoop's FileSystem statistics: the
    # parquet vectorized reader's data-page reads bypass the Hadoop
    # counter on local files (only footers register — measured r7:
    # a full 267 MB column decode registered 2.6 MB). rchar counts
    # every read syscall of the local-mode JVM; on a quiet box a
    # scan-dominated job's delta IS its scan I/O.
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())

    def bytes_read() -> int:
        with open(f"/proc/{jvm_pid}/io") as f:
            for line in f:
                if line.startswith("rchar:"):
                    return int(line.split()[1])
        return 0

    NUM_BANDS = 4
    PROBE_DOCS = 1000  # fixed batch: 1k docs x 4 bands = 4k band keys

    def synth_banded(n_docs: int, id_base: int, hash_base: int):
        """Banded rows shaped exactly like llm.dedup.banded_rows output
        (band_hash = md5 hex string)."""
        return (
            spark.range(n_docs)
            .select((F.col("id") + id_base).alias("doc_id"))
            .select(
                "doc_id",
                F.explode(
                    F.array(*[F.lit(b) for b in range(NUM_BANDS)])
                ).alias("band_idx"),
            )
            .withColumn(
                "band_hash",
                F.md5(
                    F.concat_ws(
                        ":",
                        (F.col("doc_id") + hash_base).cast("string"),
                        F.col("band_idx").cast("string"),
                    )
                ),
            )
        )

    results = []
    for log2h in range(lo, hi + 1, 2):
        n_docs = 1 << log2h
        base = tempfile.mkdtemp(prefix="sig_probe_")
        idx = StreamingDedupIndex(spark, base, sig_block_bytes=128 << 10)
        rows = (
            synth_banded(n_docs, 0, 0)
            .withColumn("bsz", F.lit(1))
            .withColumn("rep_id", F.col("doc_id"))
        )
        t0 = time.time()
        idx._write_index_rows(rows, batch_id=-1)
        idx._commit_version(1)
        build_s = round(time.time() - t0, 1)
        idx_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(base, "index"))
            for f in fs
        )
        # fixed probe: half hits (same hash recipe), half misses
        banded = (
            synth_banded(PROBE_DOCS // 2, 10**9, -(10**9))  # hits
            .unionByName(synth_banded(PROBE_DOCS // 2, 2 * 10**9, 7 * 10**8))
            .localCheckpoint()
        )
        row = {
            "n_docs": n_docs,
            "index_mb": round(idx_bytes / 1e6, 1),
            "build_s": build_s,
        }
        probe = F.broadcast(banded.select("band_idx", "band_hash").distinct())

        def materialize(pi):
            # the real probe shape: broadcast-join the batch's bands
            # against the index slice, touching every index column
            # (a bare count() would column-prune the scan to nothing
            # and undercount bytes)
            return (
                pi.join(probe, ["band_idx", "band_hash"])
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("bsz").alias("b"),
                    F.max("rep_id").alias("r"),
                )
                .collect()[0]["n"]
            )

        for mode, pmb in (("plain", 1 << 60), ("chunked", 0)):
            idx.prune_min_bytes = pmb
            pi = idx.probe_index(10**6, banded)
            materialize(pi)  # warm listing + footers
            r0, t0 = bytes_read(), time.time()
            matches = materialize(pi)
            row[f"{mode}_mb"] = round((bytes_read() - r0) / 1e6, 2)
            row[f"{mode}_s"] = round(time.time() - t0, 2)
            row[f"{mode}_rows"] = matches
        results.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"probe_docs": PROBE_DOCS, "series": results}))


def flood() -> None:
    """Over-cap fallback vs forced-chunked at flood key counts."""
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    log2h = int(args[0]) if args else 23
    flood_docs = int(args[1]) if len(args) > 1 else 8000  # 32k band keys

    from pyspark.sql import functions as F

    from parseable_spark.session import get_spark
    from parseable_spark.streaming.dedup_index import StreamingDedupIndex

    spark = get_spark("sig-probe-flood")
    spark.sparkContext.setLogLevel("ERROR")
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())

    def bytes_read() -> int:
        with open(f"/proc/{jvm_pid}/io") as f:
            for line in f:
                if line.startswith("rchar:"):
                    return int(line.split()[1])
        return 0

    NUM_BANDS = 4

    def synth_banded(n_docs: int, id_base: int, hash_base: int):
        return (
            spark.range(n_docs)
            .select((F.col("id") + id_base).alias("doc_id"))
            .select(
                "doc_id",
                F.explode(
                    F.array(*[F.lit(b) for b in range(NUM_BANDS)])
                ).alias("band_idx"),
            )
            .withColumn(
                "band_hash",
                F.md5(
                    F.concat_ws(
                        ":",
                        (F.col("doc_id") + hash_base).cast("string"),
                        F.col("band_idx").cast("string"),
                    )
                ),
            )
        )

    n_docs = 1 << log2h
    base = tempfile.mkdtemp(prefix="sig_flood_")
    idx = StreamingDedupIndex(spark, base, sig_block_bytes=128 << 10)
    rows = (
        synth_banded(n_docs, 0, 0)
        .withColumn("bsz", F.lit(1))
        .withColumn("rep_id", F.col("doc_id"))
    )
    idx._write_index_rows(rows, batch_id=-1)
    idx._commit_version(1)
    idx_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(base, "index"))
        for f in fs
    )
    banded = (
        synth_banded(flood_docs // 2, 10**9, -(10**9))
        .unionByName(synth_banded(flood_docs // 2, 2 * 10**9, 7 * 10**8))
        .localCheckpoint()
    )
    n_keys = banded.select("band_hash").distinct().count()
    out = {
        "n_docs": n_docs,
        "index_mb": round(idx_bytes / 1e6, 1),
        "flood_docs": flood_docs,
        "distinct_keys": n_keys,
        "probe_key_cap": idx.probe_key_cap,
    }

    def materialize(pi):
        return (
            pi.join(
                F.broadcast(banded.select("band_idx", "band_hash").distinct()),
                ["band_idx", "band_hash"],
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("bsz").alias("b"),
                F.max("rep_id").alias("r"),
            )
            .collect()[0]["n"]
        )

    # A: production behavior — over-cap -> partition-pruned fallback
    # B: cap lifted -> full chunked IN pushdown at flood key counts
    # forced cap stays int32-safe: probe_index passes cap+1 to .limit()
    for mode, cap in (("fallback", 20_000), ("forced_chunked", 2_000_000)):
        idx.probe_key_cap = cap
        idx.prune_min_bytes = 0
        t_plan0 = time.time()
        pi = idx.probe_index(10**6, banded)
        plan_s = time.time() - t_plan0
        materialize(pi)  # warm listing + footers
        r0, t0 = bytes_read(), time.time()
        matches = materialize(pi)
        out[mode] = {
            "mb": round((bytes_read() - r0) / 1e6, 2),
            "exec_s": round(time.time() - t0, 2),
            "build_plan_s": round(plan_s, 2),
            "rows": matches,
        }
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if "--flood" in sys.argv:
        flood()
    else:
        main()
