"""Crash-recovery drill: SIGKILL the whole engine mid-work, restart,
assert the invariant families hold (VERDICT r6 next-3).

The crash-ordering discipline (manifest-commit-then-mirror, texts/
before index fold, LATEST pointer flips, put-if-absent Delta versions,
compaction write-then-delete) is designed everywhere but was never
exercised by an actual kill. This drill:

1. spawns a WORKER process (own session group — the SIGKILL takes the
   Spark JVM down with it) that loops: HTTP-path ingest → sync →
   compaction → curator batches (near-dup history on, Delta mirror
   on), appending a durable ledger (fsync'd jsonl) of COMPLETED work:
   - {"type":"sync","counts":{stream:n}} — counts acked BEFORE the
     sync started (guaranteed flushed: the flush snapshot is taken
     under the API lock at start);
   - {"type":"curator","b":N} — batch N fully processed.
2. sleeps a random 6–18 s and SIGKILLs the worker's process group,
   recording the phase marker the worker last wrote (ingest / sync /
   compact / curator) — over cycles the kills land in every phase;
3. repeats for --cycles, then runs a VERIFY process that reopens the
   same store root, REPLAYS the last (possibly half-written) curator
   batch exactly like foreachBatch redelivery (same batch id, same
   deterministic rows), and asserts:

   a. manifest ↔ disk: every manifest file exists; spark re-count of
      the manifest's files == manifest rows;
   b. durability floor: per-stream queryable rows ≥ the last ledgered
      sync counts (staging is an in-memory memtable — events acked
      after the last completed sync are legitimately lost on a kill,
      same bound the reference's staging window gives);
   c. Delta mirror parity: replayed live set == manifest, numRecords
      == manifest rows (including the reconcile-on-open path for a
      kill between manifest commit and mirror sync);
   d. curator exactness after drain: kept ⊎ decisions == every input
      id of batches 0..last (disjoint, none lost, none duplicated) —
      batch content is a pure function of the batch id, so replays
      must converge bit-identically;
   e. index containment: LSH-indexed ⊆ texts ⊆ kept.
   f. embedding index (r8): the codebook parquet log survives and loads,
      ANN-indexed ⊆ kept, and a second redelivery of the drained batch
      leaves pairs/ and kept/ byte-identical (replay idempotence).

Usage:
    python tools/crash_drill.py [--cycles 6]
    python tools/crash_drill.py worker <root>    (internal)
    python tools/crash_drill.py verify <root>    (internal)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMS = ["drill_app", "drill_web"]
BATCH_DOCS = 16


def _ledger_path(root: str) -> str:
    return os.path.join(root, "ledger.jsonl")


def _ledger_append(root: str, obj: dict) -> None:
    with open(_ledger_path(root), "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _ledger_read(root: str) -> list[dict]:
    try:
        with open(_ledger_path(root)) as f:
            out = []
            for line in f:
                line = line.strip()
                if line:
                    try:
                        out.append(json.loads(line))
                    except ValueError:
                        pass  # torn final line from a kill mid-append
            return out
    except FileNotFoundError:
        return []


def _phase(root: str, name: str) -> None:
    with open(os.path.join(root, "phase"), "w") as f:
        f.write(name)


def _vec(did: int) -> list[float]:
    """Deterministic unit embedding per doc id (pure function — replay
    regenerates byte-identical vectors)."""
    import math
    import random as _r

    r = _r.Random(did * 2654435761 % (1 << 31))
    v = [r.gauss(0, 1) for _ in range(8)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _near_vec(ref: int, did: int, eps: float = 0.03) -> list[float]:
    """ref's embedding, deterministically perturbed — a semantic
    near-dup (cosine ≈ 0.999) with lexically unrelated text."""
    import math

    base, noise = _vec(ref), _vec(did + 7)
    v = [b + eps * x for b, x in zip(base, noise)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


_WORDS = (
    "river stone harbor lantern meadow copper falcon timber orchard "
    "saddle anchor barley cinder drift ember flint garnet hollow ivory "
    "juniper kestrel ledger marble nickel otter pebble quarry russet "
    "spruce tundra umber vessel walnut yarrow zephyr basin cradle dune "
    "fjord grove heath inlet knoll lagoon mesa notch oxbow prairie"
).split()


def _unique_text(did: int) -> str:
    """GENUINELY lexically unique per doc: seeded word salad. A shared
    template with only digits varying is itself a cross-batch lexical
    near-dup at Jaccard 0.4 — the lexical stage ate the 'unique' docs
    and starved the semantic baits (r8 fix, measured in the soak).
    Stopwords sprinkled in for the quality gate."""
    import random as _r

    r = _r.Random(did * 40503 % (1 << 30))
    words = []
    for k in range(14):
        if k % 4 == 2:
            words.append(("the", "and", "of", "in")[k % 4 - 2 + (k // 4) % 2])
        words.append(r.choice(_WORDS) + (str(did) if k == 7 else ""))
    return " ".join(words)


def _batch_rows(
    b: int, base_texts: list[str]
) -> list[tuple[int, str, list[float]]]:
    """Batch content as a PURE function of the batch id — a replay
    after a kill regenerates byte-identical input, exactly like a
    foreachBatch redelivery from a checkpointed source."""
    rows = []
    for i in range(BATCH_DOCS):
        did = b * 1000 + i
        emb = _vec(did)
        if i == BATCH_DOCS - 1 and b > 0:
            text = base_texts[((b - 1) * 7) % 40] + f" uniq {(b - 1) * 1000}"
        elif i == BATCH_DOCS - 2:
            text = base_texts[(b * 7) % 40] + " tail"  # in-batch near-dup bait
        elif i == BATCH_DOCS - 4:
            # lexically UNIQUE doc (seeded word salad — see
            # _unique_text): the next batch's semantic bait refs it, so
            # it must reliably survive every lexical stage and be
            # folded into the ANN index
            text = _unique_text(did)
        elif i == BATCH_DOCS - 3 and b > 0:
            # cross-batch SEMANTIC bait: its OWN unique text (lexical
            # stages pass), near-copy of the previous batch's unique
            # doc embedding (r8: embedding index)
            text = _unique_text(did)
            emb = _near_vec((b - 1) * 1000 + BATCH_DOCS - 4, did)
        else:
            text = base_texts[(b * 7 + i) % 40] + f" uniq {did}"
        rows.append((did, text, emb))
    return rows


def _open(root: str):
    from parseable_spark.server import ParseableAPI
    from parseable_spark.session import get_spark
    from parseable_spark.streaming.curator import StreamingCurator

    os.environ["P_DELTA_LOG"] = "true"
    os.environ["P_ICEBERG"] = "true"  # r7: both external mirrors on
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("crash-drill")
    spark.sparkContext.setLogLevel("ERROR")
    api = ParseableAPI(spark, os.path.join(root, "store"))
    base_texts = [
        r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").limit(40).collect()
    ]
    cur = StreamingCurator(
        spark, os.path.join(root, "curator"), near_dup_history=True,
        min_words=1, min_chars=1, min_stopword_ratio=0.0,
        # r8: semantic near-dup stage in the drill, with a TINY split
        # target so codebook GROWTH (cell splits at compaction — the
        # codebook-persists-BEFORE-generation crash ordering) actually
        # happens under kills (at 64 the drill-sized index never split)
        semantic_dup_history=True, ann_n_cells=4,
        semantic_threshold=0.95, ann_split_target=8,
    )
    cur.ann.compact_every = 4
    return spark, api, cur, base_texts


def worker(root: str) -> None:
    spark, api, cur, base_texts = _open(root)
    entries = _ledger_read(root)
    synced = {}
    next_b = 0
    for e in entries:
        if e.get("type") == "sync":
            synced = e["counts"]
        elif e.get("type") == "curator":
            next_b = max(next_b, int(e["b"]) + 1)
    acked = dict.fromkeys(STREAMS, 0)
    for s in STREAMS:
        acked[s] = int(synced.get(s, 0))
    _ledger_append(root, {"type": "worker_start", "next_b": next_b})
    i = 0
    while True:
        _phase(root, "ingest")
        for s in STREAMS:
            n = api.ingest(
                s,
                [
                    {"level": "info", "msg": f"ev {i}-{k}", "latency_ms": k}
                    for k in range(40)
                ],
            )
            acked[s] += n
        if i % 2 == 1:
            counts_at_start = dict(acked)
            _phase(root, "sync")
            api.run_sync()
            _ledger_append(root, {"type": "sync", "counts": counts_at_start})
        if i % 3 == 2:
            _phase(root, "compact")
            api.run_compaction(level="hour", min_files=2)
            _ledger_append(root, {"type": "compact"})
        _phase(root, "curator")
        rows = _batch_rows(next_b, base_texts)
        df = spark.createDataFrame(rows, "doc_id bigint, text string, embedding array<double>")
        cur.process_batch(df, next_b)
        _ledger_append(root, {"type": "curator", "b": next_b})
        next_b += 1
        i += 1


def verify(root: str) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    spark, api, cur, base_texts = _open(root)
    entries = _ledger_read(root)
    synced: dict = {}
    last_b = -1
    for e in entries:
        if e.get("type") == "sync":
            synced = e["counts"]
        elif e.get("type") == "curator":
            last_b = max(last_b, int(e["b"]))
    failures: list[str] = []
    report: dict = {"ledgered_batches": last_b + 1, "synced_floor": synced}

    # drain: redeliver the possibly-in-flight batch to completion, the
    # way a streaming restart would, so curator state is quiescent
    drain_b = last_b + 1
    cur.process_batch(
        spark.createDataFrame(
            _batch_rows(drain_b, base_texts), "doc_id bigint, text string, embedding array<double>"
        ),
        drain_b,
    )

    # a/b/c — storage invariants per stream
    for s in STREAMS:
        store = api.get_or_create_stream(s)
        man_rows = 0
        for fstat in store.manifest.files:
            if not os.path.exists(fstat.file_path):
                failures.append(f"{s}: manifest file missing: {fstat.file_path}")
            else:
                man_rows += fstat.num_rows
        paths = [f.file_path for f in store.manifest.files if os.path.exists(f.file_path)]
        disk_rows = spark.read.parquet(*paths).count() if paths else 0
        report[f"{s}_manifest_rows"] = man_rows
        if disk_rows != man_rows:
            failures.append(f"{s}: disk rows {disk_rows} != manifest {man_rows}")
        floor = int(synced.get(s, 0))
        if man_rows < floor:
            failures.append(f"{s}: durable rows {man_rows} < synced floor {floor}")
        if store.delta_log is None:
            failures.append(f"{s}: delta mirror missing")
        else:
            live = set(store.delta_log.live_paths())
            man = {f.file_path for f in store.manifest.files}
            if live != man:
                failures.append(
                    f"{s}: delta != manifest (+{len(live - man)}/-{len(man - live)})"
                )
            if store.delta_log.num_records() != store.manifest.total_rows():
                failures.append(f"{s}: delta numRecords != manifest rows")
        if getattr(store, "iceberg", None) is None:
            failures.append(f"{s}: iceberg mirror missing")
        else:
            ice = sorted(store.iceberg.live_paths())
            man_sorted = sorted(f.file_path for f in store.manifest.files)
            if ice != man_sorted:
                failures.append(f"{s}: iceberg live set != manifest")
            if store.iceberg.num_records() != store.manifest.total_rows():
                failures.append(f"{s}: iceberg numRecords != manifest rows")

    # d — curator exactness over ALL batches incl. the drained one
    inputs: set[int] = set()
    for b in range(drain_b + 1):
        inputs |= {r[0] for r in _batch_rows(b, base_texts)}
    kept = {r["doc_id"] for r in cur.kept().select("doc_id").collect()}
    dec = {r["doc_id"] for r in cur.decisions().select("doc_id").collect()}
    report["curator_kept"], report["curator_dropped"] = len(kept), len(dec)
    if kept & dec:
        failures.append(f"kept ∩ decisions: {sorted(kept & dec)[:5]}")
    if kept | dec != inputs:
        failures.append(
            f"curator id loss: missing {len(inputs - (kept | dec))} "
            f"extra {len((kept | dec) - inputs)}"
        )

    # e — index containment
    idx_df = cur.lsh.index_df()
    indexed = (
        {r["doc_id"] for r in idx_df.select("doc_id").distinct().collect()}
        if idx_df is not None else set()
    )
    tex_df = cur.lsh.texts_df()
    texts = (
        {r["doc_id"] for r in tex_df.select("doc_id").distinct().collect()}
        if tex_df is not None else set()
    )
    if not indexed <= texts:
        failures.append(f"indexed ⊄ texts: {sorted(indexed - texts)[:5]}")
    if not texts <= kept:
        failures.append(f"texts ⊄ kept: {sorted(texts - kept)[:5]}")

    # f — embedding index invariants (r8; codebook is a parquet log
    # since r10 — survives kills iff the topology loads and is non-empty)
    cb_root = os.path.join(root, "curator", "ann", "codebook")
    if not os.path.isdir(cb_root):
        failures.append("ann codebook/ missing after kills")
    else:
        try:
            import pyarrow.dataset as pads

            tab = pads.dataset(
                cb_root, format="parquet", partitioning="hive"
            ).to_table(columns=["cid", "parent"])
            if not tab.num_rows:
                failures.append("ann codebook empty")
        except Exception:
            failures.append("ann codebook unreadable")
    ann_idx = cur.ann.index_df()
    ann_indexed = (
        {r["doc_id"] for r in ann_idx.select("doc_id").distinct().collect()}
        if ann_idx is not None else set()
    )
    if not ann_indexed <= kept:
        failures.append(f"ann indexed ⊄ kept: {sorted(ann_indexed - kept)[:5]}")
    report["ann_leaves"] = len(cur.ann._centroids or [])
    report["ann_split_parents"] = len(cur.ann._children)
    sem_drops = (
        cur.decisions().filter("reason = 'near_duplicate_semantic'").count()
    )
    report["semantic_drops"] = sem_drops
    # the stage must actually FIRE, not merely not-crash: every batch
    # b >= 1 plants one cross-batch semantic bait (unique text, near
    # vector of the prior batch's unique doc), so zero semantic drops
    # across the run means the stage was silently disabled — a false
    # green this check existed to prevent (r9 review: the count was
    # reported but never gated)
    if drain_b >= 2 and sem_drops == 0:
        failures.append("semantic stage never fired despite planted baits")
    # replay idempotence of the semantic pair log + kept under a SECOND
    # redelivery of the drained batch
    pairs_once = sorted(map(tuple, cur.ann.pairs().collect()))
    kept_once = sorted(kept)
    cur.process_batch(
        spark.createDataFrame(
            _batch_rows(drain_b, base_texts),
            "doc_id bigint, text string, embedding array<double>",
        ),
        drain_b,
    )
    if sorted(map(tuple, cur.ann.pairs().collect())) != pairs_once:
        failures.append("ann pairs not replay-idempotent")
    kept_again = sorted(
        r["doc_id"] for r in cur.kept().select("doc_id").collect()
    )
    if kept_again != kept_once:
        failures.append("kept changed under second redelivery")

    report["failures"] = failures
    report["ok"] = not failures
    print("VERIFY " + json.dumps(report))
    sys.exit(0 if not failures else 1)


def orchestrate() -> None:
    import argparse
    import random

    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--root", default=None)
    args = ap.parse_args(sys.argv[1:])
    root = args.root or tempfile.mkdtemp(prefix="crash_drill_")
    rng = random.Random(7)
    kills = []
    for c in range(args.cycles):
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", root],
            start_new_session=True,  # killpg takes the Spark JVM too
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        # let the worker boot spark + do real work, then kill INSIDE a
        # targeted phase (rotating) so every phase family gets hit —
        # a purely random delay lands almost always in the curator
        # batch, the longest phase
        target = ["sync", "compact", "curator", "ingest"][c % 4]
        t0 = time.time()
        time.sleep(25 + rng.uniform(2, 8))  # boot + first work
        phase = "?"
        while time.time() - t0 < 120:
            try:
                with open(os.path.join(root, "phase")) as f:
                    phase = f.read().strip()
            except FileNotFoundError:
                phase = "?"
            if phase == target:
                time.sleep(rng.uniform(0.0, 0.4))  # land mid-phase
                break
            time.sleep(0.02)
        delay = time.time() - t0
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()
        kills.append({"cycle": c, "after_s": round(delay, 1), "phase": phase})
        print(json.dumps(kills[-1]), flush=True)
        time.sleep(2)
    v = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "verify", root],
        capture_output=True, text=True, timeout=900,
    )
    tail = [l for l in v.stdout.splitlines() if l.startswith("VERIFY ")]
    print(json.dumps({"kills": kills, "root": root}))
    print(tail[-1] if tail else f"VERIFY-FAILED rc={v.returncode}\n{v.stdout[-2000:]}\n{v.stderr[-2000:]}")
    sys.exit(0 if (tail and json.loads(tail[-1][7:])["ok"]) else 1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "worker":
        worker(sys.argv[2])
    elif len(sys.argv) >= 3 and sys.argv[1] == "verify":
        verify(sys.argv[2])
    else:
        orchestrate()
