"""Composed-runtime soak (VERDICT r5 next-5).

Every background job the server runs — the maintenance scheduler
(retention + compaction full passes), the 60 s staging→parquet sync
sub-tick, tombstone reaping, the alert scheduler, and the streaming
curator — is individually verified, but nothing ran them TOGETHER
against one live store under concurrent HTTP ingest + query load.
This tool does, for a sustained window, then asserts the composed
invariants:

1. zero query errors across the whole run;
2. every acknowledged event is queryable at the end (per-stream HTTP
   count == acked ingest count — staging ∪ parquet seam, across
   however many sync/compaction cycles ran);
3. curator exactness: kept ⊎ decisions == every input id (disjoint,
   none lost, none duplicated);
4. index containment: LSH-indexed ⊆ texts-store ⊆ kept;
5. manifest ↔ disk: every manifest entry exists on disk AND re-counts
   to its recorded num_rows (spark read), after compactions swapped
   files underneath;
6. query latency: p50/p99 reported; p99 must stay under --p99-budget
   (default 15 s — generous: ingest, curator and compaction all
   contend for the same local[32] JVM).

Usage:
    python tools/soak.py [--minutes 30] [--p99-budget 15]

Accelerated cadences (full maintenance pass every 120 s, sync every
15 s, alert eval every 10 s, curator batch every ~8 s) so a 30-minute
soak exercises many full cycles of each job. Run on a quiet box.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMS = ["soak_app", "soak_web"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--p99-budget", type=float, default=15.0)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from parseable_spark.server import ParseableAPI, serve_background
    from parseable_spark.session import get_spark
    from parseable_spark.streaming.curator import StreamingCurator

    spark = get_spark("soak")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak_")
    api = ParseableAPI(spark, os.path.join(root, "store"))
    srv, base = serve_background(api)
    api.start_maintenance(
        interval_s=120.0, compact_level="hour", sync_interval_s=15.0
    )

    stop = threading.Event()
    errors: list[str] = []
    latencies: list[float] = []
    acked = {s: 0 for s in STREAMS}

    def post(path: str, body, headers=None):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json", **(headers or {})},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read() or b"{}")

    # seed both streams so the alert target exists before the workers start
    for s in STREAMS:
        post("/api/v1/ingest", [{"level": "info", "msg": "seed", "latency_ms": 1}],
             {"x-p-stream": s})
        acked[s] += 1

    # one rolling-window alert so the alert scheduler has real work
    aid = post(
        "/api/v1/alerts",
        {
            "stream": STREAMS[0],
            "aggregate": "count",
            "operator": ">",
            "threshold": 10**9,  # never fires; the EVALUATION is the load
            "evalWindow": "5m",
            "evalFrequency": 1,  # minutes
        },
    )

    rng = random.Random(6)

    def ingester() -> None:
        n = 0
        while not stop.is_set():
            s = STREAMS[n % len(STREAMS)]
            batch = [
                {
                    "level": rng.choice(["info", "warn", "error"]),
                    "msg": f"event {n}-{i}",
                    "latency_ms": rng.randint(1, 1000),
                }
                for i in range(50)
            ]
            try:
                post("/api/v1/ingest", batch, {"x-p-stream": s})
                acked[s] += len(batch)
            except Exception as e:  # noqa: BLE001
                errors.append(f"ingest {s}: {e}")
            n += 1
            stop.wait(0.5)

    def window() -> dict:
        from datetime import datetime, timedelta, timezone

        now = datetime.now(timezone.utc)
        f = lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ")  # noqa: E731
        return {
            "startTime": f(now - timedelta(hours=1)),
            "endTime": f(now + timedelta(minutes=10)),
        }

    def querier() -> None:
        shapes = [
            lambda s: {"query": f"SELECT count(*) AS n FROM {s}", **window()},
            lambda s: {
                "query": f"SELECT level, count(*) AS n FROM {s} "
                "GROUP BY level ORDER BY n DESC",
                **window(),
            },
            lambda s: {
                "query": f"SELECT msg, latency_ms FROM {s} "
                "WHERE level = 'error' AND latency_ms > 500 "
                "ORDER BY latency_ms DESC LIMIT 20",
                **window(),
            },
        ]
        i = 0
        while not stop.is_set():
            s = STREAMS[i % len(STREAMS)]
            shape = shapes[i % len(shapes)]
            t0 = time.perf_counter()
            try:
                post("/api/v1/query", shape(s))
                latencies.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                errors.append(f"query {s}: {e}")
            # metadata route too (counts histogram from manifests)
            if i % 5 == 0:
                try:
                    post(
                        "/api/v1/counts",
                        {"stream": s, "numBins": 4, **window()},
                    )
                except Exception as e:  # noqa: BLE001
                    errors.append(f"counts {s}: {e}")
            i += 1
            stop.wait(1.0)

    # curator corpus: recycled sf0.001 texts with planted exact dups
    # (vs history) and near-dups (in-batch), fresh ids per batch
    base_texts = [
        r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text")
        .limit(40)
        .collect()
    ]
    cur = StreamingCurator(
        spark, os.path.join(root, "curator"), near_dup_history=True,
        # r8: semantic near-dup stage composes in — small split target
        # so IVF cell splits happen during the soak window
        semantic_dup_history=True, ann_n_cells=4,
        semantic_threshold=0.95, ann_split_target=64,
        # r11: compose the pair-work budget — sized to defer on the
        # dup-dense batches (each batch probes a few hundred pair-work
        # units) so the deferral/carry machinery runs under the full
        # concurrent load, while most verdicts still land in-batch
        semantic_pair_budget=400,
    )
    cur.ann.compact_every = 8
    curated_ids: set[int] = set()
    cur_batches = [0]

    def _vec(did: int) -> list[float]:
        import math
        import random as _r

        r = _r.Random(did * 2654435761 % (1 << 31))
        v = [r.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    def _near_vec(ref: int, did: int, eps: float = 0.03) -> list[float]:
        import math

        bv, nz = _vec(ref), _vec(did + 7)
        v = [a + eps * x for a, x in zip(bv, nz)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    _WORDS = (
        "river stone harbor lantern meadow copper falcon timber orchard "
        "saddle anchor barley cinder drift ember flint garnet hollow "
        "ivory juniper kestrel ledger marble nickel otter pebble quarry "
        "russet spruce tundra umber vessel walnut yarrow zephyr basin "
        "cradle dune fjord grove heath inlet knoll lagoon mesa notch"
    ).split()

    def _unique_text(did: int) -> str:
        import random as _r

        r = _r.Random(did * 40503 % (1 << 30))
        words = []
        for k in range(14):
            if k % 4 == 2:
                words.append(("the", "and", "of", "in")[k % 4 - 2 + (k // 4) % 2])
            words.append(r.choice(_WORDS) + (str(did) if k == 7 else ""))
        return " ".join(words)

    def curator_loop() -> None:
        b = 0
        prev_text: str | None = None
        while not stop.is_set():
            rows = []
            for i in range(20):
                did = b * 1000 + i
                emb = _vec(did)
                if i == 18 and prev_text is not None:
                    text = prev_text  # exact repeat of an OLD batch doc
                elif i == 19:
                    text = base_texts[(b * 7) % 40] + " tail"  # near-dup
                elif i == 16:
                    # GENUINELY unique doc (seeded word salad — a shared
                    # template with only digits varying is itself a
                    # cross-batch lexical near-dup at Jaccard 0.4, which
                    # ate the 'unique' docs and starved the semantic
                    # baits; measured 4/49 firing pre-fix). Next batch's
                    # bait refs it, so it must survive to be folded.
                    text = _unique_text(did)
                elif i == 17 and b > 0:
                    # semantic bait: own unique text, near-copy of the
                    # previous batch's unique doc embedding (r8 stage)
                    text = _unique_text(did)
                    emb = _near_vec((b - 1) * 1000 + 16, did)
                else:
                    text = base_texts[(b * 7 + i) % 40] + f" uniq {did}"
                rows.append((did, text, emb))
                curated_ids.add(did)
            prev_text = rows[0][1]
            df = spark.createDataFrame(
                rows, "doc_id bigint, text string, embedding array<double>"
            )
            try:
                cur.process_batch(df, b)
                cur_batches[0] = b + 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"curator batch {b}: {e}")
            b += 1
            stop.wait(8.0)

    threads = [
        threading.Thread(target=f, daemon=True, name=f.__name__)
        for f in (ingester, querier, curator_loop)
    ]
    t_start = time.time()
    for t in threads:
        t.start()
    deadline = t_start + args.minutes * 60
    while time.time() < deadline:
        time.sleep(5)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    api.run_sync()  # final flush so the count check sees everything

    # ---- invariants -------------------------------------------------------
    report: dict = {
        "minutes": args.minutes,
        "queries_run": len(latencies),
        "events_acked": dict(acked),
        "curator_batches": cur_batches[0],
        "errors": errors[:20],
        "n_errors": len(errors),
    }
    failures: list[str] = []
    if errors:
        failures.append(f"{len(errors)} worker errors")

    # 2. acked == queryable
    for s in STREAMS:
        got = post("/api/v1/query", {"query": f"SELECT count(*) AS n FROM {s}", **window()})
        n = got[0]["n"]
        report[f"final_count_{s}"] = n
        if n != acked[s]:
            failures.append(f"{s}: queryable {n} != acked {acked[s]}")

    # 3. curator exactness: kept ⊎ decisions == inputs
    kept_ids = {r["doc_id"] for r in cur.kept().select("doc_id").collect()}
    dec_ids = {r["doc_id"] for r in cur.decisions().select("doc_id").collect()}
    report["curator_kept"] = len(kept_ids)
    report["curator_dropped"] = len(dec_ids)
    if kept_ids & dec_ids:
        failures.append(f"kept ∩ decisions nonempty: {sorted(kept_ids & dec_ids)[:5]}")
    if kept_ids | dec_ids != curated_ids:
        missing = curated_ids - (kept_ids | dec_ids)
        extra = (kept_ids | dec_ids) - curated_ids
        failures.append(f"curator id loss: missing {len(missing)} extra {len(extra)}")

    # 4. indexed ⊆ texts ⊆ kept
    idx_df = cur.lsh.index_df()
    indexed = (
        {r["doc_id"] for r in idx_df.select("doc_id").distinct().collect()}
        if idx_df is not None
        else set()
    )
    tex_df = cur.lsh.texts_df()
    texts = (
        {r["doc_id"] for r in tex_df.select("doc_id").distinct().collect()}
        if tex_df is not None
        else set()
    )
    if not indexed <= texts:
        failures.append(f"indexed ⊄ texts: {sorted(indexed - texts)[:5]}")
    if not texts <= kept_ids:
        failures.append(f"texts ⊄ kept: {sorted(texts - kept_ids)[:5]}")

    # 4b. embedding index (r8): ANN-indexed ⊆ kept; codebook on disk
    ann_df = cur.ann.index_df()
    ann_indexed = (
        {r["doc_id"] for r in ann_df.select("doc_id").distinct().collect()}
        if ann_df is not None
        else set()
    )
    if not ann_indexed <= kept_ids:
        failures.append(f"ann indexed ⊄ kept: {sorted(ann_indexed - kept_ids)[:5]}")
    if not os.path.isdir(os.path.join(root, "curator", "ann", "codebook")):
        failures.append("ann codebook/ missing")
    report["ann_leaves"] = len(cur.ann._centroids or [])
    report["ann_split_parents"] = len(cur.ann._children)
    report["semantic_drops"] = (
        cur.decisions().filter("reason = 'near_duplicate_semantic'").count()
    )
    # r11: with the pair budget composed in, a bait's verdict may land
    # a batch late — then it can't drop the already-kept doc and is
    # surfaced in the late_semantic advisory log instead; both count
    # as the stage firing
    report["late_semantic"] = cur.late_semantic().count()
    # gate, don't just report (r9 review): every batch b >= 1 plants a
    # semantic bait — zero drops over a multi-batch soak means the
    # stage was silently disabled (false green)
    if (
        cur_batches[0] >= 3
        and report["semantic_drops"] + report["late_semantic"] == 0
    ):
        failures.append("semantic stage never fired despite planted baits")

    # 5. manifest ↔ disk, after compaction swaps (+ Delta mirror
    # parity when P_DELTA_LOG is on: the log's replayed state must
    # match the manifest exactly after every WRITE/OPTIMIZE/DELETE
    # transition raced with ingest)
    for s in STREAMS:
        store = api._stores[s]
        if store.delta_log is not None:
            live = set(store.delta_log.live_paths())
            man = {f.file_path for f in store.manifest.files}
            report[f"delta_versions_{s}"] = store.delta_log.latest_version()
            if live != man:
                failures.append(
                    f"{s}: delta live set != manifest "
                    f"(+{len(live - man)}/-{len(man - live)})"
                )
            if store.delta_log.num_records() != store.manifest.total_rows():
                failures.append(f"{s}: delta numRecords != manifest rows")
        if getattr(store, "iceberg", None) is not None:
            # r7: second external mirror (P_ICEBERG=true) — replayed
            # snapshot must equal the manifest file-for-file too
            ice = sorted(store.iceberg.live_paths())
            man_sorted = sorted(f.file_path for f in store.manifest.files)
            report[f"iceberg_version_{s}"] = store.iceberg.current_version()
            if ice != man_sorted:
                failures.append(
                    f"{s}: iceberg live set != manifest "
                    f"(+{len(set(ice) - set(man_sorted))}/-{len(set(man_sorted) - set(ice))})"
                )
            if store.iceberg.num_records() != store.manifest.total_rows():
                failures.append(f"{s}: iceberg numRecords != manifest rows")
        man_rows = 0
        for fstat in store.manifest.files:
            if not os.path.exists(fstat.file_path):
                failures.append(f"{s}: manifest file missing on disk: {fstat.file_path}")
                continue
            man_rows += fstat.num_rows
        disk = [f.file_path for f in store.manifest.files if os.path.exists(f.file_path)]
        if disk:
            actual = spark.read.parquet(*disk).count()
            if actual != man_rows:
                failures.append(f"{s}: manifest rows {man_rows} != disk rows {actual}")
        report[f"manifest_files_{s}"] = len(store.manifest.files)

    # 6. latency distribution
    if latencies:
        xs = sorted(latencies)
        p = lambda q: round(xs[min(len(xs) - 1, int(q * len(xs)))], 3)  # noqa: E731
        report["query_p50_s"], report["query_p99_s"] = p(0.50), p(0.99)
        if report["query_p99_s"] > args.p99_budget:
            failures.append(
                f"query p99 {report['query_p99_s']}s > budget {args.p99_budget}s"
            )

    report["alert_id"] = aid.get("id")
    report["failures"] = failures
    report["ok"] = not failures
    api.stop_maintenance()
    srv.shutdown()
    print(json.dumps(report))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
