"""Delta-log replay cost vs history length (VERDICT r6 next-2 done-bar:
"replay cost measured flat across 10^4 synthetic commits").

Commits N synthetic versions into two logs — one with
checkpoint+cleanup every 10 versions (the mirror's default), one
JSON-only (the pre-r7 behavior) — and times a COLD replay (fresh
DeltaLog) at exponentially growing history points.

Usage:
    python tools/deltalog_probe.py [N]    # default 10000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from dataclasses import dataclass, field

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parseable_spark.storage.deltalog import DeltaLog  # noqa: E402


@dataclass
class FakeStats:
    file_path: str
    num_rows: int = 100
    file_size: int = 1 << 20
    columns: dict = field(default_factory=dict)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out = {"n_commits": n, "series": []}
    base = tempfile.mkdtemp(prefix="deltalog_probe_")
    logs = {
        "checkpointed": DeltaLog(os.path.join(base, "ck")),
        "json_only": DeltaLog(os.path.join(base, "nj")),
    }
    for log in logs.values():
        log.init_table('{"type":"struct","fields":[]}', [])
    files: list[FakeStats] = []
    marks = {n // 100, n // 10, n // 3, n}
    for i in range(1, n + 1):
        files.append(FakeStats(os.path.join(base, f"data/f{i}.parquet")))
        if len(files) > 64:
            files.pop(0)  # rolling live set (retention), realistic mirror
        for name, log in logs.items():
            log.commit_diff(list(files), "WRITE")
            if name == "checkpointed":
                # tombstone retention 0: the probe's interest is replay
                # cost vs HISTORY; with the default 7-day retention the
                # whole synthetic run sits inside the window and the
                # checkpoint carries every remove (bounded by churn in
                # a real deployment, not by history)
                log.maybe_checkpoint(interval=10, tombstone_retention_ms=0)
        if i in marks:
            row = {"commits": i}
            for name, log in logs.items():
                t0 = time.time()
                fresh = DeltaLog(log.table_dir)
                live = len(fresh.live_paths())
                row[f"{name}_cold_replay_s"] = round(time.time() - t0, 3)
                row[f"{name}_json_files"] = len(fresh.versions())
                assert live == len(files)
            out["series"].append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
