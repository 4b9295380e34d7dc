"""q01 headline-vs-warm-repeats attribution (judge r9 #4).

The bench's official q01 number rose r6→r7→r8 (0.509→0.565→0.621)
while its own in-artifact warm repeats stayed flat (~0.33) — the
headline is `warm-run + best-of-3` taken FIRST after session start, so
any cold component that survives more than one execution lands in it.
This probe separates the layers on a fresh session, exactly the
bench's construction order:

1. wall-clock of the registry import (module loading — outside the
   bench's timed region but inside its process);
2. q01 executed 12 times back-to-back, each wall printed — the
   convergence curve shows how many executions the JVM/JIT needs
   before the steady state the variance annex measures;
3. the same 12-run curve for a SECOND query (q05) run afterwards — if
   its first runs are already at steady state, the cold component is
   session-global (JIT/codegen infrastructure), not per-query.

Run on a QUIET box: python tools/coldstart_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.perf_counter()
    from parseable_spark.session import get_spark

    spark = get_spark("coldstart")
    spark.sparkContext.setLogLevel("ERROR")
    session_s = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from parseable_spark.queries import registry

    specs = registry()
    import_s = round(time.perf_counter() - t0, 3)

    spark.range(1).count()  # the bench's warmup line

    out = {"session_s": session_s, "registry_import_s": import_s}
    for name in ("q01_pricing_summary", "q05_date_bin_histogram"):
        series = []
        for _ in range(12):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            series.append(round(time.perf_counter() - t0, 3))
        out[name] = series
        # the bench's headline = min(series[1:4]); steady = min(series[-5:])
        out[f"{name}_headline_equiv"] = min(series[1:4])
        out[f"{name}_steady"] = min(series[-5:])
        print(json.dumps({name: series}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
