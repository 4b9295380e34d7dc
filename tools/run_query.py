"""Run (or EXPLAIN) any registry query by name from the command line.

Usage:
  python tools/run_query.py <query_name> [sf_dir] [--explain] [--limit N]
  python tools/run_query.py --list

Examples:
  python tools/run_query.py q01_pricing_summary
  python tools/run_query.py q14_repetition_filters /root/testdata/sf0.01 --limit 5
  python tools/run_query.py q12_local_supplier_volume --explain
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    from parseable_spark.queries import registry

    specs = registry()
    if "--list" in flags or not args:
        for name, spec in sorted(specs.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {spec.doc.strip().splitlines()[0][:90]}")
        return
    name = args[0]
    if name not in specs:
        sys.exit(f"unknown query {name!r} — try --list")
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    limit = 20
    for f in flags:
        if f.startswith("--limit"):
            limit = int(f.split("=", 1)[1]) if "=" in f else limit

    from parseable_spark.session import get_spark

    spark = get_spark("run-query")
    df = specs[name].fn(spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    else:
        df.show(limit, truncate=False)
        print(f"({df.count()} rows total)")
    spark.stop()


if __name__ == "__main__":
    main()
