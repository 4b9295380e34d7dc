"""Correlation — join two streams on field equality, project selected
fields from each.

Parity with the reference correlation feature (src/correlation.rs:
TableConfig{selected_fields, table_name} + JoinConfig{join_conditions:
[{table_name, field}, ...]}, plan built at :400-418): the product UI
sends two table configs and one join condition pair; the engine builds
an inner equi-join and returns the selected columns, each prefixed with
its table name to avoid collisions.

Spark shape: a plain DataFrame equi-join — Catalyst picks broadcast vs
shuffle-hash vs sort-merge from table statistics, and with AQE on, the
choice is revisited at runtime; nothing to hand-tune here even at
100 TB (the dimension side of a log-correlation is nearly always
broadcastable).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TableConfig:
    table_name: str
    selected_fields: tuple[str, ...]


@dataclass(frozen=True)
class JoinCondition:
    table_name: str
    field: str


def correlate(
    left: DataFrame,
    right: DataFrame,
    left_cfg: TableConfig,
    right_cfg: TableConfig,
    on: tuple[JoinCondition, JoinCondition],
) -> DataFrame:
    """Inner equi-join of two streams with table-prefixed projection.

    Join conditions must actually NAME the two table configs — a typo
    or case drift previously fell through the swap heuristic and
    silently joined on whichever fields remained (r6 review); rejected
    loudly now. Column references are backtick-quoted: OTel-flattened
    streams carry dotted names (`service.name`), which unquoted
    F.col would parse as struct access (same fix as store.scan)."""
    lcond, rcond = on
    names = {lcond.table_name, rcond.table_name}
    if names != {left_cfg.table_name, right_cfg.table_name}:
        raise ValueError(
            f"joinConditions name tables {sorted(names)} but the "
            f"tableConfigs are {sorted([left_cfg.table_name, right_cfg.table_name])}"
        )
    if lcond.table_name != left_cfg.table_name:
        lcond, rcond = rcond, lcond
    a, b = left.alias("l"), right.alias("r")
    joined = a.join(
        b, F.col(f"l.`{lcond.field}`") == F.col(f"r.`{rcond.field}`")
    )
    cols = [
        F.col(f"l.`{f}`").alias(f"{left_cfg.table_name}_{f}")
        for f in left_cfg.selected_fields
    ] + [
        F.col(f"r.`{f}`").alias(f"{right_cfg.table_name}_{f}")
        for f in right_cfg.selected_fields
    ]
    return joined.select(*cols)
