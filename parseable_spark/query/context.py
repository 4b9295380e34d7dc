"""Log-context — rows surrounding an anchor timestamp.

Reference: src/handlers/http/query_context.rs builds an anchor count
query plus "newer" and "older" page queries (ORDER BY ts DESC/ASC with
LIMIT) and stitches them into one window around the anchor. Same shape
here, tagged by direction; tie-break on a unique id column keeps row
selection deterministic.
"""

from __future__ import annotations


def log_context_sql(
    stream: str,
    time_col: str,
    id_col: str,
    anchor_ts_literal: str,
    n_before: int,
    n_after: int,
    columns: str = "*",
) -> str:
    return f"""
        SELECT * FROM (
            SELECT 'before' AS direction, {columns}
            FROM {stream}
            WHERE {time_col} < {anchor_ts_literal}
            ORDER BY {time_col} DESC, {id_col} DESC
            LIMIT {n_before}
        )
        UNION ALL
        SELECT * FROM (
            SELECT 'after' AS direction, {columns}
            FROM {stream}
            WHERE {time_col} >= {anchor_ts_literal}
            ORDER BY {time_col} ASC, {id_col} ASC
            LIMIT {n_after}
        )
    """
