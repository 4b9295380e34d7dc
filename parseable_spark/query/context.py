"""Log-context — rows surrounding an anchor timestamp.

Reference: src/handlers/http/query_context.rs builds an anchor count
query plus "newer" and "older" page queries (ORDER BY ts DESC/ASC with
LIMIT, tie-broken on the request's match fields —
build_log_context_order_by, :836-862) and stitches them into one
window around the anchor. Same shape here, tagged by direction;
`id_expr` is the tie-break (the server passes a whole-row hash, so
equal-timestamp rows — the common case, since one ingest batch shares
one p_timestamp — page deterministically; r6 review: it previously
received the time column itself, a vacuous ORDER BY ts, ts).

The direction tag uses a dunder name so it can never collide with a
stream column called `direction` (only p_timestamp/date/hour/minute
are reserved at ingest; a real `direction` field was silently
clobbered and then popped out of every record — r6 review).
"""

from __future__ import annotations

DIRECTION_TAG = "__ctx_direction"


def log_context_sql(
    stream: str,
    time_col: str,
    id_expr: str,
    anchor_ts_literal: str,
    n_before: int,
    n_after: int,
    columns: str = "*",
) -> str:
    # the tie-break is PROJECTED then ordered by name: star expressions
    # (struct(*)) are legal in a Project but rejected inside a Sort
    return f"""
        SELECT * EXCEPT (__ctx_tiebreak) FROM (
            SELECT 'before' AS {DIRECTION_TAG}, {columns},
                   {id_expr} AS __ctx_tiebreak
            FROM {stream}
            WHERE {time_col} < {anchor_ts_literal}
            ORDER BY {time_col} DESC, __ctx_tiebreak DESC
            LIMIT {n_before}
        )
        UNION ALL
        SELECT * EXCEPT (__ctx_tiebreak) FROM (
            SELECT 'after' AS {DIRECTION_TAG}, {columns},
                   {id_expr} AS __ctx_tiebreak
            FROM {stream}
            WHERE {time_col} >= {anchor_ts_literal}
            ORDER BY {time_col} ASC, __ctx_tiebreak ASC
            LIMIT {n_after}
        )
    """
