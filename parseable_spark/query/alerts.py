"""Alerts — condition tree → WHERE compiler + threshold evaluation.

Reference: src/alerts/alerts_utils.rs:390-424 compiles nested AND/OR
condition groups into a parenthesized WHERE clause; :94-131 wraps one
whitelisted aggregate (COUNT/SUM/MIN/MAX/AVG/COUNT DISTINCT —
src/alerts/alert_enums.rs:297-304) over a rolling window; :269-278
compares the scalar to a threshold and drives a Triggered/NotTriggered
state machine (alert_enums.rs:320-323).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame

# operator whitelist — reference src/alerts/alert_enums.rs:171-202
_OPS = {
    "=": "{col} = {val}",
    "!=": "{col} != {val}",
    ">": "{col} > {val}",
    ">=": "{col} >= {val}",
    "<": "{col} < {val}",
    "<=": "{col} <= {val}",
    "is null": "{col} IS NULL",
    "is not null": "{col} IS NOT NULL",
    "contains": "{col} LIKE {like}",
    "not contains": "{col} NOT LIKE {like}",
    "begins with": "{col} LIKE {prefix}",
    "ends with": "{col} LIKE {suffix}",
    "ilike": "{col} ILIKE {like}",
}

_AGGS = {"count", "count distinct", "sum", "min", "max", "avg"}

_THRESHOLD_OPS = (">", ">=", "<", "<=", "=", "!=")


def _quote_val(v) -> str:
    if isinstance(v, str):
        # backslash FIRST: Spark's default lexer
        # (escapedStringLiterals=false) treats \' as an escaped quote,
        # so quote-doubling alone let a value ending in a backslash
        # swallow the closing quote and smuggle raw SQL past the
        # operator/column whitelist (r7 review, high):
        # "x\\' OR 1=1 --" → 'x\'' OR 1=1 --' parsed as literal x'
        # followed by injected SQL.
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return str(v)
    if v is None:
        # only reachable from IS [NOT] NULL templates (which ignore
        # {val}); comparison operators reject None in to_sql
        return "NULL"
    raise ValueError(f"unsupported condition value: {v!r}")


@dataclass
class Condition:
    column: str
    operator: str
    value: object = None

    def __post_init__(self) -> None:
        # the column is interpolated into generated SQL: restrict it to
        # identifier characters (letters/digits/_/./-), or a space/paren/
        # quote smuggles arbitrary expressions past the per-stream RBAC
        # gate via /counts or alert bodies (review finding). Dots stay
        # allowed for nested-field access; dashes for x-p-* custom
        # fields (those reach filter() fine unquoted in Spark only when
        # backticked by callers — same rule the reference enforces via
        # its column whitelist).
        import re as _re

        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.\-]*", str(self.column)):
            raise ValueError(f"invalid condition column: {self.column!r}")

    def to_sql(self) -> str:
        op = self.operator.lower()
        if op not in _OPS:
            raise ValueError(f"operator not in whitelist: {self.operator}")
        tmpl = _OPS[op]
        if self.value is None and op not in ("is null", "is not null"):
            # a bare None rendered as the token `None` parses as a
            # COLUMN reference: the alert was accepted with 200 and
            # then failed on every scheduler tick (r7 review). Only
            # IS [NOT] NULL accepts an absent value.
            raise ValueError(
                f"operator {self.operator!r} requires a value "
                "(use 'is null' / 'is not null' for null checks)"
            )
        s = str(self.value) if self.value is not None else ""
        # two explicit stages: (1) build the RUNTIME LIKE pattern —
        # backslash is LIKE's escape char, so a literal backslash is
        # \\ and literal %/_ are \%/\_ ; (2) render that pattern as a
        # SQL string literal under Spark's default lexer (backslash
        # doubles again, quotes double). Collapsing the stages (the
        # pre-r7 shape) produced ESC_IN_THE_MIDDLE errors or, worse,
        # lexer escapes that let a trailing backslash swallow the
        # closing quote (r7 review).
        pattern = (
            s.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        )
        esc = pattern.replace("\\", "\\\\").replace("'", "''")
        return tmpl.format(
            col=_backtick(self.column),
            val=_quote_val(self.value),
            like=f"'%{esc}%'",
            prefix=f"'{esc}%'",
            suffix=f"'%{esc}'",
        )


def _backtick(name: str) -> str:
    """Backtick each dot-segment of a validated identifier. The
    identifier regex already bans backticks/quotes/spaces, but a legal
    match like ``a--`` would otherwise open a SQL line comment when
    interpolated bare, and dash columns (``x-p-env``) would parse as
    subtraction — backticking makes both resolve (or fail) as the one
    column name the user actually typed (review finding)."""
    return ".".join(f"`{p}`" for p in str(name).split("."))


@dataclass
class ConditionGroup:
    """Nested AND/OR group — parenthesized like the reference output."""

    logic: str = "AND"  # or "OR"
    children: list = field(default_factory=list)  # Condition | ConditionGroup

    def __post_init__(self) -> None:
        # the logic string is interpolated between conditions verbatim;
        # anything but AND/OR is a SQL injection vector through the
        # alerts and /counts APIs (review finding)
        if str(self.logic).upper() not in ("AND", "OR"):
            raise ValueError(f"condition group operator must be AND or OR: {self.logic!r}")

    def to_sql(self) -> str:
        if not self.children:
            return "TRUE"
        logic = str(self.logic).upper()
        if logic not in ("AND", "OR"):  # mutated after construction
            raise ValueError(f"condition group operator must be AND or OR: {self.logic!r}")
        parts = [c.to_sql() for c in self.children]
        joined = f" {logic} ".join(
            f"({p})" if isinstance(c, ConditionGroup) else p
            for c, p in zip(self.children, parts)
        )
        return joined


class AlertState(str, Enum):
    TRIGGERED = "triggered"
    NOT_TRIGGERED = "not-triggered"


def _validate_identifier(name: str, what: str) -> str:
    """Same interpolation gate as Condition.column: identifier chars
    only, or user input smuggles SQL into the generated query (review
    finding — aggregateColumn could embed a cross-stream subquery)."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_*][A-Za-z0-9_.\-]*", str(name)) or (
        "*" in name and name != "*"
    ):
        raise ValueError(f"invalid {what}: {name!r}")
    return name


@dataclass
class Alert:
    stream: str
    aggregate: str  # e.g. "avg"
    agg_column: str  # e.g. "value" ("*" for count)
    threshold_op: str  # > >= < <= = !=
    threshold: float
    conditions: ConditionGroup | None = None
    state: AlertState = AlertState.NOT_TRIGGERED

    def __post_init__(self) -> None:
        _validate_identifier(self.agg_column, "aggregate column")
        _validate_identifier(self.stream, "stream name")
        # threshold_op/threshold are interpolated into HAVING by
        # grouped_alert_sql and looked up in update_state — an
        # unvalidated op was a 200-on-create/KeyError-on-every-eval
        # trap, and a non-numeric threshold a SQL vector (review)
        if self.threshold_op not in _THRESHOLD_OPS:
            raise ValueError(
                f"threshold operator not in whitelist: {self.threshold_op!r}"
            )
        self.threshold = float(self.threshold)

    def agg_sql(self) -> str:
        a = self.aggregate.lower()
        if a not in _AGGS:
            raise ValueError(f"aggregate not in whitelist: {self.aggregate}")
        col = self.agg_column if self.agg_column == "*" else _backtick(self.agg_column)
        if a == "count distinct":
            return f"count(DISTINCT {col})"
        return f"{a}({col})"

    def to_sql(self) -> str:
        where = f" WHERE {self.conditions.to_sql()}" if self.conditions else ""
        return f"SELECT {self.agg_sql()} AS agg_value FROM {_backtick(self.stream)}{where}"

    def evaluate(self, engine, start: str, end: str, now=None) -> AlertState:
        """Run the rolling-window aggregate and update state (under the
        engine's per-query deadline — a hung job must raise, not wedge
        the caller's thread)."""
        row = engine.execute(self.to_sql(), start, end, now=now)[0]
        return self.update_state(row["agg_value"] or 0.0)

    def update_state(self, value) -> AlertState:
        """Threshold compare → state transition (alert_enums.rs:320-323)."""
        ops = {
            ">": value > self.threshold,
            ">=": value >= self.threshold,
            "<": value < self.threshold,
            "<=": value <= self.threshold,
            "=": value == self.threshold,
            "!=": value != self.threshold,
        }
        self.state = (
            AlertState.TRIGGERED if ops[self.threshold_op] else AlertState.NOT_TRIGGERED
        )
        return self.state


def grouped_alert_sql(
    stream: str,
    aggregate: str,
    agg_column: str,
    group_col: str,
    threshold_op: str,
    threshold: float,
    conditions: ConditionGroup | None = None,
    ndigits: int = 6,
) -> str:
    """Grouped alert evaluation (one threshold check per group)."""
    _validate_identifier(group_col, "group column")
    where = f" WHERE {conditions.to_sql()}" if conditions else ""
    alert = Alert(stream, aggregate, agg_column, threshold_op, threshold)
    agg = alert.agg_sql()
    gcol = _backtick(group_col)
    return (
        f"SELECT {gcol}, round({agg}, {ndigits}) AS agg_value "
        f"FROM {_backtick(stream)}{where} "
        f"GROUP BY {gcol} HAVING {agg} {alert.threshold_op} {alert.threshold}"
    )
