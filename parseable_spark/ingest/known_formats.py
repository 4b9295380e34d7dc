"""Known-format text extraction — regex field extraction from raw lines.

Reference: src/event/format/known_schema.rs (30-235) drives 53 formats
from resources/formats.json: each format is a list of patterns with
named capture groups; check_or_extract() short-circuits when the
fields already exist, else tries each pattern and merges captures,
setting p_format / p_format_verified. Same engine here with a
fresh set of canonical formats (apache/nginx access, syslog, logfmt,
java stack traces, python logging); new formats register at runtime.

At scale this runs as a Catalyst `regexp_extract` projection when a
stream is bound to one format — see `spark_extract_columns` — and as a
pre-ingest Python transform on the multi-format detection path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class Pattern:
    pattern: re.Pattern | None
    fields: set[str]


@dataclass
class SchemaDefinition:
    name: str
    patterns: list[Pattern] = field(default_factory=list)

    def check_or_extract(self, obj: dict, extract_log: str | None = "body") -> set[str] | None:
        """Reference check_or_extract (known_schema.rs:92-150):
        1) all fields already present → verified without extraction;
        2) else run each pattern against obj[extract_log]."""
        for p in self.patterns:
            if p.fields and all(f in obj for f in p.fields):
                return set(p.fields)
        raw = obj.get(extract_log) if extract_log else None
        if not isinstance(raw, str):
            return None
        for p in self.patterns:
            if p.pattern is None:
                continue
            m = p.pattern.search(raw)
            if not m:
                continue
            extracted = {
                k: v
                for k, v in m.groupdict().items()
                if v is not None
                and (
                    k in p.fields
                    # `<name>_bare` groups are alternation plumbing (one
                    # group per quoted/unquoted alternative)
                    or (k.endswith("_bare") and k[: -len("_bare")] in p.fields)
                )
            }
            for k in [k for k in extracted if k.endswith("_bare")]:
                extracted.setdefault(k[: -len("_bare")], extracted.pop(k))
            if extracted:
                obj.update(extracted)
                return set(extracted)
        return None


# canonical formats (named capture groups, python regex syntax)
_BUILTIN = {
    "apache_access": [
        (
            r'^(?P<c_ip>\S+) \S+ (?P<cs_username>\S+) \[(?P<timestamp>[^\]]+)\] '
            r'"(?P<cs_method>[A-Z]+) (?P<cs_uri>\S+) (?P<cs_protocol>[^"]+)" '
            r"(?P<sc_status>\d{3}) (?P<sc_bytes>\d+|-)",
            {"c_ip", "cs_username", "timestamp", "cs_method", "cs_uri", "cs_protocol", "sc_status", "sc_bytes"},
        )
    ],
    "nginx_error": [
        (
            r"^(?P<timestamp>\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) "
            r"\[(?P<level>\w+)\] (?P<pid>\d+)#(?P<tid>\d+): (?P<message>.*)",
            {"timestamp", "level", "pid", "tid", "message"},
        )
    ],
    "syslog": [
        (
            r"^(?P<timestamp>\w{3}\s+\d{1,2} \d{2}:\d{2}:\d{2}) (?P<host>\S+) "
            r"(?P<process>[\w\-/.]+)(?:\[(?P<pid>\d+)\])?: (?P<message>.*)",
            {"timestamp", "host", "process", "pid", "message"},
        )
    ],
    "logfmt": [
        (
            # quoted msg captures to the closing quote; unquoted msg is
            # one token (\S+) — [^"]* had no delimiter and swallowed the
            # rest of the line including later key=value pairs (review
            # finding, verified by execution)
            r'^(?=.*\blevel=(?P<level>\w+))(?=.*\bmsg=(?:"(?P<message>[^"]*)"'
            r"|(?P<message_bare>\S+)))"
            r"(?=.*\bts=(?P<timestamp>\S+))?.*$",
            {"level", "message", "timestamp"},
        )
    ],
    "python_logging": [
        (
            r"^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) - "
            r"(?P<logger>[\w.]+) - (?P<level>\w+) - (?P<message>.*)",
            {"timestamp", "logger", "level", "message"},
        )
    ],
    "nginx_access": [
        (
            r'^(?P<remote_addr>\S+) - (?P<remote_user>\S+) \[(?P<timestamp>[^\]]+)\] '
            r'"(?P<request>[^"]*)" (?P<status>\d{3}) (?P<body_bytes_sent>\d+) '
            r'"(?P<http_referer>[^"]*)" "(?P<http_user_agent>[^"]*)"',
            {"remote_addr", "remote_user", "timestamp", "request", "status",
             "body_bytes_sent", "http_referer", "http_user_agent"},
        )
    ],
    "log4j": [
        (
            r"^(?P<timestamp>\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}[.,]\d{3}) "
            r"\[(?P<thread>[^\]]+)\] (?P<level>[A-Z]+)\s+(?P<logger>[\w.$]+) - (?P<message>.*)",
            {"timestamp", "thread", "level", "logger", "message"},
        )
    ],
    "klog": [
        (
            r"^(?P<level>[IWEF])(?P<timestamp>\d{4} \d{2}:\d{2}:\d{2}\.\d{6})\s+"
            r"(?P<pid>\d+) (?P<src_file>[\w.]+):(?P<src_line>\d+)\] (?P<message>.*)",
            {"level", "timestamp", "pid", "src_file", "src_line", "message"},
        )
    ],
    "haproxy": [
        (
            r"^(?P<timestamp>\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}) (?P<host>\S+) "
            r"haproxy\[(?P<pid>\d+)\]: (?P<client_ip>[\d.]+):(?P<client_port>\d+) "
            r"\[(?P<accept_date>[^\]]+)\] (?P<frontend>\S+) (?P<backend>\S+) (?P<message>.*)",
            {"timestamp", "host", "pid", "client_ip", "client_port",
             "accept_date", "frontend", "backend", "message"},
        )
    ],
    "redis": [
        (
            r"^(?P<pid>\d+):(?P<role>[XCSM]) (?P<timestamp>\d{1,2} \w{3} \d{4} "
            r"\d{2}:\d{2}:\d{2}\.\d{3}) (?P<level>[.\-*#]) (?P<message>.*)",
            {"pid", "role", "timestamp", "level", "message"},
        )
    ],
    "postgres": [
        (
            r"^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3} \w+) "
            r"\[(?P<pid>\d+)\] (?P<level>[A-Z]+):\s+(?P<message>.*)",
            {"timestamp", "pid", "level", "message"},
        )
    ],
    "rails": [
        (
            r"^(?P<level>[DIWEF]), \[(?P<timestamp>[^ \]]+) #(?P<pid>\d+)\]\s+"
            r"(?P<severity>\w+) -- (?P<progname>[^:]*): (?P<message>.*)",
            {"level", "timestamp", "pid", "severity", "progname", "message"},
        )
    ],
    "aws_alb": [
        (
            r"^(?P<request_type>\S+) (?P<timestamp>\S+) (?P<elb>\S+) "
            r"(?P<client_ip>[\d.]+):(?P<client_port>\d+) (?P<target>\S+) "
            r"(?P<request_processing_time>[\d.\-]+) (?P<target_processing_time>[\d.\-]+) "
            r"(?P<response_processing_time>[\d.\-]+) (?P<elb_status_code>\d+|-) (?P<message>.*)",
            {"request_type", "timestamp", "elb", "client_ip", "client_port", "target",
             "request_processing_time", "target_processing_time",
             "response_processing_time", "elb_status_code", "message"},
        )
    ],
    "go_glog": [
        (
            r"^(?P<level>[IWEF])(?P<month>\d{2})(?P<day>\d{2}) "
            r"(?P<timestamp>\d{2}:\d{2}:\d{2}\.\d{6})\s+(?P<tid>\d+) "
            r"(?P<src_file>[\w.]+):(?P<src_line>\d+)\] (?P<message>.*)",
            {"level", "month", "day", "timestamp", "tid", "src_file", "src_line", "message"},
        )
    ],
    "docker_json": [
        (
            r'^\{"log":"(?P<message>(?:[^"\\]|\\.)*)","stream":"(?P<stream>\w+)",'
            r'"time":"(?P<timestamp>[^"]+)"\}',
            {"message", "stream", "timestamp"},
        )
    ],
}


class EventProcessor:
    """Format registry + per-event extraction (known_schema.rs:154-235)."""

    def __init__(self):
        self.schema_definitions: dict[str, SchemaDefinition] = {}
        for name, patterns in _BUILTIN.items():
            for pat, fields in patterns:
                self.add_format(name, pat, fields)
        # the full 53-name reference surface (resources/formats.json names)
        from parseable_spark.ingest.format_library import register_all

        register_all(self)

    def add_format(
        self, name: str, pattern: str | None, fields: set[str], prepend: bool = False
    ) -> None:
        sd = self.schema_definitions.setdefault(name, SchemaDefinition(name))
        p = Pattern(re.compile(pattern) if pattern else None, set(fields))
        if prepend:
            sd.patterns.insert(0, p)
        else:
            sd.patterns.append(p)

    def extract_from_inline_log(
        self, record: dict, log_source: str, extract_log: str | None = "body"
    ) -> dict:
        """Extract fields in place; stamps p_format + p_format_verified
        (reference ingest_utils sets these meta columns)."""
        if log_source not in self.schema_definitions:
            raise KeyError(f"Unsupported log format: '{log_source}'")
        extracted = self.schema_definitions[log_source].check_or_extract(record, extract_log)
        record["p_format"] = log_source
        record["p_format_verified"] = extracted is not None
        return record

    def detect(self, record: dict, extract_log: str | None = "body") -> str | None:
        """Try every format; the match extracting the most fields wins
        (generic timestamp+body formats lose to specific ones; name
        sort breaks ties for determinism)."""
        best: tuple[int, str, dict] | None = None
        for name in sorted(self.schema_definitions):
            probe = dict(record)
            got = self.schema_definitions[name].check_or_extract(probe, extract_log)
            if got and (best is None or len(got) > best[0]):
                best = (len(got), name, probe)
        if best is None:
            return None
        _, name, probe = best
        record.update(probe)
        record["p_format"] = name
        record["p_format_verified"] = True
        return name


def load_formats_json(
    path: str, processor: "EventProcessor | None" = None
) -> "EventProcessor":
    """Load a formats.json-shaped resource (the reference's
    resources/formats.json layout: [{name, regex: [{pattern?, fields}]}]
    with Rust `(?<g>…)` group syntax) into a processor at runtime —
    known_schema.rs:61-70 does the same at startup. Patterns that use
    regex features Python lacks are registered fields-only (the
    fields-already-present verification path still works for them)."""
    import json as _json

    proc = processor or EventProcessor()
    with open(path) as f:
        formats = _json.load(f)
    for fmt in formats:
        for rx in fmt.get("regex", []):
            pattern = rx.get("pattern")
            if pattern is not None:
                pattern = pattern.replace("(?<", "(?P<").replace("(?P<=", "(?<=").replace(
                    "(?P<!", "(?<!"
                )
                try:
                    re.compile(pattern)
                except re.error:
                    pattern = None  # fields-only registration
            proc.add_format(fmt["name"], pattern, set(rx.get("fields", [])))
    return proc


KNOWN_SCHEMA_LIST = EventProcessor()


def spark_extract_columns(
    raw: Column, format_name: str, processor: EventProcessor | None = None
) -> list[Column]:
    """Columnar path: regexp_extract per field, fully JVM-side — the
    scan-time equivalent of check_or_extract for single-format streams.

    Mirrors the Python path's semantics exactly (r6 review — it
    previously used only the FIRST pattern, so lines matching a later
    variant extracted all-empty columns, and `*_bare` alternation
    groups were skipped, so e.g. unquoted logfmt msg= values never
    populated `message`): every pattern is tried in declaration order
    (first matching pattern wins, like check_or_extract), and a field
    with a `<field>_bare` alternation twin takes whichever group
    participated in the match."""
    proc = processor or KNOWN_SCHEMA_LIST
    sd = proc.schema_definitions[format_name]
    pats = [p for p in sd.patterns if p.pattern is not None]
    field_order: list[str] = []
    per_pattern: list[tuple] = []  # (match-predicate, {field: Column})
    for pat in pats:
        # Java group names reject underscores, so strip the python
        # (?P<name>…) syntax down to plain groups — extraction is by
        # group index.
        jp = re.sub(r"\(\?P<[^>]+>", "(", pat.pattern.pattern)
        order = _group_order(pat.pattern)
        idx = {name: i for i, name in enumerate(order, start=1)}
        exprs: dict[str, Column] = {}
        for name in order:
            if name not in pat.fields:
                continue
            e = F.regexp_extract(raw, jp, idx[name])
            bare = f"{name}_bare"
            if bare in idx:
                be = F.regexp_extract(raw, jp, idx[bare])
                e = F.when(e != "", e).otherwise(be)
            exprs[name] = e
            if name not in field_order:
                field_order.append(name)
        per_pattern.append((raw.rlike(jp), exprs))
    cols = []
    for name in field_order:
        expr = None
        for cond, exprs in per_pattern:
            if name not in exprs:
                continue
            expr = (
                F.when(cond, exprs[name])
                if expr is None
                else expr.when(cond, exprs[name])
            )
        cols.append(expr.otherwise(F.lit("")).alias(name))
    return cols


def _group_order(compiled: re.Pattern) -> list[str]:
    by_index = {v: k for k, v in compiled.groupindex.items()}
    return [by_index.get(i, f"_g{i}") for i in range(1, compiled.groups + 1)]
