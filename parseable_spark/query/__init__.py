"""Query surface: engine + generated-SQL product APIs.

The reference's product endpoints (counts, alerts, traces, log-context,
field stats) all compile to SQL strings executed by the same engine
(SURVEY.md §3.3). We keep that architecture: every module here emits
Spark SQL run through QueryEngine, which applies the reference's
time-filter-injection semantics before execution.
"""

from .engine import QueryEngine

__all__ = ["QueryEngine"]
