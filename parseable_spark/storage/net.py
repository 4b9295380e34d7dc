"""Transient-failure retry for the object-store HTTP clients.

The reference delegates storage I/O to the object_store crate, whose
clients retry 5xx/429 responses and connection failures with
exponential backoff by default (object_store RetryConfig; the
reference never configures it off). The native S3/Azure/GCS clients
here funnel every operation through one ``_request`` — this helper
gives them the same discipline. It matters at scale, not in tests: a
flush cycle uploads thousands of objects, and without retries a single
transient 503 (routine on hot buckets) fails the whole sync.

Retrying PUT/DELETE is safe here: every object write in this codebase
is a whole-object put of immutable content (manifests are versioned
files, parquet parts are content-addressed names), so a duplicate
apply is idempotent.
"""

from __future__ import annotations

import time
import urllib.error
from typing import Callable, TypeVar

T = TypeVar("T", bound=tuple)

RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def with_retries(
    attempt: Callable[[], T],
    attempts: int = 4,
    base_delay: float = 0.25,
    retryable: frozenset[int] = RETRYABLE_STATUSES,
) -> T:
    """Run ``attempt`` (returning a tuple whose FIRST element is the
    HTTP status) with exponential backoff on retryable statuses and on
    connection-level failures (URLError / timeout / reset). The final
    attempt's result is returned as-is — callers keep their own
    status-to-error mapping — and the final connection error is
    re-raised. HTTPError must be converted to a status tuple INSIDE
    ``attempt`` (all three clients do); one that escapes is a
    programming error and propagates immediately rather than being
    retried as a connection failure (a 403 must never loop)."""
    last_exc: Exception | None = None
    last_res: T | None = None
    for i in range(max(1, int(attempts))):
        if i:
            time.sleep(min(base_delay * (2 ** (i - 1)), 4.0))
        try:
            last_res = attempt()
            last_exc = None
        except urllib.error.HTTPError:
            raise
        except (TimeoutError, ConnectionError, urllib.error.URLError, OSError) as e:
            last_exc = e
            continue
        if last_res[0] not in retryable:
            return last_res
    if last_exc is not None:
        raise last_exc
    return last_res  # retryable status on the final attempt
