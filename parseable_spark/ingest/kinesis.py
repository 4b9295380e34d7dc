"""Kinesis envelope ingestion — un-base64 + flatten the Firehose
record batch.

Parity with the reference's Kinesis source
(src/handlers/http/kinesis.rs:28-120, dispatch at
src/handlers/http/modal/utils/ingest_utils.rs:209-225): a message is
`{"requestId": ..., "timestamp": ms, "records": [{"data": b64}]}`.
Each record's data is base64-decoded JSON; if it nests no deeper than
one level it goes through the cartesian `generic_flattening`
(one event per array element) and gains the envelope's `requestId` +
stringified `timestamp`; otherwise it is kept as-is, UNMODIFIED — the
reference's don't-lose-data fallback pushes the deep value without
the envelope stamp (kinesis.rs:88-99), and we match it exactly.

Output feeds the normal ingest path (`Stream.ingest` /
`StreamStore.ingest`), so schema inference, V1 coercion, and engine
columns apply identically to Kinesis and HTTP events. The HTTP server
dispatches here on `x-p-log-source: kinesis` (ingest_utils.rs:209-225
parity; r6 review — the module was previously dead code).
"""

from __future__ import annotations

import base64
import binascii
import json
from typing import Any

from .flatten import generic_flattening, has_more_than_max_allowed_levels


class KinesisError(ValueError):
    pass


def flatten_kinesis_logs(message: dict[str, Any]) -> list[dict[str, Any]]:
    """Decode one Kinesis/Firehose HTTP delivery into flat event dicts
    (reference flatten_kinesis_logs, kinesis.rs:62-120)."""
    try:
        records = message["records"]
        request_id = message["requestId"]
        timestamp = message["timestamp"]
    except (KeyError, TypeError) as e:
        raise KinesisError(f"malformed Kinesis message: missing {e}") from e
    if not isinstance(records, list):
        raise KinesisError("malformed Kinesis message: records must be a list")

    out: list[dict[str, Any]] = []
    for record in records:
        try:
            raw = base64.b64decode(record["data"], validate=True)
            payload = json.loads(raw.decode("utf-8"))
        except (
            binascii.Error,
            UnicodeDecodeError,
            json.JSONDecodeError,
            KeyError,
            TypeError,  # non-dict record entry ("abc") — r6 review:
            # raised a bare TypeError → HTTP 500 instead of the 400 the
            # KinesisError contract provides
        ) as e:
            # reference errors out the whole batch on undecodable data
            # (kinesis.rs:101-112)
            raise KinesisError(
                f"failed to decode base64 data for requestId {request_id}"
            ) from e
        if not isinstance(payload, (dict, list)):
            # valid JSON but a bare scalar ('5') — generic_flattening
            # would yield non-dict items and dict(flat) crashed with
            # TypeError (r6 review). The events contract is objects.
            raise KinesisError(
                f"record data for requestId {request_id} is not a JSON object"
            )
        if not has_more_than_max_allowed_levels(payload, 1):
            for flat in generic_flattening(payload):
                if not isinstance(flat, dict):
                    raise KinesisError(
                        f"record data for requestId {request_id} is not a JSON object"
                    )
                evt = dict(flat)
                evt["requestId"] = request_id
                evt["timestamp"] = str(timestamp)
                out.append(evt)
        else:
            # deeper nesting: push as-is, UNMODIFIED — the reference's
            # explicit don't-lose-data fallback (kinesis.rs:88-99:
            # "without flattening or modifying it"); deep events carry
            # no envelope stamp, by parity
            out.append(payload)
    return out
