"""Kinesis envelope ingestion — un-base64 + flatten the Firehose
record batch.

Parity with the reference's Kinesis source
(src/handlers/http/kinesis.rs:28-120, dispatch at
src/handlers/http/modal/utils/ingest_utils.rs:209-225): a message is
`{"requestId": ..., "timestamp": ms, "records": [{"data": b64}]}`.
Each record's data is base64-decoded JSON; if it nests no deeper than
one level it goes through the cartesian `generic_flattening`
(one event per array element), otherwise it is kept as-is (the
reference's don't-lose-data fallback). Every produced event gains the
envelope's `requestId` and stringified `timestamp`.

Output feeds the normal ingest path (`Stream.ingest` /
`StreamStore.ingest`), so schema inference, V1 coercion, and engine
columns apply identically to Kinesis and HTTP events.
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

    out: list[dict[str, Any]] = []
    for record in records:
        try:
            raw = base64.b64decode(record["data"], validate=True)
            payload = json.loads(raw.decode("utf-8"))
        except (binascii.Error, UnicodeDecodeError, json.JSONDecodeError, KeyError) as e:
            # reference errors out the whole batch on undecodable data
            # (kinesis.rs:101-112)
            raise KinesisError(
                f"failed to decode base64 data for requestId {request_id}"
            ) from e
        if not has_more_than_max_allowed_levels(payload, 1):
            for flat in generic_flattening(payload):
                evt = dict(flat)
                evt["requestId"] = request_id
                evt["timestamp"] = str(timestamp)
                out.append(evt)
        else:
            # deeper nesting: push as-is (kinesis.rs:90-100 fallback)
            out.append(payload)
    return out
