"""Arrow Flight query transport.

Parity with the reference's Flight endpoint
(src/handlers/airplane.rs:126-248): `do_get` takes a ticket JSON
`{"query": sql, "startTime": ..., "endTime": ...}`, executes it through
the same engine as HTTP queries, and streams the result as Arrow IPC.

Spark side: the plan executes distributed, `DataFrame.toArrow()`
(Arrow-native collect, Spark ≥4.0) brings the result to the driver as
one Arrow table, and pyarrow.flight serves it. Results are
API-response-sized (the product surface always aggregates or limits);
bulk data movement stays on the object store, exactly as in the
reference (queriers read parquet directly, Flight carries results
only — airplane.rs fans out *queries*, not data).

Gated import: pyarrow.flight ships with pyarrow but grpc support can be
absent in minimal builds; `serve()` raises a clear error then.
"""

from __future__ import annotations

import json
import threading

try:
    import pyarrow.flight as _flight

    _FLIGHT_ERR = None
except ImportError as e:  # pragma: no cover - flight present in this env
    _flight = None
    _FLIGHT_ERR = e

from .query.engine import QueryEngine


class FlightQueryServer(_flight.FlightServerBase if _flight else object):
    """One do_get surface over a QueryEngine (airplane.rs:126-248)."""

    def __init__(self, engine: QueryEngine, location: str = "grpc://0.0.0.0:0"):
        if _flight is None:
            raise RuntimeError(f"pyarrow.flight unavailable: {_FLIGHT_ERR}")
        super().__init__(location)
        self.engine = engine

    def do_get(self, context, ticket):
        req = json.loads(ticket.ticket.decode("utf-8"))
        df = self.engine.query(
            req["query"], req.get("startTime"), req.get("endTime")
        )
        table = df.toArrow()
        return _flight.RecordBatchStream(table)


def serve(engine: QueryEngine, port: int = 0) -> "FlightQueryServer":
    """Start a Flight server on localhost:port (0 = ephemeral); returns
    the server (server.port gives the bound port; call shutdown() to
    stop)."""
    server = FlightQueryServer(engine, f"grpc://0.0.0.0:{port}")
    threading.Thread(target=server.serve, daemon=True).start()
    return server


def fetch(port: int, query: str, start: str | None = None, end: str | None = None):
    """Client helper: run a query over Flight, return a pyarrow Table
    (the reference client path: ticket JSON → IPC stream)."""
    if _flight is None:
        raise RuntimeError(f"pyarrow.flight unavailable: {_FLIGHT_ERR}")
    client = _flight.connect(f"grpc://localhost:{port}")
    ticket_body = {"query": query}
    if start is not None:
        ticket_body["startTime"] = start
    if end is not None:
        ticket_body["endTime"] = end
    ticket = _flight.Ticket(json.dumps(ticket_body).encode("utf-8"))
    return client.do_get(ticket).read_all()
