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
    """One do_get surface over a QueryEngine (airplane.rs:126-248),
    plus cluster-management actions (cluster/mod.rs get_cluster_info /
    fetch_stats_from_ingestors): `info` returns static node metadata,
    `metrics` returns the live stats snapshot, `ping` answers liveness
    (check_liveness probes peers the same way)."""

    def __init__(
        self,
        engine: QueryEngine,
        location: str = "grpc://0.0.0.0:0",
        node_info: dict | None = None,
        metrics_fn=None,
    ):
        if _flight is None:
            raise RuntimeError(f"pyarrow.flight unavailable: {_FLIGHT_ERR}")
        super().__init__(location)
        self.engine = engine
        self.node_info = node_info or {}
        self.metrics_fn = metrics_fn

    def do_get(self, context, ticket):
        req = json.loads(ticket.ticket.decode("utf-8"))
        df = self.engine.query(
            req["query"], req.get("startTime"), req.get("endTime")
        )
        table = df.toArrow()
        return _flight.RecordBatchStream(table)

    def do_action(self, context, action):
        name = action.type
        if name == "ping":
            payload = {"status": "ok"}
        elif name == "info":
            payload = {"status": "ok", **self.node_info}
        elif name == "metrics":
            payload = self.metrics_fn() if self.metrics_fn else {}
        else:
            raise KeyError(f"unknown action {name!r}")
        return iter([_flight.Result(json.dumps(payload).encode("utf-8"))])


def serve(
    engine: QueryEngine,
    port: int = 0,
    node_info: dict | None = None,
    metrics_fn=None,
) -> "FlightQueryServer":
    """Start a Flight server on localhost:port (0 = ephemeral); returns
    the server (server.port gives the bound port; call shutdown() to
    stop)."""
    server = FlightQueryServer(
        engine, f"grpc://0.0.0.0:{port}", node_info=node_info, metrics_fn=metrics_fn
    )
    threading.Thread(target=server.serve, daemon=True).start()
    return server


def node_action(port: int, name: str, timeout: float = 2.0) -> dict:
    """Client helper: invoke a cluster action on a peer node; raises on
    unreachable/dead peers (callers map that to reachable=false)."""
    if _flight is None:
        raise RuntimeError(f"pyarrow.flight unavailable: {_FLIGHT_ERR}")
    client = _flight.connect(f"grpc://localhost:{port}")
    try:
        opts = _flight.FlightCallOptions(timeout=timeout)
        results = list(client.do_action(_flight.Action(name, b""), options=opts))
        return json.loads(results[0].body.to_pybytes()) if results else {}
    finally:
        client.close()


def fetch(port: int, query: str, start: str | None = None, end: str | None = None):
    """Client helper: run a query over Flight, return a pyarrow Table
    (the reference client path: ticket JSON → IPC stream)."""
    if _flight is None:
        raise RuntimeError(f"pyarrow.flight unavailable: {_FLIGHT_ERR}")
    client = _flight.connect(f"grpc://localhost:{port}")
    try:
        ticket_body = {"query": query}
        if start is not None:
            ticket_body["startTime"] = start
        if end is not None:
            ticket_body["endTime"] = end
        ticket = _flight.Ticket(json.dumps(ticket_body).encode("utf-8"))
        return client.do_get(ticket).read_all()
    finally:
        # the querier fan-out calls this once per ingestor per fresh
        # query — an abandoned client leaks a gRPC channel until GC
        client.close()


# --- querier → ingestor fan-out (airplane.rs:155-184) -----------------------


def send_to_ingester(
    start, end, now=None, window_seconds: int = 300
) -> bool:
    """True when the query window [start, end) touches the fresh-staging
    window — events that live only in ingestor memory and haven't been
    synced to the object store yet (reference send_to_ingester,
    src/utils/arrow/flight.rs:112-160; window = STAGING_WINDOW_SECONDS,
    stream_schema_provider.rs:936-958)."""
    from datetime import datetime, timedelta, timezone

    now = now or datetime.now(timezone.utc)
    # normalize awareness to the range's (TimeRange yields aware UTC;
    # tests may pass naive datetimes)
    if end.tzinfo is not None and now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    elif end.tzinfo is None and now.tzinfo is not None:
        now = now.astimezone(timezone.utc).replace(tzinfo=None)
    return end > now - timedelta(seconds=window_seconds) and start <= now


def fetch_fresh_events(spark, ingestor_ports, stream_name: str, start: str, end: str, schema=None):
    """Pull ``select * from `<stream>``` for the window from every
    ingestor over Flight and return one DataFrame (None when no
    ingestor has fresh rows). The stream identifier is backtick-quoted
    (the reference quotes it too, airplane.rs:158) so names that are
    not bare SQL identifiers still resolve. Per-ingestor failures are
    skipped but LOGGED — a silently-dropped fan-out would return stale
    results with no signal (reference `if let Ok(batches)`,
    airplane.rs:173-177)."""
    import logging

    import pyarrow as pa

    log = logging.getLogger(__name__)
    tables = []
    for port in ingestor_ports:
        try:
            t = fetch(port, f"select * from `{stream_name}`", start, end)
        except Exception as e:  # noqa: BLE001 — a dead ingestor must not fail the query
            log.warning(
                "ingestor :%s fetch failed for stream %r: %s", port, stream_name, e
            )
            continue
        if t.num_rows:
            tables.append(t)
    if not tables:
        return None
    merged = pa.concat_tables(tables, promote_options="default")
    pdf = merged.to_pandas()
    if schema is None:
        return spark.createDataFrame(pdf)
    # createDataFrame(pdf, schema) zips pandas columns to schema fields
    # POSITIONALLY — an ingestor whose stream just committed a new or
    # reordered field (exactly the fresh-events case this fan-out
    # exists for) would silently land field B's values in column C, or
    # crash the whole querier query on an Arrow cast. Align by NAME:
    # fields the ingestor doesn't have yet become nulls; drift-only
    # columns the local view doesn't know are dropped (the caller's
    # unionByName would drop them anyway).
    names = [f.name for f in schema.fields]
    for n in names:
        if n not in pdf.columns:
            pdf[n] = None
    pdf = pdf[names]
    return spark.createDataFrame(pdf, schema=schema)


def querier_query(
    engine: QueryEngine,
    stream_name: str,
    local_df,
    sql: str,
    start: str,
    end: str,
    ingestor_ports=(),
    now=None,
):
    """Distributed querier execution (airplane.rs:155-199): when the
    window touches the staging-fresh period, fan out to the ingestors,
    append their fresh events to the local view as temporary events
    (append_temporary_events, utils/arrow/flight.rs:91-110), then run
    the SQL once over the union. Outside the fresh window this is a
    plain local query — no RPCs."""
    from .query.engine import TimeRange

    tr = TimeRange.parse(start, end, now=now)
    df = local_df
    if ingestor_ports and send_to_ingester(tr.start, tr.end, now=now):
        fresh = fetch_fresh_events(
            engine.spark, ingestor_ports, stream_name, start, end, schema=local_df.schema
        )
        if fresh is not None:
            df = local_df.unionByName(fresh, allowMissingColumns=True)
    engine.register_stream(stream_name, df, time_col=engine.time_col)
    try:
        return engine.query(sql, start, end, now=now)
    finally:
        engine.register_stream(stream_name, local_df, time_col=engine.time_col)
