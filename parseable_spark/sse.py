"""Server-sent-events broadcaster — live alert push to UI sessions.

Parity with the reference's SSE layer (src/sse/mod.rs): a Broadcaster
keeps per-session client channels, `new_client` registers a connection
and immediately sends a ``connected`` data frame (sse/mod.rs:105-126),
a 10-second ping sweep drops unresponsive clients (sse/mod.rs:65-103),
and `broadcast` fans a JSON message out to a session subset
(sse/mod.rs:138-176). Alert evaluation broadcasts an ``alertEvent``
message — ``{criticality, message: {alertEvent: {id, state, name}},
tenantId}`` (SSEEvent/SSEAlertInfo, sse/mod.rs:199-245) — to every
active session whose principal is authorized for the alert's stream
(alerts/mod.rs:711-751 collects sessions via user_auth_for_alert_config
and broadcasts only when the alert is Triggered).

Transport shape here: each client is a bounded queue drained by the
HTTP handler thread serving ``GET /api/v1/sse`` as
``text/event-stream``. Sends are non-blocking with skip-on-overflow —
the livetail discipline — so one slow browser can never stall alert
evaluation; the reference gets the same property from its bounded
mpsc channel (sse/mod.rs:107 ``mpsc::channel(10)``).

Driver-side control plane only: nothing here touches executors, so the
broadcaster costs the same at 100 TB as at 100 MB.
"""

from __future__ import annotations

import json
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable


@dataclass
class SseClient:
    """One connected event-stream consumer (session-authenticated)."""

    session_id: str
    principal: str
    q: "queue.Queue[tuple[str, str]]" = field(
        default_factory=lambda: queue.Queue(maxsize=64)
    )
    alive: bool = True


def alert_event(
    alert_id: str,
    state: str,
    name: str,
    criticality: str = "error",
    tenant: str | None = None,
) -> dict[str, Any]:
    """SSEEvent::AlertEvent payload (sse/mod.rs:199-231, camelCase
    serde rename)."""
    return {
        "criticality": criticality,
        "message": {"alertEvent": {"id": alert_id, "state": state, "name": name}},
        "tenantId": tenant,
    }


class SseBroadcaster:
    """Registry of connected SSE clients + fan-out (sse/mod.rs
    Broadcaster)."""

    def __init__(self) -> None:
        self._clients: list[SseClient] = []
        self._lock = threading.Lock()

    def register(self, session_id: str, principal: str) -> SseClient:
        """Register a client; the first frame is the reference's
        ``connected`` data event (sse/mod.rs:113)."""
        c = SseClient(session_id, principal)
        c.q.put(("data", "connected"))
        with self._lock:
            self._clients.append(c)
        return c

    def unregister(self, client: SseClient) -> None:
        client.alive = False
        with self._lock:
            try:
                self._clients.remove(client)
            except ValueError:
                pass

    def sessions(self) -> list[str]:
        """Active session ids (sse/mod.rs fetch_sessions)."""
        with self._lock:
            return [c.session_id for c in self._clients]

    def broadcast(
        self,
        payload: dict[str, Any],
        allow: Callable[[str], bool] | None = None,
        sessions: Iterable[str] | None = None,
    ) -> int:
        """Fan one JSON message out; `allow` filters by principal (the
        per-session authorization gate of alerts/mod.rs:726-733),
        `sessions` optionally restricts to specific session ids
        (sse/mod.rs broadcast(sessions: Option<&[Ulid]>)). Returns the
        number of clients the message was enqueued to. Never blocks:
        a full client queue skips (slow consumer can't stall alerts)."""
        msg = json.dumps(payload)
        wanted = set(sessions) if sessions is not None else None
        with self._lock:
            targets = list(self._clients)
        n = 0
        for c in targets:
            if not c.alive:
                continue
            if wanted is not None and c.session_id not in wanted:
                continue
            if allow is not None:
                try:
                    if not allow(c.principal):
                        continue
                except Exception:  # noqa: BLE001 — an authz lookup that
                    # raises (e.g. a principal deleted mid-broadcast)
                    # must fail CLOSED for this client, not abort the
                    # fan-out for everyone after it and propagate into
                    # alert evaluation (r8 review)
                    continue
            try:
                c.q.put_nowait(("data", msg))
                n += 1
            except queue.Full:
                pass
        return n

    def ping(self) -> None:
        """Enqueue a comment ping to every client (sse/mod.rs ping
        sweep); handler threads that fail to WRITE it drop the
        client, which is the stale-removal path."""
        with self._lock:
            targets = list(self._clients)
        for c in targets:
            try:
                c.q.put_nowait(("comment", "ping"))
            except queue.Full:
                pass


class SseAlertTarget:
    """Notification target adapter: broadcasts an alertEvent when the
    alert transitions to Triggered (alerts/mod.rs:735-751 broadcasts
    only for AlertState::Triggered; other transitions stay
    target-only). Sits in ScheduledAlert.targets so it inherits the
    mute gate (update_notification_state) exactly like HTTP targets."""

    def __init__(
        self,
        broadcaster: SseBroadcaster,
        alert_id: str,
        name: str,
        allow: Callable[[str], bool] | None = None,
        tenant: str | None = None,
    ) -> None:
        self.broadcaster = broadcaster
        self.alert_id = alert_id
        self.name = name
        self.allow = allow
        self.tenant = tenant

    def notify(self, alert, state, value) -> None:
        if getattr(state, "value", state) != "triggered":
            return
        self.broadcaster.broadcast(
            alert_event(self.alert_id, "triggered", self.name, tenant=self.tenant),
            allow=self.allow,
        )


def format_frame(kind: str, text: str) -> bytes:
    """Wire format for one SSE frame: ``data: …`` events and ``: …``
    comments (the ping), each terminated by a blank line."""
    if kind == "comment":
        return f": {text}\n\n".encode()
    return f"data: {text}\n\n".encode()
