"""Livetail — per-stream push channel of fresh batches.

Parity with the reference's livetail broadcast layer
(src/livetail.rs:34-140, src/handlers/livetail.rs:100-144): a global
registry of per-stream pipes; `process()` fans a fresh batch out to
every subscriber; a full (bounded, capacity 1000) pipe drops the batch
and records a `Message::Skipped(num_rows)` marker instead — the reader
sees how many rows it missed, never blocks the ingest path.

Spark mapping: livetail is a driver-side pub-sub on the ingest path
(the reference pushes Arrow RecordBatches before they hit staging; we
push the row lists handed to `Stream.ingest` / foreachBatch). It is
deliberately NOT a distributed operator — at cluster scale the
equivalent is a `readStream` on the ingest topic (see
streaming.ingest.json_file_stream); this class serves the
HTTP-livetail API semantics.
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Iterator

DEFAULT_CAPACITY = 1000  # reference channel bound, src/livetail.rs:115


@dataclass(frozen=True)
class Message:
    """Either a record batch (rows != None) or a skip marker counting
    rows dropped on overflow (reference Message::{Record,Skipped},
    src/livetail.rs:72-76)."""

    rows: list[dict[str, Any]] | None = None
    skipped: int = 0

    @property
    def is_skipped(self) -> bool:
        return self.rows is None


@dataclass
class _Pipe:
    id: str
    stream: str
    capacity: int
    queue: deque = field(default_factory=deque)
    pending_skip: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock)
    closed: bool = False

    def send(self, rows: list[dict[str, Any]]) -> None:
        """Non-blocking send; on overflow count the rows as skipped
        (reference SenderPipe::send, src/livetail.rs:91-98)."""
        with self.lock:
            if self.closed:
                return
            if len(self.queue) >= self.capacity:
                self.pending_skip += len(rows)
            else:
                self.queue.append(rows)

    def recv(self) -> Message | None:
        """Next message, preferring the skip marker like the reference
        receiver which polls the command channel first
        (src/livetail.rs:130-152). None = nothing buffered."""
        with self.lock:
            if self.pending_skip:
                n, self.pending_skip = self.pending_skip, 0
                return Message(rows=None, skipped=n)
            if self.queue:
                return Message(rows=self.queue.popleft())
            return None

    def __iter__(self) -> Iterator[Message]:
        while True:
            msg = self.recv()
            if msg is None:
                return
            yield msg

    def close(self) -> None:
        with self.lock:
            self.closed = True
            self.queue.clear()


class LiveTail:
    """Per-stream registry of subscriber pipes (reference LiveTail,
    src/livetail.rs:37-62)."""

    def __init__(self, capacity: int = DEFAULT_CAPACITY) -> None:
        self._capacity = capacity
        self._pipes: dict[str, list[_Pipe]] = {}
        self._lock = threading.Lock()

    def new_pipe(self, pipe_id: str, stream: str) -> _Pipe:
        pipe = _Pipe(id=pipe_id, stream=stream, capacity=self._capacity)
        with self._lock:
            self._pipes.setdefault(stream, []).append(pipe)
        return pipe

    def process(self, stream: str, rows: list[dict[str, Any]]) -> None:
        """Fan a fresh ingest batch out to every live subscriber
        (reference LiveTail::process, src/livetail.rs:53-61). Closed
        pipes are reaped here — a consumer that close()d its pipe (or
        died) without drop_pipe otherwise stayed registered forever,
        keeping has_subscribers true and pinning up to `capacity`
        buffered batches per abandoned pipe."""
        with self._lock:
            pipes = self._pipes.get(stream, [])
            live = [p for p in pipes if not p.closed]
            if len(live) != len(pipes):
                if live:
                    self._pipes[stream] = live
                else:
                    self._pipes.pop(stream, None)
            pipes = list(live)
        for pipe in pipes:
            pipe.send(rows)

    def drop_pipe(self, pipe_id: str, stream: str) -> None:
        with self._lock:
            pipes = self._pipes.get(stream, [])
            for p in pipes:
                if p.id == pipe_id:
                    p.close()
            self._pipes[stream] = [p for p in pipes if p.id != pipe_id]
            if not self._pipes[stream]:
                del self._pipes[stream]

    def has_subscribers(self, stream: str) -> bool:
        with self._lock:
            return any(not p.closed for p in self._pipes.get(stream, ()))


LIVETAIL = LiveTail()
