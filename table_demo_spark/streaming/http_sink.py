"""Network-boundary upsert sink: an Elasticsearch-style bulk client
plus a local HTTP stub server.

The reference's production sink is a REMOTE Elasticsearch bulk client
(ElasticUpsertTableSink.scala:96-148): documents keyed by ':'-joined
key fields, an action-per-row bulk request, upsert-vs-delete dispatch
on the changelog flag. The in-repo analogs (MemoryUpsertSink /
ParquetUpsertSink) reproduce the contract but never cross a socket —
so retry, idempotent replay, and partial-failure behavior were only
argued, not executed. This module puts a real HTTP boundary in the
path:

- :class:`EsStubServer` — a threaded local HTTP server speaking a
  minimal ES-bulk dialect (NDJSON action/doc pairs on ``POST /_bulk``,
  full dump on ``GET /_search``) with injectable 503 failures;
- :class:`HttpUpsertSink` — the sink client. ``upsert``/``delete``
  build bulk NDJSON and POST with bounded exponential-backoff retry;
  replay safety comes from the same property the real ES sink relies
  on: bulk index/delete are idempotent per document id, so re-sending
  a micro-batch after a crash or timeout converges to the same store.

Scale shape: ``foreach_batch`` posts PER PARTITION from the executors
(``foreachPartition``) — the driver never materializes the batch, and
each executor holds one open connection to the service, exactly how
the Flink ES connector's per-subtask RequestIndexer works. On this
box the "remote" service is a loopback socket; the client code is
byte-for-byte what a remote deployment would run.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

from pyspark.sql import DataFrame

RETRIES = 6
BACKOFF_S = 0.05


class EsStubServer:
    """Local ES-bulk stub: keyed doc store behind a real socket.

    ``fail_next(n)`` makes the next *n* bulk requests return 503
    WITHOUT applying them — the retry/partial-failure injection the
    parquet sinks can't express. Request counters let tests assert
    that retries actually happened on the wire."""

    def __init__(self) -> None:
        store: dict[str, dict] = {}
        state = {"fail": 0, "requests": 0, "applied": 0}
        lock = threading.Lock()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self) -> None:
                if self.path != "/_bulk":
                    self.send_error(404)
                    return
                body = self.rfile.read(int(self.headers["Content-Length"]))
                with lock:
                    state["requests"] += 1
                    if state["fail"] > 0:
                        state["fail"] -= 1
                        self.send_error(503, "injected failure")
                        return
                    lines = [l for l in body.decode().split("\n") if l]
                    i = 0
                    while i < len(lines):
                        action = json.loads(lines[i])
                        if "index" in action:
                            doc = json.loads(lines[i + 1])
                            store[action["index"]["_id"]] = doc
                            i += 2
                        elif "delete" in action:
                            store.pop(action["delete"]["_id"], None)
                            i += 1
                        else:
                            self.send_error(400, f"bad action {action}")
                            return
                    state["applied"] += 1
                payload = b'{"errors": false}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self) -> None:
                if self.path != "/_search":
                    self.send_error(404)
                    return
                with lock:
                    payload = json.dumps(
                        {"hits": [{"_id": k, "_source": v} for k, v in store.items()]}
                    ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._state = state
        self._store = store
        self._lock = lock
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def fail_next(self, n: int) -> None:
        with self._lock:
            self._state["fail"] = n

    @property
    def request_count(self) -> int:
        with self._lock:
            return self._state["requests"]

    @property
    def applied_count(self) -> int:
        with self._lock:
            return self._state["applied"]

    def docs(self) -> dict[str, dict]:
        with self._lock:
            return dict(self._store)

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def _post_bulk(url: str, ndjson: str) -> None:
    """POST with bounded exponential backoff on 5xx / connection
    errors. Safe to retry because every action is keyed (idempotent
    per document id) — the ES sink's replay rule."""
    data = ndjson.encode()
    last: Exception | None = None
    for attempt in range(RETRIES):
        try:
            req = urllib.request.Request(
                f"{url}/_bulk", data=data,
                headers={"Content-Type": "application/x-ndjson"},
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                resp.read()
            return
        except urllib.error.HTTPError as e:
            if e.code < 500:
                raise
            last = e
        except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
            last = e
        time.sleep(BACKOFF_S * (2**attempt))
    raise RuntimeError(f"bulk POST failed after {RETRIES} retries: {last}")


class HttpUpsertSink:
    """ES-style bulk upsert client over the keyed-sink protocol
    (``upsert(rows)`` / ``delete(keys)``; doc id = ':'-joined key
    values, ElasticUpsertTableSink.scala:125)."""

    def __init__(self, url: str, key_cols: tuple[str, ...]):
        self.url = url
        self.key_cols = key_cols

    def doc_id(self, row: dict) -> str:
        return ":".join(str(row[k]) for k in self.key_cols)

    def upsert(self, rows: list[dict]) -> None:
        if not rows:
            return
        lines = []
        for r in rows:
            lines.append(json.dumps({"index": {"_id": self.doc_id(r)}}))
            lines.append(json.dumps(r, default=str))
        _post_bulk(self.url, "\n".join(lines) + "\n")

    def delete(self, keys: list[str]) -> None:
        if not keys:
            return
        lines = [json.dumps({"delete": {"_id": k}}) for k in keys]
        _post_bulk(self.url, "\n".join(lines) + "\n")

    def snapshot(self) -> list[dict]:
        with urllib.request.urlopen(f"{self.url}/_search", timeout=10) as resp:
            hits = json.loads(resp.read())["hits"]
        return [h["_source"] for h in hits]

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        """Executor-side batch application: each PARTITION posts its
        own bulk request directly from the task (foreachPartition) —
        the driver never collects the batch. One request per partition
        per batch; a failed task rerun simply re-posts its idempotent
        actions."""
        url, key_cols = self.url, self.key_cols

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            def post_partition(rows) -> None:
                sink = HttpUpsertSink(url, key_cols)
                sink.upsert([r.asDict() for r in rows])

            batch_df.foreachPartition(post_partition)

        return apply

    def apply_changelog(self, batch_df: DataFrame, batch_id: int) -> None:
        """Drop-in for the parquet sink's changelog entry point, so the
        run_q8-style retract->delete queries can bind this sink
        unchanged."""
        self.foreach_batch_changelog("__op")(batch_df, batch_id)

    def foreach_batch_changelog(
        self, op_col: str = "__op"
    ) -> Callable[[DataFrame, int], None]:
        """Changelog dispatch (ElasticUpsertTableSink.scala:140-147):
        rows flagged 'D' become bulk delete actions on their doc id,
        everything else upserts — posted per partition."""
        url, key_cols = self.url, self.key_cols

        def apply(batch_df: DataFrame, batch_id: int) -> None:
            def post_partition(rows) -> None:
                sink = HttpUpsertSink(url, key_cols)
                ups, dels = [], []
                for r in rows:
                    d = r.asDict()
                    if d.get(op_col) == "D":
                        dels.append(sink.doc_id(d))
                    else:
                        d.pop(op_col, None)
                        ups.append(d)
                sink.upsert(ups)
                sink.delete(dels)

            batch_df.foreachPartition(post_partition)

        return apply
