"""HTTP sink family (K3-K6, K11) — ForeachWriter / foreachPartition
push with the reference's retry-and-batch semantics.

Reference: HttpSink.scala:24-196 — exponential backoff
``(2^tries - 1) * 500ms`` capped at 30s, max 5 attempts; configured
success / retry code sets; pseudo-codes -1 (timeout) and -2 (error);
unknown codes drop the record with a log line.
CrashesBatchHttpSink.scala:10-53 — string batcher with
prefix/sep/suffix and flush-at-max.  TestTubeHttpSink.scala:13-18 —
{"enrollment": [row]} wrapper.  AmplitudeHttpSink.scala:24-67 —
byte/count-capped batcher with halve-and-resend on 413.

Uses urllib from the standard library (no external deps); transport
is injectable for tests and for keeping executors network-free in CI.
"""

from __future__ import annotations

import json
import logging
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

TIMEOUT_PSEUDO_CODE = -1
ERROR_PSEUDO_CODE = -2


@dataclass
class HttpSinkConfig:
    max_attempts: int = 5
    base_delay_ms: int = 500
    max_delay_ms: int = 30_000
    connection_timeout_ms: int = 2_000
    read_timeout_ms: int = 5_000
    success_codes: frozenset[int] = frozenset({200})
    retry_codes: frozenset[int] = frozenset(
        {429, 500, 502, 503, 504, TIMEOUT_PSEUDO_CODE, ERROR_PSEUDO_CODE}
    )


def _default_transport(url: str, payload: bytes, headers: dict[str, str], timeout_s: float) -> int:
    req = urllib.request.Request(url, data=payload, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code
    except TimeoutError:
        return TIMEOUT_PSEUDO_CODE
    except Exception:
        return ERROR_PSEUDO_CODE


class HttpSink:
    """K3: single-payload POST with retry/backoff.

    ``transport(url, payload, headers, timeout_s) -> status`` is
    injectable; the default uses urllib.
    """

    def __init__(
        self,
        url: str,
        headers: dict[str, str] | None = None,
        config: HttpSinkConfig | None = None,
        transport=None,
        metrics=None,
    ):
        self.url = url
        self.headers = headers or {"Content-Type": "application/json"}
        self.config = config or HttpSinkConfig()
        self.transport = transport or _default_transport
        # O1: optional accumulator-backed SinkMetrics
        # (observability.py); marks mirror HttpSink.scala:66-71.
        self.metrics = metrics
        self.dropped = 0
        self.retries = 0

    def _mark(self, name: str) -> None:
        if self.metrics is not None:
            self.metrics.mark(name)

    def backoff_ms(self, tries: int) -> int:
        """(2^tries - 1) * 500ms capped at 30s (HttpSink.scala:154-157)."""
        return min((2**tries - 1) * self.config.base_delay_ms, self.config.max_delay_ms)

    def send(self, payload: str | bytes) -> bool:
        body = payload.encode() if isinstance(payload, str) else payload
        cfg = self.config
        timeout_s = (cfg.connection_timeout_ms + cfg.read_timeout_ms) / 1000
        for attempt in range(1, cfg.max_attempts + 1):
            code = self.transport(self.url, body, self.headers, timeout_s)
            if code in cfg.success_codes:
                self._mark("success")
                return True
            if code == 413:
                self._mark("payload_too_large")
            elif code not in cfg.success_codes:
                self._mark("error")
            if code in cfg.retry_codes and attempt < cfg.max_attempts:
                self.retries += 1
                self._mark("retry")
                time.sleep(self.backoff_ms(attempt) / 1000)
                continue
            log.warning("dropping payload after status %s (attempt %d)", code, attempt)
            self.dropped += 1
            self._mark("dropped")
            return False
        self.dropped += 1
        self._mark("dropped")
        return False

    # ForeachWriter protocol (one payload string per row)
    def open(self, partition_id: int, epoch_id: int) -> bool:
        return True

    def process(self, row) -> None:
        self.send(row[0] if not isinstance(row, str) else row)

    def close(self, error) -> None:
        pass


class BatchHttpSink(HttpSink):
    """K5: buffer ``max_batch_size`` strings, join with
    prefix/sep/suffix, flush at capacity and on close
    (CrashesBatchHttpSink.scala:10-53).  Influx: ""/\\n/"";
    OpenTSDB: "["/","/"]"."""

    def __init__(
        self,
        url: str,
        max_batch_size: int = 1,
        prefix: str = "",
        sep: str = "\n",
        suffix: str = "",
        **kwargs,
    ):
        super().__init__(url, **kwargs)
        self.max_batch_size = max_batch_size
        self.prefix, self.sep, self.suffix = prefix, sep, suffix
        self.buffer: list[str] = []

    def process(self, row) -> None:
        self.buffer.append(row[0] if not isinstance(row, str) else row)
        if len(self.buffer) >= self.max_batch_size:
            self.flush()

    def flush(self) -> None:
        if self.buffer:
            self.send(self.prefix + self.sep.join(self.buffer) + self.suffix)
            self.buffer = []

    def close(self, error) -> None:
        self.flush()


class TestTubeHttpSink(HttpSink):
    """K6: wrap each JSON row as {"enrollment": [row]}
    (TestTubeHttpSink.scala:13-18)."""

    def process(self, row) -> None:
        value = row[0] if not isinstance(row, str) else row
        self.send('{"enrollment":[' + value + "]}")


@dataclass
class AmplitudeBatcher:
    """K4 batcher: <= max_events events and <= max_bytes serialized
    bytes per request (AmplitudeHttpSink.scala:43-67).  httpapi
    endpoint caps at 512KB, batch endpoint at 10MB, both at 2000
    events."""

    max_events: int = 2000
    max_bytes: int = 512 * 1024

    def batch(self, events: list[str]) -> list[list[str]]:
        """Maximal prefixes with cumulative 2*len(chars) <= max_bytes
        and count <= max_events (the reference's span predicate,
        AmplitudeHttpSink.scala:54-64, which sizes strings as UTF-16).
        Deviation: a single event larger than max_bytes still forms
        its own batch — the reference's span would loop emitting
        empty batches forever on that input."""
        out: list[list[str]] = []
        current: list[str] = []
        size = 0
        for e in events:
            e_bytes = 2 * len(e)
            if current and (size + e_bytes > self.max_bytes or len(current) >= self.max_events):
                out.append(current)
                current, size = [], 0
            current.append(e)
            size += e_bytes
        if current:
            out.append(current)
        return out


class AmplitudeHttpSink(HttpSink):
    """K4: POST event batches to Amplitude; on 413 split the batch in
    half and resend recursively (AmplitudeHttpSink.scala:153-158).
    Retries are unlimited in the reference (Int.MaxValue) — modeled
    with a large max_attempts."""

    def __init__(self, url: str, api_key: str, batcher: AmplitudeBatcher | None = None, **kwargs):
        kwargs.setdefault("config", HttpSinkConfig(max_attempts=1_000_000))
        super().__init__(url, **kwargs)
        self.api_key = api_key
        self.batcher = batcher or AmplitudeBatcher()

    def send_events(self, events: list[str]) -> None:
        for batch in self.batcher.batch(events):
            self._send_batch(batch)

    def _send_batch(self, batch: list[str]) -> None:
        payload = json.dumps({"api_key": self.api_key, "events": [json.loads(e) for e in batch]})
        code_holder = {}

        def capture(url, body, headers, timeout_s, _t=self.transport):
            code = _t(url, body, headers, timeout_s)
            code_holder["code"] = code
            return code

        original, self.transport = self.transport, capture
        try:
            ok = self.send(payload)
        finally:
            self.transport = original
        if not ok and code_holder.get("code") == 413 and len(batch) > 1:
            mid = len(batch) // 2
            self._send_batch(batch[:mid])
            self._send_batch(batch[mid:])


def push_partitions(
    df,
    sink_factory,
    max_parallel_requests: int = 100,
    min_delay_ms: int = 0,
    key_col: str | None = None,
):
    """K11: batch-mode analog of the foreach sink —
    ``repartition(maxParallelRequests)`` then per-partition push with a
    ``minDelay`` sleep for rate limiting (EventsToAmplitude.scala:
    277-282, CrashPingStreamingBase.scala:141-146).  Effective rate =
    10^3 x max_parallel / min_delay req/s (EventsToAmplitude.scala:
    29-36).  ``key_col`` co-locates a key's rows in one partition so
    one request carries them (R4, Bug 1484819); otherwise round-robin
    (R6).

    ``sink_factory() -> HttpSink`` runs on the executor, so transports
    and metrics must be picklable (SinkMetrics is).
    """
    import pyspark.sql.functions as F  # local: keep module import-light

    if key_col is not None:
        df = df.repartition(max_parallel_requests, F.col(key_col))
    else:
        df = df.repartition(max_parallel_requests)

    def run(rows) -> None:
        sink = sink_factory()
        for row in rows:
            sink.process(row)
        sink.close(None)
        if min_delay_ms:
            time.sleep(min_delay_ms / 1000)

    df.foreachPartition(run)
