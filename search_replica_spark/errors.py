"""K6: sink-error classification + retry/escalation policy.

Re-expresses the reference's bulk-error taxonomy (reference:
search/errors.go:9-47 — per-item error classes; search/client.go:97-138 —
HTTP 429 → throttle/backoff, 4xx → fatal, 5xx/network → retry;
document_missing_exception on a delete → ignore) for our parquet/lakehouse
sink. Spark already retries TASK failures (spark.task.maxFailures over
idempotent overwrite-mode writes); this module classifies JOB-level
failures the way the reference classifies bulk responses, so the streaming
loop can decide: retry with backoff, ignore, or fail fast.
"""

from __future__ import annotations

import time

from search_replica_spark.sources.code_table import SchemaMismatch

__all__ = [
    "DocumentMissing",
    "SchemaMismatch",
    "SinkThrottled",
    "TransientSinkError",
    "classify",
    "with_retries",
]


class TransientSinkError(RuntimeError):
    """Recoverable sink failure (network blip, 5xx analogue) — retry."""


class SinkThrottled(RuntimeError):
    """Backpressure from the sink (HTTP 429 analogue) — back off, retry."""


class DocumentMissing(KeyError):
    """Delete of a doc that is not in the index (document_missing_exception
    analogue) — a no-op, never an error (reference ignores it)."""


# action names mirror the reference's switch in search/errors.go
RETRY, THROTTLE, IGNORE, FATAL = "retry", "throttle", "ignore", "fatal"

_TRANSIENT_MARKERS = ("connection reset", "timeout", "temporarily unavailable", "eagain")


def classify(err: BaseException) -> str:
    """Map an exception to the reference's four bulk-error actions."""
    if isinstance(err, SchemaMismatch):
        return FATAL  # undecodable input: restarting won't help (config.go:93-108)
    if isinstance(err, DocumentMissing):
        return IGNORE
    if isinstance(err, SinkThrottled):
        return THROTTLE
    if isinstance(err, TransientSinkError | ConnectionError | TimeoutError):
        return RETRY
    if isinstance(err, OSError) and any(m in str(err).lower() for m in _TRANSIENT_MARKERS):
        return RETRY
    return FATAL  # unknown errors escalate, like the reference's default arm


def with_retries(fn, *, max_attempts: int = 4, base_delay: float = 0.05, sleep=time.sleep):
    """Run ``fn()`` under the classify policy: RETRY/THROTTLE → exponential
    backoff (throttle waits double), IGNORE → return None, FATAL → raise.
    Raises the last error once attempts are exhausted (escalation —
    reference: bulk.go gives up after its retry budget)."""
    attempt = 0
    while True:
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — classification IS the handler
            action = classify(e)
            if action == IGNORE:
                return None
            if action == FATAL:
                raise
            attempt += 1
            if attempt >= max_attempts:
                raise
            delay = base_delay * (2 ** (attempt - 1))
            if action == THROTTLE:
                delay *= 2
            sleep(delay)
