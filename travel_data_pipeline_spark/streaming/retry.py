"""T6 — retry/backoff/jitter policy for sink writers.

The reference wraps every crawl and sink call in a tenacity decorator
with bounded exponential backoff plus uniform jitter
(data_sources/retry_utils.py:23-54; budgets at
exchage_rate_crawler.py:450, 490, 541, 579). That is infra, not query
semantics — in the engine the analogue is a `foreachBatch` writer
policy: the micro-batch body retries transient sink failures before
surfacing the error to Structured Streaming's own restart machinery.

Pure-Python, no engine state: wraps any callable, so batch writers can
reuse it too.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import Any


def with_retries(fn: Callable[..., Any], *,
                 attempts: int = 3,
                 backoff_base_s: float = 1.0,
                 backoff_max_s: float = 60.0,
                 jitter_s: float = 0.5,
                 retry_on: tuple[type[BaseException], ...] = (Exception,),
                 sleep: Callable[[float], None] = time.sleep,
                 rng: random.Random | None = None) -> Callable[..., Any]:
    """Return a wrapper around ``fn`` that retries with bounded
    exponential backoff + uniform jitter (retry_utils.py:23-54
    semantics: wait = min(base * 2**(attempt-1), max) + U(0, jitter)).

    Re-raises the final exception after ``attempts`` failures.
    ``sleep``/``rng`` are injectable so tests run without real waits.
    """
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    _rng = rng if rng is not None else random.Random()

    def wrapped(*args: Any, **kwargs: Any) -> Any:
        for attempt in range(1, attempts + 1):
            try:
                return fn(*args, **kwargs)
            except retry_on:
                if attempt == attempts:
                    raise
                wait = min(backoff_base_s * 2 ** (attempt - 1), backoff_max_s)
                sleep(wait + _rng.uniform(0.0, jitter_s))
        raise AssertionError("unreachable")

    return wrapped


def retrying_foreach_batch(writer: Callable[[Any, int], None], *,
                           attempts: int = 3,
                           backoff_base_s: float = 1.0,
                           backoff_max_s: float = 60.0,
                           jitter_s: float = 0.5,
                           sleep: Callable[[float], None] = time.sleep,
                           rng: random.Random | None = None,
                           ) -> Callable[[Any, int], None]:
    """Wrap a foreachBatch `(batch_df, epoch_id)` writer in the retry
    policy. On exhaustion the exception propagates, failing the
    micro-batch — Structured Streaming's checkpoint then replays it on
    restart (at-least-once, converging under an idempotent writer such
    as `foreach_batch_upsert`)."""
    return with_retries(writer, attempts=attempts,
                        backoff_base_s=backoff_base_s,
                        backoff_max_s=backoff_max_s, jitter_s=jitter_s,
                        sleep=sleep, rng=rng)
