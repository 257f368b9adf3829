"""BlockNotify — the reference's block-head feed, driver-side.

Reference shape (/root/reference/eth_event_stream/src/data_feed/block.rs:22-68):
subscribe to WebSocket ``newHeads``, broadcast the current block number to
every subscriber over a ``tokio::sync::watch`` channel (data_feed/pubsub.rs:
5-29 — late joiners immediately see the latest value), reconnect forever
with exponential backoff (block.rs:25-26: 10 ms base, 5 attempts per
connect round).

Spark disposition: on the micro-batch execution model the engine's own
trigger loop polls ``latestOffset()`` (sources/block_source.py:287-301), so
a push feed cannot make BATCHES start earlier — trigger cadence bounds
ingest latency regardless. What a head feed IS for here is DRIVER-SIDE
orchestration, the same role the reference's consumers use it for:

- ``wait_for(target)`` — block until the chain reaches a height (the B5
  barrier at head level: start a bounded drain once the range is minable);
- ``latest()`` — a monotonic head reading shared by many consumers without
  each issuing RPC calls (one poll thread serves N subscribers, exactly the
  single-WS-connection fan-out of the reference);
- choosing/adapting trigger intervals from observed block cadence.

Transport is an ``eth_blockNumber`` poll thread rather than a WebSocket
subscription: the WS push would save one HTTP round-trip per poll tick but
changes nothing downstream (both deliver "the head is now H" into the same
watch state), and poll works against any HTTP-only node. The reconnect-
forever contract is kept: transient RPC failures back off exponentially
(10 ms base, capped) and polling resumes; deterministic protocol errors
surface to ``error`` and stop the feed (fail-fast, stream.rs:257-299
policy) rather than spinning on a broken endpoint.
"""

from __future__ import annotations

import threading

from .rpc import JsonRpcLogFetcher, RpcError, TransientRpcError


class BlockNotify:
    """Watch-channel head feed over a polling thread.

    Semantics mirrored from the reference:

    - watch channel (pubsub.rs): subscribers read the LATEST value; a
      subscriber that joins late sees the current head immediately; no
      queue, no per-subscriber backlog.
    - monotonic: a node answering with a lower height (load-balanced
      endpoints disagreeing) never moves the head backwards — the same
      uncle guard the live tail applies (stream.rs:239-241).
    - reconnect forever: transient failures back off (10 ms doubling,
      capped at ``poll_interval_s``) and polling continues.
    """

    def __init__(
        self,
        rpc_url: str,
        poll_interval_s: float = 0.2,
        retry_base_s: float = 0.01,
    ):
        self._fetcher = JsonRpcLogFetcher(rpc_url)
        self.poll_interval_s = poll_interval_s
        self.retry_base_s = retry_base_s
        self._cond = threading.Condition()
        self._head: int | None = None
        self.error: Exception | None = None
        self._stopped = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- feed thread --------------------------------------------------------

    def _run(self) -> None:
        backoff = self.retry_base_s
        while True:
            with self._cond:
                if self._stopped:
                    return
            try:
                head = self._fetcher.block_number()
                backoff = self.retry_base_s  # healed
            except TransientRpcError:
                backoff = min(backoff * 2, self.poll_interval_s)
                self._sleep(backoff)
                continue
            except RpcError as e:  # deterministic: fail fast, don't spin
                with self._cond:
                    self.error = e
                    self._cond.notify_all()
                return
            with self._cond:
                if self._head is None or head > self._head:
                    self._head = head
                    self._cond.notify_all()
            self._sleep(self.poll_interval_s)

    def _sleep(self, seconds: float) -> None:
        with self._cond:
            if not self._stopped:
                self._cond.wait(timeout=seconds)

    # -- subscriber surface (watch-channel reads) ---------------------------

    def latest(self) -> int | None:
        """Current head, or None before the first successful poll."""
        with self._cond:
            return self._head

    def wait_for(self, target: int, timeout_s: float = 30.0) -> int:
        """Block until head >= target (the B5 barrier at head level).

        Returns the head that satisfied the wait. Raises the feed's stored
        error if it died on a deterministic failure, TimeoutError on
        timeout."""
        import time

        deadline = time.monotonic() + timeout_s
        with self._cond:
            while True:
                if self.error is not None:
                    raise self.error
                if self._head is not None and self._head >= target:
                    return self._head
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise TimeoutError(
                        f"head did not reach {target} within {timeout_s}s "
                        f"(at {self._head})"
                    )
                self._cond.wait(timeout=remaining)

    def stop(self) -> None:
        """Stop the feed and wait for the poll thread to exit.

        The join allowance covers one in-flight RPC: the thread may be
        blocked inside ``block_number()`` for up to the fetcher's HTTP
        timeout, and joining for less would return with the thread still
        alive — free to set ``error`` or hit the endpoint once more after
        the caller believes the feed released it."""
        with self._cond:
            self._stopped = True
            self._cond.notify_all()
        self._thread.join(timeout=self._fetcher.timeout_s + 1.0)
