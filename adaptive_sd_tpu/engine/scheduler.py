"""Continuous batching scheduler: token-level admission into a running batch.

Role parity: vLLM's continuous batching (the capability the reference rents,
SURVEY.md §2.8 "vLLM paged KV cache + continuous batching → ... host-side
continuous batching scheduler"). Design:

* A fixed-width lane array (``max_batch``) keeps the decode graph's shapes
  static: one compiled decode step serves any lane occupancy, with free lanes
  masked out. Admission runs a bucketed prefill graph, then the request joins
  a lane; completion (eos / budget) frees the lane and its KV pages the same
  step. No request waits for the batch to drain — the vLLM property.
* Pages come from the shared PageAllocator and grow one page ahead of the
  write position (``ensure``).
* The hot bookkeeping (lane scan, page-table assembly) has a C++ twin in
  native/scheduler.cc used when built (see native/build.sh); the Python path
  is always available and behaviourally identical.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.exceptions import ResourceError
from ..ops.sampling import sample
from .decode import PAD_ID, TierEngine, _bucket_len


@dataclass
class SchedRequest:
    request_id: str
    prompt: list[int]
    max_new: int = 128
    temperature: float = 0.0
    arrival: float = field(default_factory=time.monotonic)
    # filled by the scheduler:
    out_tokens: list[int] = field(default_factory=list)
    out_logprobs: list[float] = field(default_factory=list)
    position: int = 0          # next position to write (== current length)
    next_token: int = PAD_ID   # token to feed at the next step
    done: bool = False
    error: Optional[str] = None
    finished_at: float = 0.0
    _event: threading.Event = field(default_factory=threading.Event)

    def wait(self, timeout: Optional[float] = None) -> bool:
        return self._event.wait(timeout)


class ContinuousBatchingScheduler:
    def __init__(
        self,
        engine: TierEngine,
        *,
        max_batch: int = 8,
        max_context: int = 2048,
        admission_wait_s: float = 0.002,
    ) -> None:
        self.engine = engine
        self.max_batch = max_batch
        self.max_context = max_context
        self.page = engine.page_size
        self.max_pages = (max_context + self.page - 1) // self.page
        self._lanes: list[Optional[SchedRequest]] = [None] * max_batch
        self._queue: "queue.Queue[SchedRequest]" = queue.Queue()
        # Idle/retired lanes point at an out-of-range page so their decode
        # writes are dropped by the scatter instead of corrupting page 0 (or
        # whatever page a stale table row referenced).
        self._oob_page = engine.allocator.n_pages
        self._tables = np.full((max_batch, self.max_pages), self._oob_page, np.int32)
        self._admission_wait = admission_wait_s
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.steps = 0
        self.completed = 0

    # -------------------------------------------------------------- frontend
    def submit(
        self, prompt: Sequence[int], *, max_new: int = 128, temperature: float = 0.0,
        request_id: Optional[str] = None,
    ) -> SchedRequest:
        if len(prompt) + max_new > self.max_context:
            raise ResourceError(
                f"prompt+max_new {len(prompt) + max_new} exceeds max_context {self.max_context}"
            )
        req = SchedRequest(
            request_id=request_id or f"req{time.monotonic_ns()}",
            prompt=list(prompt),
            max_new=max_new,
            temperature=temperature,
        )
        self._queue.put(req)
        return req

    # -------------------------------------------------------------- internals
    def _free_lane_ids(self) -> list[int]:
        return [i for i, r in enumerate(self._lanes) if r is None]

    def _admit(self) -> int:
        """Move waiting requests into free lanes; batch their prefill."""
        free = self._free_lane_ids()
        if not free:
            return 0
        batch: list[tuple[int, SchedRequest]] = []
        deadline = time.monotonic() + self._admission_wait
        while len(batch) < len(free):
            timeout = deadline - time.monotonic()
            try:
                req = self._queue.get(timeout=max(timeout, 0) if batch == [] else 0)
            except queue.Empty:
                break
            batch.append((free[len(batch)], req))
            if time.monotonic() > deadline:
                break
        if not batch:
            return 0

        S = _bucket_len(max(len(r.prompt) for _, r in batch), self.page)
        n = len(batch)
        tokens = np.full((n, S), PAD_ID, np.int32)
        seq_lens = np.zeros((n,), np.int32)
        tables = np.full((n, self.max_pages), self._oob_page, np.int32)
        try:
            for row, (lane, req) in enumerate(batch):
                needed = min(
                    (len(req.prompt) + self.page) // self.page + 1, self.max_pages
                )
                pages = self.engine.allocator.ensure(req.request_id, needed)
                self._tables[lane, :] = self._oob_page
                self._tables[lane, : len(pages)] = pages
                tokens[row, : len(req.prompt)] = req.prompt
                seq_lens[row] = len(req.prompt)
                tables[row] = self._tables[lane]
        except ResourceError as exc:
            for lane, req in batch:
                # free any pages already granted to this batch (sibling
                # allocations that succeeded would otherwise leak forever)
                self.engine.allocator.free_request(req.request_id)
                self._tables[lane, :] = self._oob_page
                req.error = str(exc)
                req.done = True
                req._event.set()
            return 0

        logits = self.engine.prefill_batch(
            jnp.asarray(tokens), jnp.asarray(seq_lens), jnp.asarray(tables)
        )
        # fold_in(1) keeps admission keys disjoint from the decode-step keys
        keys = jax.random.split(
            jax.random.fold_in(jax.random.key(self.steps), 1), n
        )
        for row, (lane, req) in enumerate(batch):
            temp = req.temperature
            res = sample(logits[row : row + 1], keys[row], temperature=temp)
            req.next_token = int(res.token[0])
            req.out_tokens.append(req.next_token)
            req.out_logprobs.append(float(res.logprob[0]))
            req.position = len(req.prompt)
            self._lanes[lane] = req
        return n

    def _retire(self, lane: int, req: SchedRequest, error: Optional[str] = None) -> None:
        req.error = error or req.error
        req.done = True
        req.finished_at = time.monotonic()
        self.engine.allocator.free_request(req.request_id)
        self._tables[lane, :] = self._oob_page  # stale rows must not alias
        self._lanes[lane] = None
        self.completed += 1
        req._event.set()

    def step(self) -> int:
        """One scheduler iteration: admit, then one decode step for all
        occupied lanes. Returns the number of active lanes stepped."""
        self._admit()
        active = [(i, r) for i, r in enumerate(self._lanes) if r is not None]
        if not active:
            return 0

        # Check budgets/eos BEFORE stepping (the sampled token may finish one).
        still = []
        for lane, req in active:
            if len(req.out_tokens) >= req.max_new or (
                self.engine.eos_id is not None and req.next_token == self.engine.eos_id
            ):
                self._retire(lane, req)
            else:
                still.append((lane, req))
        if not still:
            return 0

        tokens = np.full((self.max_batch,), PAD_ID, np.int32)
        positions = np.zeros((self.max_batch,), np.int32)
        for lane, req in still:
            # grow pages one ahead of the write position
            needed = min((req.position + 1) // self.page + 1, self.max_pages)
            pages = self.engine.allocator.ensure(req.request_id, needed)
            self._tables[lane, : len(pages)] = pages
            tokens[lane] = req.next_token
            positions[lane] = req.position

        logits = self.engine.decode_batch(
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(self._tables)
        )
        self.steps += 1
        key = jax.random.key(self.steps)
        keys = jax.random.split(key, self.max_batch)
        logits_np = logits  # stays on device; sample per lane below
        for lane, req in still:
            res = sample(
                logits_np[lane : lane + 1], keys[lane], temperature=req.temperature
            )
            req.next_token = int(res.token[0])
            req.out_tokens.append(req.next_token)
            req.out_logprobs.append(float(res.logprob[0]))
            req.position += 1
        return len(still)

    # ------------------------------------------------------------------ loop
    def run_until_idle(self, max_steps: int = 100_000) -> None:
        """Drain queue + lanes (offline/batch mode)."""
        for _ in range(max_steps):
            n = self.step()
            if n == 0 and self._queue.empty() and not any(self._lanes):
                return

    def start(self) -> None:
        if self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def _loop(self) -> None:  # pragma: no cover - thread loop
        while not self._stop.is_set():
            n = self.step()
            if n == 0:
                time.sleep(0.001)

    def stats(self) -> dict:
        occ = sum(r is not None for r in self._lanes)
        return {
            "lanes": self.max_batch,
            "occupied": occ,
            "queued": self._queue.qsize(),
            "steps": self.steps,
            "completed": self.completed,
            "allocator": vars(self.engine.allocator.stats()),
        }
