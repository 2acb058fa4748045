"""Production serving runtime: warmup, request queue, dynamic micro-batching.

The reference is a notebook library; this is the runtime tier a deployment
needs around the compiled pipelines:

* ``GenerationServer.warmup(shapes)`` precompiles the (resolution, steps,
  batch-bucket) executables so first user requests don't pay compile time
  (the persistent compilation cache in /tmp/jax_cache covers restarts).
* Requests enqueue; a single device-owner thread drains the queue, groups
  requests with identical static shape keys into ONE batched pipeline call —
  the pipelines accept a list of *distinct* prompts, so different users'
  requests share a compiled program (CFG-doubled on chip).
* Coalesced batches round up to power-of-two buckets (1, 2, 4, ... max_batch)
  by repeating the last prompt, so at most log2(max_batch)+1 executables per
  shape key exist; surplus images are dropped host-side.
* Backpressure via a bounded queue; clean shutdown.

Device work stays single-threaded (one stream owner); the host side is
thread-safe.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class _Request:
    prompt: str
    kwargs: Dict[str, Any]
    future: Future = field(default_factory=Future)

    def shape_key(self) -> Tuple:
        # all kwargs are static shape/program parameters for every pipeline
        # version (h/w/num_steps for 2.x, decoder_steps/prior_steps for 2.2);
        # requests batch together only when the compiled program is identical
        return tuple(sorted((k, str(v)) for k, v in self.kwargs.items()))


class GenerationServer:
    """Micro-batching front end over a Kandinsky pipeline.

    >>> server = GenerationServer(pipe, max_batch=4)
    >>> server.start(); fut = server.submit("a red cat", h=768, w=768)
    >>> images = fut.result()
    """

    def __init__(self, pipeline, max_batch: int = 4, max_queue: int = 64,
                 batch_window_s: float = 0.02):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self._queue: "queue.Queue[_Request]" = queue.Queue(maxsize=max_queue)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # ------------------------------------------------------------------

    def _buckets(self) -> List[int]:
        out, b = [], 1
        while b < self.max_batch:
            out.append(b)
            b *= 2
        out.append(self.max_batch)
        return out

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets():
            if n <= b:
                return b
        return self.max_batch

    def warmup(self, shapes: List[dict]) -> None:
        """Precompile executables for every (kwargs, batch-bucket) pair."""
        for kw in shapes:
            for b in self._buckets():
                self.pipeline.generate_text2img(
                    ["warmup"] * b, batch_size=b, **kw
                )

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def submit(self, prompt: str, **kwargs) -> Future:
        """Enqueue a text2img request; returns a Future of list[PIL.Image]."""
        req = _Request(prompt=prompt, kwargs=kwargs)
        self._queue.put(req)
        return req.future

    # ------------------------------------------------------------------

    def _collect_batch(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = threading.Event()
        deadline.wait(self.batch_window_s)
        key = first.shape_key()
        leftovers = []
        while len(batch) < self.max_batch:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req.shape_key() == key:
                batch.append(req)
            else:
                leftovers.append(req)
        for req in leftovers:
            self._queue.put(req)
        return batch

    def _worker(self) -> None:
        while not self._stop.is_set():
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                # one compiled program serves the whole batch, distinct
                # prompts included; pad to the warmed bucket so coalesced
                # sizes 3, 5, 6... reuse the 4- and 8-wide executables
                b = self._bucket_for(len(batch))
                prompts = [r.prompt for r in batch]
                prompts += [prompts[-1]] * (b - len(batch))
                images = self.pipeline.generate_text2img(
                    prompts, batch_size=b, **batch[0].kwargs
                )
                for req, img in zip(batch, images):
                    req.future.set_result([img])
            except Exception as e:  # pragma: no cover - error propagation
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
