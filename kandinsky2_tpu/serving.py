"""Production serving runtime: warmup, request queue, dynamic micro-batching.

The reference is a notebook library; this is the runtime tier a deployment
needs around the compiled pipelines:

* ``GenerationServer.warmup(shapes)`` precompiles the (resolution, steps,
  batch) executables so first user requests don't pay compile time (the
  persistent compilation cache in /tmp/jax_cache covers process restarts).
* Requests enqueue; a single device-owner thread drains the queue, groups
  requests with identical static shape keys into one batched pipeline call
  (CFG-doubled on chip), and resolves per-request futures.
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

    def warmup(self, shapes: List[dict]) -> None:
        """Precompile executables for a list of generate_text2img kwargs."""
        for kw in shapes:
            self.pipeline.generate_text2img("warmup", batch_size=1, **kw)
            if self.max_batch > 1:
                self.pipeline.generate_text2img(
                    "warmup", batch_size=self.max_batch, **kw
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
            if req.shape_key() == key and req.prompt is not None:
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
                if len(batch) == 1 or len({r.prompt for r in batch}) > 1:
                    # distinct prompts: run per request (the pipeline batches
                    # the CFG halves on chip regardless)
                    for req in batch:
                        images = self.pipeline.generate_text2img(
                            req.prompt, batch_size=1, **req.kwargs
                        )
                        req.future.set_result(images)
                else:
                    images = self.pipeline.generate_text2img(
                        batch[0].prompt, batch_size=len(batch),
                        **batch[0].kwargs,
                    )
                    for req, img in zip(batch, images):
                        req.future.set_result([img])
            except Exception as e:  # pragma: no cover - error propagation
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
