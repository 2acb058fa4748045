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
* Tasks: ``text2img``, ``img2img`` AND ``inpainting`` coalesce across users
  (init images and masks ride per-batch-row, keyed by shape/mode only —
  content never enters the key; the pipelines accept per-row mask lists).
  Array/PIL values inside free-form ``**kwargs`` are rejected at submit
  time: per-request content must go through ``image=`` / ``image_mask=`` so
  it cannot silently poison the batching key.
* Backpressure via a bounded queue; clean shutdown.
* LoRA hot-swap at base-model speed: ``attach_lora(name, loras)`` registers
  an adapter; requests select it with ``submit(..., lora=name)``.  On an
  adapter switch the device-owner thread FOLDS the factors into the base
  kernels (``models.lora.merge_lora`` — W += down@up, same shapes, so the
  jitted executable is reused with zero runtime branches) after restoring
  the pristine base leaves snapshotted at attach time (restore-then-merge:
  bitwise-exact across any number of swaps, no bf16 round-trip drift).
  The adapter name is part of the batch key — rows in one program call
  always share one weight tree.

Device work stays single-threaded (one stream owner); the host side is
thread-safe.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


_fold_kernels = None


def _get_fold_kernels():
    """ONE compiled program computing every merged kernel: W + s·down@up in
    fp32, cast back to the kernel dtype.  Folding eagerly per-kernel (396
    dispatches for the 2.2 decoder) queues hundreds of fp32 temporaries
    through the async tunnel client and can exhaust HBM next to a
    fully-loaded pipeline; fused, the transient working set is one kernel."""
    global _fold_kernels
    if _fold_kernels is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("scale",))
        def fold(base, loras, scale=1.0):
            return {
                k: (w.astype(jnp.float32)
                    + scale * (loras[k]["down"].astype(jnp.float32)
                               @ loras[k]["up"].astype(jnp.float32))
                    ).astype(w.dtype)
                for k, w in base.items()
            }

        _fold_kernels = fold
    return _fold_kernels


def _content_descriptor(v) -> Optional[Tuple]:
    """Shape/dtype (or PIL size/mode) descriptor for per-request content —
    what batching may key on.  Returns None for plain static values."""
    if hasattr(v, "shape") and hasattr(v, "dtype"):
        return ("arr", tuple(v.shape), str(v.dtype))
    if hasattr(v, "size") and hasattr(v, "mode"):  # PIL.Image
        return ("pil", tuple(v.size), str(v.mode))
    return None


@dataclass
class _Request:
    prompt: str
    kwargs: Dict[str, Any]
    task: str = "text2img"
    image: Any = None
    image_mask: Any = None
    lora: Optional[str] = None
    future: Future = field(default_factory=Future)

    @property
    def coalescable(self) -> bool:
        # all three tasks batch: the pipelines take per-row init images AND
        # per-row masks, so distinct users' content shares one program
        return self.task in ("text2img", "img2img", "inpainting")

    def shape_key(self) -> Tuple:
        # all **kwargs are static shape/program parameters for every pipeline
        # version (h/w/num_steps for 2.x, decoder_steps/prior_steps for 2.2);
        # requests batch together only when the compiled program is identical.
        # Per-request content (init image, mask) contributes shape/mode,
        # never content — each batch row consumes its own image and mask.
        parts = [("task", self.task), ("lora", self.lora)]
        if self.image is not None:
            parts.append(("image", _content_descriptor(self.image)))
        if self.image_mask is not None:
            parts.append(("image_mask", _content_descriptor(self.image_mask)))
        parts.extend(sorted((k, str(v)) for k, v in self.kwargs.items()))
        return tuple(parts)


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
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "coalesced": 0,
                       "padded": 0, "errors": 0, "lora_swaps": 0}
        # adapter registry: name -> (loras, scale, module); pristine base
        # leaves snapshotted per (module, path) the first time any adapter
        # targets them; the currently folded adapter + its fold recipe (kept
        # separately so a detach can't strand folded weights)
        self._lora_lock = threading.Lock()
        self._loras: Dict[str, Tuple[dict, float, str]] = {}
        self._pristine: Dict[Tuple[str, tuple], Any] = {}
        self._active_lora: Optional[str] = None
        self._folded: Optional[Tuple[dict, float, str]] = None

    def stats(self) -> Dict[str, float]:
        """Serving counters since start: requests served, device batches
        issued, requests that shared a batch with another user, padding rows
        spent rounding to buckets, errors, current queue depth, and the
        coalescing ratio (requests per device batch)."""
        with self._stats_lock:
            s = dict(self._stats)
        s["queue_depth"] = self._queue.qsize()
        s["coalesce_ratio"] = (
            s["requests"] / s["batches"] if s["batches"] else 0.0)
        return s

    # ------------------------------------------------------------------
    # LoRA hot-swap

    def attach_lora(self, name: str, loras: dict, *, scale: float = 1.0,
                    module: str = "unet") -> None:
        """Register a LoRA adapter (``models.lora`` factor dict: {path:
        {down, up}}) under ``name``; requests opt in with
        ``submit(..., lora=name)``.  Pristine base leaves are snapshotted
        here for every newly-targeted kernel, so later folds are computed
        from the true base regardless of swap history.  Cheap: nothing
        touches the device until a request selects the adapter."""
        if not loras:
            raise ValueError("empty LoRA factor dict")
        with self._lora_lock:
            tree = self.pipeline.params[module]
            for path in loras:
                key = (module, tuple(path))
                if key not in self._pristine:
                    # not yet snapshotted => currently unfolded => pristine
                    from .models.lora import _get

                    self._pristine[key] = _get(tree, path)
            self._loras[name] = (loras, float(scale), module)

    def detach_lora(self, name: str) -> None:
        """Remove an adapter from the registry.  If it is currently folded
        it stays folded until the next request with a different (or no)
        adapter triggers the usual restore — the fold recipe is kept
        internally, so detaching can never strand adapted weights."""
        with self._lora_lock:
            del self._loras[name]

    def _ensure_lora(self, name: Optional[str]) -> None:
        """Device-owner-thread only: make ``name`` the folded adapter.
        Restores the pristine leaves of whatever is folded now, then folds
        the requested adapter from the pristine base (restore-then-merge:
        exact, no accumulation error across swaps)."""
        if name == self._active_lora:
            return
        from .models.lora import _set

        with self._lora_lock:
            params = self.pipeline.params
            if self._folded is not None:
                loras, _, module = self._folded
                tree = params[module]
                for path in loras:
                    tree = _set(tree, path, self._pristine[(module, tuple(path))])
                params[module] = tree
                self._folded = None
            if name is not None:
                entry = self._loras[name]
                loras, scale, module = entry
                base = {"/".join(p): self._pristine[(module, tuple(p))]
                        for p in loras}
                merged = _get_fold_kernels()(
                    base, {"/".join(p): f for p, f in loras.items()},
                    scale=scale)
                tree = params[module]
                for p in loras:
                    tree = _set(tree, p, merged["/".join(p)])
                params[module] = tree
                self._folded = entry
            self._active_lora = name
        with self._stats_lock:
            self._stats["lora_swaps"] += 1

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
        """Precompile executables for every (kwargs, batch-bucket) pair.  An
        entry may carry ``task="img2img"`` / ``task="inpainting"`` to warm
        those programs (a black init image / all-ones mask of the requested
        size is used)."""
        for kw in shapes:
            kw = dict(kw)
            task = kw.pop("task", "text2img")
            for b in self._buckets():
                prompts = ["warmup"] * b
                if task in ("img2img", "inpainting"):
                    from PIL import Image

                    img = Image.new("RGB", (kw.get("w", 512), kw.get("h", 512)))
                    if task == "inpainting":
                        import numpy as _np

                        mask = _np.ones(
                            (kw.get("h", 512), kw.get("w", 512)), _np.float32
                        )
                        self.pipeline.generate_inpainting(
                            prompts, [img] * b, [mask] * b, batch_size=b, **kw
                        )
                    else:
                        self.pipeline.generate_img2img(
                            prompts, [img] * b, batch_size=b, **kw
                        )
                else:
                    self.pipeline.generate_text2img(prompts, batch_size=b, **kw)

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

    def submit(
        self, prompt: str, *, task: str = "text2img", image=None,
        image_mask=None, lora: Optional[str] = None, **kwargs,
    ) -> Future:
        """Enqueue a generation request; returns a Future of list[PIL.Image].

        ``task``: "text2img" (default), "img2img" (requires ``image``), or
        "inpainting" (requires ``image`` + ``image_mask``; coalesces like
        the others — masks ride per-row).  ``lora``: name of an adapter
        previously registered with :meth:`attach_lora`; the worker folds it
        into the base kernels before the batch runs (requests with the same
        adapter coalesce; different adapters never share a program call).
        Per-request content goes through ``image=`` /
        ``image_mask=`` only — arrays/PIL objects hiding in other kwargs are
        rejected because their content cannot participate in the batch key."""
        if task not in ("text2img", "img2img", "inpainting"):
            raise ValueError(f"unsupported serving task: {task!r}")
        if lora is not None:
            with self._lora_lock:
                if lora not in self._loras:
                    raise KeyError(
                        f"unknown LoRA adapter {lora!r}; attach_lora first")
        if task != "text2img" and image is None:
            raise ValueError(f"task={task!r} requires image=")
        if task == "inpainting" and image_mask is None:
            raise ValueError("task='inpainting' requires image_mask=")
        for k, v in kwargs.items():
            if _content_descriptor(v) is not None:
                raise TypeError(
                    f"array/PIL kwarg {k!r} is not batchable; pass "
                    "per-request content via image= / image_mask="
                )
        req = _Request(
            prompt=prompt, kwargs=kwargs, task=task, image=image,
            image_mask=image_mask, lora=lora,
        )
        self._queue.put(req)
        return req.future

    # ------------------------------------------------------------------

    def _collect_batch(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        if not first.coalescable:
            return batch
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
                task = batch[0].task
                kw = batch[0].kwargs
                self._ensure_lora(batch[0].lora)
                with self._stats_lock:
                    self._stats["requests"] += len(batch)
                    self._stats["batches"] += 1
                    if len(batch) > 1:
                        self._stats["coalesced"] += len(batch)
                    if batch[0].coalescable:
                        self._stats["padded"] += (
                            self._bucket_for(len(batch)) - len(batch))
                b = self._bucket_for(len(batch))
                prompts = [r.prompt for r in batch]
                prompts += [prompts[-1]] * (b - len(batch))
                if task == "inpainting":
                    inits = [r.image for r in batch]
                    inits += [inits[-1]] * (b - len(batch))
                    masks = [r.image_mask for r in batch]
                    masks += [masks[-1]] * (b - len(batch))
                    images = self.pipeline.generate_inpainting(
                        prompts, inits, masks, batch_size=b, **kw
                    )
                elif task == "img2img":
                    inits = [r.image for r in batch]
                    inits += [inits[-1]] * (b - len(batch))
                    images = self.pipeline.generate_img2img(
                        prompts, inits, batch_size=b, **kw
                    )
                else:
                    images = self.pipeline.generate_text2img(
                        prompts, batch_size=b, **kw
                    )
                for req, img in zip(batch, images):
                    req.future.set_result([img])
            except Exception as e:  # pragma: no cover - error propagation
                with self._stats_lock:
                    self._stats["errors"] += 1
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
