"""Request-batching scheduler for serving — queue → bucket → batch per chip.

NEW relative to the reference (which serves one request at a time per
process; SURVEY §2.8): on TPU, a single chip easily saturates only with
batched work, so concurrent requests arriving within a small window are
fused into one XLA dispatch (BASELINE north star: "server batches
concurrent TTS/STT streams per chip").

Design: `BatchScheduler` is model-agnostic — it owns a queue and a worker
thread; requests submitted within `window_ms` of each other are grouped by
a bucket key (padded-shape class) and handed to `batch_fn` as one list.
`KokoroBatcher` adapts it to the Kokoro TTS model via
`Model.batch_synthesize` (one frontend + one decoder dispatch for the whole
group). The TTS pipeline picks the batcher up through `register_infer_hook`,
so `model.generate()` transparently batches under a running server.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Tuple

__all__ = [
    "BatchScheduler",
    "KokoroBatcher",
    "WhisperBatcher",
    "ParakeetBatcher",
    "LMContinuousBatcher",
    "FrameBatcherBase",
    "StackBatcher",
    "register_infer_hook",
    "unregister_infer_hook",
    "get_infer_hook",
    "stream_chunks",
]


def stream_chunks(submit, *args, chunk_size: int = 1, callback_kw: str,
                  **kwargs):
    """Generator bridging a batcher's streaming callback to a pull-style
    chunk iterator: calls ``submit(*args, <callback_kw>=sink, **kwargs)``
    and yields lists of ``chunk_size`` emitted items as they arrive, then
    any tail. Re-raises the request's failure (from the Future) at the
    end, so a failed fused dispatch surfaces on the consuming thread.

    This is how model `generate(stream=True)` paths ride an installed
    batcher without losing incremental delivery: the batcher emits
    per-item (`on_token` / `on_frame`) from its worker thread; the model's
    chunked decode consumes equal-sized groups on the caller's thread,
    keeping time-to-first-audio at one chunk even when the request is
    fused with co-tenants."""
    import queue as _q

    itemq: "_q.Queue" = _q.Queue()
    kwargs[callback_kw] = itemq.put
    fut = submit(*args, **kwargs)
    fut.add_done_callback(lambda _f: itemq.put(_SENTINEL))
    buf: List[Any] = []
    while True:
        item = itemq.get()
        if item is _SENTINEL:
            fut.result()  # surface a failed dispatch
            if buf:
                yield buf
            return
        buf.append(item)
        if len(buf) >= chunk_size:
            yield buf
            buf = []


_SENTINEL = object()


class BatchScheduler:
    """Fuses concurrent submissions into batched calls.

    batch_fn(items: list) -> list of results (same order/length).
    bucket_fn(item) -> hashable key; only items with equal keys share a
    batch (shape-bucket + static-arg compatibility).
    """

    def __init__(
        self,
        batch_fn: Callable[[List[Any]], List[Any]],
        bucket_fn: Callable[[Any], Any] = lambda item: None,
        max_batch: int = 8,
        window_ms: float = 8.0,
    ):
        self.batch_fn = batch_fn
        self.bucket_fn = bucket_fn
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._q: "queue.Queue[Tuple[Any, Future]]" = queue.Queue()
        self._stop = threading.Event()
        self.dispatch_count = 0  # batched device dispatches (for tests/metrics)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, item: Any) -> Future:
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def __call__(self, item: Any, timeout: Optional[float] = None) -> Any:
        """Blocking submit."""
        return self.submit(item).result(timeout=timeout)

    def close(self):
        self._stop.set()
        self._q.put((None, None))  # wake worker
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _collect(self) -> List[Tuple[Any, Future]]:
        """Block for the first item, then drain arrivals for one window."""
        item = self._q.get()
        if item[1] is None:
            return []
        batch = [item]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt[1] is None:
                break
            batch.append(nxt)
        return batch

    def _worker(self):
        while not self._stop.is_set():
            pending = self._collect()
            if not pending:
                continue
            # group by bucket key, preserving arrival order inside groups
            groups: Dict[Any, List[Tuple[Any, Future]]] = {}
            for item, fut in pending:
                groups.setdefault(self.bucket_fn(item), []).append((item, fut))
            for group in groups.values():
                items = [it for it, _ in group]
                try:
                    results = self.batch_fn(items)
                    self.dispatch_count += 1
                    for (_, fut), res in zip(group, results):
                        fut.set_result(res)
                except Exception as e:  # pragma: no cover - defensive
                    for _, fut in group:
                        if not fut.done():
                            fut.set_exception(e)


# ---------------------------------------------------------------------------
# Infer-hook registry: lets pipelines route their device call through a
# batcher without growing host-side state on the (pytree) model object.
# ---------------------------------------------------------------------------

_INFER_HOOKS: Dict[int, Callable] = {}


def register_infer_hook(model, hook: Callable) -> None:
    _INFER_HOOKS[id(model)] = hook


def unregister_infer_hook(model) -> None:
    _INFER_HOOKS.pop(id(model), None)


def get_infer_hook(model) -> Optional[Callable]:
    return _INFER_HOOKS.get(id(model))


# ---------------------------------------------------------------------------
# Kokoro adapter
# ---------------------------------------------------------------------------


class KokoroBatcher:
    """Batches Kokoro phoneme-segment synthesis across concurrent requests.

    Bucket key = (text-length bucket, speed): rows in one bucket share the
    padded shapes of both jitted stages, so a group costs exactly one
    frontend + one synthesize dispatch. Install with `.install()`; the
    pipeline then transparently routes `model(ps, ref_s, speed)` through
    this scheduler for every `generate()` call.
    """

    def __init__(self, model, max_batch: int = 8, window_ms: float = 8.0):
        from .tts.models.kokoro.kokoro import TEXT_BUCKETS, _bucket

        self.model = model
        self._bucket = lambda n: _bucket(n, TEXT_BUCKETS)
        self.sched = BatchScheduler(
            self._run, self._key, max_batch=max_batch, window_ms=window_ms
        )

    def _key(self, item):
        ps, _ref_s, speed = item
        return (self._bucket(len(ps) + 2), float(speed))

    def _run(self, items):
        ps_list = [ps for ps, _, _ in items]
        refs = [r for _, r, _ in items]
        speed = items[0][2]
        return self.model.batch_synthesize(ps_list, refs, speed=speed)

    def __call__(self, ps: str, ref_s, speed: float = 1.0):
        return self.sched((ps, ref_s, speed))

    def warmup(self):
        """Pre-compile the batch buckets for the smallest text bucket so
        the first wave of concurrent requests doesn't stall behind XLA
        compiles (same contract as WhisperBatcher.warmup)."""
        import numpy as np

        ref = np.zeros((1, self.model.config.style_dim * 2), np.float32)
        item = ("həlˈO wˈɜɹld", ref, 1.0)
        buckets, b = [], 1
        while b < self.sched.max_batch:
            buckets.append(b)
            b *= 2
        buckets.append(self.sched.max_batch)
        for b in buckets:
            self._run([item] * b)

    def install(self):
        register_infer_hook(self.model, self)
        return self

    def close(self):
        unregister_infer_hook(self.model)
        self.sched.close()

    @property
    def dispatch_count(self) -> int:
        return self.sched.dispatch_count


class LMContinuousBatcher:
    """Continuous batching for AR token-stream models (Orpheus/Vyvo-style
    SNAC LMs, Spark, OuteTTS): concurrent requests' decodes run in
    lock-step via `lm.ContinuousBatcher`; models route through
    `hook.submit(...)`.

    `lm` lets wrapper models whose AR stage is a sub-module (e.g. Spark's
    `model.llm`) batch that sub-LM while the infer hook stays registered on
    the wrapper (what `get_infer_hook(model)` is keyed on)."""

    def __init__(self, model, lm=None, slots: int = 4, max_len: int = 4096,
                 warm_embeds: bool = False, **kwargs):
        from .lm.continuous import ContinuousBatcher

        self.model = model
        self.warm_embeds = warm_embeds
        self.cb = ContinuousBatcher(lm if lm is not None else model,
                                    slots=slots, max_len=max_len, **kwargs)

    def warmup(self):
        """Pre-compile the smallest prefill bucket, every slot's install
        program and the fused tick with one concurrent wave of tiny
        requests (same contract as the other batchers' warmup). Families
        whose prompts are embedding matrices (warm_embeds=True — the
        audio-conditioned STT LLMs) warm the embeds-prefill variant."""
        n = self.cb.tick_tokens + 1
        if self.warm_embeds:
            import numpy as np

            D = self.cb.model.config.hidden_size
            emb = np.zeros((8, D), np.float32)
            futs = [self.cb.submit_embeds(emb, max_tokens=n)
                    for _ in range(self.cb.slots)]
        else:
            futs = [self.cb.submit([1] * 8, max_tokens=n)
                    for _ in range(self.cb.slots)]
        for f in futs:
            f.result()

    def submit(self, *args, **kwargs):
        return self.cb.submit(*args, **kwargs)

    def submit_embeds(self, *args, **kwargs):
        return self.cb.submit_embeds(*args, **kwargs)

    def install(self):
        register_infer_hook(self.model, self)
        return self

    def close(self):
        unregister_infer_hook(self.model)
        self.cb.close()

    @property
    def dispatch_count(self) -> int:
        return self.cb.steps


# ---------------------------------------------------------------------------
# Parakeet adapter
# ---------------------------------------------------------------------------


class ParakeetBatcher:
    """Batches Parakeet transcription windows across concurrent requests.

    Each chunk of `generate`/`decode_chunk` submits its mel window;
    windows in the same length bucket are encoded as ONE batched conformer
    pass and decoded by the lock-step TDT greedy loop
    (`ParakeetTDT.decode_batch`). Rows are independent, so batched results
    equal sequential ones. Mirrors WhisperBatcher incl. power-of-two batch
    buckets (clamped to max_batch) and `warmup`."""

    def __init__(self, model, max_batch: int = 8, window_ms: float = 10.0):
        self.model = model
        self.sched = BatchScheduler(
            self._run, self._key, max_batch=max_batch, window_ms=window_ms
        )

    def _key(self, mel):
        from .stt.models.parakeet.parakeet import _bucket

        T = mel.shape[-2]
        return (_bucket(T), str(mel.dtype))

    def _run(self, items):
        n = len(items)
        bucket = 1
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, self.sched.max_batch)
        padded = list(items) + [items[-1]] * (bucket - n)
        return self.model.decode_batch(padded)[:n]

    def __call__(self, mel):
        return self.sched(mel)

    def warmup(self, mel=None):
        """Pre-compile every batch bucket for this mel-length bucket so
        live traffic never stalls behind an XLA compile when the
        concurrency level shifts. Default mel: a 2 s synthetic window
        through the model's own preprocessor."""
        if mel is None:
            import numpy as np

            from .stt.models.parakeet.audio import log_mel_spectrogram

            pre = self.model.preprocessor_config
            mel = log_mel_spectrogram(
                np.zeros(pre.sample_rate * 2, np.float32), pre)
        buckets, b = [], 1
        while b < self.sched.max_batch:
            buckets.append(b)
            b *= 2
        buckets.append(self.sched.max_batch)
        for b in buckets:
            self._run([mel] * b)

    def install(self):
        register_infer_hook(self.model, self)
        return self

    def close(self):
        unregister_infer_hook(self.model)
        self.sched.close()

    @property
    def dispatch_count(self) -> int:
        return self.sched.dispatch_count


# ---------------------------------------------------------------------------
# Generic exact-shape window batching for single-dispatch models
# ---------------------------------------------------------------------------


class StackBatcher:
    """Window batching for single-dispatch encoder-style models (Wav2Vec2,
    LASR-CTC, Sortformer offline, MossFormer2-SE chunks): concurrent
    submissions whose input arrays share exact shapes stack into ONE
    batched forward. Rows are independent, so batched results equal
    sequential ones bitwise — exact-shape bucketing (rather than
    length-bucket padding) keeps that true for conv stacks whose tail
    frames see padding inside their receptive field.

    `run_batch(items: list) -> list` receives the shape-equal group padded
    to a power-of-two batch bucket (repeat-last-row, clamped to max_batch,
    mirroring WhisperBatcher) and returns per-row results in order.
    """

    def __init__(self, model, run_batch: Callable[[List[Any]], List[Any]],
                 max_batch: int = 8, window_ms: float = 10.0):
        self.model = model
        self._run_batch = run_batch
        self.sched = BatchScheduler(
            self._run, self._key, max_batch=max_batch, window_ms=window_ms
        )

    @staticmethod
    def _key(item):
        arrs = item if isinstance(item, tuple) else (item,)
        return tuple(
            (getattr(a, "shape", None), str(getattr(a, "dtype", type(a))))
            for a in arrs
        )

    def _run(self, items):
        n = len(items)
        bucket = 1
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, self.sched.max_batch)
        padded = list(items) + [items[-1]] * (bucket - n)
        return self._run_batch(padded)[:n]

    def __call__(self, *arrs):
        return self.sched(arrs[0] if len(arrs) == 1 else arrs)

    def submit(self, *arrs):
        """Non-blocking submit → Future (lets a single request fan its
        own windows into the shared scheduler, e.g. MossFormer2-SE's
        chunked enhance)."""
        return self.sched.submit(arrs[0] if len(arrs) == 1 else arrs)

    def warmup(self, item=None) -> None:
        """Pre-compile every batch bucket (1, 2, 4, …, max_batch) for the
        given example item so live traffic never stalls behind an XLA
        compile when the concurrency level shifts. Called with no item
        (the server's generic no-arg warmup) this is a no-op — exact-shape
        bucketing means there is no single canonical example to compile."""
        if item is None:
            return
        buckets, b = [], 1
        while b < self.sched.max_batch:
            buckets.append(b)
            b *= 2
        buckets.append(self.sched.max_batch)
        for b in buckets:
            self._run_batch([item] * b)

    def install(self):
        register_infer_hook(self.model, self)
        return self

    def close(self):
        unregister_infer_hook(self.model)
        self.sched.close()

    @property
    def dispatch_count(self) -> int:
        return self.sched.dispatch_count


# ---------------------------------------------------------------------------
# Frame-AR slot batching (Sesame, Qwen3-TTS — models whose decode emits a
# multi-codebook FRAME per step through nested inner loops, so they can't
# ride lm.ContinuousBatcher's token-level step)
# ---------------------------------------------------------------------------


class FrameBatcherBase:
    """Host-side slot scheduler for frame-AR continuous batching.

    Same scheduling model as `lm.ContinuousBatcher` (a fixed pool of B
    cache slots decodes in lock-step; requests join free slots at tick
    boundaries and leave at EOS/cap) but at FRAME granularity: one tick =
    `tick_frames` fused frame steps, each frame being a full nested decode
    (e.g. backbone step + depth-decoder inner loop). Subclasses own the
    device state and implement:

    - `_admit(req, slot)`: prefill the request (B=1) and install its rows
      into the slot state; raise to reject (future gets the exception).
    - `_tick(n)`: ONE fused device dispatch advancing every live slot by
      n frames; consume outputs, append to requests, and `_finish` slots
      that hit EOS/cap. On dispatch failure call `_fail_all` (donated
      buffers are gone — rebuild device state there).
    """

    def __init__(self, slots: int = 4, tick_frames: int = 8):
        self.slots = slots
        self.tick_frames = max(1, int(tick_frames))
        self.active: List[Optional[Any]] = [None] * slots
        self._joinq: "queue.Queue[Any]" = queue.Queue()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self.steps = 0  # fused tick dispatches (for tests/metrics)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # -- subclass interface -------------------------------------------

    def _admit(self, req, slot: int) -> None:  # pragma: no cover
        raise NotImplementedError

    def _tick(self, n: int) -> None:  # pragma: no cover
        raise NotImplementedError

    def _fail_all(self, e: Exception) -> None:  # pragma: no cover
        raise NotImplementedError

    # -----------------------------------------------------------------

    def submit_request(self, req) -> Future:
        self._joinq.put(req)
        self._wake.set()
        return req.future

    @staticmethod
    def _emit(req, item) -> None:
        """Streaming delivery: requests may carry an `on_frame` callback
        (mirrors `lm.continuous.ContinuousBatcher._emit`'s `on_token`);
        subclass `_tick`s call this at every output-append site so a
        batched request streams frames as they are produced instead of
        delivering only a completed Future. A broken sink (e.g. a
        disconnected client socket) must never kill the shared worker —
        it is dropped after the first failure."""
        cb = getattr(req, "on_frame", None)
        if cb is not None:
            try:
                cb(item)
            except Exception:
                req.on_frame = None

    def warmup_requests(self, reqs) -> None:
        """Submit a full concurrent wave of (tiny) requests and wait —
        compiles the B=1 prefill buckets, EVERY slot's install program
        (the slot index is a static jit arg) and the fused tick, so live
        traffic never stalls behind an XLA compile. Subclasses expose a
        no-arg `warmup()` that builds suitable tiny requests."""
        for fut in [self.submit_request(r) for r in reqs]:
            fut.result()

    def _finish(self, slot: int, result) -> None:
        req = self.active[slot]
        self.active[slot] = None
        if req is not None and not req.future.done():
            req.future.set_result(result)

    def close(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=10)
        while True:
            try:
                req = self._joinq.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(RuntimeError("batcher closed"))

    def _worker(self):
        while not self._stop.is_set():
            while any(a is None for a in self.active):
                try:
                    req = self._joinq.get_nowait()
                except queue.Empty:
                    break
                slot = self.active.index(None)
                try:
                    self._admit(req, slot)
                    self.active[slot] = req
                except Exception as e:  # pragma: no cover - defensive
                    self.active[slot] = None
                    if not req.future.done():
                        req.future.set_exception(e)
            if not any(self.active):
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                # subclasses increment self.steps right after their fused
                # dispatch, BEFORE resolving futures — a caller observing
                # a resolved future must also observe the tick count
                self._tick(self.tick_frames)
            except Exception as e:  # pragma: no cover - defensive
                self._fail_all(e)

    @property
    def dispatch_count(self) -> int:
        return self.steps


# ---------------------------------------------------------------------------
# Whisper adapter
# ---------------------------------------------------------------------------


class WhisperBatcher:
    """Batches Whisper 30 s-window decodes across concurrent requests.

    Each seek-loop iteration of `Model.generate` submits (mel window,
    prompt, options, tokenizer); windows whose prompt length and decoding
    options match are encoded and decoded as ONE batched device program
    (`_decode_loop` is batch-polymorphic). Rows are independent, so batched
    results equal sequential ones.
    """

    def __init__(self, model, max_batch: int = 8, window_ms: float = 10.0):
        self.model = model
        self.sched = BatchScheduler(
            self._run, self._key, max_batch=max_batch, window_ms=window_ms
        )

    def _key(self, item):
        _window, prompt, opts, _tok = item
        return (
            len(prompt),
            float(opts.temperature),
            bool(opts.without_timestamps),
            opts.task,
            opts.language,
        )

    def _run(self, items):
        import jax.numpy as jnp

        from .stt.models.whisper.decoding import decode_window_batch

        model = self.model
        # pad to a power-of-two batch bucket (repeat the last row) so any
        # grouping the scheduler produces hits an already-compiled
        # executable — without this, every distinct concurrency level
        # compiles its own program, and a new level mid-traffic stalls
        # live requests behind a full XLA compile. Clamped to max_batch:
        # a non-power-of-two cap must not be silently exceeded (it bounds
        # HBM use, and warmup only compiles buckets <= max_batch).
        n = len(items)
        bucket = 1
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, self.sched.max_batch)
        padded = list(items) + [items[-1]] * (bucket - n)
        windows = jnp.stack([jnp.asarray(w) for w, _, _, _ in padded])
        _xa, cross_kv = type(model)._encode(model, windows)
        prompts = [list(p) for _, p, _, _ in padded]
        opts = items[0][2]
        tokenizer = items[0][3]
        return decode_window_batch(
            model, cross_kv, tokenizer, prompts, opts,
            n_ctx=model.dims.n_text_ctx, n_vocab=model.dims.n_vocab,
            decoder_step=type(model)._decoder_step,
            make_caches=model._make_caches,
        )[:n]

    def __call__(self, window, prompt, opts, tokenizer):
        return self.sched((window, prompt, opts, tokenizer))

    def warmup(self, window, prompt, opts, tokenizer):
        """Pre-compile every batch bucket (1, 2, 4, …, max_batch) for this
        (prompt length, options) key, so live traffic never stalls behind
        an XLA compile when the concurrency level shifts. Call at server
        boot per served model/options combination."""
        item = (window, prompt, opts, tokenizer)
        # same bucket set _run can produce: powers of two clamped to
        # max_batch (which need not be a power of two itself)
        buckets, b = [], 1
        while b < self.sched.max_batch:
            buckets.append(b)
            b *= 2
        buckets.append(self.sched.max_batch)
        for b in buckets:
            self._run([item] * b)

    def install(self):
        register_infer_hook(self.model, self)
        return self

    def close(self):
        unregister_infer_hook(self.model)
        self.sched.close()

    @property
    def dispatch_count(self) -> int:
        return self.sched.dispatch_count
