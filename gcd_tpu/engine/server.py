"""Request-batching serving loop for the sampling program.

Production serving on TPU wants every program invocation at one fixed,
pre-compiled batch shape (XLA programs are shape-specialized) while client
requests arrive one clip at a time. `SamplerServer` bridges the two:

  * requests (one clip each: batch-dict arrays with a (T, ...) leading axis)
    enter a queue;
  * a single worker thread packs up to `max_batch` requests — waiting at most
    `max_wait_ms` for stragglers — into ONE (B*T)-leading-axis program batch,
    padding the tail with a dummy clip so the compiled shape never changes;
  * results are split back per request and delivered through futures.

The reference's serving story is one-process-per-GPU with no batching
(scripts/test.py:1050-1084); batching is where TPU serving throughput comes
from (the bench's GCD_BENCH_BATCH mode measures the per-chip win).

The sampler callable is pluggable: pass `engine`+`params` for an in-process
jit, or the `load_sampler` callable of an AOT artifact (engine/export.py) —
both see identical (params, arrays, key) -> dict signatures.

HTTP front-end: scripts/serve.py.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

def _concat_requests(clips: List[Dict], pad_to: int) -> Dict:
    """Stack per-clip batches into one (B*T)-leading batch, padding with
    copies of the last clip up to `pad_to` clips."""
    padded = list(clips) + [clips[-1]] * (pad_to - len(clips))
    out: Dict = {}
    for k in padded[0]:
        v0 = padded[0][k]
        if k == "num_video_frames" or np.isscalar(v0):
            out[k] = v0
        else:
            out[k] = jnp.concatenate([jnp.asarray(c[k]) for c in padded],
                                     axis=0)
    return out


class SamplerServer:
    """Batch scheduler around a fixed-shape sampling program."""

    def __init__(self, sample_fn: Callable[[Dict, jax.Array], Dict],
                 num_frames: int, max_batch: int = 2,
                 max_wait_ms: float = 20.0):
        """sample_fn(batch, key) -> dict for a (max_batch*T)-leading batch.

        Use `make_engine_sample_fn` for the in-process engine path."""
        self._sample_fn = sample_fn
        self._t = int(num_frames)
        self._max_batch = int(max_batch)
        self._max_wait_s = float(max_wait_ms) / 1e3
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._started = False
        self.batches_run = 0
        self.requests_served = 0

    # -- public API --------------------------------------------------------

    def start(self) -> "SamplerServer":
        if not self._started:
            self._started = True
            self._worker.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        self._queue.put(None)  # wake the worker
        if self._started:
            self._worker.join(timeout=timeout)
        self._fail_pending(RuntimeError("server stopped"))

    def submit(self, clip_batch: Dict, key: Optional[jax.Array] = None) -> Future:
        """Enqueue one clip (arrays with a (T, ...) leading axis). Returns a
        Future resolving to the per-clip sample_video output dict."""
        if self._stop.is_set():
            raise RuntimeError("server stopped")
        t = int(np.asarray(clip_batch["image_only_indicator"]).shape[-1])
        if t != self._t:
            raise ValueError(f"server compiled for T={self._t}, got T={t}")
        fut: Future = Future()
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._queue.put((clip_batch, key, fut))
        return fut

    def _fail_pending(self, exc: Exception) -> None:
        """Fail every request still in the queue (requests that raced stop(),
        or were enqueued behind the stop sentinel) instead of leaving their
        futures unresolved forever."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None and not item[2].done():
                item[2].set_exception(exc)

    # -- worker ------------------------------------------------------------

    def _collect(self) -> List:
        """Block for the first request, then take up to max_batch-1 more,
        waiting at most max_wait_s for stragglers."""
        first = self._queue.get()
        if first is None:
            return []
        group = [first]
        while len(group) < self._max_batch:
            try:
                nxt = self._queue.get(timeout=self._max_wait_s)
            except queue.Empty:
                break
            if nxt is None:
                break
            group.append(nxt)
        return group

    def _run(self) -> None:
        while not self._stop.is_set():
            group = self._collect()
            if not group:
                continue
            clips = [g[0] for g in group]
            keys = [g[1] for g in group]
            futs = [g[2] for g in group]
            try:
                batch = _concat_requests(clips, self._max_batch)
                # One key drives the whole batch: fold the request keys in so
                # distinct requests keep independent noise.
                key = keys[0]
                for k in keys[1:]:
                    key = jax.random.fold_in(
                        key, int(np.asarray(k).ravel()[-1]))
                out = self._sample_fn(batch, key)
                jax.block_until_ready(out)
                for i, fut in enumerate(futs):
                    sl = {
                        k: np.asarray(v[i * self._t:(i + 1) * self._t])
                        for k, v in out.items()
                        if hasattr(v, "shape") and v.ndim >= 1
                        and v.shape[0] == self._max_batch * self._t
                    }
                    fut.set_result(sl)
                self.batches_run += 1
                self.requests_served += len(futs)
            except Exception as e:  # deliver, don't kill the loop
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)


def make_engine_sample_fn(engine, params, max_batch: int, num_frames: int,
                          num_steps: Optional[int] = None,
                          decoding_t: Optional[int] = None):
    """Jitted in-process sample_fn(batch, key) at the server's fixed shape.

    params are threaded as a runtime argument (functools.partial over a
    jitted 3-arg fn), NOT closed over: closure would bake the multi-GB tree
    into the jaxpr as trace-time constants — slow compiles, possible
    weight duplication inside the executable, and silent staleness if the
    caller later swaps checkpoints."""
    import functools

    from gcd_tpu.ops.dispatch import (default_compiler_options, kernel_flags,
                                      program_flag_overrides)

    # Program-level kernel policy for the server's fixed traced extent
    # (max_batch clips x num_frames x2 CFG) — the PERF_BATCH batch-4 XLA
    # layout pathology hits exactly this deployment mode (`serve.py
    # --max_batch 4` => bt=112 => 1.06 f/s without the policy, 4.49 with).
    # The flags are thread-local and matter only while jit traces, so wrap
    # every call; post-trace calls are cache hits and the with-block is
    # free. Same policy application as eval_utils.make_sampler.
    bt_extent = 2 * max_batch * num_frames
    copts = default_compiler_options(bt_extent)
    overrides = program_flag_overrides(bt_extent, copts)

    @functools.partial(jax.jit, compiler_options=copts)
    def fn(p, batch: Dict, key):
        return engine.sample_video(p, batch, key, num_steps=num_steps,
                                   decoding_t=decoding_t)

    def call(p, batch, key):
        with kernel_flags(**overrides):
            return fn(p, batch, key)

    return functools.partial(call, params)
