"""Host-side input pipeline: threaded prefetching loader.

The TPU-native replacement for the reference's torch DataLoader worker
processes + dedicated data GPU (SURVEY.md section 2.8 "heterogeneous device
split"): dataset __getitem__ runs on host threads (point splatting executes as
jitted XLA-CPU programs, releasing the GIL), batches are collated to numpy and
double-buffered ahead of the training step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


def collate_fn(example_list: List[Dict]) -> Dict:
    """Stack examples then merge batch & time dims: (B, T, ...) -> (B*T, ...)
    (reference kubric_arbit.py:650-655). Scalars stay per-example stacked."""
    out: Dict = {}
    keys = example_list[0].keys()
    for k in keys:
        vals = [np.asarray(e[k]) for e in example_list]
        stacked = np.stack(vals)  # (B, ...)
        if stacked.ndim >= 2:
            b, t = stacked.shape[0], stacked.shape[1]
            if k == "image_only_indicator":
                # (B, 1, T) -> (B, T): stays the per-video indicator.
                out[k] = stacked.reshape(b, stacked.shape[-1]).astype(np.float32)
                continue
            out[k] = stacked.reshape((b * t,) + stacked.shape[2:])
        else:
            out[k] = stacked
    if "image_only_indicator" in out:
        out["num_video_frames"] = int(out["image_only_indicator"].shape[-1])
    return out


class PrefetchLoader:
    """Iterates a map-style dataset with worker threads + a prefetch queue."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 2,
        prefetch: int = 2,
        seed: int = 0,
        collate: Callable = collate_fn,
        drop_last: bool = True,
        process_shard: Optional[tuple] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.collate = collate
        self.drop_last = drop_last
        # (process_id, num_processes): multi-host data feeding. batch_size
        # stays the GLOBAL batch; every process computes the identical global
        # shuffle (seed/epoch RNG is process-independent) and loads/renders
        # only its contiguous row slice of each batch — the slice that
        # jax.make_array_from_process_local_data expects under the
        # process-major device order of parallel/mesh.create_mesh
        # (parallel/distributed.py module docstring).
        self.process_shard = process_shard
        if process_shard is not None:
            pid, nproc = process_shard
            assert 0 <= pid < nproc, process_shard
            assert batch_size % nproc == 0, (
                f"global batch_size {batch_size} not divisible by "
                f"{nproc} processes")
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(order)
        self._epoch += 1

        batches = [
            order[i:i + self.batch_size]
            for i in range(0, n - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size)
        ]
        if self.process_shard is not None:
            pid, nproc = self.process_shard
            assert 0 <= pid < nproc and self.batch_size % nproc == 0, (
                self.process_shard, self.batch_size)
            lbs = self.batch_size // nproc
            batches = [b[pid * lbs:(pid + 1) * lbs] for b in batches]
        if not batches:
            return

        # Warmup: the first batch is computed synchronously in the calling
        # thread so every jitted kernel in the dataset's render path compiles
        # exactly once before worker threads start. Concurrent first-compiles
        # from multiple Python threads have been observed to deadlock the
        # XLA-CPU client (rare, but fatal for a training job).
        first_batch = self.collate([self.dataset[int(i)] for i in batches[0]])

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        idx_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches[1:], start=1):
            idx_q.put((bi, b))
        stop = threading.Event()
        results: Dict[int, Dict] = {}
        results_lock = threading.Lock()
        next_emit = [1]

        def worker():
            while not stop.is_set():
                try:
                    bi, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    examples = [self.dataset[int(i)] for i in idxs]
                    batch = self.collate(examples)
                except Exception as e:  # surface errors to the consumer
                    batch = e
                with results_lock:
                    results[bi] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            yield first_batch
            for _ in range(len(batches) - 1):
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
