"""Host-side batch prefetching for the stage-1 training loops.

The reference hides GT-synthesis latency behind DataLoader worker
*processes* (reference ``train_objectness_net.py:137-143``, SURVEY
§3.1). Here the synthesis hot spots — JPEG/PNG decode, EDT, resizes —
are OpenCV calls that release the GIL, so worker *threads* deliver the
same overlap without pickling datasets across process boundaries: each
worker assembles full fixed-shape batches into a bounded queue while
the device executes the previous step.

Starvation accounting: ``starved_s`` accumulates the wall time the
training loop spent blocked on ``__next__`` — the "data-starved"
fraction of step time is ``starved_s / total_s`` (VERDICT round-2
item 7 wants this < 10%).
"""

from __future__ import annotations

import queue
import threading
import time


class PrefetchIterator:
    """Wrap a thread-safe ``make_batch() -> batch`` callable with N
    worker threads and a bounded queue.

    make_batch must be safe to call concurrently (give each worker its
    own RNG / dataset handle via ``worker_fns`` instead when it isn't).
    """

    def __init__(self, make_batch=None, num_workers: int = 4, depth: int = 8,
                 worker_fns=None):
        if worker_fns is None:
            if make_batch is None:
                raise ValueError("need make_batch or worker_fns")
            worker_fns = [make_batch] * num_workers
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._errors: queue.Queue = queue.Queue()
        self.starved_s = 0.0
        self.total_s = 0.0
        self._t_last = None
        self._threads = [
            threading.Thread(target=self._run, args=(fn,), daemon=True)
            for fn in worker_fns
        ]
        for t in self._threads:
            t.start()

    def _run(self, fn):
        while not self._stop.is_set():
            try:
                batch = fn()
            except Exception as e:  # surface worker crashes to the consumer
                self._errors.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        now = time.perf_counter()
        if self._t_last is not None:
            self.total_s += now - self._t_last
        t0 = now
        while True:
            if not self._errors.empty():
                self.close()
                raise self._errors.get()
            try:
                batch = self._q.get(timeout=0.5)
                break
            except queue.Empty:
                continue
        t1 = time.perf_counter()
        self.starved_s += t1 - t0
        self._t_last = t1
        return batch

    @property
    def starved_fraction(self) -> float:
        return self.starved_s / self.total_s if self.total_s > 0 else 0.0

    def close(self):
        self._stop.set()
        # drain so producers blocked on put() can observe the stop flag,
        # then JOIN the workers: a daemon thread still inside a C++ call
        # (cv2 / jax transfer) when the interpreter finalizes can abort
        # the process ("terminate called without an active exception" at
        # exit, observed with the axon TPU plugin)
        deadline = time.perf_counter() + 10.0
        while any(t.is_alive() for t in self._threads):
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            for t in self._threads:
                t.join(timeout=0.1)
            if time.perf_counter() > deadline:
                break
