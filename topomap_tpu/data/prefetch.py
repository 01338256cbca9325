"""Double-buffered host→device input pipeline.

The reference trains with a synchronous ``DataLoader(num_workers=0)`` (SURVEY.md §3.1,
``addlrSD.py:387``) — every step waits for PIL decode + host→GPU copy. Here a background
thread runs the host side (decode/augment/tokenize via ``prepare_fn``) and issues the
(asynchronous) ``jax.device_put`` for the NEXT batches while the current step computes, so
the TPU never idles on input. Depth 2 = classic double buffering.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wrap a host-batch iterator with a staging thread + bounded device queue.

    ``prepare_fn(host_batch) -> pytree`` runs in the background thread (tokenization,
    stacking, numpy work); its result is ``device_put`` there too — dispatch is async, so
    the transfer overlaps the in-flight step. Iteration order is preserved. The thread
    shuts down when the source is exhausted (StopIteration propagates) or when ``close()``
    is called.
    """

    _END = object()

    def __init__(
        self,
        source: Iterator[Any],
        prepare_fn: Callable[[Any], Any] = lambda b: b,
        depth: int = 2,
        device: Optional[jax.Device] = None,
    ):
        self._source = source
        self._prepare = prepare_fn
        self._device = device
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._closed = False
        self._done = False       # worker has exited (sentinel may or may not be queued)
        self._finished = False   # consumer saw end-of-stream; latched for repeat calls
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._source:
                if self._closed:
                    return
                batch = self._prepare(item)
                if self._device is not None:
                    batch = jax.device_put(batch, self._device)
                # Bounded put, re-checking _closed so close() can't race us back into a
                # full queue after its drain (blocking put here could deadlock forever).
                while not self._closed:
                    try:
                        self._q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            # Never block on the sentinel: if the queue is full the consumer is either
            # closing (drain will empty it) or will consume real items first and find
            # _done via the latch below on the next put attempt.
            self._done = True
            try:
                self._q.put_nowait(self._END)
            except queue.Full:
                pass

    def __iter__(self):
        return self

    def __next__(self):
        if self._finished:
            if self._err is not None:
                raise self._err
            raise StopIteration
        while True:
            try:
                item = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                # Worker finished without managing to enqueue the sentinel (full-queue
                # race) — treat an empty queue + done worker as end-of-stream.
                if self._done:
                    item = self._END
                    break
        if item is self._END:
            self._finished = True  # latch: repeated __next__ keeps raising
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._closed = True
        # drain so the worker's blocked put() wakes up
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
