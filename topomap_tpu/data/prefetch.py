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
                self._q.put(batch)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
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
