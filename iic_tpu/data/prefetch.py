"""Background-thread host prefetch.

The train pipelines' ``epoch()`` generators do their host work (geometry
prep, ``jax.device_put`` upload) inside ``next()`` — i.e. on the consumer
thread, serially between step dispatches. JAX dispatch is async, so that
work already overlaps device compute *up to* the point where the consumer
blocks on a result; what it cannot hide is the host-side cost of
``device_put`` itself through a slow transport (the axon tunnel) plus prep
when they exceed the dispatch headroom.

``ThreadedPrefetch`` moves the whole generator onto a daemon thread with a
bounded queue (depth 2 by default): host prep and uploads for batch i+1/i+2
run concurrently with the consumer dispatching and waiting on batch i.
``jax.device_put`` is thread-safe; arrays created on the worker thread are
ordinary committed device buffers.

The reference has no analogue (its DataLoaders run with num_workers=0 and
do augmentation inside ``__getitem__`` on GPU — SURVEY.md §5.2); this is
the TPU-native replacement for that overlap.
"""

import queue
import threading


class _Sentinel:
    pass


_DONE = _Sentinel()


class ThreadedPrefetch:
    """Iterate ``gen`` on a background thread, keeping up to ``depth``
    items ready. Exceptions in the generator re-raise in the consumer.

    Use as an iterator; call ``close()`` (or exhaust it) to join the
    thread. Safe to abandon mid-epoch: the bounded queue blocks the
    worker, and the daemon thread dies with the process, but prefer
    ``close()`` in loops that break early (the trainers' --test_code)."""

    def __init__(self, gen, depth=2):
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._done = False
        self._thread = threading.Thread(
            target=self._run, args=(gen,), daemon=True)
        self._thread.start()

    def _run(self, gen):
        try:
            for item in gen:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    if hasattr(gen, "close"):
                        gen.close()  # run its finally blocks NOW
                    return
            self._q.put(_DONE)
        except BaseException as e:  # propagate to the consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        item = self._q.get()
        if item is _DONE:
            self._done = True
            self._thread.join()
            raise StopIteration
        if isinstance(item, BaseException):
            self._done = True
            self._thread.join()
            raise item
        return item

    def close(self):
        """Stop the worker and drop queued items (early-exit consumers)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)


def prefetch_epochs(pipe, epoch_indices, depth=2, **epoch_kw):
    """Chain several ``pipe.epoch(e_i)`` generators through ONE prefetch
    thread so the inter-epoch boundary is overlapped too. Yields
    (epoch_idx, batch...) tuples."""

    def chained():
        for e_i in epoch_indices:
            gen = pipe.epoch(e_i, **epoch_kw)
            try:
                for item in gen:
                    yield (e_i,) + tuple(item)
            finally:
                # If epoch() returned its own ThreadedPrefetch (lazy
                # image stores), stop that inner worker when the outer
                # prefetch is closed mid-epoch — otherwise it would spin
                # against its full queue for the process lifetime.
                if hasattr(gen, "close"):
                    gen.close()

    return ThreadedPrefetch(chained(), depth=depth)
