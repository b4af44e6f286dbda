"""Host input pipeline: background prefetch + multi-step batch stacking.

TPU-native replacement for the reference's host-side input parallelism
(SURVEY.md §2.4 "host-side op parallelism"): torch
``DataLoader(num_workers=4)`` (`PointNet/train_semseg.py:91`) and the
tf.data generator pipeline (`RandLA-Net/main_S3DIS.py:216-239`). Instead
of worker *processes* feeding a framework queue, one background thread
runs the numpy sampler + augmentation + ``jax.device_put`` and stages
ready batches in a bounded queue — the host pipeline overlaps device
compute instead of serializing with it, which is all the parallelism the
numpy samplers need (they are vectorized; the reference's workers mostly
hid python-loop sampling cost).

``stack_batches`` groups consecutive batches along a new leading axis so
a single jitted program can ``lax.scan`` over several optimizer steps
per dispatch (``make_multi_train_step``) — on a tunneled TPU each
dispatch costs ~25-30 ms, comparable to a whole train step, so stacking
K steps per call cuts that overhead by K.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

_SENTINEL = object()


def prefetch(
    iterable: Iterable,
    transform: Callable | None = None,
    *,
    depth: int = 2,
) -> Iterator:
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    Args:
      iterable: the source iterator (e.g. ``sampler.batches(...)``). It is
        consumed entirely on the worker thread, so any RNG it draws from
        keeps the exact sequential order of a plain ``for`` loop.
      transform: optional per-item callable, also run on the worker thread
        (augmentation + ``device_put`` belong here so transfers are in
        flight before the consumer asks).
      depth: max items staged ahead (``depth <= 0`` disables prefetching
        and iterates inline — same semantics, no thread).

    Yields the (transformed) items in order. Exceptions raised by the
    source or transform re-raise at the consuming ``next()`` call. Breaking
    out early stops the worker promptly (bounded queue + stop flag).
    """
    if depth <= 0:
        for item in iterable:
            yield transform(item) if transform is not None else item
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                # bounded put, polled so an abandoned consumer can't strand
                # the thread on a full queue
                while not stop.is_set():
                    try:
                        q.put((False, item), timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put((False, _SENTINEL))
        except BaseException as e:  # propagate to the consumer
            # same polled put as the item path: a one-shot timed put could
            # drop the exception while the consumer sits in a >1s device
            # step with the queue full, leaving it blocked forever on
            # q.get() after draining the staged items
            while not stop.is_set():
                try:
                    q.put((True, e), timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True, name="psg-prefetch")
    t.start()
    try:
        while True:
            is_exc, item = q.get()
            if is_exc:
                raise item
            if item is _SENTINEL:
                return
            yield item
    finally:
        stop.set()
        # unblock a worker waiting on a full queue, then reap it
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)


def stack_batches(iterable: Iterable[tuple], k: int) -> Iterator[tuple]:
    """Group consecutive batch tuples into stacks of ``k`` along a new
    leading axis: ``k`` tuples of arrays ``[B, ...]`` → one tuple of
    arrays ``[k, B, ...]``.

    The final partial group (fewer than ``k`` items) is emitted unstacked
    one item at a time as ``(1, ...)``-leading stacks, so the consumer
    compiles exactly two program shapes (k and 1) regardless of epoch
    length.
    """
    if k <= 1:
        for item in iterable:
            yield tuple(np.asarray(x)[None] for x in item)
        return
    buf: list[tuple] = []
    for item in iterable:
        buf.append(item)
        if len(buf) == k:
            yield tuple(np.stack(xs) for xs in zip(*buf))
            buf = []
    for item in buf:  # tail: singleton stacks, no k-1 recompiles
        yield tuple(np.asarray(x)[None] for x in item)
