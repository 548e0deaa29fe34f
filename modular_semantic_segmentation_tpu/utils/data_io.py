"""Host-side batch plumbing between datasets and jitted steps.

Replaces the reference's string-handle iterator machinery
(xview/models/base_model.py:10-38, 105-118) with plain Python iterators plus:

    * static-shape padding of partial batches (pad pixels get label -1 which
      the confusion matrix ignores) so XLA never recompiles;
    * a background-thread prefetcher that overlaps host batch assembly +
      H2D transfer with device compute (double buffering) — the reference's
      tf.data map-parallelism equivalent.
"""

import queue
import threading

import jax
import numpy as np


def _pad_batch(batch, batchsize, pad_label=-1):
    """Pad a partial batch to the static batchsize. Returns (batch, valid)."""
    n = next(iter(batch.values())).shape[0]
    if n == batchsize:
        return batch, n
    padded = {}
    for key, value in batch.items():
        pad_width = [(0, batchsize - n)] + [(0, 0)] * (value.ndim - 1)
        fill = pad_label if key == "labels" else 0
        padded[key] = np.pad(value, pad_width, constant_values=fill)
    return padded, n


def _dict_to_batches(data, batchsize, order=None):
    """Slice a dict of stacked arrays into batch dicts (optionally permuted)."""
    total = next(iter(data.values())).shape[0]
    for start in range(0, total, batchsize):
        sel = (slice(start, start + batchsize) if order is None
               else order[start:start + batchsize])
        yield {k: np.asarray(v[sel]) for k, v in data.items()}


def _as_batch_iterator(data, batchsize, shuffle=False, repeat=False,
                       workers=None, seed=None):
    """Normalize the accepted data forms into an iterator of batch dicts.

    Accepts: a DataSource (duck-typed via .batches), a dict of stacked
    arrays, or any iterator/generator of batch dicts. ``seed`` makes the
    shuffle order deterministic (fit() passes the model's config seed so
    training trajectories reproduce run to run).
    """
    if hasattr(data, "batches"):
        try:
            return data.batches(batchsize, shuffle=shuffle, repeat=repeat,
                                seed=seed, workers=workers)
        except TypeError:  # custom sources without seed/worker support
            return data.batches(batchsize, shuffle=shuffle, repeat=repeat)
    if isinstance(data, dict):
        total = next(iter(data.values())).shape[0]
        # Mirror DataSource.batches: fresh permutation each epoch when
        # shuffling (the reference shuffles its trainset too).
        rng = np.random.RandomState(seed) if shuffle else None

        def epochs():
            while True:
                order = rng.permutation(total) if shuffle else None
                yield from _dict_to_batches(data, batchsize, order)
                if not repeat:
                    return
        return epochs()
    return iter(data)


def iterate_batches(data, batchsize, pad=False, pad_label=-1):
    """Yield (device-ready batch, num valid items) over the data, once."""
    for batch in _as_batch_iterator(data, batchsize):
        if pad:
            batch, valid = _pad_batch(batch, batchsize, pad_label)
        else:
            valid = next(iter(batch.values())).shape[0]
        yield batch, valid


def training_batches(data, batchsize, workers=None, seed=None):
    """Infinite shuffled batch iterator for fit().

    ``workers``: thread-pool size for parallel blob assembly (decode +
    augment + pack run off the training thread; see DataSource.batches).
    ``seed``: deterministic shuffle order (None = fresh entropy).
    """
    return _as_batch_iterator(data, batchsize, shuffle=True, repeat=True,
                              workers=workers, seed=seed)


def to_device_prefetched(batch_iterator, buffer_size=2):
    """Double-buffered host->device pipeline.

    A background thread assembles batches (cv2/NumPy release the GIL) and
    eagerly issues ``jax.device_put``; the consumer always finds the next
    batch already on device.
    """
    q = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    def producer():
        try:
            for batch in batch_iterator:
                q.put({k: jax.device_put(np.asarray(v))
                       for k, v in batch.items()})
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    def consumer():
        while True:
            item = q.get()
            if item is sentinel:
                return
            yield item

    return consumer()


def prefetch_eval_batches(data, batchsize, pad_label=-1, buffer_size=2):
    """Double-buffered (device batch, valid count) stream for score().

    Same contract as ``iterate_batches(pad=True)`` but a background thread
    pads + issues ``jax.device_put`` ``buffer_size`` batches ahead, so the
    H2D transfer of batch i+1 overlaps the device compute of batch i. On a
    tunneled device (30 ms RTT) this roughly doubles offline-evaluation
    throughput (docs/TIMING.md offline_eval row); on local PCIe/HBM hosts
    it hides the transfer entirely. Only used for the un-distributed eval
    path — committed single-device arrays must not be fed to mesh-sharded
    steps.
    """
    q = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    def producer():
        try:
            for batch in _as_batch_iterator(data, batchsize):
                batch, valid = _pad_batch(batch, batchsize, pad_label)
                q.put(({k: jax.device_put(np.asarray(v))
                        for k, v in batch.items()}, valid))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
