"""
Host→device batch prefetching.

The reference feeds every training step synchronously from numpy (SURVEY.md §3.1
hot-loop note); here a small background thread samples/transfers the next batches
while the device executes the current step, hiding host latency.
"""
import queue
import threading

_SENTINEL = object()


def prefetch(generator, size=2, device_put=True, sharding=None):
    """
    Wrap a batch generator with a background prefetch thread.

    :param generator: yields numpy batches (arrays or tuples of arrays)
    :param size: prefetch depth
    :param device_put: move arrays to device (optionally with a sharding) eagerly
    :param sharding: optional jax sharding for device placement
    """
    q = queue.Queue(maxsize=size)
    error = []

    def put(batch):
        if not device_put:
            return batch
        # multi-process aware placement: slices batch-sharded arrays to this
        # process's rows and assembles the global jax.Array
        from neural_imaging_tpu.parallel.mesh import put_global
        if isinstance(batch, tuple):
            return tuple(put_global(b, sharding) if b is not None else None
                         for b in batch)
        return put_global(batch, sharding)

    def worker():
        try:
            for batch in generator:
                q.put(put(batch))
        except Exception as e:  # surface producer errors on the consumer side
            error.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    if error:
        raise error[0]


class EpochPrefetcher:
    """Reusable per-epoch prefetcher over a Dataset's training batches."""

    def __init__(self, data, batch_size, rgb_patch_size, discard='flat', size=2,
                 sharding=None, quantized=False):
        self.data = data
        self.batch_size = batch_size
        self.rgb_patch_size = rgb_patch_size
        self.discard = discard
        self.size = size
        self.sharding = sharding
        # ship uint8/uint16 batches (4x less host→device traffic); consumers
        # normalize in-graph (ops.normalize_batch)
        self.quantized = quantized

    def __iter__(self):
        gen = self.data.get_training_generator(self.batch_size, self.rgb_patch_size,
                                               self.discard, quantized=self.quantized)
        return prefetch(gen, size=self.size, sharding=self.sharding)
