"""Host-side async batch prefetching with device double-buffering.

The reference's equivalent is torch DataLoader workers
(--load_data_workers 10, train_rnn_nnet_classifier.py:70; SURVEY.md §2.8
'DataLoader workers -> host async prefetch + double-buffered device puts').
A background thread pulls batches from the iterator and issues
non-blocking jax.device_put so the next batch's H2D transfer overlaps the
current step's compute.
"""

import queue
import threading

import jax


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with async device prefetch.

    Args:
      iterator: yields pytrees of numpy arrays.
      size: prefetch depth (2 = double buffering).
      sharding: optional jax.sharding.Sharding for the device_put.

    Yields device-resident batches.
    """
    q = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                put = (
                    (lambda x: jax.device_put(x, sharding))
                    if sharding is not None
                    else jax.device_put
                )
                q.put(jax.tree.map(put, batch))
        except Exception as e:  # surface errors on the consumer side
            q.put(e)
            return
        q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, Exception):
            raise item
        yield item
