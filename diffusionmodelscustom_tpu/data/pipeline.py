"""Host-to-device input pipeline: background prefetch + double buffering.

The reference fed the GPU through torch DataLoader workers with a
per-batch ``.to(device)`` copy inside the train loop
(training_DANRA_conditional.py:805-852). TPU-native version: a background
thread keeps a small queue of ready host batches while the current step
runs, and ``device_put`` (optionally with a batch NamedSharding) overlaps
the H2D copy with compute — the classic double-buffer pattern.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterable: Iterable[Any],
    *,
    buffer_size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Any]:
    """Iterate batches with background host prefetch and eager device_put.

    ``sharding`` (e.g. parallel.batch_sharding(mesh)) shards the batch dim
    across the mesh during the transfer, so per-device slices land
    directly on their chips.
    """

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    err_box = []

    def producer():
        try:
            for batch in iterable:
                q.put(put(batch))
        except BaseException as e:  # propagate loader errors to consumer
            err_box.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is sentinel:
            if err_box:
                raise err_box[0]
            return
        yield item


__all__ = ["prefetch_to_device"]
