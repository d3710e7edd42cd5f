"""Host->device prefetch: overlap next-batch H2D transfer with the current
step's compute.

The reference's DataLoader is synchronous single-process
(datafactory/dataloader.py:98,111). Here a background thread stages the
next batch onto the device (sharded when a mesh is given) while the jitted
step runs, hiding host parse + PCIe/tunnel latency. Depth-1 double
buffering is enough because steps are long relative to transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def prefetch_to_device(batch_iter: Iterator, size: int = 2,
                       mesh=None, transform: Optional[Callable] = None
                       ) -> Iterator:
    """Wrap a host batch iterator with a staging thread.

    transform(batch) -> pytree of arrays to place (default: identity).
    With a mesh, array leaves get their batch axis sharded over 'data'."""
    from t2ms_tpu.parallel.mesh import global_shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def _place(batch):
        payload = transform(batch) if transform is not None else batch
        if mesh is not None:
            # multi-host aware: assembles the global array from
            # process-local rows when jax.process_count() > 1
            return batch, global_shard_batch(mesh, payload)
        return batch, jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a))
            if isinstance(a, (np.ndarray, jax.Array)) else a, payload)

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone —
        otherwise an abandoned generator (e.g. step_fn raised mid-epoch)
        leaves this thread blocked in q.put forever, pinning the staged
        device-resident batches."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in batch_iter:
                if not _put(_place(batch)):
                    return
        except Exception as e:  # surface errors on the consumer side
            _put(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        # consumer abandoned (or finished): release the worker and the
        # staged batches it holds. One drain is not enough — the worker
        # can complete a q.put into the just-drained queue inside its
        # 0.5 s timeout window, pinning one staged device batch until GC;
        # join it briefly, then drain whatever it managed to stage.
        stop.set()
        for _ in range(2):
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=1.0)
            if not t.is_alive():
                break
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
