"""Small runtime utilities shared by the CLIs."""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterable, Iterator, TypeVar

_T = TypeVar("_T")


def prefetch(iterable: Iterable[_T], depth: int = 2) -> Iterator[_T]:
    """Host/device overlap: pull items from ``iterable`` in a background
    thread, keeping up to ``depth`` ready ahead of the consumer.

    The reference overlaps input work via DataLoader worker processes
    (/root/reference/main_diffusion.py:221-230); here a single thread suffices
    because the heavy collation is the C++ collator releasing the GIL and the
    device transfer is async. Wrap an iterator whose __next__ does the
    collate (+ optionally jax.device_put) so the next batch is staged while
    the TPU runs the current step."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    First XLA compiles of the big fused train-step programs take minutes on
    the remote-compile TPU path; the persistent cache makes every later
    process start instantly for unchanged programs. Call before the first
    jit execution.
    """
    import jax

    cache_dir = path or os.environ.get(
        "ARREAU_JAX_CACHE", os.path.expanduser("~/.cache/arreau_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
