"""Depth-N pipelined chunk driver around the emulator's submit/collect API.

Shared by the CLI paths: the device runs ahead of the host by up to `depth`
chunks, and collection runs as a two-stage ordered pipeline — a fetcher
thread owns the link (device wait + packed fetches) while a finalizer
thread owns the host (event materialization + sink writes) — so chunk N's
fetch overlaps chunk N-1's materialization.  Event callbacks fire in
submission order on the caller's thread.
"""
from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional

import numpy as np


class ChunkPipeline:
    def __init__(
        self,
        emulator,
        on_events: Callable[[np.ndarray, Optional[np.ndarray], np.ndarray], None],
        depth: int = 6,
    ):
        self.emulator = emulator
        self.on_events = on_events
        self.depth = depth
        self._fetcher = ThreadPoolExecutor(1)
        self._finalizer = ThreadPoolExecutor(1)
        self._pending: deque = deque()

    def push(self, frames, times) -> None:
        handle = self.emulator.submit_batch(frames, times)
        if handle is None:
            return
        ffut = self._fetcher.submit(self.emulator.collect_fetch, handle)
        self._pending.append(
            self._finalizer.submit(self._finalize, handle, ffut)
        )
        if len(self._pending) > self.depth:
            self._drain_one()

    def _finalize(self, handle, ffut):
        return self.emulator.collect_finalize(handle, ffut.result())

    def _drain_one(self) -> None:
        events, labels, offsets = self._pending.popleft().result()
        if events.shape[0]:
            self.on_events(events, labels, offsets)

    def flush(self) -> None:
        while self._pending:
            self._drain_one()

    def close(self) -> None:
        self.flush()
        self._fetcher.shutdown()
        self._finalizer.shutdown()
