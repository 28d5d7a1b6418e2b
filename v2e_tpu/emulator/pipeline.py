"""Depth-N pipelined chunk driver around the emulator's submit/collect API.

Shared by the CLI paths: the device runs ahead of the host by up to `depth`
chunks, a single collector thread overlaps the device->host fetches with the
next submissions, and event callbacks fire in submission order on the
caller's thread.
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
        self._collector = ThreadPoolExecutor(1)
        self._pending: deque = deque()

    def push(self, frames, times) -> None:
        handle = self.emulator.submit_batch(frames, times)
        if handle is None:
            return
        self._pending.append(
            self._collector.submit(self.emulator.collect, handle)
        )
        if len(self._pending) > self.depth:
            self._drain_one()

    def _drain_one(self) -> None:
        events, labels, offsets = self._pending.popleft().result()
        if events.shape[0]:
            self.on_events(events, labels, offsets)

    def flush(self) -> None:
        while self._pending:
            self._drain_one()

    def close(self) -> None:
        self.flush()
        self._collector.shutdown()
