"""Asynchronous frame pipeline: decode threads -> bounded queue -> device.

Reimagines the reference's event bus + GPU worker free-list
(reference src/EventsThread.cpp:57-116 — one mutex/condvar queue per
service, drop-on-full backpressure at :63; src/SlamGpuPipeline/
SlamGpuPipeline.cpp:144-165 — frames silently skipped when no GPU worker
is free) for a world where the "GPU worker" is a single jitted step:

  * A thread pool decodes/loads frames ahead of the consumer (PNG decode
    and disk IO are the host-side cost; the device step is async anyway).
  * A bounded queue provides backpressure; `drop_when_full` reproduces the
    reference's frame-drop policy for live sources, while dataset replay
    uses blocking mode (drop nothing, throttle the producer).
  * Stats mirror the reference's counters (frames in/out/dropped,
    per-stage wall time — buildStream.cpp:657-665).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

from jetracer_orbslam2_tpu.utils.timing import StageTimers


@dataclasses.dataclass
class PipelineStats:
    produced: int = 0
    consumed: int = 0
    dropped: int = 0


class FramePipeline:
    """Prefetching producer/consumer bridge.

    source: iterable of frame payloads (anything — usually io.datasets
    Frame objects or already-decoded numpy arrays).
    transform: optional host-side per-frame preprocessing executed in the
    producer threads (e.g. PNG decode, dtype conversion, device_put).
    """

    _STOP = object()

    def __init__(
        self,
        source: Iterable,
        transform: Optional[Callable] = None,
        capacity: int = 5,
        drop_when_full: bool = False,
        num_workers: int = 1,
    ):
        self.source = source
        self.transform = transform
        self.capacity = capacity
        self.drop_when_full = drop_when_full
        self.num_workers = max(1, num_workers)
        self.stats = PipelineStats()
        self.timers = StageTimers()
        self._q: queue.Queue = queue.Queue(maxsize=capacity)
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()

    # -- producer ----------------------------------------------------------
    def _next_item(self):
        with self._it_lock:
            try:
                item = next(self._it)
            except StopIteration:
                return self._STOP, -1
            seq = self._seq
            self._seq += 1
            return item, seq

    def _producer(self):
        while not self._stop.is_set():
            item, seq = self._next_item()
            if item is self._STOP:
                break
            if self.transform is not None:
                with self.timers.timer("decode"):
                    item = self.transform(item)
            if self.drop_when_full:
                try:
                    self._q.put_nowait((seq, item))
                    self.stats.produced += 1
                except queue.Full:
                    # the reference's policy: drop and log
                    # (EventsThread.cpp:63-71)
                    self.stats.dropped += 1
            else:
                while not self._stop.is_set():
                    try:
                        self._q.put((seq, item), timeout=0.1)
                        self.stats.produced += 1
                        break
                    except queue.Full:
                        continue
        self._q.put(self._STOP)

    # -- consumer ----------------------------------------------------------
    def __iter__(self) -> Iterator:
        """Yields frames in source order (a reorder buffer compensates for
        decode-thread races); dropped frames are skipped over."""
        self._it = iter(self.source)
        self._it_lock = threading.Lock()
        self._seq = 0
        for t in range(self.num_workers):
            th = threading.Thread(target=self._producer, daemon=True)
            th.start()
            self._threads.append(th)
        finished = 0
        pending: dict[int, object] = {}
        next_seq = 0
        try:
            while True:
                item = self._q.get()
                if item is self._STOP:
                    finished += 1
                    if finished == self.num_workers:
                        # flush whatever arrived (in order), skipping holes
                        for s in sorted(pending):
                            self.stats.consumed += 1
                            yield pending[s]
                        return
                    continue
                seq, payload = item
                pending[seq] = payload
                while True:
                    if next_seq in pending:
                        self.stats.consumed += 1
                        yield pending.pop(next_seq)
                        next_seq += 1
                    elif (self.drop_when_full
                          and pending
                          and len(pending) > self.capacity):
                        next_seq = min(pending)  # hole was a dropped frame
                    else:
                        break
        finally:
            self.close()

    def close(self):
        self._stop.set()
        for th in self._threads:
            th.join(timeout=1.0)
        self._threads.clear()
