"""Approximate-time synchronization of sensor streams.

Host-side equivalent of message_filters::ApproximateTime as used by the
merger (point_cloud_merger/include/.../PointCloudMerger.h:30-40): groups
one message per stream into tuples whose stamps lie within a window,
tolerating rate mismatch and jitter; dead streams (no recent messages)
are dropped from the expected set, mirroring the merger's failover
rewiring (PointCloudMerger.cc:191-250).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class ApproximateTimeSync:
    """Queue-based approximate-time synchronizer.

    push(stream, stamp, payload) returns a completed tuple
    {stream: (stamp, payload)} whenever one can be emitted, else None.
    """

    streams: List[str]
    slop: float = 0.05            # max stamp spread within a tuple [s]
    queue_size: int = 10
    liveness_timeout: float = 1.0  # streams silent longer are not awaited

    _queues: Dict[str, List[Tuple[float, Any]]] = field(default_factory=dict)
    _last_seen: Dict[str, float] = field(default_factory=dict)
    _last_emitted: float = field(default=-1e18)

    _first_activity: float = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        for s in self.streams:
            self._queues[s] = []
            self._last_seen[s] = None  # never seen

    def alive_streams(self, now: float) -> List[str]:
        out = []
        for s in self.streams:
            seen = self._last_seen[s]
            if seen is None:
                # cold start: await unseen streams until the timeout has
                # elapsed since the first message on ANY stream
                if (
                    self._first_activity is None
                    or now - self._first_activity <= self.liveness_timeout
                ):
                    out.append(s)
            elif now - seen <= self.liveness_timeout:
                out.append(s)
        return out

    def push(self, stream: str, stamp: float, payload) -> Optional[Dict[str, tuple]]:
        q = self._queues[stream]
        q.append((float(stamp), payload))
        if len(q) > self.queue_size:
            q.pop(0)
        self._last_seen[stream] = float(stamp)
        if self._first_activity is None:
            self._first_activity = float(stamp)
        return self._try_emit(float(stamp))

    def _try_emit(self, now: float) -> Optional[Dict[str, tuple]]:
        alive = self.alive_streams(now)
        if not alive or any(not self._queues[s] for s in alive):
            return None
        alive = [s for s in alive if self._queues[s]]
        # candidate: earliest head across alive streams; try to pick one
        # message per stream within slop of the pivot
        pivot_stream = min(alive, key=lambda s: self._queues[s][0][0])
        pivot = self._queues[pivot_stream][0][0]
        if pivot <= self._last_emitted:
            self._queues[pivot_stream].pop(0)
            return None
        chosen = {}
        for s in alive:
            best = None
            for stamp, payload in self._queues[s]:
                if abs(stamp - pivot) <= self.slop:
                    if best is None or abs(stamp - pivot) < abs(best[0] - pivot):
                        best = (stamp, payload)
            if best is None:
                # pivot cannot complete: if any stream's earliest message
                # is already past pivot+slop, the pivot never completes
                if all(q and q[0][0] > pivot + self.slop
                       for s2, q in self._queues.items()
                       if s2 != pivot_stream and s2 in alive):
                    self._queues[pivot_stream].pop(0)
                return None
            chosen[s] = best
        # emit: remove chosen + everything older
        for s, (stamp, _) in chosen.items():
            self._queues[s] = [
                (t, p) for t, p in self._queues[s] if t > stamp
            ]
        self._last_emitted = pivot
        return chosen
