"""Exponential-histogram sliding-window counter (Datar, Gionis, Indyk
& Motwani 2002, "Maintaining stream statistics over sliding windows" —
the DGIM structure): the number of flagged events in the LAST ``W``
ticks, maintained online with ``O(r log W)`` buckets instead of a
W-slot ring buffer.

Every other summary in the engine is a TUMBLING-bucket monoid (rollup
tiers, CMS/Bloom/KMV/DDSketch); the sliding window is the shape those
cannot express with bounded state — DGIM trades exactness for it:

* buckets hold power-of-two counts of flagged ticks; at most ``r``
  buckets of each size are kept (``r >= 2``), merging the two oldest
  of a size when a size overflows;
* buckets whose newest tick leaves the window expire whole;
* the estimate counts full buckets plus HALF the straddling oldest
  bucket, so the error is at most half the oldest bucket's size.

Error guarantee (pinned in tests): once a bucket of size ``2s`` exists,
at least ``r - 1`` buckets of every smaller size remain (merging takes
the two OLDEST of a size and expiry removes only the tail), so with the
oldest bucket at size ``2^j`` the window holds at least
``1 + (r - 1)(2^j - 1)`` true events while the error is at most
``2^(j-1)`` — a uniform bound of ``|est - true| <= max(1/2, true / r)``
(the ``j = 1`` corner attains ``true / r``; a lone size-1 bucket
attains the absolute ``1/2``; the asymptote is ``true / (2 (r - 1))``).

Pure deterministic Python — no hashing, no randomness; the Spark
operator replays it per series inside one Arrow stage
(``operators/... eh_sliding_count_map``), with the exact relational
window count joined next to it so the bound is visible per row.
"""

from __future__ import annotations


class ExpHistogram:
    """DGIM counter for a single 0/1 stream over a window of ``W``
    ticks. ``add(t)`` records a flagged event at tick ``t`` (ticks must
    be non-decreasing); ``estimate(now)`` returns the approximate count
    of flagged events in ``(now - W, now]``."""

    __slots__ = ("window", "r", "buckets")

    def __init__(self, window: int, r: int = 4):
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if r < 2:
            raise ValueError(f"r must be >= 2, got {r}")
        self.window = window
        self.r = r
        # (newest_tick, size) pairs, newest first; sizes non-decreasing
        # toward the tail (powers of two)
        self.buckets: list = []

    def _expire(self, now: int) -> None:
        while self.buckets and self.buckets[-1][0] <= now - self.window:
            self.buckets.pop()

    def add(self, t: int) -> None:
        self._expire(t)
        self.buckets.insert(0, (t, 1))
        # cascade merges: when r+1 buckets of one size exist, merge the
        # two OLDEST of that size into one of twice the size (keeping
        # the newer of the two timestamps — the merged bucket's newest)
        size = 1
        i = 0
        while True:
            idx = [j for j in range(i, len(self.buckets))
                   if self.buckets[j][1] == size]
            if len(idx) <= self.r:
                break
            a, b = idx[-2], idx[-1]  # two oldest of this size
            self.buckets[a] = (self.buckets[a][0], size * 2)
            del self.buckets[b]
            i = idx[0]
            size *= 2

    def estimate(self, now: int) -> float:
        self._expire(now)
        if not self.buckets:
            return 0.0
        total = sum(s for _, s in self.buckets)
        return total - self.buckets[-1][1] + self.buckets[-1][1] / 2.0

    def n_buckets(self) -> int:
        return len(self.buckets)

    def max_error(self) -> float:
        """Current analytic error bound: half the oldest bucket."""
        return self.buckets[-1][1] / 2.0 if self.buckets else 0.0
