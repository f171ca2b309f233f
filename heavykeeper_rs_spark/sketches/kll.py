"""KLL quantile sketch — mergeable rank/quantile estimator.

From scratch per Karnin, Lang & Liberty 2016 ("Optimal Quantile
Approximation in Streams"): a hierarchy of compactors; level h holds
items of weight 2^h; a full compactor sorts its buffer and promotes a
random parity's half upward. Capacities shrink geometrically
(c = 2/3) toward lower levels. Rank error is ~O(1/k) with k the top
capacity. Merge = levelwise concatenation + re-compaction (weights are
preserved, so merge is associative up to sketch error).

All buffers are float64 NumPy arrays; compaction is sort + slice —
no per-item Python.
"""

from __future__ import annotations


from ..serde import dumps as serde_dumps, loads as serde_loads

import numpy as np

_KIND = b"KLL1"
_C = 2.0 / 3.0


class KLL:
    def __init__(self, k: int = 200, seed: int = 12345) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    def _capacity(self, h: int) -> int:
        # top level gets k, each level below shrinks by c
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def add_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += v.size
        self._compress()

    def _total_size(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _max_total(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels))) + self.k

    def _compress(self) -> None:
        while self._total_size() > self._max_total():
            for h in range(len(self.levels)):
                if self.levels[h].size > self._capacity(h):
                    buf = np.sort(self.levels[h])
                    if buf.size % 2 == 1:
                        # keep one item at this level, compact the rest
                        keep_one = buf[-1:]
                        buf = buf[:-1]
                    else:
                        keep_one = np.empty(0, dtype=np.float64)
                    parity = int(self.rng.integers(0, 2))
                    promoted = buf[parity::2]
                    self.levels[h] = keep_one
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], promoted]
                    )
                    break
            else:
                break

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("incompatible KLL (k)")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, 2**h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        o = np.argsort(v, kind="stable")
        return v[o], w[o]

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        v, w = self._weighted()
        if v.size == 0:
            return np.full(np.shape(q) or (1,), np.nan)
        cw = np.cumsum(w)
        target = np.atleast_1d(np.asarray(q, dtype=np.float64)) * cw[-1]
        pos = np.searchsorted(cw, target, side="left")
        pos = np.clip(pos, 0, v.size - 1)
        return v[pos]

    def rank(self, x: float | np.ndarray) -> np.ndarray:
        """Approximate normalized rank of x (fraction of items <= x)."""
        v, w = self._weighted()
        if v.size == 0:
            return np.full(np.shape(x) or (1,), np.nan)
        cw = np.concatenate([[0.0], np.cumsum(w)])
        pos = np.searchsorted(v, np.atleast_1d(np.asarray(x)), side="right")
        return cw[pos] / cw[-1]

    def serialize(self) -> bytes:
        return _KIND + serde_dumps(
            {"k": self.k, "seed": self.seed, "levels": self.levels, "n": self.n}
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "KLL":
        if blob[:4] != _KIND:
            raise ValueError("not a KLL blob")
        d = serde_loads(blob[4:])
        sk = cls(d["k"], d["seed"])
        sk.levels = d["levels"]
        sk.n = d["n"]
        return sk
