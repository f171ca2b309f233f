"""Merging t-digest — mergeable quantile sketch with tail accuracy.

From scratch per Dunning & Ertl 2019 ("Computing extremely accurate
quantiles using t-digests"), merging variant: centroids (mean, weight)
kept sorted; a merge pass walks the sorted stream and greedily fuses
neighbors while the fused weight respects the k1 scale-function bound,
which squeezes centroid capacity near q=0 and q=1 (better tails than
uniform-capacity sketches). Merge(other) = concatenate centroid lists
+ one merge pass — associative up to sketch error.

Vectorized: batch values are np.sort-ed and pre-clustered; the merge
pass is a short Python loop over centroids (<= ~2*delta of them),
never over raw items.
"""

from __future__ import annotations


from ..serde import dumps as serde_dumps, loads as serde_loads

import numpy as np

_KIND = b"TDG1"


def _k1(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


class TDigest:
    def __init__(self, delta: float = 200.0) -> None:
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_n = 0

    def add_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        ok = ~np.isnan(v)
        v = v[ok]
        if v.size == 0:
            return
        w = (
            np.ones(v.size, dtype=np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64)[ok]
        )
        self._buf_m.append(v)
        self._buf_w.append(w)
        self._buf_n += v.size
        if self._buf_n > 8 * int(self.delta):
            self._flush()

    def _flush(self) -> None:
        if not self._buf_m:
            return
        m = np.concatenate([self.means] + self._buf_m)
        w = np.concatenate([self.weights] + self._buf_w)
        self._buf_m, self._buf_w, self._buf_n = [], [], 0
        o = np.argsort(m, kind="stable")
        m, w = m[o], w[o]
        total = w.sum()
        # single merge pass (Dunning-Ertl Algorithm 1)
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(m[0]), float(w[0])
        q0 = 0.0
        lim = self._q_limit(q0, total)
        for i in range(1, m.size):
            if cur_w + w[i] <= (lim - q0) * total:
                cur_m += (m[i] - cur_m) * w[i] / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                lim = self._q_limit(q0, total)
                cur_m, cur_w = float(m[i]), float(w[i])
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
        self.n = float(total)

    def _q_limit(self, q0: float, total: float) -> float:
        k0 = _k1(q0, self.delta)
        q = np.sin(2 * np.pi * (k0 + 1.0) / self.delta) / 2 + 0.5
        return min(float(q), 1.0)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("incompatible TDigest (delta)")
        other._flush()
        if other.means.size:
            self._buf_m.append(other.means)
            self._buf_w.append(other.weights)
            self._buf_n += other.means.size
        self._flush()
        return self

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        self._flush()
        if self.means.size == 0:
            return np.full(np.shape(q) or (1,), np.nan)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        cw = np.cumsum(self.weights) - self.weights / 2
        t = qs * self.n
        return np.interp(t, cw, self.means)

    def cdf(self, x: float | np.ndarray) -> np.ndarray:
        self._flush()
        if self.means.size == 0:
            return np.full(np.shape(x) or (1,), np.nan)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        cw = np.cumsum(self.weights) - self.weights / 2
        return np.interp(xs, self.means, cw / self.n, left=0.0, right=1.0)

    def serialize(self) -> bytes:
        self._flush()
        return _KIND + serde_dumps(
            {"delta": self.delta, "means": self.means, "weights": self.weights,
             "n": self.n}
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        if blob[:4] != _KIND:
            raise ValueError("not a TDigest blob")
        d = serde_loads(blob[4:])
        sk = cls(d["delta"])
        sk.means = d["means"]
        sk.weights = d["weights"]
        sk.n = d["n"]
        return sk
