"""Mergeable sketches: t-digest (quantiles), HyperLogLog (distinct), Count-Min +
top-k (heavy hitters).

These are the per-column stats the north rule requires (absent from the reference,
whose only aggregate is an error slice — SURVEY §2.7). All three are:
- **mergeable**: per-batch/per-actor partials combine associatively, so the global
  sketch is a tiny ``groupby``/driver reduce over O(num_blocks) rows, never a
  row-level shuffle;
- **bounded**: O(KB) each regardless of input size;
- **deterministic** for a fixed input multiset (t-digest compression depends on
  merge order only weakly; tests assert tolerances, not exact centroids).

Pure numpy; no external deps. Standard algorithms from the literature (Dunning &
Ertl t-digest; Flajolet et al. HLL; Cormode & Muthukrishnan CMS).
"""

from __future__ import annotations

import pickle

import numpy as np

# ---------------------------------------------------------------------------
# stable 64-bit hashing (shared by HLL / CMS)

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def hash64_ints(v: np.ndarray) -> np.ndarray:
    """splitmix-style avalanche over int64/uint64 arrays."""
    h = v.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= _M1
    h ^= h >> np.uint64(33)
    h *= _M2
    h ^= h >> np.uint64(33)
    return h


def hash64_strings(vals: list) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (int.from_bytes(
            hashlib.blake2b(
                (x if isinstance(x, bytes) else str(x or "").encode()),
                digest_size=8).digest(), "little")
         for x in vals),
        dtype=np.uint64, count=len(vals))


def hash_column(col) -> np.ndarray:
    """Hash a pyarrow array to uint64 (ints avalanche; strings blake2b)."""
    import pyarrow as pa

    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # widen before filling: the sentinel does not fit narrow int types
        return hash64_ints(pc.cast(col, pa.int64()).fill_null(-(2 ** 63))
                           .to_numpy(zero_copy_only=False))
    if pa.types.is_floating(col.type):
        v = col.fill_null(np.nan).to_numpy(zero_copy_only=False)
        return hash64_ints(v.view(np.uint64) if v.dtype == np.float64
                           else v.astype(np.float64).view(np.uint64))
    return hash64_strings(col.to_pylist())


# ---------------------------------------------------------------------------
# HyperLogLog


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros + 1 = 65 - bit_length; bit_length via float log2
        # (guard bit makes rest nonzero; values rounding up at a 2^k boundary
        # shift rank by 1 with probability ~2^-40 — negligible HLL bias)
        nz = 64 - self.p + 1
        bl = np.floor(np.log2(rest.astype(np.float64))).astype(np.int64) + 1
        rank = np.clip(65 - bl, 1, nz)
        np.maximum.at(self.registers, idx, rank.astype(np.uint8))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting for small cardinalities
        return float(e)

    def dumps(self) -> bytes:
        return pickle.dumps((self.p, self.registers))

    @classmethod
    def loads(cls, b: bytes) -> "HLL":
        p, regs = pickle.loads(b)
        h = cls(p)
        h.registers = regs
        return h


# ---------------------------------------------------------------------------
# t-digest (merging variant)


class TDigest:
    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self.n = 0.0
        self._min = np.inf
        self._max = -np.inf

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        # pre-bin large batches to bound compress cost
        if v.size > 4 * self.delta:
            v.sort()
            chunks = np.array_split(v, 2 * self.delta)
            means = np.array([c.mean() for c in chunks if c.size])
            wts = np.array([c.size for c in chunks if c.size], np.float64)
        else:
            means, wts = v, np.ones(v.size)
        self.means = np.concatenate([self.means, means])
        self.weights = np.concatenate([self.weights, wts])
        self.n += float(wts.sum())
        if self.means.size > 4 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, wts = self.means[order], self.weights[order]
        total = wts.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], wts[0]
        cum = 0.0
        for i in range(1, means.size):
            q = (cum + cur_w / 2) / total
            limit = 4 * total * q * (1 - q) / self.delta
            if cur_w + wts[i] <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + means[i] * wts[i]) / (cur_w + wts[i])
                cur_w += wts[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = means[i], wts[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.n
        return float(np.interp(target, cum, self.means,
                               left=self._min, right=self._max))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        if self.n == 0:
            return np.zeros(len(np.atleast_1d(x)))
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2
        return np.interp(np.atleast_1d(x), self.means, cum / self.n,
                         left=0.0, right=1.0)

    def dumps(self) -> bytes:
        self._compress()
        return pickle.dumps(
            (self.delta, self.means, self.weights, self.n, self._min, self._max))

    @classmethod
    def loads(cls, b: bytes) -> "TDigest":
        delta, means, weights, n, mn, mx = pickle.loads(b)
        t = cls(delta)
        t.means, t.weights, t.n, t._min, t._max = means, weights, n, mn, mx
        return t


# ---------------------------------------------------------------------------
# Count-Min + top-k heavy hitters


class CountMin:
    def __init__(self, width: int = 2048, depth: int = 4, topk: int = 32):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), np.int64)
        self.topk = topk
        self.candidates: dict = {}

    def _rows(self, h: np.ndarray) -> list[np.ndarray]:
        out = []
        for d in range(self.depth):
            hd = hash64_ints(h + np.uint64(0x9E37 * (d + 1)))
            out.append((hd % np.uint64(self.width)).astype(np.int64))
        return out

    def add(self, keys: list) -> None:
        counts: dict = {}
        for k in keys:  # combine within batch first
            counts[k] = counts.get(k, 0) + 1
        ks = list(counts)
        hs = hash64_strings(ks)
        cs = np.array([counts[k] for k in ks], np.int64)
        for d, pos in enumerate(self._rows(hs)):
            np.add.at(self.table[d], pos, cs)
        est = self.query_hashes(hs)
        for k, e in zip(ks, est):
            self.candidates[k] = int(e)
        if len(self.candidates) > 4 * self.topk:
            keep = sorted(self.candidates.items(), key=lambda kv: -kv[1])[: 2 * self.topk]
            self.candidates = dict(keep)

    def query_hashes(self, hs: np.ndarray) -> np.ndarray:
        est = np.full(len(hs), np.iinfo(np.int64).max, np.int64)
        for d, pos in enumerate(self._rows(hs)):
            est = np.minimum(est, self.table[d][pos])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        for k in other.candidates:
            self.candidates[k] = 0
        if self.candidates:
            ks = list(self.candidates)
            est = self.query_hashes(hash64_strings(ks))
            self.candidates = dict(zip(ks, (int(e) for e in est)))
            keep = sorted(self.candidates.items(), key=lambda kv: -kv[1])[: 2 * self.topk]
            self.candidates = dict(keep)
        return self

    def top(self, k: int | None = None):
        k = k or self.topk
        return sorted(self.candidates.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]

    def dumps(self) -> bytes:
        return pickle.dumps((self.width, self.depth, self.topk, self.table,
                             self.candidates))

    @classmethod
    def loads(cls, b: bytes) -> "CountMin":
        width, depth, topk, table, cand = pickle.loads(b)
        c = cls(width, depth, topk)
        c.table = table
        c.candidates = cand
        return c
