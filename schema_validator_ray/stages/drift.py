"""Distribution-drift checks: KS statistic on t-digest CDFs (numeric columns),
PSI on categorical value distributions and fixed-bin histograms (intensity).

North-rule functionality with no reference analogue (SURVEY §2.7). A *reference
profile* is built once from a trusted split (or an earlier run) and stored as JSON
-able dict; each validation run builds the same profile from the new data (via the
pre-aggregated sketch stage in stats.py) and compares:

- numeric: KS = max |cdf_ref(x) - cdf_new(x)| evaluated on the union of centroid
  locations; fail at ks > threshold (default 0.15);
- categorical / histogram: PSI = sum((p-q) * ln(p/q)) over categories/bins with
  epsilon smoothing; fail at psi > threshold (default 0.25, the classic industry
  cutoff).
"""

from __future__ import annotations

import numpy as np

from ..functions.sketches import TDigest
from .stats import ColumnProfile

KS_THRESHOLD = 0.15
PSI_THRESHOLD = 0.25
_EPS = 1e-6


def ks_statistic(ref: TDigest, new: TDigest) -> float:
    if ref.n == 0 or new.n == 0:
        return 0.0
    xs = np.unique(np.concatenate([ref.means, new.means]))
    return float(np.max(np.abs(ref.cdf(xs) - new.cdf(xs))))


def psi(p_counts: dict, q_counts: dict) -> float:
    keys = sorted(set(p_counts) | set(q_counts), key=str)
    p = np.array([max(p_counts.get(k, 0), 0) for k in keys], np.float64)
    q = np.array([max(q_counts.get(k, 0), 0) for k in keys], np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0
    p = np.maximum(p / p.sum(), _EPS)
    q = np.maximum(q / q.sum(), _EPS)
    return float(np.sum((p - q) * np.log(p / q)))


def psi_hist(p_hist: np.ndarray, q_hist: np.ndarray) -> float:
    p = np.asarray(p_hist, np.float64)
    q = np.asarray(q_hist, np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0
    p = np.maximum(p / p.sum(), _EPS)
    q = np.maximum(q / q.sum(), _EPS)
    return float(np.sum((p - q) * np.log(p / q)))


def compare_profiles(ref: dict[str, ColumnProfile], new: dict[str, ColumnProfile],
                     *, ks_threshold: float = KS_THRESHOLD,
                     psi_threshold: float = PSI_THRESHOLD) -> list[dict]:
    """Per-column drift verdicts: [{column, metric, value, threshold, ok}]."""
    out = []
    for name, rp in ref.items():
        np_ = new.get(name)
        if np_ is None:
            continue
        if isinstance(rp, np.ndarray):  # fixed-bin histogram (e.g. __intensity__)
            v = psi_hist(rp, np.asarray(np_))
            out.append({"column": name, "metric": "psi", "value": v,
                        "threshold": psi_threshold, "ok": v <= psi_threshold})
            continue
        if rp.tdigest is not None and np_.tdigest is not None:
            ks = ks_statistic(rp.tdigest, np_.tdigest)
            out.append({"column": name, "metric": "ks", "value": ks,
                        "threshold": ks_threshold, "ok": ks <= ks_threshold})
        if rp.cms is not None and np_.cms is not None:
            v = psi(dict(rp.cms.top(32)), dict(np_.cms.top(32)))
            out.append({"column": name, "metric": "psi", "value": v,
                        "threshold": psi_threshold, "ok": v <= psi_threshold})
    return out


def merge_histograms(hist_batches) -> np.ndarray:
    """Sum fixed-bin histogram partials (e.g. the decode stage's per-image
    intensity histograms) into one global histogram."""
    total = None
    for h in hist_batches:
        a = np.asarray(h, np.int64)
        a = a.sum(axis=0) if a.ndim == 2 else a
        total = a if total is None else total + a
    return total if total is not None else np.zeros(0, np.int64)
