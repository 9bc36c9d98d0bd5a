"""Per-column statistics profiling: exact partials (count / nulls / min / max /
sum) + mergeable sketches (t-digest quantiles, HLL distinct, Count-Min top-k).

The partial/combiner pattern from the guide: the ``map_batches`` stage emits ONE
row per (column, batch) containing serialized partial sketches; the reduce touches
only those O(num_blocks) rows (streamed to the driver — each partial is O(KB),
so the reduce is trivially small at any input scale; a tree/groupby merge is the
documented path if num_blocks itself ever became huge).

The stage is a callable CLASS: per-actor state (the column plan) is built once in
``__init__``, not per batch.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import HLL, CountMin, TDigest, hash_column


@dataclass
class ColumnProfile:
    column: str
    count: int = 0
    nulls: int = 0
    vmin: float | str | None = None
    vmax: float | str | None = None
    vsum: float = 0.0
    tdigest: TDigest | None = None
    hll: HLL | None = None
    cms: CountMin | None = None

    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        self.count += other.count
        self.nulls += other.nulls
        for attr, fn in (("vmin", min), ("vmax", max)):
            a, b = getattr(self, attr), getattr(other, attr)
            setattr(self, attr, b if a is None else (a if b is None else fn(a, b)))
        self.vsum += other.vsum
        if other.tdigest is not None:
            self.tdigest = (other.tdigest if self.tdigest is None
                            else self.tdigest.merge(other.tdigest))
        if other.hll is not None:
            self.hll = other.hll if self.hll is None else self.hll.merge(other.hll)
        if other.cms is not None:
            self.cms = other.cms if self.cms is None else self.cms.merge(other.cms)
        return self

    def summary(self) -> dict:
        out = {
            "column": self.column, "count": self.count, "nulls": self.nulls,
            "min": self.vmin, "max": self.vmax, "sum": self.vsum,
        }
        if self.tdigest is not None and self.tdigest.n:
            out["quantiles"] = {q: self.tdigest.quantile(q)
                                for q in (0.01, 0.25, 0.5, 0.75, 0.99)}
        if self.hll is not None:
            out["distinct_est"] = self.hll.estimate()
        if self.cms is not None:
            out["top"] = self.cms.top()
        return out


class ColumnProfilerStage:
    """map_batches stage -> one partial row per (column, batch):
    (column, count, nulls, min_s, max_s, sum, blob) with blob = pickled sketches."""

    def __init__(self, numeric_columns: list[str] = (),
                 categorical_columns: list[str] = (),
                 key_columns: list[str] = ()):
        self.numeric = list(numeric_columns)
        self.categorical = list(categorical_columns)
        self.keys = list(key_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for col_name in dict.fromkeys(self.numeric + self.categorical + self.keys):
            col = batch[col_name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            p = ColumnProfile(col_name)
            p.count = len(col)
            p.nulls = col.null_count
            if col_name in self.numeric:
                v = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                if v.size:
                    p.vmin, p.vmax, p.vsum = float(v.min()), float(v.max()), float(v.sum())
                p.tdigest = TDigest()
                p.tdigest.add(v)
            if col_name in self.categorical:
                p.cms = CountMin()
                p.cms.add(col.drop_null().to_pylist())
            if col_name in self.keys or col_name in self.categorical:
                p.hll = HLL()
                p.hll.add_hashes(hash_column(col))
            rows.append((col_name, p.count, p.nulls,
                         pickle.dumps((p.vmin, p.vmax, p.vsum, p.tdigest, p.hll, p.cms))))
        return pa.table({
            "column": pa.array([r[0] for r in rows], pa.string()),
            "count": pa.array([r[1] for r in rows], pa.int64()),
            "nulls": pa.array([r[2] for r in rows], pa.int64()),
            "blob": pa.array([r[3] for r in rows], pa.binary()),
        })


def merge_profiles(partials_ds) -> dict[str, ColumnProfile]:
    """Reduce the partials Dataset (tiny: one row per column per batch) into final
    per-column profiles."""
    profiles: dict[str, ColumnProfile] = {}
    for b in partials_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        cols = b["column"].to_pylist()
        counts = b["count"].to_pylist()
        nulls = b["nulls"].to_pylist()
        blobs = b["blob"].to_pylist()
        for cname, cnt, nl, blob in zip(cols, counts, nulls, blobs):
            vmin, vmax, vsum, td, hll, cms = pickle.loads(blob)
            p = ColumnProfile(cname, cnt, nl, vmin, vmax, vsum, td, hll, cms)
            if cname in profiles:
                profiles[cname].merge(p)
            else:
                profiles[cname] = p
    return profiles


def grouped_tdigest(ds, key: str, col: str,
                    batch_size: int = 65536) -> dict:
    """Per-group approximate quantiles: one t-digest per key value.
    Partial/combiner: each batch emits one (key, pickled digest) row per key
    present; a ``groupby(key)`` merges worker-side (digests are mergeable) and
    the driver receives exactly one digest per key. Right for modest key
    cardinality (dashboards, per-class stats); per-key rows never shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                           col: b[col].to_numpy(zero_copy_only=False)})
        rows_k, rows_b = [], []
        for k, sub in df.groupby(key):
            td = TDigest()
            td.add(sub[col].to_numpy())
            rows_k.append(k)
            rows_b.append(pickle.dumps(td))
        return pa.table({key: pa.array(rows_k),
                         "blob": pa.array(rows_b, pa.binary())})

    def merge_group(g: pa.Table) -> pa.Table:
        merged = None
        for blob in g["blob"].to_pylist():
            td = pickle.loads(blob)
            merged = td if merged is None else merged.merge(td)
        return pa.table({key: g[key].slice(0, 1),
                         "blob": pa.array([pickle.dumps(merged)],
                                          pa.binary())})

    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size)
    reduced = partials.groupby(key).map_groups(merge_group,
                                               batch_format="pyarrow")
    out = {}
    for b in reduced.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for k, blob in zip(b[key].to_pylist(), b["blob"].to_pylist()):
            out[k] = pickle.loads(blob)
    return out


def grouped_hll(ds, key: str, col: str, batch_size: int = 65536) -> dict:
    """Per-group approximate distinct counts: one HLL per key value, merged
    worker-side exactly like :func:`grouped_tdigest` (register-max merges are
    order-independent, so the estimate is deterministic under re-blocking)."""
    from ..functions.sketches import hash_column

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        kvals = b[key].to_numpy(zero_copy_only=False)
        cvals = b[col]
        if isinstance(cvals, pa.ChunkedArray):
            cvals = cvals.combine_chunks()
        hashes = hash_column(cvals)
        df = pd.DataFrame({key: kvals, "_h": hashes})
        rows_k, rows_b = [], []
        for k, sub in df.groupby(key):
            h = HLL()
            h.add_hashes(sub["_h"].to_numpy())
            rows_k.append(k)
            rows_b.append(pickle.dumps(h))
        return pa.table({key: pa.array(rows_k),
                         "blob": pa.array(rows_b, pa.binary())})

    def merge_group(g: pa.Table) -> pa.Table:
        merged = None
        for blob in g["blob"].to_pylist():
            h = pickle.loads(blob)
            merged = h if merged is None else merged.merge(h)
        return pa.table({key: g[key].slice(0, 1),
                         "blob": pa.array([pickle.dumps(merged)],
                                          pa.binary())})

    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size)
    reduced = partials.groupby(key).map_groups(merge_group,
                                               batch_format="pyarrow")
    out = {}
    for b in reduced.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for k, blob in zip(b[key].to_pylist(), b["blob"].to_pylist()):
            out[k] = pickle.loads(blob)
    return out


def merge_profiles_distributed(partials_ds) -> dict[str, ColumnProfile]:
    """Tree-merge path for partial streams too large to stream to the driver
    (≳10^6 blocks): a ``groupby(column)`` reduces every column's partials on
    workers — sketches are mergeable, so each group collapses to ONE row — and
    the driver loads exactly one profile per column."""

    def merge_group(g: pa.Table) -> pa.Table:
        merged: ColumnProfile | None = None
        colname = g["column"][0].as_py()
        for cnt, nl, blob in zip(g["count"].to_pylist(),
                                 g["nulls"].to_pylist(),
                                 g["blob"].to_pylist()):
            vmin, vmax, vsum, td, hll, cms = pickle.loads(blob)
            p = ColumnProfile(colname, int(cnt), int(nl),
                              vmin, vmax, vsum, td, hll, cms)
            merged = p if merged is None else merged.merge(p)
        return pa.table({
            "column": pa.array([merged.column]),
            "count": pa.array([merged.count], pa.int64()),
            "nulls": pa.array([merged.nulls], pa.int64()),
            "blob": pa.array([pickle.dumps(
                (merged.vmin, merged.vmax, merged.vsum,
                 merged.tdigest, merged.hll, merged.cms))], pa.binary()),
        })

    reduced = partials_ds.groupby("column").map_groups(
        merge_group, batch_format="pyarrow")
    return merge_profiles(reduced)


def save_profiles(profiles: dict[str, ColumnProfile], path: str) -> str:
    """Persist a profile set (the drift reference) — pickle of the dataclasses,
    written atomically."""
    import os
    import uuid

    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    payload = {}
    for k, p in profiles.items():
        if isinstance(p, ColumnProfile):
            payload[k] = ("col", (p.column, p.count, p.nulls, p.vmin, p.vmax,
                                  p.vsum, p.tdigest, p.hll, p.cms))
        else:  # raw histogram entries (e.g. "__intensity__")
            payload[k] = ("hist", np.asarray(p))
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_profiles(path: str) -> dict:
    with open(path, "rb") as f:
        raw = pickle.load(f)
    out = {}
    for k, (kind, v) in raw.items():
        out[k] = ColumnProfile(*v) if kind == "col" else v
    return out


def profile_dataset(ds, *, numeric=(), categorical=(), keys=(),
                    batch_size: int = 65536,
                    distributed_merge: bool = False) -> dict[str, ColumnProfile]:
    """``distributed_merge=True`` routes the partials through the worker-side
    tree merge (one groupby) instead of the incremental driver stream — use it
    when block count is huge (the partial stream is O(blocks x columns))."""
    cols = list(dict.fromkeys(list(numeric) + list(categorical) + list(keys)))
    partials = (ds.select_columns(cols)  # prune before the stage
                .map_batches(ColumnProfilerStage(numeric, categorical, keys),
                             batch_format="pyarrow", batch_size=batch_size))
    if distributed_merge:
        return merge_profiles_distributed(partials)
    return merge_profiles(partials)


def exact_quantiles(ds, col: str, qs: list[float]):
    """EXACT order statistics: (q, value) rows matching DuckDB's
    ``quantile_disc`` (value at sorted index ``max(ceil(q*n)-1, 0)`` over
    the n non-null values).

    Shape: one distributed sort of the (single, pruned) column; the sorted
    blocks STAY in the object store — per-block row counts come back from
    tiny remote tasks, and the driver then fetches ONLY the blocks that
    contain a target index (≤ len(qs) blocks), never the data between.
    Scale note: the sort is a full all-to-all over one column; the t-digest
    profile is the 100-TB default, this is the exactness path (SLA cutoffs,
    oracle checks)."""
    import math

    import ray

    nonnull = ds.select_columns([col]).map_batches(
        lambda b: b.drop_null(), batch_format="pyarrow")
    mat = nonnull.sort(col).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    n = int(sum(counts))
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    bounds = np.concatenate([[0], np.cumsum(counts)])
    out_q, out_v = [], []
    fetched: dict[int, pa.Table] = {}
    for q in qs:
        idx = max(math.ceil(q * n) - 1, 0)
        blk = int(np.searchsorted(bounds, idx, side="right") - 1)
        if blk not in fetched:
            fetched[blk] = ray.get(refs[blk])
        out_q.append(q)
        out_v.append(fetched[blk][col][idx - int(bounds[blk])].as_py())
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v)})


def grouped_exact_quantile(ds, key: str, col: str, q: float, *,
                           bucket_width="auto",
                           out_col: str = "qvalue",
                           summary_merge_max: int = 5_000_000):
    """EXACT per-group order statistic (DuckDB ``quantile_disc(col, q) GROUP
    BY key`` — the value at sorted index ``max(ceil(q*n)-1, 0)`` of each
    group's n non-null values). The approximate companion is
    ``grouped_tdigest``; this is the exactness path.

    Distributed selection, NOT a per-group sort: pass 1 ships only per-batch
    ``(key, value-bucket, count)`` partials (no row ever shuffles); the
    driver prefix-sums each key's bucket counts to locate the single bucket
    containing the target rank and its local rank within that bucket; pass 2
    re-reads the input, keeps ONLY rows of probed (key, bucket) pairs — the
    rows within one ``bucket_width`` of the quantile — and one tiny
    ``map_groups`` sort picks the element. A hot key ships one bucket, never
    its history. Falls back to a per-key sort (`groupby(key)`, hot-key
    bounded) if the count summaries exceed ``summary_merge_max``.

    ``bucket_width="auto"`` (default) calibrates from a sampled-quantile
    pre-pass over ``col`` — a finer grid than the rank operators (the width
    bounds how many rows pass 2 re-ships per key)."""
    import math

    import ray
    from ray.data.aggregate import Sum

    from ._calibrate import resolve_bucket_width

    bucket_width = resolve_bucket_width(ds, col, bucket_width,
                                        target_buckets=256)
    import pandas as _pd
    if isinstance(bucket_width, _pd.Timedelta):
        bucket_width = float(bucket_width.value)   # ns, matching the cast
    bucket_width = float(bucket_width)

    def part(b: pa.Table) -> pa.Table:
        t = b.select([key, col]).drop_null()
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.floor(v / bucket_width).astype(np.int64)
        tt = pa.table({key: t[key], "_bkt": pa.array(bkt)})
        agg = tt.group_by([key, "_bkt"]).aggregate([([], "count_all")])
        return pa.table({key: agg[key], "_bkt": agg["_bkt"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    counts = (ds.map_batches(part, batch_format="pyarrow")
              .groupby([key, "_bkt"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    import pandas as pd
    parts, total = [], 0
    for b in counts.iter_batches(batch_size=1 << 20, batch_format="pandas"):
        if len(b):
            parts.append(b)
            total += len(b)
        if total > summary_merge_max:
            return _exact_grouped_quantile_fallback(ds, key, col, q, out_col)
    if not parts:
        return ds.map_batches(
            lambda b: pa.table({key: b[key].slice(0, 0),
                                out_col: b[col].slice(0, 0)}),
            batch_format="pyarrow")
    c = (pd.concat(parts, ignore_index=True)
         .sort_values([key, "_bkt"], kind="stable").reset_index(drop=True))
    kv = c[key].to_numpy()
    cnt = c["cnt"].to_numpy()
    key_brk = np.r_[True, kv[1:] != kv[:-1]]
    seg = np.flatnonzero(key_brk)
    seg_id = np.cumsum(key_brk) - 1
    cum = np.cumsum(cnt)
    base = np.r_[0, cum[:-1]][seg]                 # rows before each key
    n_per_key = (cum[np.r_[seg[1:] - 1, len(c) - 1]] - base)[seg_id]
    target = np.maximum(np.ceil(q * n_per_key) - 1, 0).astype(np.int64)
    before = np.r_[0, cum[:-1]] - base[seg_id]     # rows before this bucket
    hit = (target >= before) & (target < before + cnt)
    probes = {(k, b): int(r) for k, b, r in
              zip(kv[hit], c["_bkt"].to_numpy()[hit],
                  (target - before)[hit])}
    ref = ray.put(probes)

    def keep(b: pa.Table) -> pa.Table:
        pr = ray.get(ref)
        t = b.select([key, col]).drop_null()
        if t.num_rows == 0:
            # factorize of an empty MultiIndex raises ("cannot infer number
            # of levels"); an all-null batch must just contribute nothing
            return t.append_column("_bkt", pa.array([], pa.int64()))
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.floor(v / bucket_width).astype(np.int64)
        kk = t[key].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            pd.MultiIndex.from_arrays([kk, bkt]))
        sel = np.fromiter((u in pr for u in uniq), bool, len(uniq))
        mask = sel[codes]
        return pa.table({key: t[key].filter(pa.array(mask)),
                         col: t[col].filter(pa.array(mask)),
                         "_bkt": pa.array(bkt[mask])})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        pr = ray.get(ref)
        k0 = g[key].iloc[0]
        r = pr[(k0, int(g["_bkt"].iloc[0]))]
        v = np.sort(g[col].to_numpy())
        return pd.DataFrame({key: [k0], out_col: [v[r]]})

    return (ds.map_batches(keep, batch_format="pyarrow")
            .groupby([key, "_bkt"])
            .map_groups(pick, batch_format="pandas"))


def _exact_grouped_quantile_fallback(ds, key, col, q, out_col):
    import math

    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k0, sub in g.groupby(key, sort=False):
            v = np.sort(sub[col].dropna().to_numpy())
            if not len(v):
                continue
            out.append((k0, v[max(math.ceil(q * len(v)) - 1, 0)]))
        return pd.DataFrame(out, columns=[key, out_col])

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def grouped_exact_quantiles(ds, key: str, col: str, qs, *,
                            out_cols=None, bucket_width="auto",
                            summary_merge_max: int = 5_000_000):
    """EXACT per-group order statistics for SEVERAL quantiles at once
    (DuckDB ``quantile_disc(col, q_i) GROUP BY key``, one wide row per key)
    — the same two-pass distributed selection as
    ``grouped_exact_quantile``, but ALL targets probe in the SAME count
    pass and the SAME fetch pass: p25/p50/p75 cost one selection, not
    three (2 passes instead of 6). The widen step is a tiny shuffle over
    |keys| × |qs| picked rows, never the input."""
    import math

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ._calibrate import resolve_bucket_width

    qs = [float(q) for q in qs]
    if out_cols is None:
        out_cols = [f"q{int(round(q * 100)):02d}" for q in qs]
    if len(out_cols) != len(qs):
        raise ValueError("out_cols must align with qs")
    bucket_width = resolve_bucket_width(ds, col, bucket_width,
                                        target_buckets=256)
    import pandas as _pd
    if isinstance(bucket_width, _pd.Timedelta):
        bucket_width = float(bucket_width.value)   # ns, matching the cast
    bucket_width = float(bucket_width)

    def part(b: pa.Table) -> pa.Table:
        t = b.select([key, col]).drop_null()
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.floor(v / bucket_width).astype(np.int64)
        tt = pa.table({key: t[key], "_bkt": pa.array(bkt)})
        agg = tt.group_by([key, "_bkt"]).aggregate([([], "count_all")])
        return pa.table({key: agg[key], "_bkt": agg["_bkt"],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    counts = (ds.map_batches(part, batch_format="pyarrow")
              .groupby([key, "_bkt"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    from ._collect import collect_up_to

    cparts, over = collect_up_to(counts, summary_merge_max,
                                 batch_format="pandas")
    if over:
        return _exact_grouped_quantiles_fallback(ds, key, col, qs, out_cols)
    if not cparts:
        return ds.map_batches(
            lambda b: pa.table(
                {key: b[key].slice(0, 0)}
                | {oc: b[col].slice(0, 0) for oc in out_cols}),
            batch_format="pyarrow")
    c = (pd.concat(cparts, ignore_index=True)
         .sort_values([key, "_bkt"], kind="stable").reset_index(drop=True))
    kv = c[key].to_numpy()
    cnt = c["cnt"].to_numpy()
    key_brk = np.r_[True, kv[1:] != kv[:-1]]
    seg = np.flatnonzero(key_brk)
    seg_id = np.cumsum(key_brk) - 1
    cum = np.cumsum(cnt)
    base = np.r_[0, cum[:-1]][seg]
    n_per_key = (cum[np.r_[seg[1:] - 1, len(c) - 1]] - base)[seg_id]
    before = np.r_[0, cum[:-1]] - base[seg_id]
    probes: dict = {}
    for qi, q in enumerate(qs):
        target = np.maximum(np.ceil(q * n_per_key) - 1, 0).astype(np.int64)
        hit = (target >= before) & (target < before + cnt)
        for k, bk, r in zip(kv[hit], c["_bkt"].to_numpy()[hit],
                            (target - before)[hit]):
            probes.setdefault((k, bk), []).append((qi, int(r)))
    ref = ray.put(probes)

    def keep(b: pa.Table) -> pa.Table:
        pr = ray.get(ref)
        t = b.select([key, col]).drop_null()
        if t.num_rows == 0:
            return t.append_column("_bkt", pa.array([], pa.int64()))
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.floor(v / bucket_width).astype(np.int64)
        kk = t[key].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(pd.MultiIndex.from_arrays([kk, bkt]))
        sel = np.fromiter((u in pr for u in uniq), bool, len(uniq))
        mask = sel[codes]
        return pa.table({key: t[key].filter(pa.array(mask)),
                         col: t[col].filter(pa.array(mask)),
                         "_bkt": pa.array(bkt[mask])})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        pr = ray.get(ref)
        k0 = g[key].iloc[0]
        v = np.sort(g[col].to_numpy())
        rows = [(k0, qi, v[r]) for qi, r in pr[(k0, int(g["_bkt"].iloc[0]))]]
        return pd.DataFrame(rows, columns=[key, "_qi", "_qv"])

    picked = (ds.map_batches(keep, batch_format="pyarrow")
              .groupby([key, "_bkt"])
              .map_groups(pick, batch_format="pandas"))

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        row = {key: [g[key].iloc[0]]}
        got = dict(zip(g["_qi"], g["_qv"]))
        for qi, oc in enumerate(out_cols):
            row[oc] = [got[qi]]
        return pd.DataFrame(row)

    return picked.groupby(key).map_groups(widen, batch_format="pandas")


def _exact_grouped_quantiles_fallback(ds, key, col, qs, out_cols):
    import math

    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k0, sub in g.groupby(key, sort=False):
            v = np.sort(sub[col].dropna().to_numpy())
            if not len(v):
                continue
            out.append([k0] + [v[max(math.ceil(q * len(v)) - 1, 0)]
                               for q in qs])
        return pd.DataFrame(out, columns=[key] + list(out_cols))

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def winsorize_by_group(ds, key: str, col: str, *, lo_q: float = 0.05,
                       hi_q: float = 0.95, out_col: str = "v_w",
                       keep_cols=None, bucket_width="auto"):
    """Clip ``col`` into its group's exact [quantile_disc(lo_q),
    quantile_disc(hi_q)] band — heavy-tail taming before any mean-based
    statistic. ONE multi-quantile selection (2 passes, both thresholds
    probed together via ``grouped_exact_quantiles``), the |groups|×2
    threshold table broadcasts via ``ray.put``, and the clip runs
    map-only. Rows with a null key or null value are dropped (the SQL
    oracle's inner JOIN USING(key) semantics)."""
    import pandas as pd
    import ray

    from ._collect import collect_up_to

    bands = grouped_exact_quantiles(ds, key, col, [lo_q, hi_q],
                                    out_cols=["_lo", "_hi"],
                                    bucket_width=bucket_width)
    bparts, over = collect_up_to(bands, 5_000_000)
    if over:
        raise ValueError("winsorize_by_group: per-group threshold table "
                         "exceeds the 5M-row broadcast budget — bucket the "
                         "key space or clip per shard")
    lut = {}
    for p in bparts:                               # |groups| rows
        for kv, lo, hi in zip(p[key].to_pylist(),
                              p["_lo"].to_pylist(), p["_hi"].to_pylist()):
            lut[kv] = (float(lo), float(hi))
    ref = ray.put(lut)
    cols = keep_cols if keep_cols is not None else None

    def clip(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        t = b
        keys = t[key].to_numpy(zero_copy_only=False)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(keys)
        keep = (codes >= 0) & ~np.isnan(v)
        if len(uniq):
            lo = np.array([m.get(u, (np.nan, np.nan))[0] for u in uniq])
            hi = np.array([m.get(u, (np.nan, np.nan))[1] for u in uniq])
            keep &= ~np.isnan(lo[np.maximum(codes, 0)])
            w = np.minimum(np.maximum(v, lo[np.maximum(codes, 0)]),
                           hi[np.maximum(codes, 0)])
        else:
            w = v
        out = t.filter(pa.array(keep))
        sel = out.select(cols) if cols else out
        return sel.append_column(out_col, pa.array(w[keep], pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow")


def filter_by_group_quantile(ds, key: str, col: str, *, q: float = 0.25,
                             keep_cols=None, thr_col: str = "thr",
                             bucket_width="auto"):
    """Adaptive per-group quality gate: keep rows whose ``col`` is >= their
    OWN group's exact quantile_disc(``q``) — the "drop each source's worst
    quartile" curation rule, robust to sources whose score scales differ
    (a fixed global threshold over- or under-prunes skewed sources).

    Same distributed shape as ``winsorize_by_group``: ONE exact selection
    pass per group (``grouped_exact_quantiles``), the |groups|-row threshold
    table broadcast once via ``ray.put``, then a map-only filter. Rows with
    a null key or null value are dropped (SQL inner-JOIN semantics)."""
    import pandas as pd
    import ray

    from ._collect import collect_up_to

    bands = grouped_exact_quantiles(ds, key, col, [q], out_cols=["_thr"],
                                    bucket_width=bucket_width)
    bparts, over = collect_up_to(bands, 5_000_000)
    if over:
        raise ValueError("filter_by_group_quantile: per-group threshold "
                         "table exceeds the 5M-row broadcast budget — "
                         "bucket the key space first")
    lut = {}
    for p in bparts:                               # |groups| rows
        for kv, t in zip(p[key].to_pylist(), p["_thr"].to_pylist()):
            lut[kv] = float(t)
    ref = ray.put(lut)
    cols = list(keep_cols) if keep_cols is not None else None

    def gate(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = b[key].to_numpy(zero_copy_only=False)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(keys)
        keep = (codes >= 0) & ~np.isnan(v)
        if len(uniq):
            thr = np.array([m.get(u, np.nan) for u in uniq], np.float64)
            tv = thr[np.maximum(codes, 0)]
            keep &= ~np.isnan(tv) & (v >= tv)
        else:
            tv = np.full(len(v), np.nan)
        out = b.filter(pa.array(keep))
        sel = out.select(cols + [col]) if cols else out
        return sel.append_column(thr_col, pa.array(tv[keep], pa.float64()))

    return ds.map_batches(gate, batch_format="pyarrow")


def iqr_outliers_by_group(ds, key: str, col: str, *, k: float = 1.5,
                          keep_cols=None, bucket_width="auto"):
    """Tukey-fence robust outliers per group: rows whose ``col`` falls
    outside [q1 − k·IQR, q3 + k·IQR] of their OWN group's exact quartiles —
    the box-plot rule, complementing the z-score (mean/σ, skew-sensitive)
    and MAD outlier detectors. Matches the SQL
    ``quantile_disc(0.25/0.75) GROUP BY key`` + fence-filter formulation
    bit-for-bit (both sides compute ``q1 − k·(q3 − q1)`` in doubles).

    Same distributed shape as ``winsorize_by_group``: ONE multi-quantile
    exact selection (2 passes, q1 and q3 probed together), the |groups|×2
    fence table broadcast once via ``ray.put``, then a map-only filter.
    Rows with a null key or null value are dropped (SQL inner-JOIN
    semantics)."""
    import pandas as pd
    import ray

    from ._collect import collect_up_to

    bands = grouped_exact_quantiles(ds, key, col, [0.25, 0.75],
                                    out_cols=["_q1", "_q3"],
                                    bucket_width=bucket_width)
    bparts, over = collect_up_to(bands, 5_000_000)
    if over:
        raise ValueError("iqr_outliers_by_group: per-group fence table "
                         "exceeds the 5M-row broadcast budget — bucket the "
                         "key space first")
    lut = {}
    for p in bparts:                               # |groups| rows
        for kv, q1, q3 in zip(p[key].to_pylist(),
                              p["_q1"].to_pylist(), p["_q3"].to_pylist()):
            q1 = float(q1)
            q3 = float(q3)
            iqr = q3 - q1
            lut[kv] = (q1 - k * iqr, q3 + k * iqr)
    ref = ray.put(lut)
    cols = list(keep_cols) if keep_cols is not None else None

    def gate(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = b[key].to_numpy(zero_copy_only=False)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(keys)
        keep = (codes >= 0) & ~np.isnan(v)
        if len(uniq):
            lo = np.array([m.get(u, (np.nan, np.nan))[0] for u in uniq])
            hi = np.array([m.get(u, (np.nan, np.nan))[1] for u in uniq])
            lov = lo[np.maximum(codes, 0)]
            hiv = hi[np.maximum(codes, 0)]
            keep &= ~np.isnan(lov) & ((v < lov) | (v > hiv))
        out = b.filter(pa.array(keep))
        return out.select(cols) if cols else out

    return ds.map_batches(gate, batch_format="pyarrow")


def trimmed_mean_by_group(ds, key: str, col: str, *, lo_q: float = 0.05,
                          hi_q: float = 0.95, out_col: str = "trimmed_mean",
                          n_col: str = "n_kept", bucket_width="auto"):
    """Exact interquantile (trimmed) mean per group: the mean of values
    inside the group's own [quantile_disc(lo_q), quantile_disc(hi_q)] band
    — the robust-location aggregate that, unlike ``winsorize_by_group``
    (which CLAMPS tail values), DROPS them. Value-based trimming, so it is
    deterministic under ties and matches the SQL
    ``AVG(col) FILTER (col BETWEEN lo AND hi)`` formulation.

    Distributed shape: ONE multi-quantile selection for both bounds, the
    |groups|×2 band table broadcast once, then conditional (n, Σ) partials
    per batch → one tiny |groups|-row groupby → map-only divide. The value
    column itself never re-shuffles."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    bands = grouped_exact_quantiles(ds, key, col, [lo_q, hi_q],
                                    out_cols=["_lo", "_hi"],
                                    bucket_width=bucket_width)
    bparts, over = collect_up_to(bands, 5_000_000)
    if over:
        raise ValueError("trimmed_mean_by_group: per-group band table "
                         "exceeds the 5M-row broadcast budget — bucket the "
                         "key space first")
    lut = {}
    for p in bparts:                               # |groups| rows
        for kv, lo, hi in zip(p[key].to_pylist(),
                              p["_lo"].to_pylist(), p["_hi"].to_pylist()):
            lut[kv] = (float(lo), float(hi))
    ref = ray.put(lut)

    def part(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        t = b.select([key, col]).drop_null()
        keys = t[key].to_numpy(zero_copy_only=False)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(keys)
        if len(uniq):
            lo = np.array([m.get(u, (np.nan, np.nan))[0] for u in uniq])
            hi = np.array([m.get(u, (np.nan, np.nan))[1] for u in uniq])
            keep = (~np.isnan(lo[codes])) & (v >= lo[codes]) & (v <= hi[codes])
        else:
            keep = np.zeros(0, bool)
        kk = keys[keep]
        vv = v[keep]
        codes2, uniq2 = pd.factorize(kk)
        n = np.bincount(codes2, minlength=len(uniq2)).astype(np.int64)
        s = np.zeros(len(uniq2), np.float64)
        np.add.at(s, codes2, vv)
        return pa.table({key: pa.array(uniq2),
                         "_n": pa.array(n), "_s": pa.array(s)})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(key)
           .aggregate(Sum("_n", alias_name="_n"), Sum("_s", alias_name="_s")))

    def fin(b: pa.Table) -> pa.Table:
        n = np.asarray(b["_n"], dtype=np.float64)
        s = np.asarray(b["_s"], dtype=np.float64)
        return pa.table({key: b[key],
                         n_col: pc.cast(b["_n"], pa.int64()),
                         out_col: pa.array(np.round(s / n, 6))})

    return agg.map_batches(fin, batch_format="pyarrow")


def key_size_histogram(ds, key_cols, *, size_col: str = "cluster_size",
                       n_col: str = "n_keys",
                       pairs_col: str = "candidate_pairs"):
    """Key-cardinality (skew / duplication) profile: for each distinct
    group size s, how many keys have exactly s rows, plus the blocking
    candidate-pair count s·(s−1)/2 · n_keys — the reduction-ratio input of
    a record-linkage blocking scheme, and the straight answer to "is this
    join/shuffle key skewed, and how much pairwise work would blocking on
    it create?".

    Two bounded exchanges: per-batch (key, cnt) partials (keys-per-batch
    rows, never the input) → groupby sum → per-batch (size, 1) partials →
    a second groupby over the tiny distinct-size alphabet. Rows with any
    null key column are excluded (SQL GROUP BY drops them via the WHERE)."""
    from ray.data.aggregate import Sum

    key_cols = list(key_cols)

    def cnt_part(b: pa.Table) -> pa.Table:
        t = b.select(key_cols).drop_null()
        agg = t.group_by(key_cols).aggregate([([], "count_all")])
        return agg.set_column(
            agg.schema.get_field_index("count_all"), "cnt",
            pc.cast(agg["count_all"], pa.int64()))

    per_key = (ds.map_batches(cnt_part, batch_format="pyarrow")
               .groupby(key_cols)
               .aggregate(Sum("cnt", alias_name="cnt")))

    def size_part(b: pa.Table) -> pa.Table:
        sizes = b["cnt"].to_numpy(zero_copy_only=False)
        uniq, n = np.unique(sizes, return_counts=True)
        return pa.table({size_col: pa.array(uniq.astype(np.int64)),
                         "_n": pa.array(n.astype(np.int64))})

    hist = (per_key.map_batches(size_part, batch_format="pyarrow")
            .groupby(size_col)
            .aggregate(Sum("_n", alias_name=n_col)))

    def fin(b: pa.Table) -> pa.Table:
        s = np.asarray(b[size_col], dtype=np.int64)
        n = np.asarray(b[n_col], dtype=np.int64)
        return pa.table({size_col: b[size_col],
                         n_col: pc.cast(b[n_col], pa.int64()),
                         pairs_col: pa.array(s * (s - 1) // 2 * n)})

    return hist.map_batches(fin, batch_format="pyarrow")


def grouped_entropy(ds, key: str, col: str, *, out_col: str = "entropy"):
    """Shannon entropy (bits) of ``col``'s value distribution per ``key`` —
    e.g. behavioural diversity per user, class balance per source. Matches
    SQL ``entropy(col) GROUP BY key`` (log2) at 6dp.

    Fully vectorized two-stage shape: per-batch ``(key, value, cnt)``
    partials (exchange bounded by distinct pairs per batch) → groupby sum →
    the identity ``H = log2(N) − (Σ c·log2 c)/N`` turns the finish into one
    more Sum-groupby over per-row terms — no per-group function calls."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        agg = (b.select([key, col]).drop_null()
               .group_by([key, col]).aggregate([([], "count_all")]))
        return pa.table({key: agg[key], col: agg[col],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    pairs = (ds.map_batches(part, batch_format="pyarrow")
             .groupby([key, col])
             .aggregate(Sum("cnt", alias_name="cnt")))

    def terms(b: pa.Table) -> pa.Table:
        c = b["cnt"].to_numpy().astype(np.float64)
        return pa.table({key: b[key],
                         "n": pa.array(c, pa.float64()),
                         "clog": pa.array(c * np.log2(c), pa.float64())})

    sums = (pairs.map_batches(terms, batch_format="pyarrow")
            .groupby(key)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("clog", alias_name="clog")))

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy()
        h = np.log2(n) - b["clog"].to_numpy() / n
        return pa.table({key: b[key],
                         out_col: pa.array(np.round(h, 6), pa.float64())})

    return sums.map_batches(fin, batch_format="pyarrow")


def histogram_fixed(ds, col: str, *, lo: float, hi: float, n_bins: int):
    """Equi-width histogram of a numeric column — the exact companion to the
    t-digest profile. Bin semantics follow SQL ``width_bucket``: values below
    ``lo`` land in bin 0, values ≥ ``hi`` in bin ``n_bins + 1``, otherwise
    ``floor((v - lo) / (hi - lo) * n_bins) + 1`` (the float expression is
    kept in exactly that order so a SQL oracle using the same literal
    expression bins boundary values identically). NULLs are excluded.

    Map-only per-batch ``bincount`` partials (≤ n_bins + 2 rows per batch,
    regardless of batch size) → one tiny groupby. Nothing row-sized crosses
    the exchange, so the 100-TB shape is a scan plus a |bins|-row shuffle."""
    from ray.data.aggregate import Sum

    lo_f, hi_f = float(lo), float(hi)

    def part(b: pa.Table) -> pa.Table:
        arr = b[col]
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        # always mask NaN, not just when null_count > 0: a literal NaN in a
        # non-null float column would yield an undefined bin index that
        # escapes both where-clamps (NaN < lo and NaN >= hi are both False)
        v = v[~np.isnan(v)]
        bins = (np.floor((v - lo_f) / (hi_f - lo_f) * n_bins) + 1).astype(
            np.int64)
        bins = np.where(v < lo_f, 0,
                        np.where(v >= hi_f, n_bins + 1, bins))
        cnt = np.bincount(bins, minlength=n_bins + 2)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n")))


def heavy_hitters_exact(ds, col: str, min_count: int, *,
                        local_threshold: int | None = None,
                        candidates_max: int = 5_000_000):
    """EXACT heavy hitters (keys with global count >= ``min_count``) in two
    passes, without a full-cardinality groupby:

    1. Candidate pass — each batch emits only keys whose LOCAL count reaches
       ``local_threshold``. Pigeonhole guarantee: a key with global count
       >= T over P batches has local count >= ceil(T / P) in at least one
       batch, so ``local_threshold <= ceil(T / P)`` means zero false
       negatives; the actual batch count is verified after the pass and the
       run fails LOUDLY if the guarantee didn't hold (rather than silently
       dropping hitters).
    2. Verify pass — the candidate key set broadcasts via ``ray.put``; a
       map-only pass emits exact per-batch counts for candidates only, a
       tiny groupby sums them, and the final filter applies ``min_count``.

    At 10^12 rows this touches the full key cardinality in NO exchange:
    pass 1 ships only locally-frequent keys, pass 2 only candidates.
    Returns a Dataset of (col, n)."""
    import ray
    from ray.data.aggregate import Sum

    thr = local_threshold if local_threshold is not None else max(
        1, min_count // 64)

    def candidates_partial(b: pa.Table) -> pa.Table:
        agg = (b.select([col]).drop_null().group_by(col)
               .aggregate([([], "count_all")]))
        cnt = agg["count_all"].to_numpy(zero_copy_only=False)
        keep = agg.filter(pa.array(cnt >= thr))
        # sentinel row (null key) marks one source batch for the P check
        keys = pa.concat_arrays([keep[col].combine_chunks(),
                                 pa.array([None], keep[col].type)])
        return pa.table({col: keys})

    cand_keys, n_batches, total = set(), 0, 0
    for b in (ds.map_batches(candidates_partial, batch_format="pyarrow")
              .iter_batches(batch_size=1 << 20, batch_format="pyarrow")):
        keys = b[col]
        nulls = keys.null_count
        n_batches += nulls
        vals = keys.drop_null().to_pylist()
        cand_keys.update(vals)
        total += len(vals)
        if total > candidates_max:
            raise ValueError(
                f"candidate volume exceeds {candidates_max}; raise "
                f"local_threshold (now {thr}) or min_count")
    import math

    needed = max(1, math.ceil(min_count / max(n_batches, 1)))
    if thr > needed:
        raise ValueError(
            f"local_threshold {thr} breaks the pigeonhole guarantee for "
            f"min_count={min_count} over {n_batches} batches (needs <= "
            f"{needed}); rerun with local_threshold={needed}")
    keys_ref = ray.put(np.sort(np.array(sorted(cand_keys))))

    def exact_partial(b: pa.Table) -> pa.Table:
        ev = ray.get(keys_ref)
        agg = (b.select([col]).drop_null().group_by(col)
               .aggregate([([], "count_all")]))
        kv = agg[col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ev, kv)
        pos[pos == len(ev)] = 0
        hit = (ev[pos] == kv) if len(ev) else np.zeros(len(kv), bool)
        keep = agg.filter(pa.array(hit))
        return pa.table({col: keep[col],
                         "n": pa.array(
                             keep["count_all"].to_numpy(zero_copy_only=False)
                             .astype(np.int64), pa.int64())})

    totals = (ds.map_batches(exact_partial, batch_format="pyarrow")
              .groupby(col).aggregate(Sum("n", alias_name="n")))

    def final(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            b["n"].to_numpy(zero_copy_only=False) >= min_count))

    return totals.map_batches(final, batch_format="pyarrow")


def grouped_corr(ds, key: str, x: str, y: str):
    """Exact per-group Pearson correlation from one pass of sufficient
    statistics: each batch reduces to (key, n, sx, sy, sxx, syy, sxy), a
    tiny groupby sums them, and the driver-free finalize applies the
    closed-form r = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2)(n*syy - sy^2)).
    The exchange is O(groups x batches) rows regardless of input size.
    Zero-variance groups yield null (SQL corr() semantics). Rows where
    either column is null are excluded pairwise (SQL semantics)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key, x, y]).drop_null()
        xv = t[x].to_numpy(zero_copy_only=False).astype(np.float64)
        yv = t[y].to_numpy(zero_copy_only=False).astype(np.float64)
        agg_src = pa.table({key: t[key],
                            "n": pa.array(np.ones(len(xv), np.int64)),
                            "sx": pa.array(xv), "sy": pa.array(yv),
                            "sxx": pa.array(xv * xv),
                            "syy": pa.array(yv * yv),
                            "sxy": pa.array(xv * yv)})
        return agg_src.group_by(key).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]).rename_columns(
            [key, "n", "sx", "sy", "sxx", "syy", "sxy"])

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(key)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxx", alias_name="sxx"),
                         Sum("syy", alias_name="syy"),
                         Sum("sxy", alias_name="sxy")))

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        vx = n * b["sxx"].to_numpy(zero_copy_only=False) - sx * sx
        vy = n * b["syy"].to_numpy(zero_copy_only=False) - sy * sy
        cov = n * b["sxy"].to_numpy(zero_copy_only=False) - sx * sy
        denom = np.sqrt(vx * vy)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(denom > 0, cov / denom, np.nan)
        return pa.table({key: b[key],
                         "n": pc.cast(b["n"], pa.int64()),
                         "corr": pa.array(r, pa.float64(), from_pandas=True)})

    return totals.map_batches(finalize, batch_format="pyarrow")


def chi2_independence(ds, col_a: str, col_b: str, *,
                      level_budget: int = 2_000_000,
                      with_levels: bool = False):
    """Pearson chi-square test of independence between two categorical
    columns — the "did the distribution of B shift across A" validation
    check (drift across sources, time buckets, shards).

    Fully distributed: per-batch ``(a, b, count)`` partials (exchange
    bounded by the batch's DISTINCT pairs, never its rows) merge into a
    DISTRIBUTED contingency-cell dataset that is never collected. Only the
    MARGINALS come to the driver (|A| + |B| rows, behind the loud
    ``level_budget`` — millions of category levels isn't a chi-square-shaped
    question); they broadcast via ``ray.put`` and the (O−E)²/E deltas run
    as a map over the cell table. ZERO-observed cells — whose (O−E)²/E = E
    term SQL formulations silently drop — never need enumerating: expected
    values sum to n over the FULL |A|×|B| grid, so their total contribution
    is exactly ``n − Σ_observed E``.

    Rows with a null in EITHER column are excluded — null is not a category
    level here (pair the op with the `required` rule to surface them).

    Returns a one-row Dataset: (chi2 rounded 6dp, dof, n)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        t = b.select([col_a, col_b]).drop_null()
        agg = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        return pa.table({col_a: agg[col_a], col_b: agg[col_b],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    from ._collect import collect_up_to

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .groupby([col_a, col_b])
             .aggregate(Sum("cnt", alias_name="cnt"))
             .materialize())                    # reused: marginals + deltas

    def _marginal(col):
        m = cells.groupby(col).aggregate(Sum("cnt", alias_name="m"))
        parts, over = collect_up_to(m, level_budget)
        if over:
            raise ValueError(
                f"chi2_independence: {col} exceeds the {level_budget}-level "
                "budget — bucket the column before testing")
        if not parts:
            return {}, np.int64(0)
        t = pa.concat_tables(parts)
        vals = t["m"].to_numpy(zero_copy_only=False)
        return dict(zip(t[col].to_pylist(), vals.tolist())), vals.sum()

    ma, n_a = _marginal(col_a)
    mb, _ = _marginal(col_b)
    empty = pa.table({"chi2": pa.array([], pa.float64()),
                      "dof": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if with_levels:
        empty = (empty.append_column("ka", pa.array([], pa.int64()))
                 .append_column("kb", pa.array([], pa.int64())))
    n = float(n_a)
    if n == 0:
        return rd.from_arrow(empty)
    ref = ray.put((ma, mb, n))

    def deltas(t: pa.Table) -> pa.Table:
        A, B, tot = ray.get(ref)
        o = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        # one dict probe per DISTINCT level, then a vectorized gather
        import pandas as pd
        ca, ua = pd.factorize(t[col_a].to_numpy(zero_copy_only=False))
        cb, ub = pd.factorize(t[col_b].to_numpy(zero_copy_only=False))
        e = (np.array([A[x] for x in ua], np.float64)[ca]
             * np.array([B[x] for x in ub], np.float64)[cb] / tot)
        return pa.table({"chi": pa.array([float(((o - e) ** 2 / e).sum())]),
                         "esum": pa.array([float(e.sum())])})

    stat = cells.map_batches(deltas, batch_format="pyarrow")
    sparts, _ = collect_up_to(stat, 10_000_000)   # one row per cell block
    st = pa.concat_tables(sparts) if sparts else pa.table(
        {"chi": pa.array([], pa.float64()), "esum": pa.array([],
                                                            pa.float64())})
    chi_obs = float(pc.sum(st["chi"]).as_py() or 0.0)
    e_obs = float(pc.sum(st["esum"]).as_py() or 0.0)
    chi2 = chi_obs + (n - e_obs)                  # zero-observed cells
    dof = (len(ma) - 1) * (len(mb) - 1)
    out = pa.table({
        "chi2": pa.array([round(chi2, 6)], pa.float64()),
        "dof": pa.array([dof], pa.int64()),
        "n": pa.array([int(n)], pa.int64())})
    if with_levels:
        out = (out.append_column("ka", pa.array([len(ma)], pa.int64()))
               .append_column("kb", pa.array([len(mb)], pa.int64())))
    return rd.from_arrow(out)


def grouped_linreg(ds, key: str, x: str, y: str):
    """Exact per-group simple linear regression (slope + intercept) from one
    pass of sufficient statistics — trend detection per key (is a source's
    quality drifting? a user's activity value rising?). Same shape as
    ``grouped_corr``: per-batch (key, n, sx, sy, sxx, sxy) partials, tiny
    groupby, closed-form finish

        slope = (n·sxy − sx·sy) / (n·sxx − sx²)
        intercept = (sy − slope·sx) / n

    O(groups × batches) exchange. Zero-x-variance groups yield null (SQL
    regr_slope semantics); pairwise-null rows excluded."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key, x, y]).drop_null()
        xv = t[x].to_numpy(zero_copy_only=False).astype(np.float64)
        yv = t[y].to_numpy(zero_copy_only=False).astype(np.float64)
        src = pa.table({key: t[key],
                        "n": pa.array(np.ones(len(xv), np.int64)),
                        "sx": pa.array(xv), "sy": pa.array(yv),
                        "sxx": pa.array(xv * xv),
                        "sxy": pa.array(xv * yv)})
        agg = src.group_by(key).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")])
        # name-based relabel (positional rename breaks if pyarrow's
        # group_by column ordering ever changes)
        return pa.table({key: agg[key]} | {
            c: agg[f"{c}_sum"] for c in ("n", "sx", "sy", "sxx", "sxy")})

    totals = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(key)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxx", alias_name="sxx"),
                         Sum("sxy", alias_name="sxy")))

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        vx = n * b["sxx"].to_numpy(zero_copy_only=False) - sx * sx
        cov = n * b["sxy"].to_numpy(zero_copy_only=False) - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(vx > 0, cov / vx, np.nan)
            intercept = np.where(vx > 0, (sy - slope * sx) / n, np.nan)
        return pa.table({
            key: b[key],
            "n": pc.cast(b["n"], pa.int64()),
            "slope": pa.array(slope, pa.float64(), from_pandas=True),
            "intercept": pa.array(intercept, pa.float64(),
                                  from_pandas=True)})

    return totals.map_batches(finalize, batch_format="pyarrow")


def welch_ttest(ds, group_col: str, value_col: str, group_a, group_b):
    """Welch's two-sample t-test between two groups of one column — the A/B
    significance check (did the new pipeline shift the quality score?).
    One pass of (n, Σv, Σv²) sufficient statistics per side (per-batch
    partials, exchange O(batches)); the finish computes

        t = (m_a − m_b) / sqrt(va/na + vb/nb)        (sample variances)
        dof = (va/na + vb/nb)² / ((va/na)²/(na−1) + (vb/nb)²/(nb−1))

    driver-side from 2 rows. Returns a one-row Dataset (t, dof, n_a, n_b,
    mean_a, mean_b). Null values drop; a side with <2 rows yields nulls."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col]).drop_null()
        m = pc.is_in(t[group_col], value_set=pa.array([group_a, group_b]))
        t = t.filter(m)
        agg = t.group_by(group_col).aggregate([(value_col, "sum"),
                                               ([], "count_all")])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = pa.table({group_col: t[group_col],
                       "sq": pa.array(v * v)}).group_by(group_col).aggregate(
            [("sq", "sum")])
        merged = agg.join(sq, keys=group_col)
        return pa.table({
            group_col: merged[group_col],
            "n": pc.cast(merged["count_all"], pa.int64()),
            "sv": pc.cast(merged[f"{value_col}_sum"], pa.float64()),
            "sq": merged["sq_sum"]})

    totals = (ds.map_batches(part, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sv", alias_name="sv"),
                         Sum("sq", alias_name="sq")))
    stats = {r[group_col]: (int(r["n"]), float(r["sv"]), float(r["sq"]))
             for r in totals.take_all()}          # ≤ 2 rows

    def side(g):
        n, sv, sq = stats.get(g, (0, 0.0, 0.0))
        if n < 2:
            return n, np.nan, np.nan
        mean = sv / n
        var = (sq - sv * sv / n) / (n - 1)        # sample variance
        return n, mean, var

    na, ma, va = side(group_a)
    nb, mb, vb = side(group_b)
    if na >= 2 and nb >= 2 and (va / na + vb / nb) > 0:
        se2 = va / na + vb / nb
        tstat = (ma - mb) / np.sqrt(se2)
        dof = se2 * se2 / ((va / na) ** 2 / (na - 1)
                           + (vb / nb) ** 2 / (nb - 1))
    else:
        tstat, dof = np.nan, np.nan
    return rd.from_arrow(pa.table({
        "t": pa.array([tstat], pa.float64(), from_pandas=True),
        "dof": pa.array([dof], pa.float64(), from_pandas=True),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "mean_a": pa.array([ma], pa.float64(), from_pandas=True),
        "mean_b": pa.array([mb], pa.float64(), from_pandas=True)}))


def grouped_decayed_sum(ds, key: str, value_col: str, ts_col: str, *,
                        tau_s: float = 7 * 86400.0, t_ref=None,
                        out_col: str = "decayed_value"):
    """Exact per-group exponentially time-decayed sum — recency-weighted
    activity/quality per key (the curation signal behind "recent sources
    weigh more"):

        decayed = Σ value · exp(−(t_ref − ts) / τ)

    Order-free closed form, so it is ONE pass of (key, Σw·v) partials +
    a tiny groupby — no sequential EWMA state, no sort, no window. When
    ``t_ref`` is None a cheap narrow pre-pass takes max(ts) (one int64 per
    batch reaches the driver). SQL-exact: the oracle computes the identical
    expression from SQL sums. NULL values/keys/timestamps are excluded
    (SQL aggregate semantics)."""
    from ray.data.aggregate import Sum

    narrow = ds.select_columns([key, value_col, ts_col])
    if t_ref is None:
        def ts_max(b: pa.Table) -> pa.Table:
            m = pc.max(pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                               pa.int64()))
            return pa.table({"m": pa.array(
                [m.as_py()] if m.is_valid else [], pa.int64())})

        t_ref_us = narrow.select_columns([ts_col]).map_batches(
            ts_max, batch_format="pyarrow").max("m")
    else:
        import pandas as pd

        t_ref_us = pd.Timestamp(t_ref).value // 1000
    inv_tau_us = 1.0 / (tau_s * 1e6)

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key, value_col, ts_col]).drop_null()
        if t.num_rows == 0:
            return pa.table({key: t[key], "w": pa.array([], pa.float64())})
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = v * np.exp(-(t_ref_us - us).astype(np.float64) * inv_tau_us)
        agg = (pa.table({key: t[key], "w": pa.array(w)})
               .group_by(key).aggregate([("w", "sum")]))
        return pa.table({key: agg[key], "w": agg["w_sum"]})

    return (narrow.map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("w", alias_name=out_col)))


def benford_first_digit(ds, col: str):
    """First-significant-digit census of a positive numeric column vs the
    Benford expectation log10(1+1/d) — the classic fabricated-data /
    distribution-drift alarm for financial-style columns (a feed whose
    leading-digit profile jumps was generated, truncated, or re-scaled).

    Values are snapped to integer cents (round-half-even, matching the
    oracle's ``round_even``) and the leading digit extracted by pure
    vectorized integer division — no per-value string materialization.
    The exchange is nine (digit, n) rows per batch; the finish is a
    driver-side merge of those ≤9-key partials (bounded by the digit
    alphabet, never data size).

    Output: digit (1-9, only digits observed), n, pct of rows, expected
    Benford share — pct/expected rounded to 6 digits.
    """

    def part(b: pa.Table) -> pa.Table:
        v = b[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[np.isfinite(vals) & (vals > 0)]
        d = np.rint(vals * 100).astype(np.int64)
        d = d[d > 0]
        while (big := d >= 10).any():
            d[big] //= 10
        counts = np.bincount(d, minlength=10)[1:10]
        keep = counts > 0
        return pa.table({
            "digit": pa.array(np.arange(1, 10)[keep], pa.int64()),
            "n": pa.array(counts[keep], pa.int64()),
        })

    partials = ds.select_columns([col]).map_batches(
        part, batch_format="pyarrow")
    # ≤9 rows per batch: the driver merge is digit-alphabet-bounded,
    # never data-bounded
    merged: dict[int, int] = {}
    for b in partials.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for dig, n in zip(b["digit"].to_pylist(), b["n"].to_pylist()):
            merged[dig] = merged.get(dig, 0) + n
    import ray.data as rd

    digits = np.array(sorted(merged), dtype=np.int64)
    ns = np.array([merged[d] for d in digits], dtype=np.int64)
    total = float(ns.sum()) or 1.0
    return rd.from_arrow(pa.table({
        "digit": pa.array(digits, pa.int64()),
        "n": pa.array(ns, pa.int64()),
        "pct": pa.array(np.round(ns / total, 6), pa.float64()),
        "expected": pa.array(np.round(np.log10(1.0 + 1.0 / digits), 6),
                             pa.float64()),
    }))


def column_format_census(ds, specs: list):
    """Value-FORMAT census over string columns — the schema-drift profile
    the validation tier runs before trusting a feed: for each (column,
    pattern_name, regex) spec, how many non-null values match. One
    vectorized RE2 pass per spec per batch (``pc.match_substring_regex``
    — DuckDB's regexp_matches is RE2 too, so the SQL oracle runs the
    IDENTICAL pattern), per-batch count partials, one tiny groupby. A
    format whose match fraction moves between snapshots is a
    schema-drift alarm no type check catches (think: zip codes turning
    into emails)."""
    from ray.data.aggregate import Sum

    cols = sorted({c for c, _, _ in specs})
    narrow = ds.select_columns(cols)

    def part(b: pa.Table) -> pa.Table:
        col_out, pat_out, nm_out, n_out = [], [], [], []
        for col, name, pattern in specs:
            arr = b[col]
            if not pa.types.is_string(arr.type):
                arr = pc.cast(arr, pa.string())
            n = len(arr) - arr.null_count
            m = pc.match_substring_regex(arr, pattern)
            nm = pc.sum(pc.cast(pc.fill_null(m, False), pa.int64())).as_py()
            col_out.append(col)
            pat_out.append(name)
            nm_out.append(int(nm or 0))
            n_out.append(int(n))
        return pa.table({"column": pa.array(col_out, pa.string()),
                         "pattern": pa.array(pat_out, pa.string()),
                         "n_match": pa.array(nm_out, pa.int64()),
                         "n": pa.array(n_out, pa.int64())})

    return (narrow.map_batches(part, batch_format="pyarrow")
            .groupby(["column", "pattern"])
            .aggregate(Sum("n_match", alias_name="n_match"),
                       Sum("n", alias_name="n")))


def theil_by_group(ds, key: str, value_col: str):
    """Exact-sufficient-stats Theil-T inequality index per group over
    POSITIVE integer values (callers pass exact units, e.g. cents):
    T = Σx·ln(x)/Σx − ln(Σx/n), the entropy-based companion to
    ``gini_by_group`` (decomposable across subgroups, which Gini is not).
    Nulls and non-positive values drop (ln undefined), mirroring the
    oracle's WHERE.

    Distributed shape: per-batch (group → n, Σx, Σ x·ln x) partials, one
    |groups|-row groupby-sum, map-only finish. Σx and n are int64-exact;
    Σ x·ln x is a float64 sum whose partial order differs from a
    sequential scan by ulps — absorbed by the half-even 6dp rounding
    both sides apply.

    Returns a Dataset of (key, n, theil).
    """
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        t = pa.table({"g": b[key],
                      "x": pc.cast(b[value_col], pa.int64())}).drop_null()
        t = t.filter(pc.greater(t["x"], pa.scalar(0, pa.int64())))
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        g = (t.append_column("_xlnx", pa.array(x * np.log(x)))
             .group_by("g")
             .aggregate([("x", "sum"), ("_xlnx", "sum"), ([], "count_all")]))
        return pa.table({"g": g["g"],
                         "sx": pc.cast(g["x_sum"], pa.int64()),
                         "sxlnx": g["_xlnx_sum"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("g")
           .aggregate(Sum("sx", alias_name="sx"),
                      Sum("sxlnx", alias_name="sxlnx"),
                      Sum("n", alias_name="n")))

    def finish(b: pa.Table) -> pa.Table:
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxlnx = b["sxlnx"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            key: b["g"],
            "n": pc.cast(b["n"], pa.int64()),
            "theil": pa.array(np.round(sxlnx / sx - np.log(sx / n), 6),
                              pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def gini_by_group(ds, key: str, value_col: str, tiebreak: str):
    """Exact per-group Gini coefficient of ``value_col`` (int64 values —
    callers pass exact integer units, e.g. cents) — the inequality /
    concentration check of a spend or contribution distribution
    (training-data analogue: how concentrated is a source's token mass?).

    Uses the sorted-rank identity G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n with
    1-based positions i. Positions come from the ``running_sum`` scan
    machinery (cumulative count of ones per key ordered by value,tiebreak),
    so the wide step is the calibrated (shard, bucket) exchange — never a
    per-key group call; the finish is one tiny sufficient-stats row per key
    (n, Σx, Σ i·x). All sums are int64-exact; Σ i·x overflows int64 only
    past ~9.2e18 (≈1e9 rows × 1e7-unit values × mid positions) — switch the
    product column to float64 beyond that regime (documented, not hit by
    any supported profile).
    """
    from ray.data.aggregate import Sum

    from .analytics import running_sum

    ones = ds.map_batches(
        lambda b: b.append_column(
            "_one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow")
    pos = running_sum(ones, key=key, order_col=value_col, value="_one",
                      tiebreak=tiebreak, out_col="_pos")

    def part(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = b["_pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({key: b[key], "_n": pa.array(
            np.ones(b.num_rows, np.int64)),
            "_t": pa.array(v), "_s": pa.array(i * v)})
        agg = t.group_by(key).aggregate(
            [("_n", "sum"), ("_t", "sum"), ("_s", "sum")])
        return pa.table({key: agg[key], "_n": agg["_n_sum"],
                         "_t": agg["_t_sum"], "_s": agg["_s_sum"]})

    agg = (pos.map_batches(part, batch_format="pyarrow")
           .groupby(key)
           .aggregate(Sum("_n", alias_name="n"),
                      Sum("_t", alias_name="t"),
                      Sum("_s", alias_name="s")))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = b["t"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        gini = np.round((2.0 * s) / (n * t) - (n + 1.0) / n, 6)
        return pa.table({key: b[key],
                         "n": pc.cast(b["n"], pa.int64()),
                         "gini": pa.array(gini)})

    return agg.map_batches(finish, batch_format="pyarrow")


def mann_whitney_u(ds, group_col: str, value_col: str, group_a, group_b):
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups — the
    nonparametric "did the value distribution shift" check that the Welch
    t-test (``welch_ttest``) can't answer under heavy tails.

    Rank computation never ships rows: per-batch (value → count_a, count)
    partials collapse to the DISTINCT-value stream, a single calibrated
    running-count scan yields each value's cumulative count (→ midrank
    = cum − c + (c+1)/2), and the finish is a handful of scalar sufficient
    stats (Σ count_a·midrank is a sum of exact half-integers, so the
    distributed float sum is order-independent below 2^52). Tie correction
    Σ(t³−t) is int64-exact. Returns one row:
    (n_a, n_b, u_a, z, auc) with the normal-approximation z under the
    tie-corrected variance and AUC = U/(n_a·n_b).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .analytics import running_sum

    def part(b: pa.Table) -> pa.Table:
        g = b[group_col]
        keep = pc.and_(pc.is_valid(b[value_col]),
                       pc.or_(pc.equal(g, pa.scalar(group_a)),
                              pc.equal(g, pa.scalar(group_b))))
        t = b.filter(keep)
        ia = pc.cast(pc.equal(t[group_col], pa.scalar(group_a)), pa.int64())
        tt = pa.table({"v": t[value_col], "_a": ia,
                       "_c": pa.array(np.ones(t.num_rows, np.int64))})
        agg = tt.group_by("v").aggregate([("_a", "sum"), ("_c", "sum")])
        return pa.table({"v": agg["v"], "ca": agg["_a_sum"],
                         "c": agg["_c_sum"]})

    dv = (ds.map_batches(part, batch_format="pyarrow")
          .groupby("v")
          .aggregate(Sum("ca", alias_name="ca"), Sum("c", alias_name="c")))
    # Checkpoint the distinct-value alphabet: the running scan below is
    # multi-pass (bucket calibration + scan), and without this the whole
    # upstream read + all-to-all aggregate re-executes per pass. The
    # materialized set is |distinct values| rows — already reduced, never
    # row-count — so the object store holds it cheaply at any scale.
    tagged = dv.map_batches(
        lambda b: b.append_column("_g", pa.array(
            np.zeros(b.num_rows, np.int8))),
        batch_format="pyarrow").materialize()
    cum = running_sum(tagged, key="_g", order_col="v", value="c",
                      tiebreak="v", out_col="_cum")

    def suff(b: pa.Table) -> pa.Table:
        ca = b["ca"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        cm = b["_cum"].to_numpy(zero_copy_only=False).astype(np.int64)
        mr = (cm - c).astype(np.float64) + (c + 1).astype(np.float64) / 2.0
        ci = c.astype(np.float64)
        return pa.table({
            "na": pa.array([float((ca * 1.0).sum())]),
            "n": pa.array([float(ci.sum())]),
            "ra": pa.array([float((ca * mr).sum())]),
            "tie": pa.array([int((c * c * c - c).sum())], pa.int64())})

    sp = cum.map_batches(suff, batch_format="pyarrow")
    from ._collect import collect_up_to
    parts, _ = collect_up_to(sp, 10_000_000)    # one row per batch
    if parts:
        st = pa.concat_tables(parts)
        na = float(pc.sum(st["na"]).as_py() or 0.0)
        n = float(pc.sum(st["n"]).as_py() or 0.0)
        ra = float(pc.sum(st["ra"]).as_py() or 0.0)
        tie = float(pc.sum(st["tie"]).as_py() or 0)
    else:
        na = n = ra = tie = 0.0
    nb = n - na
    empty = pa.table({"n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "u_a": pa.array([], pa.float64()),
                      "z": pa.array([], pa.float64()),
                      "auc": pa.array([], pa.float64())})
    if na == 0 or nb == 0:
        return rd.from_arrow(empty)
    u = ra - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    sig2 = na * nb / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
    z = (u - mu) / np.sqrt(sig2) if sig2 > 0 else float("nan")
    return rd.from_arrow(pa.table({
        "n_a": pa.array([int(na)], pa.int64()),
        "n_b": pa.array([int(nb)], pa.int64()),
        "u_a": pa.array([round(u, 6)], pa.float64()),
        "z": pa.array([round(float(z), 6)], pa.float64()),
        "auc": pa.array([round(u / (na * nb), 6)], pa.float64())}))


def kruskal_wallis(ds, group_col: str, value_col: str):
    """Kruskal–Wallis H (rank-based one-way ANOVA across k groups) — the
    k-group extension of ``mann_whitney_u``, sharing its machinery: the
    exchange collapses to the DISTINCT-value stream, one calibrated
    running-count scan yields midranks (exact half-integers, so the
    distributed float sums are order-independent below 2^52), and the
    per-group rank sums come from a value-sharded zip (never a join —
    Ray 2.49 acero joins reject schema-less empty blocks). Tie
    correction Σ(t³−t)/(N³−N) is int64-exact. Returns one row
    (k, n, h) with h rounded half-even to 6dp.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .analytics import running_sum

    def _vshard(col, n: int = 64) -> np.ndarray:
        # values may be float64 (unsupported by the key hasher): shard on
        # the raw bit pattern — equal doubles have equal bits
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            u = v.view(np.uint64) * np.uint64(0xFF51AFD7ED558CCD)
            u = u ^ (u >> np.uint64(33))
            return (u % np.uint64(n)).astype(np.int32)
        from .asof import _shard_of

        return _shard_of(col if isinstance(col, pa.Array)
                         else col.combine_chunks(), n)

    def part(b: pa.Table) -> pa.Table:
        t = pa.table({"v": b[value_col], "g": b[group_col]}).drop_null()
        agg = (t.append_column("_c", pa.array(
            np.ones(t.num_rows, np.int64)))
            .group_by(["v", "g"]).aggregate([("_c", "sum")]))
        return pa.table({"v": agg["v"], "g": agg["g"],
                         "c": pc.cast(agg["_c_sum"], pa.int64())})

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .groupby(["v", "g"])
             .aggregate(Sum("c", alias_name="c"))
             .materialize())               # (value, group) cells, reused
    totals = (cells.map_batches(
        lambda b: pa.table({"v": b["v"],
                            "ct": pc.cast(b["c"], pa.int64())}),
        batch_format="pyarrow")
        .groupby("v").aggregate(Sum("ct", alias_name="ct"))
        .map_batches(lambda b: pa.table({
            "v": b["v"], "ct": pc.cast(b["ct"], pa.int64())})
            .append_column("_g", pa.array(np.zeros(b.num_rows, np.int8))),
            batch_format="pyarrow")
        .materialize())
    ranked = running_sum(totals, key="_g", order_col="v", value="ct",
                         tiebreak="v", out_col="_cum")

    # value-sharded zip: cells (side 0) meet their value's midrank
    # (side 1) inside one shard group; in-shard searchsorted lookup
    def tag_cells(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"], "gg": pc.cast(b["g"], pa.string()),
            "c": pc.cast(b["c"], pa.int64()),
            "m": pa.array(np.zeros(b.num_rows, np.float64)),
            "_side": pa.array(np.zeros(b.num_rows, np.int8)),
            "_shard": pa.array(_vshard(b["v"]))})

    def tag_ranks(b: pa.Table) -> pa.Table:
        ct = b["ct"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = b["_cum"].to_numpy(zero_copy_only=False).astype(np.int64)
        mr = (cum - ct).astype(np.float64) \
            + (ct + 1).astype(np.float64) / 2.0
        return pa.table({
            "v": b["v"], "gg": pa.array([""] * b.num_rows, pa.string()),
            "c": pa.array(np.zeros(b.num_rows, np.int64)),
            "m": pa.array(mr),
            "_side": pa.array(np.ones(b.num_rows, np.int8)),
            "_shard": pa.array(_vshard(b["v"]))})

    def zip_shard(g: pa.Table) -> pa.Table:
        empty = pa.table({"gg": pa.array([], pa.string()),
                          "r": pa.array([], pa.float64()),
                          "n": pa.array([], pa.int64())})
        side = g["_side"].to_numpy(zero_copy_only=False)
        cells_t = g.filter(pa.array(side == 0))
        ranks_t = g.filter(pa.array(side == 1))
        if cells_t.num_rows == 0 or ranks_t.num_rows == 0:
            return empty
        rv = ranks_t["v"].to_numpy(zero_copy_only=False)
        rm = ranks_t["m"].to_numpy(zero_copy_only=False)
        o = np.argsort(rv, kind="stable")
        rv, rm = rv[o], rm[o]
        cv = cells_t["v"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rv, cv)
        m = rm[pos]
        c = cells_t["c"].to_numpy(zero_copy_only=False)
        t = (pa.table({"gg": cells_t["gg"],
                       "_rc": pa.array(c.astype(np.float64) * m),
                       "_n": pa.array(c)})
             .group_by("gg").aggregate([("_rc", "sum"), ("_n", "sum")]))
        return pa.table({"gg": t["gg"], "r": t["_rc_sum"],
                         "n": pc.cast(t["_n_sum"], pa.int64())})

    rg = (cells.map_batches(tag_cells, batch_format="pyarrow")
          .union(ranked.map_batches(tag_ranks, batch_format="pyarrow"))
          .groupby("_shard").map_groups(zip_shard, batch_format="pyarrow")
          .groupby("gg")
          .aggregate(Sum("r", alias_name="r"), Sum("n", alias_name="n"))
          .take_all())                     # |groups| rows

    tie_parts = totals.map_batches(
        lambda b: pa.table({"s": pa.array([int(np.sum(
            (lambda ct: ct * ct * ct - ct)(
                b["ct"].to_numpy(zero_copy_only=False)
                .astype(np.int64))))], pa.int64())}),
        batch_format="pyarrow").take_all()
    tie = float(sum(int(r["s"]) for r in tie_parts))

    empty = pa.table({"k": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "h": pa.array([], pa.float64())})
    if not rg:
        return rd.from_arrow(empty)
    r = np.array([float(x["r"]) for x in rg])
    n = np.array([int(x["n"]) for x in rg], np.float64)
    k = len(rg)
    nn = n.sum()
    if nn <= 1 or k < 2:
        return rd.from_arrow(empty)
    h_raw = 12.0 / (nn * (nn + 1.0)) * float(np.sum(r * r / n)) \
        - 3.0 * (nn + 1.0)
    corr = 1.0 - tie / (nn * nn * nn - nn)
    h = h_raw / corr if corr > 0 else float("nan")
    return rd.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([int(nn)], pa.int64()),
        "h": pa.array([float(np.round(h, 6))], pa.float64())}))


def survival_curve(ds, key: str, ts_col: str, *, unit_us: int,
                   max_k: int = 12, merge_budget: int = 5_000_000):
    """Per-entity lifetime survival curve: for k = 0..max_k, the fraction of
    entities whose observed lifetime (last − first event) spans ≥ k units —
    the retention/longevity profile of a user base (or a crawl source's
    document-recency spread). Per-batch (key → min,max) partials bound the
    exchange at distinct-keys-per-batch; under ``merge_budget`` one driver
    merge finishes (the duplicate-keys fast-path pattern), above it the
    distributed groupby runs and only (max_k+1)-long histogram partials
    reach the driver. Output ints are exact; frac = n_ge / n_total.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from ._collect import collect_up_to

    def part(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key],
                      "_ts": pc.cast(b[ts_col], pa.int64())})
        agg = t.group_by(key).aggregate([("_ts", "min"), ("_ts", "max")])
        return pa.table({key: agg[key], "mn": agg["_ts_min"],
                         "mx": agg["_ts_max"]})

    partials = ds.map_batches(part, batch_format="pyarrow")
    parts, over = collect_up_to(partials, merge_budget)

    def hist_of(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
        wk = np.minimum((mx - mn) // unit_us, max_k)
        return np.bincount(wk, minlength=max_k + 1)

    if not over:
        if parts:
            t = pa.concat_tables(parts)
            agg = t.group_by(key).aggregate([("mn", "min"), ("mx", "max")])
            hist = hist_of(
                agg["mn_min"].to_numpy(zero_copy_only=False).astype(np.int64),
                agg["mx_max"].to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            hist = np.zeros(max_k + 1, np.int64)
    else:
        merged = (ds.map_batches(part, batch_format="pyarrow")
                  .groupby(key)
                  .aggregate(Min("mn", alias_name="mn"),
                             Max("mx", alias_name="mx")))

        def hpart(b: pa.Table) -> pa.Table:
            h = hist_of(
                b["mn"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["mx"].to_numpy(zero_copy_only=False).astype(np.int64))
            return pa.table({"k": pa.array(np.arange(max_k + 1, dtype=np.int64)),
                             "cnt": pa.array(h.astype(np.int64))})

        hp, _ = collect_up_to(merged.map_batches(
            hpart, batch_format="pyarrow"), 10_000_000)
        hist = np.zeros(max_k + 1, np.int64)
        for t in hp:
            hist[t["k"].to_numpy(zero_copy_only=False)] += \
                t["cnt"].to_numpy(zero_copy_only=False)

    total = int(hist.sum())
    n_ge = np.cumsum(hist[::-1])[::-1]           # suffix counts
    if total == 0:
        frac = np.zeros(max_k + 1, np.float64)
    else:
        frac = np.round(n_ge.astype(np.float64) / float(total), 6)
    return rd.from_arrow(pa.table({
        "k": pa.array(np.arange(max_k + 1, dtype=np.int64)),
        "n": pa.array(n_ge.astype(np.int64)),
        "frac": pa.array(frac)}))


def cramers_v(ds, col_a: str, col_b: str, *,
              level_budget: int = 2_000_000):
    """Cramér's V — the [0,1] effect-size normalization of the chi-square
    independence statistic (``chi2_independence``), so association strength
    is comparable across column pairs with different level counts:
    V = sqrt(χ² / (n · (min(|A|,|B|) − 1))). Same fully-distributed cell
    pipeline; the finish is one scalar transform of the chi2 row (computed
    from the 6-dp-rounded χ² so the value is an exact function of the
    published statistic). Returns (cramers_v, chi2, dof, n).
    """
    base = chi2_independence(ds, col_a, col_b, level_budget=level_budget,
                             with_levels=True)

    def finish(b: pa.Table) -> pa.Table:
        chi2 = b["chi2"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ka = b["ka"].to_numpy(zero_copy_only=False).astype(np.float64)
        kb = b["kb"].to_numpy(zero_copy_only=False).astype(np.float64)
        mind = np.minimum(ka, kb) - 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.round(np.sqrt(chi2 / (n * mind)), 6)
        return pa.table({"cramers_v": pa.array(v),
                         "chi2": b["chi2"], "dof": b["dof"], "n": b["n"]})

    return base.map_batches(finish, batch_format="pyarrow")


def mutual_information(ds, col_a: str, col_b: str, *,
                       level_budget: int = 2_000_000):
    """Mutual information (nats) between two categorical columns — the
    information-theoretic dependence audit that complements the
    chi-square / Cramér's-V tests: MI = Σ_observed p(a,b) ln(p(a,b) /
    (p(a)p(b))). Zero-count cells contribute exactly 0 (lim x→0 x ln x),
    so unlike chi-square no full-grid correction is needed.

    Distributed shape (the chi2_independence census): per-batch (a, b)
    count partials bound the exchange at distinct-pairs-per-batch; one
    groupby-sum builds the contingency cells; marginals + total derive
    from the cell census, which comes to the driver behind the loud
    ``level_budget`` (a million-level alphabet isn't an MI-shaped
    question — bucket first). Rows with a null in either column are
    excluded. Returns a one-row pandas DataFrame (mi 6dp, n)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def part(b: pa.Table) -> pa.Table:
        t = b.select([col_a, col_b]).drop_null()
        agg = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        return pa.table({"a": agg[col_a], "b": agg[col_b],
                         "cnt": pc.cast(agg["count_all"], pa.int64())})

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Sum("cnt", alias_name="cnt")))
    parts, over = collect_up_to(cells, level_budget)
    if over:
        raise ValueError("mutual_information: cell census exceeds the "
                         "level budget — bucket the columns first")
    empty = pd.DataFrame({"mi": pd.Series([], dtype="float64"),
                          "n": pd.Series([], dtype="int64")})
    if not parts:
        return empty
    df = pa.concat_tables(parts).to_pandas()
    if df.empty:
        return empty
    n = float(df["cnt"].sum())
    pab = df["cnt"].to_numpy(np.float64) / n
    pa_ = (df.groupby("a")["cnt"].transform("sum").to_numpy(np.float64)
           / n)
    pb_ = (df.groupby("b")["cnt"].transform("sum").to_numpy(np.float64)
           / n)
    mi = float(np.round(np.sum(pab * np.log(pab / (pa_ * pb_))), 6))
    return pd.DataFrame({"mi": [mi], "n": [np.int64(n)]})


def mahalanobis2(ds, x_col: str, y_col: str, *, keep_cols: list[str]):
    """Squared Mahalanobis distance of every row from the global mean of the
    2-D point (``x_col``, ``y_col``) — the MULTIVARIATE outlier score that
    catches rows whose (x, y) COMBINATION is anomalous even when each
    marginal is ordinary (a tiny quantity at a huge price), complementing
    the univariate z-score / MAD / IQR detectors. Both columns must be
    int64 (exact cents/units): the sufficient statistics (n, Σx, Σy, Σx²,
    Σy², Σxy) accumulate as EXACT integers, so mean/covariance — and hence
    every per-row d² — are bit-identical between the engine and a SQL
    oracle that spells the same closed-form 2×2 inverse from the same
    integer sums.

    Distributed shape: one pass of per-batch integer partials (6 numbers
    per batch) folds on the driver; the 5 broadcast doubles then drive a
    map-only second pass. Returns keep_cols + d2 (6dp).

    The second-moment sums overflow int64 long before 100 TB (price-cents
    ~1e7 → Σy² wraps at ~900k rows), so per-batch partials accumulate via
    a hi/lo 32-bit split (every intermediate stays inside int64 for any
    batch under 2³¹ rows) and travel as decimal STRINGS; the driver folds
    arbitrary-precision Python ints — matching DuckDB, whose SUM(BIGINT)
    is exact HUGEINT before the CAST to DOUBLE."""
    import ray
    import ray.data as rd

    from ._collect import collect_up_to

    def _exact_sum(a: np.ndarray) -> int:
        # exact even when the aggregate exceeds int64: arithmetic-shift
        # hi + masked lo, each partial bounded by n·2³² < 2⁶³
        lo = int((a & np.int64(0xFFFFFFFF)).sum(dtype=np.int64))
        hi = int((a >> np.int64(32)).sum(dtype=np.int64))
        return (hi << 32) + lo

    def part(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x):
            xm = int(np.abs(x).max())
            ym = int(np.abs(y).max())
            if max(xm * xm, ym * ym, xm * ym) >= 2**63:
                # element-wise PRODUCT would wrap — exact slow path
                xs, ys = x.tolist(), y.tolist()
                sxx = sum(v * v for v in xs)
                syy = sum(v * v for v in ys)
                sxy = sum(u * v for u, v in zip(xs, ys))
            else:
                sxx = _exact_sum(x * x)
                syy = _exact_sum(y * y)
                sxy = _exact_sum(x * y)
            sx, sy = _exact_sum(x), _exact_sum(y)
        else:
            sx = sy = sxx = syy = sxy = 0
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([str(sx)], pa.string()),
            "sy": pa.array([str(sy)], pa.string()),
            "sxx": pa.array([str(sxx)], pa.string()),
            "syy": pa.array([str(syy)], pa.string()),
            "sxy": pa.array([str(sxy)], pa.string())})

    parts, over = collect_up_to(
        ds.map_batches(part, batch_format="pyarrow"), 10_000_000)
    if over:
        raise RuntimeError("mahalanobis2: partials exceeded driver budget")
    empty = pa.table({**{c: pa.array([]) for c in keep_cols},
                      "d2": pa.array([], pa.float64())})
    if not parts:
        return rd.from_arrow(empty)
    t = pa.concat_tables(parts)
    n = float(pc.sum(t["n"]).as_py() or 0)
    if n < 2:
        return rd.from_arrow(empty)

    def _fold(col: str) -> float:
        # arbitrary-precision fold, then one int→double rounding — the
        # same place DuckDB's CAST(SUM(...) AS DOUBLE) rounds
        return float(sum(int(s) for s in t[col].to_pylist()))

    sx, sy = _fold("sx"), _fold("sy")
    sxx, syy, sxy = _fold("sxx"), _fold("syy"), _fold("sxy")
    # population moments — the SQL oracle spells these same expressions
    mx, my = sx / n, sy / n
    vx, vy = sxx / n - mx * mx, syy / n - my * my
    cxy = sxy / n - mx * my
    det = vx * vy - cxy * cxy
    if det <= 0:
        raise ValueError("mahalanobis2: singular covariance — the two "
                         "columns are perfectly collinear or constant")
    params = ray.put((mx, my, vx, vy, cxy, det))

    def score(b: pa.Table, ref=params) -> pa.Table:
        mx, my, vx, vy, cxy, det = ray.get(ref)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        dx, dy = x - mx, y - my
        d2 = (dx * dx * vy - 2 * dx * dy * cxy + dy * dy * vx) / det
        return pa.table({**{c: b[c] for c in keep_cols},
                         "d2": pa.array(np.round(d2, 6))})

    return ds.map_batches(score, batch_format="pyarrow")


def grouped_weighted_median(ds, *, group_col: str, value_col: str,
                            weight_col: str):
    """WEIGHTED lower median of int64 ``value_col`` per group: the smallest
    value v with 2·(cumulative weight through v) ≥ total weight — e.g. the
    quantity-weighted median price, where each line counts as many times
    as its units (``quantile_disc`` semantics over the weight-expanded
    multiset, computed without ever expanding it).

    Distributed shape: rows reduce to DISTINCT-value (group, v, Σw) cells
    via per-batch group_by partials + one groupby-sum; per-group selection
    sorts its own cells (bounded by the group's distinct values, never its
    rows) inside ``map_groups`` and picks the crossing cell with one
    ``searchsorted`` over the cumsum. Returns (group, wmedian, total_w)."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        agg = (pa.table({group_col: b[group_col],
                         "v": pc.cast(b[value_col], pa.int64()),
                         "w": pc.cast(b[weight_col], pa.int64())})
               .group_by([group_col, "v"]).aggregate([("w", "sum")]))
        return pa.table({group_col: agg[group_col], "v": agg["v"],
                         "w": agg["w_sum"]})

    from ._collect import collect_up_to, guarded_groupby

    cells = guarded_groupby(ds.map_batches(part, batch_format="pyarrow"),
                            [group_col, "v"], [("w", "sum")])

    def pick(g: pa.Table) -> pa.Table:
        t = g.take(pc.sort_indices(g, sort_keys=[("v", "ascending")]))
        w = t["w_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        cw = np.cumsum(w)
        tot = int(cw[-1])
        idx = int(np.searchsorted(2 * cw, tot))   # first 2·cw >= tot
        return pa.table({group_col: t[group_col][:1],
                         "wmedian": t["v"][idx:idx + 1],
                         "total_w": pa.array([tot], pa.int64())})

    # the merged cell census is distinct-value bounded: below the budget
    # the per-group selection runs driver-side (a Ray sort-shuffle to
    # |groups| map_groups costs seconds at 10^5 cells); above it, the
    # distributed per-group path
    parts2, over2 = collect_up_to(cells, 5_000_000)
    if not over2:
        import ray.data as rd

        if not parts2:
            return rd.from_arrow(pa.table({
                group_col: pa.array([], pa.string()),
                "wmedian": pa.array([], pa.int64()),
                "total_w": pa.array([], pa.int64())}))
        merged = pa.concat_tables(parts2)
        outs = []
        gcol = merged[group_col]
        for gv in pc.unique(gcol).to_pylist():
            outs.append(pick(merged.filter(pc.equal(gcol, pa.scalar(gv)))))
        return rd.from_arrow(pa.concat_tables(outs))
    return cells.groupby(group_col).map_groups(pick,
                                               batch_format="pyarrow")


def spearman_corr(ds, x_col: str, y_col: str, *,
                  level_budget: int = 20_000_000):
    """EXACT Spearman rank correlation between two int64 columns: Pearson
    correlation of the AVERAGE (midrank) ranks, the tie convention every
    statistics package uses. Works in DOUBLED ranks so everything stays
    integer: for a value with c occurrences and C predecessors, the
    midrank is C + (c+1)/2, i.e. 2·midrank = 2C + c + 1 exactly — the
    factor 2 cancels in the correlation. All sufficient statistics
    (n, Σrx, Σry, Σrx², Σry², Σrxry) accumulate as exact integers
    (int64 per batch, Python ints across batches), so the final closed
    form runs on identical doubles engine- and SQL-side.

    Distributed shape: pass 1 reduces rows to per-column distinct-value
    (v, cnt) cells (per-batch partials + one groupby-sum); the cell
    censuses come to the driver behind ``level_budget`` and broadcast as
    two sorted arrays with their doubled-rank lookups; pass 2 is map-only
    (two searchsorted probes per batch + six integer sums). Exactness
    budget: per-batch int64 products need n ≲ 5e6 rows per 64Ki batch —
    beyond that, lower the batch size. Rows with a null in either column
    are excluded. Returns a 1-row pandas DataFrame (spearman 6dp, n)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def cells_part(b: pa.Table) -> pa.Table:
        t = b.select([x_col, y_col]).drop_null()
        out = []
        for tag, col in (("x", x_col), ("y", y_col)):
            agg = (pa.table({"v": pc.cast(t[col], pa.int64())})
                   .group_by("v").aggregate([([], "count_all")]))
            out.append(pa.table({
                "tag": pa.array(np.repeat(tag, agg.num_rows)),
                "v": agg["v"],
                "cnt": pc.cast(agg["count_all"], pa.int64())}))
        return pa.concat_tables(out)

    from ._collect import guarded_groupby

    cells = guarded_groupby(
        ds.map_batches(cells_part, batch_format="pyarrow"),
        ["tag", "v"], [("cnt", "sum")]).map_batches(
            lambda b: pa.table({"tag": b["tag"], "v": b["v"],
                                "cnt": b["cnt_sum"]}),
            batch_format="pyarrow")
    parts, over = collect_up_to(cells, level_budget)
    if over:
        raise ValueError("spearman_corr: distinct-value census exceeds "
                         "the level budget")
    empty = pd.DataFrame({"spearman": pd.Series([], dtype="float64"),
                          "n": pd.Series([], dtype="int64")})
    if not parts:
        return empty
    cen = pa.concat_tables(parts)

    def lookup(tag: str):
        t = cen.filter(pc.equal(cen["tag"], pa.scalar(tag)))
        t = t.take(pc.sort_indices(t, sort_keys=[("v", "ascending")]))
        v = t["v"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        cprev = np.r_[0, np.cumsum(c)[:-1]]
        return v, 2 * cprev + c + 1             # doubled midranks

    vx, r2x = lookup("x")
    vy, r2y = lookup("y")
    if len(vx) == 0 or len(vy) == 0:
        return empty
    ref = ray.put((vx, r2x, vy, r2y))

    def sums(b: pa.Table) -> pa.Table:
        gvx, gr2x, gvy, gr2y = ray.get(ref)
        t = b.select([x_col, y_col]).drop_null()
        x = pc.cast(t[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        rx = gr2x[np.searchsorted(gvx, x)]
        ry = gr2y[np.searchsorted(gvy, y)]
        return pa.table({k: pa.array([int(s)], pa.int64()) for k, s in (
            ("n", len(rx)), ("sx", rx.sum()), ("sy", ry.sum()),
            ("sxx", (rx * rx).sum()), ("syy", (ry * ry).sum()),
            ("sxy", (rx * ry).sum()))})

    sparts, over = collect_up_to(
        ds.map_batches(sums, batch_format="pyarrow"), 10_000_000)
    if over:
        raise RuntimeError("spearman_corr: sum partials exceeded budget")
    st = pa.concat_tables(sparts)
    # fold in Python ints: exact at any scale, then one cast to double
    n = float(sum(st["n"].to_pylist()))
    sx, sy = float(sum(st["sx"].to_pylist())), float(sum(st["sy"].to_pylist()))
    sxx = float(sum(st["sxx"].to_pylist()))
    syy = float(sum(st["syy"].to_pylist()))
    sxy = float(sum(st["sxy"].to_pylist()))
    if n < 2:
        return empty
    denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    if denom == 0:
        return empty
    rho = float(np.round((n * sxy - sx * sy) / denom, 6))
    return pd.DataFrame({"spearman": [rho], "n": [np.int64(n)]})


def rare_level_coverage(censuses: list, *, pct: int = 99):
    """Long-tail coverage census: for each named categorical census
    (a (name, Dataset, col) triple), the total level count and k_pct —
    how many of the most frequent levels cover ≥ ``pct``% of the rows
    (ties broken by value ascending, the deterministic head order). A
    k99 close to n_levels means no usable head; a tiny k99 flags a
    skewed alphabet that one-hot/salting strategies must special-case.
    Returns a pandas DataFrame (col_name, n_levels, k{pct}) — coverage
    compares exact integers (100·cum ≥ pct·total), no float cliffs.

    Distributed shape: per input, per-batch value-count partials + one
    groupby-sum; only the level census (bounded by the alphabet, behind
    a loud budget) reaches the driver for the sort/cumsum."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    rows = []
    for name, ds, col in censuses:
        def part(b: pa.Table, col=col) -> pa.Table:
            agg = (pa.table({"v": pc.cast(b[col], pa.string())})
                   .drop_null().group_by("v")
                   .aggregate([([], "count_all")]))
            return pa.table({"v": agg["v"], "cnt": agg["count_all"]})

        cen = (ds.map_batches(part, batch_format="pyarrow")
               .groupby("v").aggregate(Sum("cnt", alias_name="cnt")))
        parts, over = collect_up_to(cen, 2_000_000)
        if over:
            raise ValueError(f"rare_level_coverage: {name} exceeds the "
                             "level budget")
        if not parts:
            rows.append((name, 0, 0))
            continue
        t = pa.concat_tables(parts)
        df = t.to_pandas().sort_values(
            ["cnt", "v"], ascending=[False, True])
        cnt = df["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        tot = int(cum[-1])
        k = int(np.searchsorted(100 * cum, pct * tot)) + 1
        rows.append((name, len(cnt), k))
    return pd.DataFrame(rows, columns=["col_name", "n_levels",
                                       f"k{pct}"])


def chi2_residuals(ds, col_a: str, col_b: str, *,
                   level_budget: int = 2_000_000):
    """Standardized Pearson residuals (O − E)/√E for every OBSERVED cell
    of the col_a × col_b contingency table — the interpretability
    companion of :func:`chi2_independence`: the test says THAT the
    columns are dependent, the residuals say WHICH cells drive it
    (|resid| ≳ 2 is the classic callout). Returns a Dataset
    (a, b, o, e 6dp, resid 6dp).

    Distributed shape: the chi2 cell census (per-batch (a, b) count
    partials, one groupby-sum); marginals fold on the driver behind the
    loud ``level_budget`` and broadcast via ``ray.put``; the residual
    pass maps over the DISTRIBUTED cell table. Expected counts divide
    exact int64 marginals, so engine and SQL operate on identical
    doubles. Null in either column excludes the row."""
    import ray
    from ray.data.aggregate import Sum

    from ._collect import collect_up_to

    def part(b: pa.Table) -> pa.Table:
        t = b.select([col_a, col_b]).drop_null()
        agg = t.group_by([col_a, col_b]).aggregate([([], "count_all")])
        return pa.table({"a": pc.cast(agg[col_a], pa.string()),
                         "b": pc.cast(agg[col_b], pa.string()),
                         "o": pc.cast(agg["count_all"], pa.int64())})

    cells = (ds.map_batches(part, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Sum("o", alias_name="o"))
             .materialize())
    parts, over = collect_up_to(
        cells.map_batches(
            lambda t: (pa.table({"a": t["a"], "o": t["o"]})
                       .group_by("a").aggregate([("o", "sum")])
                       .rename_columns(["a", "m"])),
            batch_format="pyarrow")
        .groupby("a").aggregate(Sum("m", alias_name="m")), level_budget)
    if over:
        raise ValueError("chi2_residuals: marginal census exceeds budget")
    ta = pa.concat_tables(parts) if parts else pa.table(
        {"a": pa.array([], pa.string()), "m": pa.array([], pa.int64())})
    parts, over = collect_up_to(
        cells.map_batches(
            lambda t: (pa.table({"b": t["b"], "o": t["o"]})
                       .group_by("b").aggregate([("o", "sum")])
                       .rename_columns(["b", "m"])),
            batch_format="pyarrow")
        .groupby("b").aggregate(Sum("m", alias_name="m")), level_budget)
    if over:
        raise ValueError("chi2_residuals: marginal census exceeds budget")
    tb = pa.concat_tables(parts) if parts else pa.table(
        {"b": pa.array([], pa.string()), "m": pa.array([], pa.int64())})
    ma = dict(zip(ta["a"].to_pylist(),
                  ta["m"].to_numpy(zero_copy_only=False).tolist()))
    mb = dict(zip(tb["b"].to_pylist(),
                  tb["m"].to_numpy(zero_copy_only=False).tolist()))
    n = float(sum(ma.values()))
    ref = ray.put((ma, mb, n))

    def resid(t: pa.Table) -> pa.Table:
        gma, gmb, gn = ray.get(ref)
        if t.num_rows == 0 or gn == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "o": pa.array([], pa.int64()),
                             "e": pa.array([], pa.float64()),
                             "resid": pa.array([], pa.float64())})
        fa = np.array([float(gma[x]) for x in t["a"].to_pylist()])
        fb = np.array([float(gmb[x]) for x in t["b"].to_pylist()])
        o = t["o"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = fa * fb / gn
        return pa.table({"a": t["a"], "b": t["b"],
                         "o": pc.cast(t["o"], pa.int64()),
                         "e": pa.array(np.round(e, 6)),
                         "resid": pa.array(np.round((o - e) / np.sqrt(e),
                                                    6))})

    return cells.map_batches(resid, batch_format="pyarrow")
