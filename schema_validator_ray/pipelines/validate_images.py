"""Flagship pipeline: full validation of the canonical image/caption table.

Composition (each leg is an independent lazy Dataset; nothing materializes the
input mid-pipeline):

  metadata leg   read(columns w/o bytes)  -> RuleStage(row-local rules)  -> violations
  decode leg     read(id,bytes,w,h,phash) -> ImageViolationsStage (actor pool,
                 small batches — the bytes column is wide)               -> violations
  uniqueness     pre-aggregated (key,count) partials -> groupby -> broadcast filter
  referential    captions key side broadcast -> anti-join filter          -> violations
  stats/drift    ColumnProfilerStage partials -> driver merge -> KS/PSI verdicts

Two separate column-pruned reads beat one fat read: the metadata leg streams
thousands of rows per block while the decode leg uses small batches (SURVEY §7.4.8).
"""

from __future__ import annotations

import time
from typing import Any

import pyarrow as pa

from ..engine import RuleStage
from ..stages.drift import compare_profiles
from ..stages.images import ImageViolationsStage
from ..stages.referential import referential_violations
from ..stages.stats import profile_dataset
from ..stages.uniqueness import uniqueness_violations

# row-local rules for the input_hint schema (the reference-rule profile for the
# image table; see FIXTURES.md F1 for which seeded violation trips which rule)
IMAGE_SPEC: dict[str, str] = {
    "image_id": "required|uuid",
    "w": "required|min=1|max=65535",
    "h": "required|min=1|max=65535",
    "fmt": "required|oneof=png,jpeg,webp",
    "caption": "required|printascii|max=2000",
}

META_COLUMNS = ["image_id", "w", "h", "fmt", "caption", "phash"]
DECODE_COLUMNS = ["image_id", "bytes", "w", "h", "phash"]
VIOLATION_COLUMNS = ["image_id", "rule_id", "column", "offending_value"]


def _std(ds):
    return ds.select_columns(VIOLATION_COLUMNS)


# ---------------------------------------------------------------------------
# fused two-scan flagship
#
# Scan 1 (meta columns only): ONE map_batches computes row-local rule violations
# + per-batch (key, count) partials for image_id/phash + profile sketch partials,
# emitted as a tagged narrow stream that is materialized (it is ~2 narrow rows
# per input row at worst — violations + distinct keys; at extreme scale swap the
# materialize for a second column-pruned scan, see validate_images()).
# Scan 2 (decode columns): decode/dims/phash/PSNR checks AND the broadcast
# membership checks (duplicate ids, duplicate phashes, missing captions) fused
# into one stage — no third pass over the input.

_MIXED_SCHEMA = pa.schema([
    ("kind", pa.string()),          # v=violation, k=keycount, p=profile partial
    ("image_id", pa.string()),
    ("rule_id", pa.string()),
    ("column", pa.string()),
    ("offending_value", pa.string()),
    ("key_kind", pa.string()),
    ("key", pa.string()),
    ("cnt", pa.int64()),
    ("pcol", pa.string()),
    ("pcount", pa.int64()),
    ("pnulls", pa.int64()),
    ("blob", pa.binary()),
])


class FusedMetaStage:
    """One pass over the metadata columns: rule violations + uniqueness key
    partials + profile sketch partials, as one tagged narrow table."""

    def __init__(self, spec, key_columns=("image_id", "phash")):
        self.spec = spec
        self.key_columns = list(key_columns)
        self._compiled = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..compile import compile_ruleset
        from ..stages.stats import ColumnProfilerStage

        if self._compiled is None:
            self._compiled = compile_ruleset(self.spec, batch.schema)
            self._profiler = ColumnProfilerStage(
                numeric_columns=("w", "h"), categorical_columns=("fmt",),
                key_columns=self.key_columns)

        pass_mask, viol = self._compiled.evaluate(batch, id_column="image_id")
        n_v = viol.num_rows
        parts = [pa.table({
            "kind": pa.array(["v"] * n_v),
            "image_id": viol["image_id"],
            "rule_id": viol["rule_id"],
            "column": viol["column"],
            "offending_value": viol["offending_value"],
        })]

        # per-batch failed-row partial (exact: from the pass mask)
        parts.append(pa.table({
            "kind": pa.array(["f"]),
            "key_kind": pa.array(["meta_failed"]),
            "cnt": pa.array([int((~pass_mask).sum())], pa.int64()),
        }))

        for key in self.key_columns:
            agg = (batch.select([key]).group_by(key)
                   .aggregate([([], "count_all")]))
            n_k = agg.num_rows
            parts.append(pa.table({
                "kind": pa.array(["k"] * n_k),
                "key_kind": pa.array([key] * n_k),
                "key": pc.cast(agg[key], pa.string()),
                "cnt": pc.cast(agg["count_all"], pa.int64()),
            }))

        prof = self._profiler(batch)
        n_p = prof.num_rows
        parts.append(pa.table({
            "kind": pa.array(["p"] * n_p),
            "pcol": prof["column"],
            "pcount": prof["count"],
            "pnulls": prof["nulls"],
            "blob": prof["blob"],
        }))

        unified = [_conform(t) for t in parts]
        return pa.concat_tables(unified)


def _conform(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    cols = []
    for f in _MIXED_SCHEMA:
        if f.name in t.column_names:
            # cast pins the declared type even for empty columns (a bare
            # pa.array([]) is null-typed and would poison concat_tables)
            cols.append(pc.cast(t[f.name], f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=_MIXED_SCHEMA)


class _DecodeAndMembership:
    """Scan-2 stage: image payload checks + broadcast-set membership violations
    (duplicate image_id / phash, missing caption) in one pass."""

    # tag rows for per-batch partials riding in the violations schema
    # (filtered back out and summed by the flagship)
    HIST_RULE = "__intensity_hist__"
    FAILED_RULE = "__scan2_failed__"

    def __init__(self, dup_ids_ref, dup_phash_ref, caption_keys_ref,
                 do_decode: bool = True, collect_hist: bool = False,
                 caption_bloom_ref=None):
        from ..stages.images import DecodeCheckStage

        self.dup_ids_ref = dup_ids_ref
        self.dup_phash_ref = dup_phash_ref
        self.caption_keys_ref = caption_keys_ref
        self.caption_bloom_ref = caption_bloom_ref
        self.do_decode = do_decode
        self.collect_hist = collect_hist
        self._sets = None
        self._bloom = None
        self._decode = DecodeCheckStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        import ray

        from ..stages.images import image_violations

        if self._sets is None:
            get = lambda r: ray.get(r) if r is not None else None
            self._sets = (get(self.dup_ids_ref), get(self.dup_phash_ref),
                          get(self.caption_keys_ref))
        dup_ids, dup_ph, cap_keys = self._sets

        import numpy as np

        n = batch.num_rows
        flagged = np.zeros(n, bool)  # rows failing ANY scan-2 check
        out = []
        if self.do_decode:
            decoded = self._decode(batch)
            out.append(image_violations(decoded))
            if decoded.num_rows:
                ok = np.ones(n, bool)
                for c in ("decode_ok", "dims_ok", "phash_ok", "psnr_ok"):
                    ok &= decoded[c].combine_chunks().to_numpy(
                        zero_copy_only=False)
                flagged |= ~ok
            if self.collect_hist and decoded.num_rows:
                hist = np.asarray(
                    decoded["hist"].combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                ).reshape(decoded.num_rows, -1).sum(axis=0)
                out.append(pa.table({
                    "image_id": pa.array([""], pa.string()),
                    "rule_id": pa.array([self.HIST_RULE], pa.string()),
                    "column": pa.array(["bytes"], pa.string()),
                    "offending_value": pa.array(
                        [",".join(str(int(v)) for v in hist)], pa.string()),
                }))
        ids = batch["image_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()

        def emit(mask, rule_id, column, values):
            m = (mask.to_numpy(zero_copy_only=False)
                 if hasattr(mask, "to_numpy") else mask)
            flagged[:] |= m
            idx = m.nonzero()[0]
            if not len(idx):
                return
            take = pa.array(idx)
            out.append(pa.table({
                "image_id": ids.take(take),
                "rule_id": pa.array([rule_id] * len(idx)),
                "column": pa.array([column] * len(idx)),
                "offending_value": pc.cast(values.take(take), pa.string()),
            }))

        if dup_ids is not None:
            emit(pc.is_in(ids, value_set=dup_ids).fill_null(False),
                 "unique:image_id", "image_id", ids)
        if dup_ph is not None:
            ph = batch["phash"]
            if isinstance(ph, pa.ChunkedArray):
                ph = ph.combine_chunks()
            emit(pc.is_in(pc.cast(ph, pa.string()), value_set=dup_ph)
                 .fill_null(False), "unique:phash", "phash", ph)
        if cap_keys is not None:
            emit(pc.invert(pc.is_in(ids, value_set=cap_keys)).fill_null(True),
                 "referential", "image_id", ids)
        elif self.caption_bloom_ref is not None:
            # constant-size broadcast: sound (flagged rows are truly missing)
            # but incomplete at the filter's false-positive rate
            from ..stages.referential import _hash_keys

            if self._bloom is None:
                self._bloom = ray.get(self.caption_bloom_ref)
            missing = ~self._bloom.contains(_hash_keys(ids))
            if ids.null_count:
                missing |= pc.is_null(ids).to_numpy(zero_copy_only=False)
            emit(missing, "referential", "image_id", ids)
        if self.collect_hist:
            # exact per-batch count of rows failing any scan-2 check
            out.append(pa.table({
                "image_id": pa.array([""], pa.string()),
                "rule_id": pa.array([self.FAILED_RULE], pa.string()),
                "column": pa.array(["image_id"], pa.string()),
                "offending_value": pa.array([str(int(flagged.sum()))],
                                            pa.string()),
            }))
        if not out:
            return pa.schema([(c, pa.string()) for c in VIOLATION_COLUMNS]
                             ).empty_table()
        return pa.concat_tables(out)


def validate_images(input_dir: str, *, captions_path: str | None = None,
                    reference_profile: dict | None = None,
                    decode: bool = True,
                    meta_batch_size: int = 8192,
                    decode_batch_size: int | None = None,
                    decode_concurrency: int | None = None,
                    ref_strategy: str = "auto",
                    ref_broadcast_max: int = 5_000_000,
                    ref_bloom_bits: int | None = None,
                    reader=None) -> dict[str, Any]:
    """Fused two-scan flagship. Returns {violations: Dataset (lazy),
    profile: {col: ColumnProfile}, drift: [verdicts]}.

    Scan 1 reads only the metadata columns and computes rules + key partials +
    sketches in one stage; its compact tagged output is materialized (swap for a
    re-scan at scales where even the narrow stream is too big to pin). Scan 2
    reads the bytes column once and fuses decode checks with the broadcast
    membership checks. Total input passes: metadata 1x, bytes 1x.

    ``ref_strategy`` picks how the captions referential leg runs:
    - "auto" (default): a footer-metadata row count of the side table chooses
      exact broadcast when it fits (<= ``ref_broadcast_max`` keys) and the
      hash-partitioned shuffle anti-join otherwise — both exact.
    - "broadcast" / "shuffle": force the respective exact path.
    - "bloom": constant-size broadcast filter (sound but under-reports at the
      false-positive rate; explicit opt-in only, never chosen by auto).
    With "shuffle" the referential leg runs as its own narrow (image_id-only)
    scan unioned into violations, and its failures are not folded into
    ``failed_rows`` (which is an upper bound either way)."""
    import pickle

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.referential import _side_key_column
    from ..stages.stats import ColumnProfile

    # block count sized to the session's CPUs (4 blocks per core): Ray otherwise
    # coalesces small input files into target_max_block_size blocks, capping the
    # decode stage's parallelism below the core count
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n_cpus = 8
    import os as _os
    n_blocks = max(16, n_cpus * int(_os.environ.get('SVR_BLOCKS_PER_CPU', '4')))

    def _scan(columns):
        # `reader` (e.g. a Lance fragment's column-pruned scan,
        # sources/lance_io.Fragment.read) replaces the parquet read for
        # fragment-level resumable runs
        if reader is not None:
            return reader(columns, override_num_blocks=n_blocks)
        return rd.read_parquet(input_dir, columns=columns,
                               override_num_blocks=n_blocks)

    meta = _scan(META_COLUMNS)
    mixed = meta.map_batches(FusedMetaStage(IMAGE_SPEC),
                             batch_format="pyarrow",
                             batch_size=meta_batch_size).materialize()

    # ONE driver pass over the compact tagged stream splits the key partials,
    # sketch partials, and failed counts by kind (three separate filtered
    # re-iterations cost ~0.1s of fixed overhead each). Duplicate-key sets:
    # below the threshold the (key_kind, key, cnt) partials merge with one
    # pyarrow group_by (milliseconds — they are already in the object store);
    # above it, the distributed groupby path (cluster scale: per-batch combine
    # means each reducer sees at most num_batches rows per key even for hot
    # keys).
    import pyarrow.compute as _pc

    dup_sets: dict[str, set] = {"image_id": set(), "phash": set()}
    DRIVER_MERGE_MAX = 5_000_000
    profile: dict[str, ColumnProfile] = {}
    meta_failed = 0
    key_parts, key_rows = [], 0
    for b in (mixed.filter(expr="kind != 'v'")
              .iter_batches(batch_size=1 << 20, batch_format="pyarrow")):
        kind = b["kind"]
        kb = b.filter(_pc.equal(kind, "k"))
        if kb.num_rows and key_rows <= DRIVER_MERGE_MAX:
            key_parts.append(kb.select(["key_kind", "key", "cnt"]))
            key_rows += kb.num_rows
        pb = b.filter(_pc.equal(kind, "p"))
        for cname, cnt, nl, blob in zip(pb["pcol"].to_pylist(),
                                        pb["pcount"].to_pylist(),
                                        pb["pnulls"].to_pylist(),
                                        pb["blob"].to_pylist()):
            vmin, vmax, vsum, td, hll, cms = pickle.loads(blob)
            p = ColumnProfile(cname, cnt, nl, vmin, vmax, vsum, td, hll, cms)
            if cname in profile:
                profile[cname].merge(p)
            else:
                profile[cname] = p
        fb = b.filter(_pc.equal(kind, "f"))
        if fb.num_rows:
            meta_failed += int(pa.compute.sum(fb["cnt"]).as_py() or 0)
    if key_rows <= DRIVER_MERGE_MAX:
        if key_parts:
            merged = (pa.concat_tables(key_parts)
                      .group_by(["key_kind", "key"])
                      .aggregate([("cnt", "sum")]))
            dup = merged.filter(_pc.greater(merged["cnt_sum"], 1))
            for kk, k in zip(dup["key_kind"].to_pylist(),
                             dup["key"].to_pylist()):
                dup_sets[kk].add(k)
    else:
        kc = mixed.filter(expr="kind == 'k'").select_columns(
            ["key_kind", "key", "cnt"])
        dups = (kc.repartition(64)
                .groupby(["key_kind", "key"])
                .aggregate(Sum("cnt", alias_name="total"))
                .filter(expr="total > 1"))
        for b in dups.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
            for kk, k in zip(b["key_kind"].to_pylist(), b["key"].to_pylist()):
                dup_sets[kk].add(k)

    viol_meta = (mixed.filter(expr="kind == 'v'")
                 .select_columns(VIOLATION_COLUMNS))

    def _ref(s):
        vals = sorted(v for v in s if v is not None)
        return ray.put(pa.array(vals)) if vals else None

    dup_ids_ref = _ref(dup_sets["image_id"])
    dup_ph_ref = _ref(dup_sets["phash"])
    cap_ref = None
    cap_bloom_ref = None
    ref_extra = None
    if captions_path is not None:
        from ..stages.referential import (bloom_from_side,
                                          referential_violations_shuffle,
                                          side_key_count)

        strat = ref_strategy
        if strat == "auto":
            strat = ("broadcast"
                     if side_key_count(captions_path) <= ref_broadcast_max
                     else "shuffle")
        if strat == "broadcast":
            cap_keys = _side_key_column(captions_path, "image_id").drop_null()
            cap_ref = ray.put(cap_keys)
        elif strat == "bloom":
            bits = ref_bloom_bits or max(
                1024, 10 * side_key_count(captions_path))
            cap_bloom_ref = ray.put(
                bloom_from_side(captions_path, "image_id", bits))
        elif strat == "shuffle":
            ids_scan = _scan(["image_id"])
            ref_extra = _std(referential_violations_shuffle(
                ids_scan, captions_path, "image_id"))
        else:
            raise ValueError(f"unknown ref_strategy {ref_strategy!r}")

    cols = DECODE_COLUMNS if decode else ["image_id", "phash"]
    scan2 = _scan(cols)
    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if decode_batch_size:  # None = one batch per block (max parallelism)
        kwargs["batch_size"] = decode_batch_size
    if decode_concurrency:
        kwargs["concurrency"] = decode_concurrency
    scan2_out = scan2.map_batches(
        _DecodeAndMembership(dup_ids_ref, dup_ph_ref, cap_ref,
                             do_decode=decode, collect_hist=decode,
                             caption_bloom_ref=cap_bloom_ref), **kwargs)

    scan2_failed = 0
    if decode:
        # split the per-batch partial rows (intensity histograms, failed-row
        # counts) from the violation rows — scan2 output is narrow
        import numpy as np

        scan2_mat = scan2_out.materialize()
        hist_total = None
        specials = (f"rule_id == '{_DecodeAndMembership.HIST_RULE}' or "
                    f"rule_id == '{_DecodeAndMembership.FAILED_RULE}'")
        for b in (scan2_mat.filter(expr=specials)
                  .iter_batches(batch_size=4096, batch_format="pyarrow")):
            for rid, s in zip(b["rule_id"].to_pylist(),
                              b["offending_value"].to_pylist()):
                if rid == _DecodeAndMembership.HIST_RULE:
                    h = np.array([int(x) for x in s.split(",")], np.int64)
                    hist_total = h if hist_total is None else hist_total + h
                else:
                    scan2_failed += int(s)
        if hist_total is not None:
            profile["__intensity__"] = hist_total
        # Ray's expr grammar has no `not`: filter the complement directly
        scan2_out = scan2_mat.filter(
            expr=(f"rule_id != '{_DecodeAndMembership.HIST_RULE}' and "
                  f"rule_id != '{_DecodeAndMembership.FAILED_RULE}'"))

    violations = viol_meta.union(scan2_out)
    if ref_extra is not None:
        violations = violations.union(ref_extra)
    drift = (compare_profiles(reference_profile, profile)
             if reference_profile else [])
    return {"violations": violations, "profile": profile, "drift": drift,
            # upper bound: a row failing in both scans is counted twice
            "failed_rows": meta_failed + scan2_failed}


def validate_images_multiscan(input_dir: str, *, captions_path: str | None = None,
                              reference_profile: dict | None = None,
                              decode: bool = True,
                              meta_batch_size: int = 8192,
                              decode_batch_size: int = 512,
                              decode_concurrency: int | None = None) -> dict[str, Any]:
    """Original one-leg-per-check composition (each check an independent lazy
    Dataset over its own column-pruned read). Kept as the reference composition
    and for A/B-ing against the fused path."""
    import ray.data as rd

    meta = rd.read_parquet(input_dir, columns=META_COLUMNS)

    legs = [
        _std(meta.map_batches(
            RuleStage(IMAGE_SPEC, id_column="image_id", mode="violations"),
            batch_format="pyarrow", batch_size=meta_batch_size)),
        uniqueness_violations(meta, "image_id", id_column="image_id",
                              rule_id="unique:image_id"),
        uniqueness_violations(meta, "phash", id_column="image_id",
                              rule_id="unique:phash"),
    ]

    if captions_path is not None:
        # output already has columns (image_id, rule_id, column, offending_value)
        legs.append(referential_violations(
            meta.select_columns(["image_id"]), captions_path, "image_id"))

    if decode:
        imgs = rd.read_parquet(input_dir, columns=DECODE_COLUMNS)
        kwargs: dict[str, Any] = {"batch_format": "pyarrow",
                                  "batch_size": decode_batch_size}
        if decode_concurrency:
            kwargs["concurrency"] = decode_concurrency
        legs.append(imgs.map_batches(ImageViolationsStage(), **kwargs))

    violations = legs[0]
    for leg in legs[1:]:
        violations = violations.union(leg)

    profile = profile_dataset(meta, numeric=("w", "h"),
                              categorical=("fmt",), keys=("image_id", "phash"))
    drift = (compare_profiles(reference_profile, profile)
             if reference_profile else [])

    return {"violations": violations, "profile": profile, "drift": drift}


def run_partition(input_path: str, *, captions_path: str | None = None,
                  decode: bool = True, reader=None,
                  reference_profile: dict | None = None) -> dict[str, Any]:
    """One partition (shard) end-to-end; returns materialized small outputs
    for the manifest runner: violations table + verdict counts, plus the
    partition's drift verdicts vs ``reference_profile`` (north rule: each
    partition emits pass/fail + violation rows + metrics)."""
    import ray.data as rd

    res = validate_images(input_path, captions_path=captions_path,
                          decode=decode, reader=reader,
                          reference_profile=reference_profile)
    vio: pa.Table = pa.concat_tables(
        [b for b in res["violations"].iter_batches(batch_size=65536,
                                                   batch_format="pyarrow")]
        or [pa.schema([(c, pa.string()) for c in VIOLATION_COLUMNS]).empty_table()])
    # row count comes from scan 1's profile — no extra read; failed rows from
    # the exact per-batch pass-mask partials (upper bound across the two scans)
    n_rows = res["profile"]["image_id"].count
    failed = res["failed_rows"]
    drift = res.get("drift") or []
    drift_ok = all(d.get("ok", True) for d in drift)
    verdict = "pass" if (failed == 0 and vio.num_rows == 0
                         and drift_ok) else "fail"
    return {"violations": vio, "rows": n_rows, "failed_rows": failed,
            "profile": res["profile"], "drift": drift,
            "drift_ok": drift_ok, "verdict": verdict}


def run_resumable(input_paths: list[str], out_dir: str, *,
                  captions_path: str | None = None, decode: bool = True,
                  job_id: str = "job",
                  reference_profile: dict | None = None) -> dict[str, Any]:
    """Manifest-driven resumable run: partitions already recorded done (with a
    matching input digest) are skipped; each partition's outputs land atomically
    before its manifest row is written (state/manifest.py)."""
    import os

    import pyarrow.parquet as pq

    from ..state.manifest import Manifest, atomic_output_dir, promote

    man = Manifest(out_dir)
    inputs = {f"{i:05d}": p for i, p in enumerate(sorted(input_paths))}
    done = man.done_partitions(inputs)
    ran, skipped = [], []

    failed = []
    for pid, path in inputs.items():
        if pid in done:
            skipped.append(pid)
            continue
        t0 = time.perf_counter()
        attempt = man.next_attempt(pid)
        try:
            out = run_partition(path, captions_path=captions_path,
                                decode=decode,
                                reference_profile=reference_profile)
        except Exception as exc:  # noqa: BLE001 — isolate the partition
            # a broken shard must not sink the run: record the failure
            # (status=failed never matches done_partitions, so the next
            # invocation retries it with attempt+1) and keep going
            print(f"[resumable] partition {pid} failed: {exc!r}")
            man.record(partition_id=pid, input_path=path, status="failed",
                       attempt=attempt, rows=0, failed_rows=0, violations=0,
                       wall_seconds=time.perf_counter() - t0, job_id=job_id,
                       verdict="fail")
            failed.append(pid)
            continue
        tmp, final = atomic_output_dir(out_dir, "violations", pid)
        pq.write_table(out["violations"], os.path.join(tmp, "violations.parquet"))
        promote(tmp, final)
        man.record(partition_id=pid, input_path=path, status="done",
                   attempt=attempt, rows=out["rows"],
                   failed_rows=out["failed_rows"],
                   violations=out["violations"].num_rows,
                   wall_seconds=time.perf_counter() - t0, job_id=job_id,
                   verdict=out["verdict"], drift_ok=out["drift_ok"])
        ran.append(pid)
    return {"ran": ran, "skipped": skipped, "failed": failed,
            "manifest": man.load()}


def run_resumable_fragments(input_path: str, out_dir: str, *,
                            captions_path: str | None = None,
                            decode: bool = True,
                            job_id: str = "job",
                            reference_profile: dict | None = None
                            ) -> dict[str, Any]:
    """Fragment-level resumable run over a Lance dataset OR a parquet shard
    directory: one manifest partition per ``sources/lance_io.scan_fragments``
    entry (stable ``frag-NNNNN`` id + content digest), each validated through
    its fragment's own column-pruned reader. Fragments whose manifest row is
    ``done`` with a matching digest are skipped on resume."""
    import os

    import pyarrow.parquet as pq

    from ..sources.lance_io import scan_fragments
    from ..state.manifest import Manifest, atomic_output_dir, promote

    man = Manifest(out_dir)
    frags = {f.frag_id: f for f in scan_fragments(input_path)}
    done = man.done_fragments({fid: f.digest for fid, f in frags.items()})
    ran, skipped = [], []

    failed = []
    for fid, frag in sorted(frags.items()):
        if fid in done:
            skipped.append(fid)
            continue
        t0 = time.perf_counter()
        attempt = man.next_attempt(fid)
        try:
            out = run_partition(frag.source, captions_path=captions_path,
                                decode=decode, reader=frag.read,
                                reference_profile=reference_profile)
        except Exception as exc:  # noqa: BLE001 — isolate the fragment
            print(f"[resumable] fragment {fid} failed: {exc!r}")
            man.record(partition_id=fid, input_path=frag.source,
                       status="failed", attempt=attempt, rows=0,
                       failed_rows=0, violations=0,
                       wall_seconds=time.perf_counter() - t0, job_id=job_id,
                       input_digest=frag.digest, verdict="fail")
            failed.append(fid)
            continue
        tmp, final = atomic_output_dir(out_dir, "violations", fid)
        pq.write_table(out["violations"],
                       os.path.join(tmp, "violations.parquet"))
        promote(tmp, final)
        man.record(partition_id=fid, input_path=frag.source, status="done",
                   attempt=attempt, rows=out["rows"],
                   failed_rows=out["failed_rows"],
                   violations=out["violations"].num_rows,
                   wall_seconds=time.perf_counter() - t0, job_id=job_id,
                   input_digest=frag.digest,
                   verdict=out["verdict"], drift_ok=out["drift_ok"])
        ran.append(fid)
    return {"ran": ran, "skipped": skipped, "failed": failed,
            "manifest": man.load()}
