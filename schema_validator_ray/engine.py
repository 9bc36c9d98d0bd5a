"""Ray Data execution layer: run a CompiledRuleSet over a Dataset.

Replaces the reference's synchronous single-record driver (validator.go:32-49) with a
streaming ``map_batches`` pipeline:

    read (column-pruned)  ->  map_batches(RuleStage, batch_format="pyarrow")  ->
      violations Dataset  (streamed, never accumulated driver-side)
      + per-partition verdict rows (pre-aggregated per batch, merged via groupby)

Design notes for 100 TB scale:
- The stage ships the *spec* (tiny) and compiles once per worker on first batch —
  regex compilation and type dispatch are NOT paid per batch.
- Verdict aggregation is a partial/combiner pattern: one summary row per (partition,
  batch) leaves the stage; the global/groupby reduce touches only those partials.
- Violations stream out per batch (unlike the reference's unbounded error slice).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .compile import CompiledRuleSet, compile_ruleset, violations_schema
from .registry import Registry


class RuleStage:
    """Callable-class stage for ``map_batches``: compiles the spec once per
    actor/worker process, then evaluates batches vectorized.

    mode:
      "violations" -> emit violation rows only
      "verdict"    -> emit one partial-summary row per (partition, batch)
      "annotate"   -> pass rows through with an appended ``_valid`` bool column
    """

    def __init__(self, spec, *, id_column: str | None = None,
                 mode: str = "violations", partition_column: str | None = None,
                 registry: Registry | None = None):
        self.spec = spec
        self.id_column = id_column
        self.mode = mode
        self.partition_column = partition_column
        self.registry = registry
        self._compiled: CompiledRuleSet | None = None

    def _get(self, schema: pa.Schema) -> CompiledRuleSet:
        if self._compiled is None:
            self._compiled = compile_ruleset(self.spec, schema, registry=self.registry)
        return self._compiled

    def __call__(self, batch: pa.Table) -> pa.Table:
        cs = self._get(batch.schema)
        pass_mask, violations = cs.evaluate(batch, id_column=self.id_column)
        if self.mode == "violations":
            return violations
        if self.mode == "annotate":
            return batch.append_column("_valid", pa.array(pass_mask))
        if self.mode == "tagged":
            # one evaluation, both outputs: violation rows (kind='v') + verdict
            # partials (kind='p') in a union schema — the caller splits
            part = self._verdict_partials(batch, pass_mask, violations)
            return _tag_union(violations, part)
        # verdict: pre-aggregated partials, one row per partition value per batch
        return self._verdict_partials(batch, pass_mask, violations)

    def _verdict_partials(self, batch, pass_mask, violations) -> pa.Table:
        if self.partition_column is None:
            return pa.table({
                "partition": pa.array(["__all__"]),
                "rows": pa.array([batch.num_rows], type=pa.int64()),
                "failed_rows": pa.array([int((~pass_mask).sum())], type=pa.int64()),
                "violations": pa.array([violations.num_rows], type=pa.int64()),
            })
        part = batch[self.partition_column]
        if isinstance(part, pa.ChunkedArray):
            part = part.combine_chunks()
        part_str = pc.cast(part, pa.string()).fill_null("__null__")
        # per-partition violation counts via the violation rows' row_index
        codes = part_str.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_parts = len(codes.dictionary)
        viol_counts = np.zeros(n_parts, np.int64)
        if violations.num_rows:
            vrows = violations["row_index"].to_numpy(zero_copy_only=False)
            np.add.at(viol_counts, idx[vrows], 1)
        rows = np.bincount(idx, minlength=n_parts).astype(np.int64)
        failed = np.zeros(n_parts, np.int64)
        np.add.at(failed, idx, (~pass_mask).astype(np.int64))
        return pa.table({
            "partition": codes.dictionary,
            "rows": pa.array(rows, type=pa.int64()),
            "failed_rows": pa.array(failed, type=pa.int64()),
            "violations": pa.array(viol_counts, type=pa.int64()),
        })


def _tag_union(violations: pa.Table, partials: pa.Table) -> pa.Table:
    fields = ([pa.field("kind", pa.string())]
              + list(violations.schema)
              + [f for f in partials.schema])
    schema = pa.schema(fields)

    def conform(t: pa.Table, kind: str) -> pa.Table:
        cols = [pa.array([kind] * t.num_rows, pa.string())]
        for f in schema:
            if f.name == "kind":
                continue
            if f.name in t.column_names:
                cols.append(pc.cast(t[f.name], f.type))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    return pa.concat_tables([conform(violations, "v"), conform(partials, "p")])


def validate(ds, spec, *, id_column: str | None = None,
             partition_column: str | None = None,
             batch_size: int | None = 8192,
             concurrency: int | None = None,
             fused: bool = True,
             registry: Registry | None = None):
    """Main entry: returns a dict of lazy Datasets:
       ``violations`` (one row per rule violation) and ``verdicts`` (one row per
       partition with rows / failed_rows / violations counts merged from
       per-batch partials).

    ``fused=True`` (default): ONE scan + one rule evaluation per batch emits a
    tagged stream (violations + verdict partials) that is materialized and
    split — materialization is bounded by the violation rate. ``fused=False``
    keeps two independent lazy legs (each scans and evaluates; use when
    violations must stream unmaterialized).

    ``concurrency=N`` runs the stage as an ACTOR POOL of N workers: the spec
    compiles once per actor (regexes, type dispatch) instead of once per task —
    the stateful-stage pattern; without it, stateless tasks (cheap, elastic).
    """
    from ray.data.aggregate import Sum

    kwargs: dict[str, Any] = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size

    def stage(mode, part_col=None):
        ctor = dict(spec=spec, id_column=id_column, mode=mode,
                    partition_column=part_col, registry=registry)
        if concurrency is not None:
            return dict(fn=RuleStage, fn_constructor_kwargs=ctor,
                        concurrency=concurrency)
        return dict(fn=RuleStage(**ctor))

    def merge(partials):
        return (partials
                .groupby("partition")
                .aggregate(Sum("rows", alias_name="rows"),
                           Sum("failed_rows", alias_name="failed_rows"),
                           Sum("violations", alias_name="violations")))

    if fused:
        s = stage("tagged", partition_column)
        mixed = ds.map_batches(s.pop("fn"), **s, **kwargs).materialize()
        viol_cols = ["row_index", "rule_id", "column", "offending_value"]
        if id_column:
            viol_cols.insert(1, id_column)
        violations = (mixed.filter(expr="kind == 'v'")
                      .select_columns(viol_cols))
        partials = (mixed.filter(expr="kind == 'p'")
                    .select_columns(["partition", "rows", "failed_rows",
                                     "violations"]))
        return {"violations": violations, "verdicts": merge(partials)}

    s = stage("violations")
    violations = ds.map_batches(s.pop("fn"), **s, **kwargs)
    s = stage("verdict", partition_column)
    partials = ds.map_batches(s.pop("fn"), **s, **kwargs)
    return {"violations": violations, "verdicts": merge(partials)}


def validate_table(tbl: pa.Table, spec, *, id_column: str | None = None,
                   registry: Registry | None = None):
    """Driver-side single-batch convenience (test harness parity with the
    reference's NewContext+Validate shape, schema/context.go:46-54)."""
    cs = compile_ruleset(spec, tbl.schema, registry=registry)
    return cs.evaluate(tbl, id_column=id_column)
