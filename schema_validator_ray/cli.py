"""CLI entry point — the ``ray job submit`` surface.

    ray job submit -- python -m schema_validator_ray validate \
        --input /data/images --captions /data/captions.parquet \
        --out /data/out --resume

Owns the Ray session (library code never calls ray.init). ``--resume`` skips
partitions whose manifest row is done with a matching input digest.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """Returns True if WE initialized the session (then we own the shutdown;
    an externally-owned session — driver, pytest fixture — is left alone)."""
    import ray

    owned = False
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
        owned = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def cmd_validate(args) -> int:
    import os

    import ray

    if not os.path.exists(args.input):
        print(f"error: input path does not exist: {args.input}",
              file=sys.stderr)
        return 2
    if args.captions and not os.path.exists(args.captions):
        print(f"error: captions path does not exist: {args.captions}",
              file=sys.stderr)
        return 2

    owned = _init_ray(args.num_cpus)
    try:
        reference_profile = None
        if args.drift_profile:
            from .stages.stats import load_profiles

            reference_profile = load_profiles(args.drift_profile)
        if args.out:
            if args.fragments:
                # fragment-level resume: Lance get_fragments() partitions (or
                # per-file parquet fallback), digests from fragment metadata
                from .pipelines.validate_images import run_resumable_fragments

                res = run_resumable_fragments(
                    args.input, args.out, captions_path=args.captions,
                    decode=not args.no_decode, job_id=args.job_id,
                    reference_profile=reference_profile)
            else:
                from .pipelines.validate_images import run_resumable
                from .sources.lance_io import fragment_paths

                paths = fragment_paths(args.input)
                res = run_resumable(paths, args.out,
                                    captions_path=args.captions,
                                    decode=not args.no_decode,
                                    job_id=args.job_id,
                                    reference_profile=reference_profile)
            summary = {
                "ran": len(res["ran"]), "skipped": len(res["skipped"]),
                "failed": len(res.get("failed", [])),
                "partitions": {pid: {"rows": row["rows"],
                                     "violations": row["violations"],
                                     "status": row["status"],
                                     "verdict": row.get("verdict", "pass"),
                                     "drift_ok": row.get("drift_ok", True)}
                               for pid, row in res["manifest"].items()},
            }
        else:
            from .pipelines.validate_images import validate_images

            res = validate_images(args.input, captions_path=args.captions,
                                  reference_profile=reference_profile,
                                  decode=not args.no_decode,
                                  ref_strategy=args.ref_strategy)
            vio = res["violations"]
            if args.locale:
                from .i18n import translate

                vio = translate(vio, args.locale)
            if args.violations_out:
                vio = vio.materialize()  # count + write without re-executing
            counts: dict[str, int] = {}
            for b in vio.iter_batches(batch_size=1 << 16,
                                      batch_format="pyarrow"):
                for r in b["rule_id"].to_pylist():
                    counts[r] = counts.get(r, 0) + 1
            summary = {"violations_by_rule": dict(sorted(counts.items())),
                       "profile": {k: (p.summary() if hasattr(p, "summary")
                                       else list(map(int, p)))
                                   for k, p in res["profile"].items()}}
            if reference_profile is not None:
                summary["drift"] = res["drift"]
            if args.save_profile:
                from .stages.stats import save_profiles

                save_profiles(res["profile"], args.save_profile)
                summary["profile_saved"] = args.save_profile
            if args.violations_out:
                vio.write_parquet(args.violations_out)
                summary["violations_written"] = args.violations_out
        print(json.dumps(summary, default=str))
        return 0
    finally:
        if owned:
            ray.shutdown()


def cmd_profile(args) -> int:
    import ray

    owned = _init_ray(args.num_cpus)
    try:
        from .sources.lance_io import read_table
        from .stages.stats import profile_dataset

        ds = read_table(args.input)
        numeric = args.numeric.split(",") if args.numeric else []
        categorical = args.categorical.split(",") if args.categorical else []
        keys = args.keys.split(",") if args.keys else []
        profs = profile_dataset(ds, numeric=numeric, categorical=categorical,
                                keys=keys)
        print(json.dumps({k: p.summary() for k, p in profs.items()},
                         default=str))
        return 0
    finally:
        if owned:
            ray.shutdown()


def cmd_curate(args) -> int:
    import glob
    import os

    import ray

    owned = _init_ray(args.num_cpus)
    try:
        from .pipelines.curate_images import run_curate_resumable

        paths = (sorted(glob.glob(os.path.join(args.input, "*.parquet")))
                 if os.path.isdir(args.input) else [args.input])
        res = run_curate_resumable(
            paths, args.out, min_sharpness=args.min_sharpness,
            max_saturated_frac=args.max_saturated_frac,
            job_id=args.job_id)
        print(json.dumps({"ran": len(res["ran"]),
                          "skipped": len(res["skipped"]),
                          "failed": res["failed"],
                          "curated_rows": res["curated_rows"],
                          "dominated": res["dominated"]}))
        return 1 if res["failed"] else 0
    finally:
        if owned:
            ray.shutdown()


def cmd_curate_docs(args) -> int:
    import glob
    import os

    import ray

    owned = _init_ray(args.num_cpus)
    try:
        from .pipelines.curate_documents import run_curate_docs_resumable

        paths = (sorted(glob.glob(os.path.join(args.input, "*.parquet")))
                 if os.path.isdir(args.input) else [args.input])
        res = run_curate_docs_resumable(
            paths, args.out, embeddings_path=args.embeddings,
            min_quality=args.min_quality, min_tokens=args.min_tokens,
            span_k=args.span_k, prior_seen=args.prior_seen,
            job_id=args.job_id)
        print(json.dumps({"ran": len(res["ran"]),
                          "skipped": len(res["skipped"]),
                          "failed": res["failed"],
                          "curated_rows": res["curated_rows"],
                          "dropped": res["phase1"]["dropped"],
                          "dup_spans": res["phase1"]["dup_spans"]}))
        return 1 if res["failed"] else 0
    finally:
        if owned:
            ray.shutdown()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="schema_validator_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the image validation pipeline")
    v.add_argument("--input", required=True)
    v.add_argument("--captions")
    v.add_argument("--out", help="output dir (enables resumable manifest mode)")
    v.add_argument("--fragments", action="store_true",
                   help="with --out: one resume partition per Lance fragment "
                        "(or per parquet file) via scan_fragments")
    v.add_argument("--no-decode", action="store_true")
    v.add_argument("--job-id", default="job")
    v.add_argument("--num-cpus", type=int)
    v.add_argument("--locale", help="append localized messages to violations "
                                    "(en, zh-CN, or a register_locale name)")
    v.add_argument("--ref-strategy", default="auto",
                   choices=["auto", "broadcast", "bloom", "shuffle"],
                   help="referential-check strategy (auto sizes the side)")
    v.add_argument("--violations-out",
                   help="write violation rows as partitioned parquet here")
    v.add_argument("--drift-profile",
                   help="reference profile file: run KS/PSI drift checks")
    v.add_argument("--save-profile",
                   help="save this run's column profile (future drift reference)")
    v.set_defaults(fn=cmd_validate)

    pr = sub.add_parser("profile", help="column statistics profile")
    pr.add_argument("--input", required=True)
    pr.add_argument("--numeric", default="")
    pr.add_argument("--categorical", default="")
    pr.add_argument("--keys", default="")
    pr.add_argument("--num-cpus", type=int)
    pr.set_defaults(fn=cmd_profile)

    cu = sub.add_parser("curate", help="resumable image curation: validate"
                        " -> quality -> near-dup canonical keep")
    cu.add_argument("--input", required=True,
                    help="parquet shard dir or one file")
    cu.add_argument("--out", required=True)
    cu.add_argument("--min-sharpness", type=float, default=0.5)
    cu.add_argument("--max-saturated-frac", type=float, default=0.9)
    cu.add_argument("--job-id", default="job")
    cu.add_argument("--num-cpus", type=int)
    cu.set_defaults(fn=cmd_curate)

    cd = sub.add_parser("curate-docs", help="resumable document curation: "
                        "quality -> exact/streaming/semantic dedup -> exact "
                        "span removal")
    cd.add_argument("--input", required=True,
                    help="parquet shard dir or one file (doc_id, text)")
    cd.add_argument("--out", required=True)
    cd.add_argument("--embeddings",
                    help="embeddings parquet (vec_id aligned with doc_id) "
                         "enabling the SemDeDup drop set")
    cd.add_argument("--min-quality", type=float, default=0.75)
    cd.add_argument("--min-tokens", type=int, default=15)
    cd.add_argument("--span-k", type=int, default=40)
    cd.add_argument("--prior-seen",
                    help="seen-key snapshot dir from a previous run: its "
                         "content is deduped away (incremental feeds)")
    cd.add_argument("--job-id", default="job")
    cd.add_argument("--num-cpus", type=int)
    cd.set_defaults(fn=cmd_curate_docs)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
