"""Per-rule-pack throughput microbenchmark (single core, no Ray): rows/sec of
vectorized kernel evaluation over a 1M-row column. Usage:

    python tools/rulebench.py [rows]

Evidence that the hot path is Arrow kernels, not Python row loops: regex-class
rules sustain tens of millions of rows/sec; checksum rules (numpy) millions.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from schema_validator_ray import compile_ruleset  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

PACKS = {
    "required(int)": ("int", "required"),
    "min/max(int)": ("int", "min=10|max=5000000"),
    "uuid(regex)": ("uuid", "uuid"),
    "email(regex)": ("email", "email"),
    "oneof(str)": ("word", "oneof=alpha,beta,gamma"),
    "alpha+printascii": ("word", "alpha|printascii"),
    "min-len(str)": ("word", "min=4"),
    "luhn(numpy)": ("digits", "luhn_checksum"),
    "datetime": ("dt", "datetime"),
    "ipv4": ("ip", "ipv4"),
    "full-image-spec(5 cols)": ("image", None),
}


def make_column(kind: str, n: int) -> pa.Table:
    rng = np.random.default_rng(7)
    if kind == "int":
        return pa.table({"x": pa.array(rng.integers(0, 10_000_000, n))})
    if kind == "uuid":
        base = "550e8400-e29b-41d4-a716-4466554400"
        vals = [base + f"{i % 100:02d}" for i in range(n)]
        return pa.table({"x": pa.array(vals)})
    if kind == "email":
        vals = [f"user{i}@example{i % 7}.com" for i in range(n)]
        return pa.table({"x": pa.array(vals)})
    if kind == "word":
        words = np.array(["alpha", "beta", "gamma", "delta", "x1"])
        return pa.table({"x": pa.array(words[rng.integers(0, 5, n)])})
    if kind == "digits":
        vals = [str(rng.integers(10 ** 12, 10 ** 15)) for _ in range(n // 10)]
        return pa.table({"x": pa.array(vals * 10)[:n]})
    if kind == "dt":
        vals = [f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d} 10:30:00"
                for i in range(n)]
        return pa.table({"x": pa.array(vals)})
    if kind == "ip":
        vals = [f"10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}"
                for i in range(n)]
        return pa.table({"x": pa.array(vals)})
    if kind == "image":
        from schema_validator_ray.sources.synth import synth_batch

        t = synth_batch(0, min(n, 20000), seed=1)
        return t.drop_columns(["bytes"])
    raise ValueError(kind)


def main() -> None:
    from schema_validator_ray.pipelines.validate_images import IMAGE_SPEC

    print(f"{'pack':28s} {'rows':>9s} {'ms':>8s} {'Mrows/s':>9s}")
    for name, (kind, tag) in PACKS.items():
        tbl = make_column(kind, N)
        spec = IMAGE_SPEC if tag is None else {"x": tag}
        cs = compile_ruleset(spec, tbl.schema)
        cs.evaluate(tbl)  # warm (this VM page-faults fresh large allocations)
        t0 = time.perf_counter()
        cs.evaluate(tbl)
        dt = time.perf_counter() - t0
        print(f"{name:28s} {tbl.num_rows:>9d} {dt * 1000:>8.1f} "
              f"{tbl.num_rows / dt / 1e6:>9.2f}")


if __name__ == "__main__":
    main()
