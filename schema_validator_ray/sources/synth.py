"""Deterministic synthesis of the canonical image/caption table.

Schema exactly per BASELINE.json ``input_hint``:
    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

Seeded violations follow FIXTURES.md F1 (each tagged with the rule id it should
trip). Everything is a pure function of (seed, row index) so any shard can be
re-generated independently — the property that makes resume tests byte-stable.

Captions can be derived from a documents table (sf testdata) so ``entry()`` reads
driver-provided inputs; otherwise token soup from the seeded RNG.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import imagecodec as codec

SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

FMTS = ("png", "jpeg", "webp")
_WORDS = ("sun moon tree river cloud stone bird fish leaf wind rain snow star "
          "hill lake sand wave fire frost dawn dusk mist peak vale fern moss").split()

# violation rates (FIXTURES.md F1)
R_EMPTY_ID = 0.010
R_BAD_UUID = 0.005
R_DUP_ID = 0.005
R_TRUNCATED = 0.005
R_DIM_MISMATCH = 0.005
R_DIM_RANGE = 0.010
R_NULL_W = 0.002
R_BAD_FMT = 0.010
R_EMPTY_CAPTION = 0.010
R_NONPRINT_CAPTION = 0.005
R_HOT_PHASH = 0.02  # rows funneled into ~10 shared phash values (skew fixture)

MIN_DIM, MAX_DIM = 16, 96  # kept small so synthesis stays cheap at test scale

SYNTH_VERSION = 3  # bump when generation changes — busts /tmp caches

# small row groups so Ray's block splitting has real split points (a shard with
# ONE row group makes override_num_blocks re-read the same group per split)
ROW_GROUP_SIZE = 256


def _row_image_id(seed: int, i: int) -> str:
    """image_id from a DEDICATED RNG stream (independent of the pixel stream),
    so the duplicate-id fixture can reproduce row i-1's id exactly."""
    rng = np.random.default_rng([seed, i, 101])
    return str(uuid.UUID(int=int(rng.integers(0, 2 ** 63)) << 64
                         | int(rng.integers(0, 2 ** 63)), version=4))


def synth_batch(start: int, n: int, seed: int = 42,
                captions: list[str] | None = None,
                clean: bool = False,
                min_dim: int = MIN_DIM, max_dim: int = MAX_DIM) -> pa.Table:
    """Generate rows [start, start+n) deterministically."""
    ids, blobs, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
    hot_rng = np.random.default_rng(seed)
    hot_phashes = hot_rng.integers(-(2 ** 62), 2 ** 62, size=10)

    for i in range(start, start + n):
        rng = np.random.default_rng((seed << 20) ^ i)
        u = rng.random(12)

        # dims (log-uniform-ish)
        w = int(np.exp(rng.uniform(np.log(min_dim), np.log(max_dim))))
        h = int(np.exp(rng.uniform(np.log(min_dim), np.log(max_dim))))
        fmt = FMTS[int(rng.integers(0, 3))]
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.uint8)
        blob = codec.encode(px, fmt)
        ph = codec.phash64(codec.decode(blob)[0])

        image_id = _row_image_id(seed, i)
        if captions is not None:
            caption = captions[i % len(captions)]
        else:
            k = int(rng.integers(4, 12))
            caption = " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), k))

        wo: int | None = w
        ho: int | None = h
        if not clean:
            if u[0] < R_EMPTY_ID:
                image_id = ""                                   # required
            elif u[0] < R_EMPTY_ID + R_BAD_UUID:
                image_id = "not-a-uuid-" + str(i)               # uuid
            elif u[0] < R_EMPTY_ID + R_BAD_UUID + R_DUP_ID and i > 0:
                image_id = _row_image_id(seed, i - 1)  # exact duplicate of row i-1
            if u[1] < R_TRUNCATED:
                blob = blob[: max(4, len(blob) // 2)]            # decode check
            elif u[1] < R_TRUNCATED + R_DIM_MISMATCH:
                wo = w + 1                                       # dims mismatch
            if u[2] < R_DIM_RANGE:
                wo = 0 if u[3] < 0.5 else 70000                  # min=1|max=65535
            elif u[2] < R_DIM_RANGE + R_NULL_W:
                wo = None                                        # required (null)
            if u[4] < R_BAD_FMT:
                fmt_col = "bmp" if u[5] < 0.5 else ""            # oneof
            else:
                fmt_col = fmt
            if u[6] < R_EMPTY_CAPTION:
                caption = ""                                     # required
            elif u[6] < R_EMPTY_CAPTION + R_NONPRINT_CAPTION:
                caption = caption + "\x07"                       # printascii
            if u[7] < R_HOT_PHASH:
                ph = int(hot_phashes[int(u[8] * 10) % 10])       # skewed hot bucket
        else:
            fmt_col = fmt

        ids.append(image_id)
        blobs.append(blob)
        ws.append(wo)
        hs.append(ho)
        fmts.append(fmt_col)
        caps.append(caption)
        phashes.append(ph)

    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })


def write_images_dataset(out_dir: str, n_rows: int, *, seed: int = 42,
                         shards: int = 8, captions: list[str] | None = None,
                         clean: bool = False,
                         min_dim: int = MIN_DIM, max_dim: int = MAX_DIM,
                         parallel: bool = False) -> list[str]:
    """Write a sharded parquet dataset (the Lance stand-in — lance is not in this
    container; each shard is an independent partition for the manifest/resume
    path). Returns shard paths. ``parallel=True`` synthesizes shards as Ray
    tasks (needs an active session; rows are a pure function of (seed, i), so
    output is identical either way)."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + shards - 1) // shards
    jobs, paths = [], []
    for s in range(shards):
        start = s * per
        n = min(per, n_rows - start)
        if n <= 0:
            break
        path = os.path.join(out_dir, f"part-{s:05d}.parquet")
        paths.append(path)
        if not os.path.exists(path):
            jobs.append((start, n, path))

    def _write(start: int, n: int, path: str) -> None:
        tbl = synth_batch(start, n, seed=seed, captions=captions, clean=clean,
                          min_dim=min_dim, max_dim=max_dim)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=ROW_GROUP_SIZE)
        os.replace(tmp, path)

    if parallel and jobs:
        import ray

        task = ray.remote(num_cpus=1)(_write)
        ray.get([task.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _write(*j)
    return paths


def write_captions_side_table(out_path: str, images_dir: str,
                              drop_rate: float = 0.01, seed: int = 42) -> str:
    """Side table captions(image_id, caption): copy of the images' (image_id,
    caption) with ~1% of image_ids removed -> referential violations (F1)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(images_dir)
    tbl = ds.to_table(columns=["image_id", "caption"])
    rng = np.random.default_rng(seed + 7)
    keep = rng.random(tbl.num_rows) >= drop_rate
    pq.write_table(tbl.filter(pa.array(keep)), out_path)
    return out_path
