"""Image-payload validation stage (axes A+B): decode, dims, phash, PSNR round-trip.

An actor-pool ``map_batches`` stage (callable class => one instance per actor,
decoder state initialized once — the pattern for real decoders; here the stand-in
codec needs no warmup but the plumbing is identical). Small batches, ``num_cpus=1``
per actor: the ``bytes`` column is wide, so block size — not row count — bounds
memory.

Emits one row per input row:
    (image_id, decode_ok, dims_ok, phash_ok, psnr_ok, hist: list<int64>[16])
plus violation semantics downstream: decode_ok=False -> rule "image_decode", etc.

Checked invariants (input_hint): decoded dims == (w, h); stored phash == phash of
decoded pixels; lossy formats round-trip re-encode with PSNR >= 40 dB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import imagecodec as codec

HIST_BINS = 16

def _binary_views(col) -> list:
    """Zero-copy memoryview per row of a binary column (no per-blob memcpy;
    the decode stage reads straight from the Arrow data buffer). None for null
    rows."""
    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
    else:
        chunks = [col]
    out: list = []
    for arr in chunks:
        if arr.null_count == len(arr):
            out.extend([None] * len(arr))
            continue
        bufs = arr.buffers()
        # binary uses int32 offsets, large_binary int64 — honor the type
        off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                     else np.int32)
        offsets = (np.frombuffer(bufs[1], dtype=off_dtype,
                                 count=len(arr) + 1 + arr.offset)
                   [arr.offset:])
        data = memoryview(bufs[2])
        if arr.null_count:
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
        else:
            valid = None
        for i in range(len(arr)):
            if valid is not None and not valid[i]:
                out.append(None)
            else:
                out.append(data[offsets[i]:offsets[i + 1]])
    return out


RULE_DECODE = "image_decode"
RULE_DIMS = "image_dims"
RULE_PHASH = "image_phash"
RULE_PSNR = "image_psnr"

PSNR_MIN_DB = 40.0


class DecodeCheckStage:
    """map_batches(DecodeCheckStage, batch_format="pyarrow", batch_size=256,
    concurrency=N, num_cpus=1)"""

    def __init__(self, psnr_min_db: float = PSNR_MIN_DB):
        self.psnr_min_db = psnr_min_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch["image_id"].to_pylist()
        blobs = _binary_views(batch["bytes"])  # zero-copy memoryviews
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        phs = batch["phash"].to_pylist()

        decode_ok = np.zeros(n, bool)
        dims_ok = np.zeros(n, bool)
        phash_ok = np.zeros(n, bool)
        psnr_ok = np.zeros(n, bool)
        hists = np.zeros((n, HIST_BINS), np.int64)

        for i in range(n):
            blob = blobs[i]
            if blob is None:
                continue
            try:
                px, fmt, _, _ = codec.decode(blob)
            except codec.CodecError:
                continue
            decode_ok[i] = True
            dims_ok[i] = (ws[i] is not None and hs[i] is not None
                          and px.shape == (hs[i], ws[i]))
            phash_ok[i] = phs[i] is not None and codec.phash64(px) == phs[i]
            if fmt in codec.LOSSY:
                # lossy round-trip stability: decode(encode(decoded)) vs decoded
                rt, _, _, _ = codec.decode(codec.encode(px, fmt))
                psnr_ok[i] = codec.psnr(px, rt) >= self.psnr_min_db
            else:
                psnr_ok[i] = True
            hists[i] = codec.intensity_histogram(px, HIST_BINS)

        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "decode_ok": pa.array(decode_ok),
            "dims_ok": pa.array(dims_ok),
            "phash_ok": pa.array(phash_ok),
            "psnr_ok": pa.array(psnr_ok),
            "hist": pa.FixedSizeListArray.from_arrays(
                pa.array(hists.ravel(), pa.int64()), HIST_BINS),
        })


def image_violations(decoded: pa.Table) -> pa.Table:
    """Convert a DecodeCheckStage output batch to violation rows
    (image_id, rule_id, column, offending_value)."""
    ids, rules = [], []
    d = decoded.to_pydict()
    for i in range(decoded.num_rows):
        if not d["decode_ok"][i]:
            ids.append(d["image_id"][i]); rules.append(RULE_DECODE)
            continue  # dims/phash meaningless if undecodable
        if not d["dims_ok"][i]:
            ids.append(d["image_id"][i]); rules.append(RULE_DIMS)
        if not d["phash_ok"][i]:
            ids.append(d["image_id"][i]); rules.append(RULE_PHASH)
        if not d["psnr_ok"][i]:
            ids.append(d["image_id"][i]); rules.append(RULE_PSNR)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "rule_id": pa.array(rules, pa.string()),
        "column": pa.array(["bytes"] * len(ids), pa.string()),
        "offending_value": pa.array(["<binary>"] * len(ids), pa.string()),
    })


class ImageViolationsStage:
    """Fused decode-check -> violation rows (streaming; keeps only failing rows)."""

    def __init__(self, psnr_min_db: float = PSNR_MIN_DB):
        self.inner = DecodeCheckStage(psnr_min_db)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return image_violations(self.inner(batch))
