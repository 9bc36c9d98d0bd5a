"""Multimodal transform stages: image resize / thumbnail, video frame-sampling,
audio feature extraction.

Images are REAL against the stand-in codec (decode -> block-mean resize ->
re-encode); swapping in PIL is confined to functions/imagecodec.py. Video/audio
libraries are not in this container, so those stages implement the full Ray-side
plumbing (schema, actor signature, batch sizing, output layout) over a
deterministic fake payload format, with the actual media parsing isolated behind
``_decode_video`` / ``_decode_audio`` which raise ``NotImplementedError`` for
real payloads — clearly-marked swap points.

All are actor-pool stages: pass the CLASS to ``map_batches(Cls, concurrency=N,
num_cpus=1, batch_size=...)`` so any decoder/model state initializes once per
actor.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import imagecodec as codec
from .images import _binary_views


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize via block means (exact for integer grids, approximate
    otherwise) — the deterministic stand-in for a real resampling kernel."""
    h, w = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    ys1 = np.maximum(ys[1:], ys[:-1] + 1)
    xs1 = np.maximum(xs[1:], xs[:-1] + 1)
    row_red = np.add.reduceat(px, ys[:-1], axis=0, dtype=np.int64)
    sums = np.add.reduceat(row_red, xs[:-1], axis=1)
    areas = (ys1 - ys[:-1])[:, None] * (xs1 - xs[:-1])[None, :]
    if h < out_h or w < out_w:  # upsample: fall back to nearest
        yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
        xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
        return px[np.ix_(yi, xi)]
    return np.clip(sums / areas, 0, 255).astype(np.uint8)


class ImageResizeStage:
    """(image_id, bytes, fmt) -> (image_id, bytes, w, h, fmt) resized to fit
    within (max_w, max_h), preserving aspect. Undecodable payloads pass through
    with ``resize_ok=False`` instead of failing the task (lineage-safe)."""

    def __init__(self, max_w: int = 64, max_h: int = 64, out_fmt: str | None = None):
        self.max_w = max_w
        self.max_h = max_h
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = _binary_views(batch["bytes"])
        ids = batch["image_id"].to_pylist()
        out_b, out_w, out_h, out_f, ok = [], [], [], [], []
        for i, blob in enumerate(blobs):
            if blob is None:
                out_b.append(None); out_w.append(None); out_h.append(None)
                out_f.append(None); ok.append(False)
                continue
            try:
                px, fmt, w, h = codec.decode(blob)
            except codec.CodecError:
                out_b.append(bytes(blob)); out_w.append(None); out_h.append(None)
                out_f.append(None); ok.append(False)
                continue
            scale = min(self.max_w / w, self.max_h / h, 1.0)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            small = block_mean_resize(px, nh, nw)
            fmt_out = self.out_fmt or fmt
            out_b.append(codec.encode(small, fmt_out))
            out_w.append(nw); out_h.append(nh); out_f.append(fmt_out)
            ok.append(True)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(out_b, pa.binary()),
            "w": pa.array(out_w, pa.int32()),
            "h": pa.array(out_h, pa.int32()),
            "fmt": pa.array(out_f, pa.string()),
            "resize_ok": pa.array(ok, pa.bool_()),
        })


# ---------------------------------------------------------------------------
# video / audio (stub decoders, real plumbing)

_FVID = b"FVID"  # fake payload: FVID | n_frames u32 | w u16 | h u16 | frames…
_FAUD = b"FAUD"  # fake payload: FAUD | n_samples u32 | i16 samples


def make_fake_video(n_frames: int, w: int, h: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n_frames, h, w), dtype=np.uint8)
    return _FVID + struct.pack("<IHH", n_frames, w, h) + frames.tobytes()


def make_fake_audio(n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 8000).astype(np.int16)
    return _FAUD + struct.pack("<I", n_samples) + samples.tobytes()


try:                                              # pragma: no cover - env
    import av as _av

    HAVE_PYAV = True
except ImportError:                               # the shipped container
    _av = None
    HAVE_PYAV = False

try:                                              # pragma: no cover - env
    import soundfile as _sf

    HAVE_SOUNDFILE = True
except ImportError:
    _sf = None
    HAVE_SOUNDFILE = False


def _decode_video(blob) -> np.ndarray:
    """-> frames (n, h, w) uint8. Fake (FVID) payloads always take the
    deterministic branch; real containers decode via pyav when installed,
    else raise NotImplementedError (no video libs in this container)."""
    if bytes(blob[:4]) == _FVID:
        n, w, h = struct.unpack("<IHH", bytes(blob[4:12]))
        return np.frombuffer(blob, dtype=np.uint8, count=n * h * w,
                             offset=12).reshape(n, h, w)
    if HAVE_PYAV:
        import io

        frames = []
        with _av.open(io.BytesIO(bytes(blob))) as container:
            for frame in container.decode(video=0):
                frames.append(frame.to_ndarray(format="gray"))
        if not frames:
            return np.zeros((0, 0, 0), np.uint8)
        return np.stack(frames)
    raise NotImplementedError("real video decoding requires pyav/cv2")


def _decode_audio(blob) -> np.ndarray:
    """-> mono int16 samples. Fake (FAUD) payloads always take the
    deterministic branch; real files decode via soundfile when installed."""
    if bytes(blob[:4]) == _FAUD:
        (n,) = struct.unpack("<I", bytes(blob[4:8]))
        return np.frombuffer(blob, dtype=np.int16, count=n, offset=8)
    if HAVE_SOUNDFILE:
        import io

        data, _rate = _sf.read(io.BytesIO(bytes(blob)), dtype="int16",
                               always_2d=True)
        return np.ascontiguousarray(data.mean(axis=1)).astype(np.int16)
    raise NotImplementedError("real audio decoding requires soundfile")


class ImageQualityStage:
    """(image_id, bytes) → per-image quality metrics for curation filters:
    mean/std intensity (contrast proxy), mean gradient magnitude (sharpness
    / blur proxy — blurry images have weak gradients), and the fraction of
    saturated pixels (≤2 or ≥253). Undecodable payloads emit nulls with
    ``ok=False`` instead of failing the task (lineage-safe). Actor-pool
    stage: pass the CLASS to ``map_batches(..., concurrency=N)``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = _binary_views(batch["bytes"])
        mean_l, std_l, grad_l, sat_l, ok_l = [], [], [], [], []
        for blob in blobs:
            if blob is None:
                mean_l.append(None); std_l.append(None)
                grad_l.append(None); sat_l.append(None); ok_l.append(False)
                continue
            try:
                px, _fmt, _w, _h = codec.decode(blob)
            except codec.CodecError:
                mean_l.append(None); std_l.append(None)
                grad_l.append(None); sat_l.append(None); ok_l.append(False)
                continue
            f = px.astype(np.float64)
            gy = np.abs(np.diff(f, axis=0))
            gx = np.abs(np.diff(f, axis=1))
            n_grad = gy.size + gx.size
            grad = ((gy.sum() + gx.sum()) / n_grad) if n_grad else 0.0
            mean_l.append(float(f.mean()))
            std_l.append(float(f.std()))
            grad_l.append(float(grad))
            sat_l.append(float(((px <= 2) | (px >= 253)).mean()))
            ok_l.append(True)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "mean_intensity": pa.array(mean_l, pa.float64()),
            "std_intensity": pa.array(std_l, pa.float64()),
            "sharpness": pa.array(grad_l, pa.float64()),
            "saturated_frac": pa.array(sat_l, pa.float64()),
            "ok": pa.array(ok_l, pa.bool_()),
        })


class VideoFrameSampleStage:
    """(video_id, bytes) -> one row per sampled frame:
    (video_id, frame_index, frame: binary (encoded png via the image codec)).
    Deterministic uniform sampling of ``n_sample`` frames."""

    def __init__(self, n_sample: int = 4):
        self.n_sample = n_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_pylist()
        blobs = _binary_views(batch["bytes"])
        out_id, out_idx, out_frame = [], [], []
        for vid, blob in zip(ids, blobs):
            if blob is None:
                continue
            frames = _decode_video(blob)
            n = len(frames)
            if n == 0:
                continue  # decodable but frameless: nothing to sample
            picks = np.unique((np.arange(self.n_sample) * n)
                              // max(self.n_sample, 1))[: self.n_sample]
            for j in picks:
                out_id.append(vid)
                out_idx.append(int(j))
                out_frame.append(codec.encode(frames[j], "png"))
        return pa.table({
            "video_id": pa.array(out_id, pa.string()),
            "frame_index": pa.array(out_idx, pa.int32()),
            "frame": pa.array(out_frame, pa.binary()),
        })


class AudioFeatureStage:
    """(audio_id, bytes) -> (audio_id, n_samples, rms, zero_crossings,
    band_energy: list<double>[8]) — cheap spectral-ish features, vectorized."""

    BANDS = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        blobs = _binary_views(batch["bytes"])
        ns, rms, zc, bands = [], [], [], []
        for blob in blobs:
            if blob is None:
                ns.append(0); rms.append(0.0); zc.append(0)
                bands.append([0.0] * self.BANDS)
                continue
            s = _decode_audio(blob).astype(np.float64)
            ns.append(len(s))
            rms.append(float(np.sqrt(np.mean(s * s))) if len(s) else 0.0)
            zc.append(int(np.count_nonzero(np.diff(np.signbit(s)))))
            if len(s) >= 2 * self.BANDS:
                spec = np.abs(np.fft.rfft(s))
                chunks = np.array_split(spec, self.BANDS)
                bands.append([float(np.mean(c * c)) for c in chunks])
            else:
                bands.append([0.0] * self.BANDS)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "rms": pa.array(rms, pa.float64()),
            "zero_crossings": pa.array(zc, pa.int64()),
            "band_energy": pa.array(bands, pa.list_(pa.float64())),
        })


class ImageEmbedStage:
    """(image_id, bytes) → a deterministic 24-dim feature embedding: the
    16-bin intensity histogram ++ an 8-bin gradient-magnitude histogram,
    L2-normalized — a REAL (if simple) visual descriptor, not a stub: it
    is resolution-robust (distributions, not pixels) and feeds the same
    embedding near-dup / ANN machinery a CLIP-style embedder would (swap
    the model in at this stage's seam, exactly like imagecodec's PIL
    seam). Undecodable payloads emit null embeddings (lineage-safe).
    Actor-pool stage: pass the CLASS to map_batches(concurrency=N) when a
    real model needs loading; the histogram version is stateless."""

    DIM = 24

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = _binary_views(batch["bytes"])
        out = []
        for blob in blobs:
            if blob is None:
                out.append(None)
                continue
            try:
                px, _fmt, _w, _h = codec.decode(blob)
            except codec.CodecError:
                out.append(None)
                continue
            ih = codec.intensity_histogram(px, bins=16).astype(np.float64)
            ih /= max(px.size, 1)
            g = np.abs(np.diff(px.astype(np.float64), axis=1))
            gh = (np.bincount(np.minimum(g.astype(np.int64) >> 5, 7)
                              .ravel(), minlength=8).astype(np.float64)
                  / max(g.size, 1)) if g.size else np.zeros(8)
            v = np.concatenate([ih, gh])
            n = np.linalg.norm(v)
            out.append((v / n if n > 0 else v).astype(np.float32).tolist())
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "embedding": pa.array(out, pa.list_(pa.float32())),
        })


# SDXL-style aspect-ratio ladder around a 1024x1024 training area: each
# (w, h) keeps w*h close to 2^20 while stepping the ratio from 1:4 to 4:1.
DEFAULT_AR_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 2048), (576, 1728), (640, 1536), (704, 1408), (768, 1344),
    (832, 1216), (896, 1152), (960, 1088), (1024, 1024), (1088, 960),
    (1152, 896), (1216, 832), (1344, 768), (1408, 704), (1536, 640),
    (1728, 576), (2048, 512),
)


def ar_bucket_assign(ds, *, w_col: str = "w", h_col: str = "h",
                     id_col: str = "image_id", buckets=None):
    """Aspect-ratio bucketing (the SDXL / NovelAI training-prep step):
    assign every image to the ladder bucket whose aspect ratio is nearest
    its own in log space, so a training job can batch same-bucket images
    and resize without letterboxing. Map-only and fully vectorized — the
    |ladder|-column distance matrix is tiny; no shuffle, no state. Rows
    with a null or non-positive dimension are dropped (they fail the
    dims rule upstream; bucketing them is meaningless). Ties in log-ratio
    distance resolve to the FIRST ladder entry (deterministic).

    Emits (id, w, h, bucket_w, bucket_h, bucket_id) — the per-image
    assignment a downstream grouped-batching stage keys on; a bucket
    histogram is one tiny groupby away."""
    ladder = list(buckets) if buckets is not None else list(DEFAULT_AR_BUCKETS)
    bw = np.array([b[0] for b in ladder], np.int64)
    bh = np.array([b[1] for b in ladder], np.int64)
    bar = np.log(bw.astype(np.float64) / bh.astype(np.float64))

    def assign(b: pa.Table) -> pa.Table:
        w = b[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = b[h_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(w) & np.isfinite(h) & (w > 0) & (h > 0)
        t = b.filter(pa.array(ok))
        ar = np.log(w[ok] / h[ok])
        idx = np.abs(ar[:, None] - bar[None, :]).argmin(axis=1)
        return pa.table({
            id_col: t[id_col],
            w_col: pc.cast(t[w_col], pa.int64()),
            h_col: pc.cast(t[h_col], pa.int64()),
            "bucket_w": pa.array(bw[idx]),
            "bucket_h": pa.array(bh[idx]),
            "bucket_id": pa.array(idx.astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def byte_exact_dedup(ds, *, bytes_col: str = "bytes",
                     id_col: str = "image_id",
                     driver_merge_max: int = 5_000_000):
    """EXACT binary-payload dedup: one survivor (min id) per distinct byte
    string — the first, cheapest rung of the image dedup ladder (below
    phash near-dup and embedding semdedup): identical re-crawled bytes
    never reach the decoder twice.

    Per-batch: blake2b-128 digest of each payload (per-byte hashing work
    dominates; the row loop is not the cost), then the batch reduces to
    one (digest, id) winner per local digest before anything shuffles —
    ``keep_best_rows`` semantics, exchange bounded by distinct digests per
    batch. Null payloads are dropped. Collision risk at 128 bits is
    ~2^-64 at 10^12 rows — below hardware error rates."""
    import hashlib

    from .dedup import keep_best_rows

    def digest(b: pa.Table) -> pa.Table:
        blobs = _binary_views(b[bytes_col])
        ids = b[id_col]
        dg = np.fromiter(
            (hashlib.blake2b(v, digest_size=16).digest() if v is not None
             else b"" for v in blobs),
            dtype=object, count=len(blobs))
        keep = pa.array([v is not None for v in blobs])
        return pa.table({"_digest": pa.array(list(dg), pa.binary()),
                         id_col: ids}).filter(keep)

    digests = ds.map_batches(digest, batch_format="pyarrow")
    winners = keep_best_rows(digests, "_digest", [(id_col, False)],
                             driver_merge_max=driver_merge_max)
    return winners.select_columns([id_col])
