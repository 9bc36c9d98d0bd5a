"""Real-codec seam tests — SKIPPED in this container (PIL/pyav/soundfile are
not installed) but live so the day the environment has codecs the engine is
already wired and verified. The stand-in (FIMG/FVID/FAUD) branches are
byte-identical regardless of which optional libs import — pinned here too.
"""

import numpy as np
import pytest

from schema_validator_ray.functions import imagecodec as codec


def test_standin_branch_unaffected_by_seam():
    """FIMG payloads must take the stand-in branch BEFORE any PIL dispatch
    — byte-identical round-trip whether or not PIL is installed."""
    px = np.arange(64 * 48, dtype=np.uint8).reshape(48, 64) % 251
    blob = codec.encode(px, "png")
    out, fmt, w, h = codec.decode(blob)
    assert (out == px).all() and (fmt, w, h) == ("png", 64, 48)
    with pytest.raises(codec.CodecError):
        codec.decode(b"\x89PNGnot-actually-a-png" if not codec.HAVE_PIL
                     else b"FIMGtruncated")


def test_pil_decode_real_png(ray_session):
    """Real PNG → decode() → exact pixel parity with the source array, and
    the ImageResizeStage runs end-to-end over real payloads."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    import pyarrow as pa

    from schema_validator_ray.stages.multimodal import ImageResizeStage

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    out, fmt, w, h = codec.decode(buf.getvalue())
    assert fmt == "png" and (w, h) == (56, 40)
    assert (out == px).all()                      # PNG is lossless

    batch = pa.table({"image_id": pa.array(["a"], pa.string()),
                      "bytes": pa.array([buf.getvalue()], pa.binary())})
    res = ImageResizeStage(max_w=16, max_h=16)(batch)
    assert res["resize_ok"].to_pylist() == [True]
    assert res["w"].to_pylist()[0] <= 16 and res["h"].to_pylist()[0] <= 16


def test_pil_decode_lossy_psnr():
    """Real JPEG decode must satisfy the north rule's PSNR >= 40 dB
    invariant against the source pixels at quality 95."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    # smooth image (noise is the worst case for JPEG and not representative)
    base = np.outer(np.linspace(0, 255, 64), np.ones(64))
    px = np.clip(base + rng.normal(0, 4, (64, 64)), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="JPEG", quality=95)
    out, fmt, _, _ = codec.decode(buf.getvalue())
    assert fmt == "jpeg"
    assert codec.psnr(px, out) >= 40.0


def test_pyav_video_frames():
    pytest.importorskip("av")
    import io

    import av

    from schema_validator_ray.stages.multimodal import _decode_video

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (6, 32, 32), dtype=np.uint8)
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=5)
        stream.width, stream.height, stream.pix_fmt = 32, 32, "yuv420p"
        for f in frames:
            vf = av.VideoFrame.from_ndarray(
                np.repeat(f[:, :, None], 3, axis=2), format="rgb24")
            for pkt in stream.encode(vf):
                out.mux(pkt)
        for pkt in stream.encode():
            out.mux(pkt)
    got = _decode_video(buf.getvalue())
    assert got.ndim == 3 and got.shape[1:] == (32, 32) and len(got) >= 1


def test_soundfile_audio_features():
    pytest.importorskip("soundfile")
    import io

    import soundfile as sf

    from schema_validator_ray.stages.multimodal import _decode_audio

    t = np.linspace(0, 1, 8000)
    wave = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
    buf = io.BytesIO()
    sf.write(buf, wave, 8000, format="WAV", subtype="PCM_16")
    got = _decode_audio(buf.getvalue())
    assert got.dtype == np.int16 and len(got) == 8000
    assert np.abs(got.astype(np.int64) - wave).max() <= 1
