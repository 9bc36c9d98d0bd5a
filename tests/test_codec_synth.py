"""Codec invariants (input_hint): round-trip decode, PSNR >= 40 dB for lossy
formats, loud failure on truncation; synth determinism."""

import numpy as np
import pytest

from schema_validator_ray.functions import imagecodec as codec
from schema_validator_ray.sources.synth import synth_batch


def _pixels(seed=0, h=32, w=48):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


def test_png_lossless_roundtrip():
    px = _pixels()
    out, fmt, w, h = codec.decode(codec.encode(px, "png"))
    assert fmt == "png" and (w, h) == (48, 32)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_above_40(fmt):
    px = _pixels(1)
    out, _, _, _ = codec.decode(codec.encode(px, fmt))
    assert codec.psnr(px, out) >= 40.0


def test_truncated_payload_fails():
    b = codec.encode(_pixels(2), "png")
    with pytest.raises(codec.CodecError):
        codec.decode(b[: len(b) // 2])
    with pytest.raises(codec.CodecError):
        codec.decode(b"garbage")


def test_phash_stable_and_sensitive():
    px = _pixels(3)
    assert codec.phash64(px) == codec.phash64(px.copy())
    other = _pixels(4)
    assert codec.phash64(px) != codec.phash64(other)


def test_synth_deterministic_and_shard_independent():
    a = synth_batch(100, 50, seed=42)
    b = synth_batch(100, 50, seed=42)
    assert a.equals(b)
    # rows [120,130) generated alone match the same rows from a wider batch
    sub = synth_batch(120, 10, seed=42)
    assert sub.equals(a.slice(20, 10))


def test_synth_clean_passes_all_row_rules():
    from schema_validator_ray import compile_ruleset
    from schema_validator_ray.pipelines.validate_images import IMAGE_SPEC

    tbl = synth_batch(0, 200, seed=7, clean=True)
    cs = compile_ruleset(IMAGE_SPEC, tbl.schema)
    pm, vio = cs.evaluate(tbl, id_column="image_id")
    assert pm.all(), vio.to_pylist()[:5]
