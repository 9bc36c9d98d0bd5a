"""Invariant: the fused two-scan flagship and the original one-leg-per-check
composition produce the same violation multiset (modulo `column` naming of the
referential leg, which both emit identically)."""

import pandas as pd
import pytest

from schema_validator_ray.pipelines.validate_images import (
    validate_images,
    validate_images_multiscan,
)
from schema_validator_ray.sources.synth import (
    write_captions_side_table,
    write_images_dataset,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ab")
    write_images_dataset(str(d / "images"), 2000, seed=13, shards=3)
    write_captions_side_table(str(d / "captions.parquet"), str(d / "images"))
    return d


def _norm(ds):
    df = ds.to_pandas()[["image_id", "rule_id", "column"]]
    return df.sort_values(["image_id", "rule_id", "column"]).reset_index(drop=True)


def test_fused_equals_multiscan(data_dir, ray_session):
    fused = validate_images(str(data_dir / "images"),
                            captions_path=str(data_dir / "captions.parquet"),
                            decode=True)
    multi = validate_images_multiscan(
        str(data_dir / "images"),
        captions_path=str(data_dir / "captions.parquet"), decode=True)
    a, b = _norm(fused["violations"]), _norm(multi["violations"])
    pd.testing.assert_frame_equal(a, b)

    # profiles agree on the exact fields
    pa_, pb = fused["profile"], multi["profile"]
    for col in ("w", "h"):
        assert pa_[col].count == pb[col].count
        assert pa_[col].vmin == pb[col].vmin
        assert pa_[col].vmax == pb[col].vmax
        assert pa_[col].vsum == pb[col].vsum
