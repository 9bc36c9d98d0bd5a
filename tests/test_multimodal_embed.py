"""Image → embedding → near-dup chain: descriptor determinism,
resolution robustness of clone pairs, undecodable-null handling."""

import numpy as np
import pyarrow as pa

from schema_validator_ray.functions import imagecodec as codec


def _encode(px):
    return codec.encode(px, "png")


def test_embed_deterministic_and_normalized(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.multimodal import ImageEmbedStage

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(40, 50)).astype(np.uint8)
    t = pa.table({"image_id": pa.array(["a", "b"]),
                  "bytes": pa.array([_encode(px), b"garbage"],
                                    pa.binary())})
    def collect(ds):
        bt = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        return dict(zip(bt["image_id"].to_pylist(),
                        bt["embedding"].to_pylist()))

    out = collect(rd.from_arrow(t)
                  .map_batches(ImageEmbedStage(), batch_format="pyarrow"))
    v = np.asarray(out["a"], np.float64)
    assert len(v) == ImageEmbedStage.DIM
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    assert out["b"] is None
    # deterministic across calls
    out2 = collect(rd.from_arrow(t)
                   .map_batches(ImageEmbedStage(), batch_format="pyarrow"))
    assert np.allclose(out2["a"], v)


def test_embed_neardup_finds_clone_and_crop(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.dedup import embedding_near_dup_pairs
    from schema_validator_ray.stages.multimodal import ImageEmbedStage

    rng = np.random.default_rng(6)
    base = rng.integers(0, 256, size=(60, 60)).astype(np.uint8)
    crop = base[1:-1, 1:-1]  # near-identical distributions
    rows = [("orig", _encode(base)), ("clone", _encode(base.copy())),
            ("crop", _encode(crop))]
    for i in range(30):  # unrelated noise images
        rows.append((f"n{i:02d}", _encode(
            rng.integers(0, 256, size=(30 + i, 40)).astype(np.uint8))))
    t = pa.table({"image_id": pa.array([r[0] for r in rows]),
                  "bytes": pa.array([r[1] for r in rows], pa.binary())})
    emb = (rd.from_arrow(t).repartition(3)
           .map_batches(ImageEmbedStage(), batch_format="pyarrow"))
    pairs = embedding_near_dup_pairs(emb, "embedding", "image_id",
                                     ImageEmbedStage.DIM,
                                     threshold=0.999, n_planes=8)
    got = {tuple(sorted((a, b)))
           for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())}
    # byte-identical payloads embed identically (cosine 1)
    assert ("clone", "orig") in got
    # a 1-px border crop shifts ~6% of histogram mass: near, not equal —
    # it appears at a looser threshold
    loose = embedding_near_dup_pairs(emb, "embedding", "image_id",
                                     ImageEmbedStage.DIM,
                                     threshold=0.99, n_planes=6)
    lgot = {tuple(sorted((a, b)))
            for a, b in zip(loose["a"].to_pylist(),
                            loose["b"].to_pylist())}
    assert ("crop", "orig") in lgot


def test_embed_knn_string_ids(ray_session):
    """knn_self_join with STRING ids (generalized from int64): the clone
    must be the top neighbor of the original at cosine 1."""
    import ray.data as rd

    from schema_validator_ray.stages.multimodal import ImageEmbedStage
    from schema_validator_ray.stages.similarity import knn_self_join

    rng = np.random.default_rng(8)
    base = rng.integers(0, 256, size=(50, 50)).astype(np.uint8)
    rows = [("orig", _encode(base)), ("clone", _encode(base.copy()))]
    for i in range(20):
        rows.append((f"n{i:02d}", _encode(
            rng.integers(0, 256, size=(20 + i, 30)).astype(np.uint8))))
    t = pa.table({"image_id": pa.array([r[0] for r in rows]),
                  "bytes": pa.array([r[1] for r in rows], pa.binary())})
    emb = (rd.from_arrow(t).repartition(3)
           .map_batches(ImageEmbedStage(), batch_format="pyarrow"))
    out = knn_self_join(emb, emb_col="embedding", id_col="image_id",
                        k=1).to_pandas()
    top = out.set_index("vec_id")
    assert top.loc["orig", "neighbor_id"] == "clone"
    assert top.loc["clone", "neighbor_id"] == "orig"
    assert abs(top.loc["orig", "cosine"] - 1.0) < 1e-9
