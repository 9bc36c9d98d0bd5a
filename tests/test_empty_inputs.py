"""Empty-input behavior of the round-3 operators: every stage must return an
empty, correctly-typed result (or a documented error) — never crash — when
the input has zero rows. Empty partitions are routine at scale; the
grouped_exact_quantile probe crash came from exactly this class."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _empty_events():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64())}))


def _empty_embeddings(dim=8):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "label": pa.array([], pa.int32()),
        "embedding": pa.array([], pa.list_(pa.float32(), dim))}))


def test_funnel_empty(ray_session):
    from schema_validator_ray.stages.funnel import funnel

    out = funnel(_empty_events(), user_col="user_id", ts_col="ts",
                 type_col="event_type", steps=["view", "click"],
                 window_us=1_000_000).to_pandas()
    assert len(out) == 0


def test_cohort_retention_empty(ray_session):
    from schema_validator_ray.stages.funnel import cohort_retention

    out = cohort_retention(_empty_events(), user_col="user_id",
                           ts_col="ts").to_pandas()
    assert len(out) == 0


def test_chi2_empty(ray_session):
    from schema_validator_ray.stages.stats import chi2_independence

    res = chi2_independence(_empty_events(), "event_type", "user_id")
    assert [f.name for f in res.schema().base_schema] == ["chi2", "dof", "n"]
    # (Dataset.to_pandas() drops columns for any zero-row dataset — a Ray
    # quirk; the dataset-level schema above is the real contract)
    assert len(res.to_pandas()) == 0


def test_linreg_empty(ray_session):
    from schema_validator_ray.stages.stats import grouped_linreg

    out = grouped_linreg(_empty_events(), "event_type", "value",
                         "value").to_pandas()
    assert len(out) == 0


def test_welch_empty(ray_session):
    from schema_validator_ray.stages.stats import welch_ttest

    out = welch_ttest(_empty_events(), "event_type", "value",
                      "click", "purchase").to_pandas()
    assert len(out) == 1
    assert np.isnan(out["t"].iloc[0]) and out["n_a"].iloc[0] == 0


def test_mad_outliers_empty(ray_session):
    from schema_validator_ray.stages.analytics import mad_outliers

    out = mad_outliers(_empty_events(), value_col="value",
                       group_col="event_type").to_pandas()
    assert len(out) == 0


def test_set_op_same_source_empty(ray_session):
    import pyarrow.compute as pc

    from schema_validator_ray.stages.setops import set_op_same_source

    out = set_op_same_source(
        _empty_events(), ["user_id"],
        lambda b: pc.equal(b["event_type"], "click"),
        lambda b: pc.equal(b["event_type"], "purchase"),
        "except").to_pandas()
    assert len(out) == 0


def test_budget_mix_empty(ray_session):
    from schema_validator_ray.stages.sampling import budget_mix

    out = budget_mix(_empty_events(), id_col="event_id",
                     group_col="event_type", weight_col="value",
                     default_budget=100).to_pandas()
    assert len(out) == 0


def test_mean_pairwise_cosine_empty(ray_session):
    from schema_validator_ray.stages.similarity import (
        grouped_mean_pairwise_cosine)

    res = grouped_mean_pairwise_cosine(
        _empty_embeddings(), emb_col="embedding", group_col="label")
    sch = res.schema()
    assert sch.names == ["label", "n", "mean_cos"]
    assert str(dict(zip(sch.names, sch.types))["label"]) == "int32"
    assert len(res.to_pandas()) == 0


def test_knn_self_join_empty(ray_session):
    from schema_validator_ray.stages.similarity import knn_self_join

    out = knn_self_join(_empty_embeddings(), k=3).to_pandas()
    assert len(out) == 0


def test_global_rank_empty(ray_session):
    from schema_validator_ray.stages.analytics import global_rank

    out = global_rank(_empty_events().select_columns(
        ["event_id", "value"]), order_col="value").to_pandas()
    assert len(out) == 0


def test_round4_ops_empty_inputs(ray_session):
    """Round-4 operators on zero-row inputs: no crashes, empty outputs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.cooccur import cooccurrence_pairs
    from schema_validator_ray.stages.fuzzy import (edit_distance_join,
                                                   edit_distance_pairs)
    from schema_validator_ray.stages.funnel import followed_by
    from schema_validator_ray.stages.stats import (grouped_exact_quantiles,
                                                   winsorize_by_group)

    ek = rd.from_pandas(pd.DataFrame({
        "k": pd.Series([], dtype="object"),
        "v": pd.Series([], dtype="float64")}))
    assert grouped_exact_quantiles(ek, "k", "v", [0.5]).count() == 0
    assert winsorize_by_group(ek, "k", "v", keep_cols=["k"]).count() == 0

    ee = rd.from_pandas(pd.DataFrame({
        "u": pd.Series([], dtype="int64"),
        "it": pd.Series([], dtype="int64")}))
    assert cooccurrence_pairs(ee, "u", "it").count() == 0

    es = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="object")}))
    assert edit_distance_pairs(es, "x", max_dist=2).count() == 0
    assert edit_distance_join(es, es, "x", "x").count() == 0

    ev = rd.from_pandas(pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[ns]"),
        "event_type": pd.Series([], dtype="object")}))
    assert followed_by(ev, user_col="user_id", ts_col="ts",
                       type_col="event_type", id_col="event_id",
                       first="a", then="b", window_us=1000).count() == 0
