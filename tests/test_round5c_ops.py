"""Round-5 batch-3 operators: functional-dependency violations, Benford
first-digit census, DAU/WAU stickiness, inter-event gap quantiles,
label-confusion centroid pairs, min-max normalization."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _fd_df():
    # source s0 maps to ONE lang; s1 spans two; s2 spans three; plus nulls
    return pd.DataFrame({
        "source": ["s0", "s0", "s1", "s1", "s1", "s2", "s2", "s2",
                   None, "s3"],
        "lang": ["en", "en", "en", "fr", "fr", "en", "fr", "de",
                 "en", None],
    })


def test_fd_violations_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import fd_violations

    out = fd_violations(
        rd.from_pandas(_fd_df()).repartition(3), "source", "lang"
    ).to_pandas().set_index("source")
    assert sorted(out.index) == ["s1", "s2"]
    assert out.loc["s1", "n_values"] == 2 and out.loc["s1", "n_rows"] == 3
    assert out.loc["s2", "n_values"] == 3 and out.loc["s2", "n_rows"] == 3


def test_fd_violations_distributed_path_matches(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import fd_violations

    ds = rd.from_pandas(_fd_df()).repartition(3)
    a = (fd_violations(ds, "source", "lang")
         .to_pandas().sort_values("source").reset_index(drop=True))
    b = (fd_violations(ds, "source", "lang", driver_merge_max=0)
         .to_pandas().sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_fd_violations_holds_clean(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.uniqueness import fd_violations

    df = pd.DataFrame({"k": ["a", "a", "b"], "v": ["x", "x", "y"]})
    out = fd_violations(rd.from_pandas(df), "k", "v").to_pandas()
    assert len(out) == 0


def test_benford_first_digit_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.stats import benford_first_digit

    df = pd.DataFrame({"p": [1.23, 12.3, 0.91, 950.0, None, -5.0, 0.0]})
    out = (benford_first_digit(rd.from_pandas(df).repartition(2), "p")
           .to_pandas().set_index("digit"))
    # 1.23->123, 12.3->1230 lead with 1; 0.91->91, 950->95000 lead with 9;
    # null / negative / zero are excluded
    assert sorted(out.index) == [1, 9]
    assert out.loc[1, "n"] == 2 and out.loc[9, "n"] == 2
    assert out.loc[1, "pct"] == 0.5
    assert abs(out.loc[1, "expected"] - np.log10(2)) < 1e-6
    assert abs(out.loc[9, "expected"] - np.log10(10 / 9)) < 1e-6


def test_dau_wau_stickiness_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.funnel import dau_wau_stickiness

    day = 86_400
    # week 0: user 1 active on days 0,1 (twice on day 0); user 2 on day 2.
    # week 1: user 1 active on day 7 only.
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 1],
        "ts": pd.to_datetime(
            [10, 20, day + 5, 2 * day + 3, 7 * day + 1], unit="s"),
    })
    out = (dau_wau_stickiness(rd.from_pandas(df).repartition(3),
                              user_col="user_id", ts_col="ts")
           .to_pandas().set_index("week"))
    assert sorted(out.index) == [0, 1]
    assert out.loc[0, "wau"] == 2 and out.loc[0, "day_actives"] == 3
    assert out.loc[1, "wau"] == 1 and out.loc[1, "day_actives"] == 1
    assert abs(out.loc[0, "stickiness"] - round(3 / 7 / 2, 6)) < 1e-9


def test_grouped_gap_quantiles_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import grouped_gap_quantiles

    # user 1 type a at 0,10,30 -> gaps 10,20; user 2 type a at 100,105
    # -> gap 5; user 1 type b at 0,1 -> gap 1. Cross-user/type never mixes.
    df = pd.DataFrame({
        "event_id": np.arange(9, dtype=np.int64),
        "user_id": [1, 1, 1, 2, 2, 1, 1, 3, 3],
        "event_type": ["a", "a", "a", "a", "a", "b", "b", "c", "c"],
        "ts": pd.to_datetime([0, 10, 30, 100, 105, 0, 1, 7, 7],
                             unit="s"),
    })
    out = (grouped_gap_quantiles(
        rd.from_pandas(df).repartition(3), user_col="user_id",
        type_col="event_type", ts_col="ts", tiebreak="event_id",
        qs=[0.5], out_cols=["med"]).to_pandas().set_index("event_type"))
    # type a gaps {10s,20s,5s} -> disc median 10s; b {1s}; c {0s} (ts tie)
    assert out.loc["a", "med"] == 10_000_000
    assert out.loc["b", "med"] == 1_000_000
    assert out.loc["c", "med"] == 0


def test_label_confusion_pairs_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.similarity import label_confusion_pairs

    # label 0 centroid -> x axis, label 1 -> y axis (orthogonal),
    # label 2 -> exactly the 45-degree diagonal
    df = pd.DataFrame({
        "embedding": [[1.0, 0.0], [3.0, 0.0], [0.0, 2.0], [0.0, 4.0],
                      [2.0, 2.0]],
        "label": np.array([0, 0, 1, 1, 2], dtype=np.int32),
    })
    out = (label_confusion_pairs(rd.from_pandas(df).repartition(2),
                                 emb_col="embedding", label_col="label")
           .to_pandas().set_index(["label_a", "label_b"]))
    assert len(out) == 3
    assert out.loc[(0, 1), "cosine"] == 0.0
    assert abs(out.loc[(0, 2), "cosine"] - round(1 / np.sqrt(2), 6)) < 1e-9
    assert abs(out.loc[(1, 2), "cosine"] - round(1 / np.sqrt(2), 6)) < 1e-9


def test_monthly_verdict_trend_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.engine import validate

    df = pd.DataFrame({
        "k": np.arange(4, dtype=np.int64),
        "v": [5.0, -1.0, 3.0, 4.0],
        "month": ["2024-01", "2024-01", "2024-02", "2024-02"],
    })
    verdicts = validate(rd.from_pandas(df).repartition(2), {"v": "gt=0"},
                        id_column="k",
                        partition_column="month")["verdicts"].to_pandas()
    got = verdicts.set_index("partition")
    assert got.loc["2024-01", "rows"] == 2
    assert got.loc["2024-01", "failed_rows"] == 1
    assert got.loc["2024-02", "failed_rows"] == 0


def test_gopher_word_filter_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import gopher_word_filter

    good = "the cat sat on a mat and it was that good for " \
           "everyone in town today"                      # 16 words, 2+ stops
    short = "the cat sat"                                 # < min_words
    nostop = " ".join(["zwxq"] * 20)                      # no stopwords
    longwords = " ".join(["supercalifragilistic"] * 20) + " the a"  # mwl > 10
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [good, short, nostop, longwords],
    })
    out = (gopher_word_filter(rd.from_pandas(df).repartition(2), "text",
                              "doc_id").to_pandas().set_index("doc_id"))
    assert list(out.index) == [0]
    assert out.loc[0, "n_words"] == 16
    assert out.loc[0, "n_stop"] >= 2


def test_group_minmax_scale_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import group_minmax_scale

    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "event_type": ["a", "a", "a", "b", "b", "a"],
        "value": [0.0, 5.0, 10.0, 7.0, 7.0, None],
    })
    out = (group_minmax_scale(
        rd.from_pandas(df).repartition(3), value_col="value",
        group_col="event_type",
        keep_cols=["event_id", "value"]).to_pandas()
        .set_index("event_id"))
    assert out.loc[0, "scaled"] == 0.0
    assert out.loc[1, "scaled"] == 0.5
    assert out.loc[2, "scaled"] == 1.0
    # constant group scales to 0.0; null value stays null
    assert out.loc[3, "scaled"] == 0.0 and out.loc[4, "scaled"] == 0.0
    assert pd.isna(out.loc[5, "scaled"])


def test_keyed_gaps_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.analytics import keyed_gaps

    day = 86_400
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([0, 3 * day, 10 * day, 5 * day,
                              5 * day + 3600, 0], unit="s"),
        "tie": np.arange(6, dtype=np.int64),
    })
    out = (keyed_gaps(rd.from_pandas(df).repartition(3), key="k",
                      ts_col="ts", tiebreak="tie", out_col="gap_days",
                      unit_us=86_400_000_000)
           .to_pandas().sort_values(["k", "gap_days"]))
    # key 1: gaps 3 and 7 days; key 2: one sub-day gap -> floor 0 days;
    # key 3 has a single record, no gap
    assert out["k"].tolist() == [1, 1, 2]
    assert out["gap_days"].tolist() == [3, 7, 0]


def test_ltv_deciles_query_shape(ray_session, tmp_path):
    import ray.data as rd

    import __ray_entry__ as entrymod

    # 12 customers, one order each, spends 1..12 dollars: NTILE(10) puts
    # 2 rows in each of the first two tiles, 1 in the rest
    df = pd.DataFrame({
        "o_custkey": np.arange(12, dtype=np.int64),
        "o_totalprice": (np.arange(12) + 1).astype(np.float64),
    })
    df.to_parquet(tmp_path / "orders.parquet")
    out = (entrymod.q_customer_ltv_deciles(str(tmp_path))
           .to_pandas().sort_values("o_custkey"))
    assert out["spend_cents"].tolist() == [(i + 1) * 100 for i in range(12)]
    assert out["decile"].tolist() == [1, 1, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10]
