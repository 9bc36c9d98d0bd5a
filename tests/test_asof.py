"""Distributed as-of join vs pandas merge_asof ground truth, including a hot
key, sparse right side (carry-ins spanning many buckets), and exact-ts ties."""

import numpy as np
import pandas as pd
import pytest


def _mk(n_left, seed):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value
    lts = pd.to_datetime(base + rng.integers(0, 30 * 24 * 3600 * 10 ** 9,
                                             n_left))
    keys = np.where(rng.random(n_left) < 0.8, 7, rng.integers(0, 5, n_left))
    left = pd.DataFrame({
        "ev_id": np.arange(n_left, dtype=np.int64),
        "k": keys.astype(np.int64), "ts": lts})
    # sparse right: few checkpoints, none for key 3, exact-ts tie for ev 0
    rights = []
    for k in [7, 0, 1, 2, 4]:
        m = 8 if k == 7 else 2
        rts = pd.to_datetime(base + rng.integers(
            0, 30 * 24 * 3600 * 10 ** 9, m))
        rights.append(pd.DataFrame({
            "k": np.full(m, k, np.int64), "ts": rts,
            "v": rng.random(m).round(3)}))
    right = pd.concat(rights, ignore_index=True)
    right = pd.concat([right, left.iloc[[0]].assign(v=0.5)[["k", "ts", "v"]]],
                      ignore_index=True)  # exact-ts match for ev 0
    right = right.groupby(["k", "ts"], as_index=False)["v"].max()
    return left, right


def test_asof_join_matches_merge_asof(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.asof import asof_join

    left, right = _mk(4000, seed=9)
    got = (asof_join(rd.from_pandas(left).repartition(6),
                     rd.from_pandas(right).repartition(3),
                     key="k", ts="ts", value_cols=["v"], bucket="12h")
           .to_pandas().sort_values("ev_id").reset_index(drop=True))

    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(
            columns={"ts": "ts_r", "v": "v_r"}),
        left_on="ts", right_on="ts_r", by="k",
        direction="backward", allow_exact_matches=True,
    ).sort_values("ev_id").reset_index(drop=True)

    assert len(got) == len(left)
    pd.testing.assert_series_equal(got["v_r"], want["v_r"], check_names=False)
    pd.testing.assert_series_equal(got["ts_r"], want["ts_r"],
                                   check_names=False, check_dtype=False)
    # exact-ts tie matched itself
    assert got.loc[got.ev_id == 0, "v_r"].iloc[0] == 0.5
    # key 3 has no checkpoints at all -> all null
    k3 = got[got.k == 3]
    assert k3["v_r"].isna().all() and len(k3) > 0


def test_interval_join_overlaps_left_and_span_guard(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.interval import interval_join

    base = pd.Timestamp("2024-05-01")
    left = pd.DataFrame({
        "ev": np.arange(6, dtype=np.int64),
        "k": np.array([1, 1, 1, 1, 2, 2], np.int64),
        "ts": pd.to_datetime([base + pd.Timedelta(h, "h")
                              for h in [1, 5, 30, 100, 2, 50]]),
    })
    iv = pd.DataFrame({
        "k": np.array([1, 1, 2], np.int64),
        "s": pd.to_datetime([base, base + pd.Timedelta("4h"), base]),
        "e": pd.to_datetime([base + pd.Timedelta("6h"),
                             base + pd.Timedelta("40h"),
                             base + pd.Timedelta("3h")]),
        "w": np.array([1.0, 2.0, 3.0]),
    })

    got = (interval_join(rd.from_pandas(left).repartition(3),
                         rd.from_pandas(iv), key="k", ts="ts",
                         start="s", end="e", payload_cols=["w"], bucket="2h")
           .to_pandas().sort_values(["ev", "w"]).reset_index(drop=True))
    # ev0 in iv0 only; ev1 overlaps iv0 AND iv1 (two rows); ev2 in iv1
    # (bucket-crossing interval); ev3 matches nothing; ev4 in iv2; ev5 nothing
    assert list(map(tuple, got[["ev", "w"]].itertuples(index=False))) == [
        (0, 1.0), (1, 1.0), (1, 2.0), (2, 2.0), (4, 3.0)]

    lft = (interval_join(rd.from_pandas(left), rd.from_pandas(iv),
                         key="k", ts="ts", start="s", end="e",
                         payload_cols=["w"], bucket="2h", how="left")
           .to_pandas())
    assert len(lft) == 7                              # 5 matches + 2 unmatched
    assert lft[lft.ev == 3]["w"].isna().all()

    with pytest.raises(Exception):        # span guard trips (sharded path)
        interval_join(rd.from_pandas(left), rd.from_pandas(iv),
                      key="k", ts="ts", start="s", end="e",
                      payload_cols=["w"], bucket="2h",
                      max_span_buckets=2).to_pandas()


def test_interval_join_duplicated_interval_rows(ray_session):
    """A genuinely duplicated interval row must emit one output row per
    duplicate (SQL BETWEEN-join multiplicity), not be coalesced."""
    import ray.data as rd

    from schema_validator_ray.stages.interval import interval_join

    base = pd.Timestamp("2024-05-01")
    left = pd.DataFrame({
        "ev": np.array([0, 1], np.int64),
        "k": np.array([1, 1], np.int64),
        "ts": pd.to_datetime([base + pd.Timedelta("1h"),
                              base + pd.Timedelta("9h")]),
    })
    iv = pd.DataFrame({                       # first interval appears TWICE
        "k": np.array([1, 1, 1], np.int64),
        "s": pd.to_datetime([base, base, base + pd.Timedelta("8h")]),
        "e": pd.to_datetime([base + pd.Timedelta("2h"),
                             base + pd.Timedelta("2h"),
                             base + pd.Timedelta("10h")]),
        "w": np.array([5.0, 5.0, 7.0]),
    })
    got = (interval_join(rd.from_pandas(left), rd.from_pandas(iv),
                         key="k", ts="ts", start="s", end="e",
                         payload_cols=["w"], bucket="2h")
           .to_pandas().sort_values(["ev", "w"]).reset_index(drop=True))
    naive = left.merge(iv, on="k")
    naive = naive[(naive.ts >= naive.s) & (naive.ts <= naive.e)]
    assert len(got) == len(naive) == 3        # ev0 matches the dup twice
    assert list(got[got.ev == 0]["w"]) == [5.0, 5.0]


def test_asof_join_property_random(ray_session):
    """Randomized parity vs pandas merge_asof across bucket sizes and shard
    counts (exercises carry-ins, empty shards, keys on only one side)."""
    import ray.data as rd

    from schema_validator_ray.stages.asof import asof_join

    rng = np.random.default_rng(123)
    base = pd.Timestamp("2023-11-05").value
    for trial, (bucket, shards, blk) in enumerate(
            [("3h", 8, 4), ("1D", 5, 2), ("30min", 32, 16)]):
        n_l, n_r = 600, 120
        left = pd.DataFrame({
            "i": np.arange(n_l, dtype=np.int64),
            "k": rng.integers(0, 12, n_l).astype(np.int64),
            "ts": pd.to_datetime(
                base + rng.integers(0, 12 * 24 * 3600 * 10 ** 9, n_l)),
        })
        right = pd.DataFrame({
            "k": rng.integers(4, 16, n_r).astype(np.int64),  # keys 12..15 unused
            "ts": pd.to_datetime(
                base + rng.integers(0, 12 * 24 * 3600 * 10 ** 9, n_r)),
            "v": rng.random(n_r).round(4),
        }).groupby(["k", "ts"], as_index=False)["v"].max()

        # broadcast_right_max=0 pins the sharded shuffle path; the default
        # takes the broadcast fast path — both must match pandas exactly
        got = (asof_join(rd.from_pandas(left).repartition(4),
                         rd.from_pandas(right).repartition(2),
                         key="k", ts="ts", value_cols=["v"], bucket=bucket,
                         n_shards=shards, blk_factor=blk,
                         broadcast_right_max=0)
               .to_pandas().sort_values("i").reset_index(drop=True))
        bc = (asof_join(rd.from_pandas(left).repartition(4),
                        rd.from_pandas(right).repartition(2),
                        key="k", ts="ts", value_cols=["v"], bucket=bucket)
              .to_pandas().sort_values("i").reset_index(drop=True))
        want = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable").rename(
                columns={"ts": "ts_r", "v": "v_r"}),
            left_on="ts", right_on="ts_r", by="k", direction="backward",
        ).sort_values("i").reset_index(drop=True)
        assert len(got) == n_l, (trial, len(got))
        pd.testing.assert_series_equal(got["v_r"], want["v_r"],
                                       check_names=False)
        pd.testing.assert_series_equal(bc["v_r"], want["v_r"],
                                       check_names=False)


def test_interval_join_property_random(ray_session):
    """Randomized parity vs a naive pandas range join."""
    import ray.data as rd

    from schema_validator_ray.stages.interval import interval_join

    rng = np.random.default_rng(77)
    base = pd.Timestamp("2023-11-05").value
    n_l, n_iv = 500, 60
    left = pd.DataFrame({
        "i": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, 8, n_l).astype(np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 6 * 24 * 3600 * 10 ** 9, n_l)),
    })
    s = base + rng.integers(0, 6 * 24 * 3600 * 10 ** 9, n_iv)
    dur = rng.integers(1, 18 * 3600 * 10 ** 9, n_iv)
    iv = pd.DataFrame({
        "k": rng.integers(0, 8, n_iv).astype(np.int64),
        "s": pd.to_datetime(s), "e": pd.to_datetime(s + dur),
        "w": np.arange(n_iv, dtype=np.float64),
    })
    naive = left.merge(iv, on="k")
    naive = naive[(naive.ts >= naive.s) & (naive.ts <= naive.e)]
    want = set(map(tuple, naive[["i", "w"]].itertuples(index=False)))
    # both the sharded shuffle path and the broadcast fast path must match
    for bcast_max in (0, 1_000_000):
        got = (interval_join(rd.from_pandas(left).repartition(4),
                             rd.from_pandas(iv), key="k", ts="ts", start="s",
                             end="e", payload_cols=["w"], bucket="4h",
                             n_shards=8, blk_factor=3,
                             broadcast_intervals_max=bcast_max)
               .to_pandas())
        assert set(map(tuple,
                       got[["i", "w"]].itertuples(index=False))) == want
        assert len(got) == len(naive)
