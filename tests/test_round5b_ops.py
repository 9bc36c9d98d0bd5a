"""Round-5 batch-2 operators: Markov transition matrix, conversion
latency, TPC-H Q3-shape shipping priority, Zipf slope, cosine label
margin, term burstiness."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events_df(seed=7, n=400, n_users=23):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 3_600_000, n), unit="ms", utc=False),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup"], n),
    })


def test_transition_counts_planted(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.funnel import transition_counts

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 2, 2, 3, 9],
        "ts": pd.to_datetime([10, 20, 30, 10, 15, 5, 1], unit="s"),
        "event_type": ["a", "b", "a", "a", "b", "a", "z"],
    })
    out = transition_counts(
        rd.from_pandas(df).repartition(3), user_col="user_id",
        ts_col="ts", type_col="event_type",
        tiebreak_col="event_id").to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    # user 1: a->b, b->a; user 2: a->b; users 3/9: single events
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_transition_counts_ts_tie_uses_tiebreak(ray_session):
    import ray.data as rd

    from schema_validator_ray.stages.funnel import transition_counts

    df = pd.DataFrame({
        "event_id": [2, 1],
        "user_id": [5, 5],
        "ts": pd.to_datetime([100, 100], unit="s"),
        "event_type": ["b", "a"],
    })
    out = transition_counts(
        rd.from_pandas(df), user_col="user_id", ts_col="ts",
        type_col="event_type", tiebreak_col="event_id").to_pandas()
    # event_id 1 ("a") precedes event_id 2 ("b") despite input order
    assert len(out) == 1
    assert (out.iloc[0]["prev_type"], out.iloc[0]["next_type"]) == ("a", "b")


def test_transition_counts_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from schema_validator_ray.stages.funnel import transition_counts

    df = _events_df()
    out = transition_counts(
        rd.from_pandas(df).repartition(5), user_col="user_id",
        ts_col="ts", type_col="event_type",
        tiebreak_col="event_id").to_pandas()
    got = out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute("""
        WITH seq AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events)
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE prev_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(
        got[["prev_type", "next_type", "n"]], exp, check_dtype=False)
