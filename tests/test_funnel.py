"""Windowed conversion funnel vs the DuckDB chain of correlated mins:
boundary inclusivity ((t_prev, t_prev+W]), missed steps (NULL tail), hot
users, and events before step 1 never counting."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from schema_validator_ray.stages.funnel import funnel

W = 1_000_000 * 60          # 60 s in µs


def _events():
    rows = []

    def ev(u, t_us, ty):
        rows.append((u, np.datetime64(t_us, "us"), ty))

    # u1 completes: view@0, click@30s, purchase@60s after click
    ev(1, 0, "view"); ev(1, 30_000_000, "click"); ev(1, 89_000_000, "purchase")
    # u2 clicks exactly at the window boundary (inclusive), never purchases
    ev(2, 0, "view"); ev(2, W, "click")
    # u3 clicks too late (boundary + 1µs)
    ev(3, 0, "view"); ev(3, W + 1, "click")
    # u4: click BEFORE the first view must not count; a later one does
    ev(4, 50_000_000, "view"); ev(4, 10_000_000, "click")
    ev(4, 70_000_000, "click")
    # u5: never views (absent from the funnel entirely)
    ev(5, 0, "click"); ev(5, 1_000_000, "purchase")
    # u6 (hot): 500 duplicate views/clicks — min semantics, one row out
    for i in range(500):
        ev(6, 1_000_000 + i, "view")
        ev(6, 2_000_000 + i, "click")
    # click at exactly t1 must NOT count (strict >)
    ev(7, 0, "view"); ev(7, 0, "click"); ev(7, 1, "click")
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["user_id"] = df["user_id"].astype(np.int64)
    return df


def test_funnel_matches_sql(ray_session):
    import ray.data as rd

    df = _events()
    got = (funnel(rd.from_pandas(df).repartition(7),
                  user_col="user_id", ts_col="ts", type_col="event_type",
                  steps=["view", "click", "purchase"], window_us=W)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1
                     FROM df WHERE event_type='view' GROUP BY 1),
             c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
                     FROM df e JOIN v USING (user_id)
                    WHERE e.event_type='click' AND epoch_us(e.ts) > v.t1
                      AND epoch_us(e.ts) <= v.t1 + {W} GROUP BY 1),
             p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
                     FROM df e JOIN c USING (user_id)
                    WHERE e.event_type='purchase' AND epoch_us(e.ts) > c.t2
                      AND epoch_us(e.ts) <= c.t2 + {W} GROUP BY 1)
        SELECT v.user_id, v.t1, c.t2, p.t3
          FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         ORDER BY user_id""").df()
    assert len(got) == len(exp) == 6          # u5 absent
    for col in ("t1", "t2", "t3"):
        a = got[col].astype("float64").to_numpy()   # NaN-safe compare
        b = exp[col].astype("float64").to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), col
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    # pinned edge semantics
    byu = got.set_index("user_id")
    assert byu.loc[2, "t2"] == W                  # boundary inclusive
    assert pd.isna(byu.loc[3, "t2"])              # boundary + 1 excluded
    assert byu.loc[4, "t2"] == 70_000_000         # pre-view click ignored
    assert byu.loc[7, "t2"] == 1                  # strict > t1
    assert pd.isna(byu.loc[6, "t3"])


def test_cohort_retention_vs_sql(ray_session):
    """Retention matrix == the SQL distinct-(user,week) formulation; a user
    active in weeks {0, 2} contributes to offsets 0 and 2 only; full first
    column (every user is in their own cohort at offset 0)."""
    import ray.data as rd

    from schema_validator_ray.stages.funnel import cohort_retention

    rng = np.random.default_rng(14)
    n = 6000
    base = 1_700_000_000_000_000                     # epoch µs anchor
    week = 604_800_000_000
    users = rng.integers(0, 300, n)
    weeks = rng.integers(0, 8, n) + (users % 3)      # staggered cohorts
    ts = base + weeks * week + rng.integers(0, week, n)
    df = pd.DataFrame({"user_id": users.astype(np.int64),
                       "ts": ts.astype("datetime64[us]")})
    got = (cohort_retention(rd.from_pandas(df).repartition(7),
                            user_col="user_id", ts_col="ts")
           .to_pandas().sort_values(["cohort", "offset"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH a AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 604800000000 AS w FROM df),
             f AS (SELECT user_id, min(w) AS w0 FROM a GROUP BY 1)
        SELECT f.w0 AS cohort, a.w - f.w0 AS "offset",
               CAST(count(*) AS BIGINT) AS n_users
          FROM a JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert got.values.tolist() == exp.values.tolist()
    # offset-0 cells account for every user exactly once
    assert got.loc[got["offset"] == 0, "n_users"].sum() == \
        df["user_id"].nunique()


def test_followed_by_matches_brute_force(ray_session):
    """Per-event A-then-B matching vs a pandas brute force, incl. the
    strictly-after semantics (a purchase at the same microsecond does NOT
    count) and the first-follower pick."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.funnel import followed_by

    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_type": rng.choice(["click", "purchase", "view"], n,
                                 p=[0.4, 0.2, 0.4]),
    })
    # plant an exact-tie pair: same-instant purchase must NOT match
    df.loc[0, ["user_id", "ts", "event_type"]] = [99, pd.Timestamp(0), "click"]
    df.loc[1, ["user_id", "ts", "event_type"]] = [99, pd.Timestamp(0),
                                                  "purchase"]
    w = 3600 * 1_000_000
    out = (followed_by(rd.from_pandas(df).repartition(7), user_col="user_id",
                       ts_col="ts", type_col="event_type",
                       id_col="event_id", first="click", then="purchase",
                       window_us=w)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    exp = []
    for _, c in df[df["event_type"] == "click"].iterrows():
        cu = us[c.name]
        p = df[(df["event_type"] == "purchase")
               & (df["user_id"] == c["user_id"])]
        nxt = us[p.index][(us[p.index] > cu) & (us[p.index] <= cu + w)]
        if len(nxt):
            exp.append((c["event_id"], c["user_id"], int(nxt.min())))
    exp = sorted(exp)
    got = list(map(tuple, out[["event_id", "user_id", "next_us"]]
                   .values.tolist()))
    assert got == exp and len(exp) > 20
    assert 0 not in out["event_id"].tolist()      # the planted tie
