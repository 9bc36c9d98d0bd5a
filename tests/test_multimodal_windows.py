"""Multimodal stages (resize real, video/audio stubbed decoders) + windowed
aggregates vs pandas/duckdb references."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from schema_validator_ray.functions import imagecodec as codec
from schema_validator_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    make_fake_audio,
    make_fake_video,
)


def test_image_resize_stage():
    rng = np.random.default_rng(0)
    rows = []
    for i in range(5):
        px = rng.integers(0, 256, (120, 200), dtype=np.uint8)
        rows.append((f"img{i}", codec.encode(px, "png")))
    rows.append(("bad", b"not an image"))
    batch = pa.table({"image_id": pa.array([r[0] for r in rows]),
                      "bytes": pa.array([r[1] for r in rows], pa.binary())})
    out = ImageResizeStage(max_w=64, max_h=64)(batch)
    d = out.to_pydict()
    assert d["resize_ok"] == [True] * 5 + [False]
    assert all(w <= 64 and h <= 64 for w, h in zip(d["w"][:5], d["h"][:5]))
    px2, fmt, w, h = codec.decode(d["bytes"][0])
    assert (h, w) == (d["h"][0], d["w"][0])
    # aspect preserved: 200x120 -> 64x38
    assert (d["w"][0], d["h"][0]) == (64, 38)


def test_video_frame_sampling():
    batch = pa.table({
        "video_id": pa.array(["v1", "v2"]),
        "bytes": pa.array([make_fake_video(10, 32, 24, seed=1),
                           make_fake_video(3, 16, 16, seed=2)], pa.binary()),
    })
    out = VideoFrameSampleStage(n_sample=4)(batch)
    d = out.to_pydict()
    assert d["video_id"].count("v1") == 4
    assert d["video_id"].count("v2") == 3  # only 3 frames exist
    px, fmt, w, h = codec.decode(d["frame"][0])
    assert (w, h) == (32, 24) and fmt == "png"


def test_video_real_payload_raises_not_implemented():
    from schema_validator_ray.stages.multimodal import _decode_video

    with pytest.raises(NotImplementedError):
        _decode_video(b"\x00\x00\x00\x20ftypmp42 pretend mp4")


def test_audio_features():
    batch = pa.table({
        "audio_id": pa.array(["a1", "a2"]),
        "bytes": pa.array([make_fake_audio(16000, seed=3),
                           make_fake_audio(100, seed=4)], pa.binary()),
    })
    out = AudioFeatureStage()(batch)
    d = out.to_pydict()
    assert d["n_samples"] == [16000, 100]
    assert d["rms"][0] > 1000
    assert len(d["band_energy"][0]) == 8


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 4000
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(np.sort(rng.integers(0, 86400 * 3, n)), unit="s"))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": ts.astype("datetime64[us]"),
        "value": rng.random(n).round(3),
    })
    return rd.from_pandas(df), df


def test_tumbling_window_vs_duckdb(events_ds, ray_session):
    from schema_validator_ray.stages.windows import tumbling_window

    ds, df = events_ds
    got = tumbling_window(ds, key="user_id", ts="ts", value="value",
                          every="hour").to_pandas()
    want = duckdb.sql("""
        SELECT user_id, date_trunc('hour', ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n, SUM(value) AS total FROM df
        GROUP BY 1, 2""").df()
    g = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["user_id", "n"]], w[["user_id", "n"]], check_dtype=False)
    assert np.allclose(g.total, w.total)


def test_sliding_count_vs_duckdb(events_ds, ray_session):
    from schema_validator_ray.stages.windows import sliding_count

    ds, df = events_ds
    got = (sliding_count(ds, key="user_id", ts="ts", window="1h")
           .to_pandas()[["event_id", "cnt_window"]]
           .sort_values("event_id").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT event_id, CAST(COUNT(*) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cnt_window
          FROM df ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_windows_vs_duckdb(events_ds, ray_session):
    from schema_validator_ray.stages.windows import session_windows

    ds, df = events_ds
    got = (session_windows(ds, key="user_id", ts="ts", gap="30min").to_pandas()
           .sort_values(["user_id", "session_start"]).reset_index(drop=True))
    want = duckdb.sql("""
        WITH s AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
            FROM df),
        g AS (SELECT user_id, ts,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM s)
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
          FROM g GROUP BY user_id, sid
          ORDER BY user_id, session_start""").df()
    pd.testing.assert_frame_equal(
        got[["user_id", "n_events"]], want[["user_id", "n_events"]],
        check_dtype=False)
    assert (got.session_start.to_numpy() == want.session_start.to_numpy()).all()


def test_cli_validate(ray_session, tmp_path):
    """Drive the CLI end-to-end (it owns no session here: ray_session active ->
    _init_ray no-ops; validates the argparse wiring + summary output)."""
    import json

    from schema_validator_ray.cli import main
    from schema_validator_ray.sources.synth import write_images_dataset

    d = tmp_path / "imgs"
    write_images_dataset(str(d), 400, seed=5, shards=2)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["validate", "--input", str(d), "--no-decode"])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "violations_by_rule" in summary and "required" in summary["violations_by_rule"]

    buf = io.StringIO()
    out_dir = tmp_path / "out"
    with contextlib.redirect_stdout(buf):
        rc = main(["validate", "--input", str(d), "--out", str(out_dir),
                   "--no-decode"])
    assert rc == 0
    s2 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert s2["ran"] == 2 and s2["skipped"] == 0


def test_windows_hot_key_bucketed(ray_session):
    """One hot key spanning many time buckets: the bucketed implementations
    must equal a naive single-partition pandas computation exactly (including
    sessions that chain across bucket boundaries and duplicate timestamps)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.windows import (session_windows,
                                                     sliding_count)

    rng = np.random.default_rng(5)
    n = 20000
    # hot key "hot" has 90% of events; gaps drawn so sessions cross buckets
    base = pd.Timestamp("2024-01-01").value
    steps = rng.integers(1, 40 * 60 * 10 ** 9, n).cumsum()  # 1ns..40min steps
    ts = pd.to_datetime(base + steps)
    ts = ts.insert(0, pd.Timestamp("2024-01-01"))  # duplicate-ts edge
    ts = ts.insert(0, pd.Timestamp("2024-01-01"))
    keys = np.where(rng.random(len(ts)) < 0.9, "hot", "cold")
    df = pd.DataFrame({"user_id": keys, "ts": ts}).sample(
        frac=1.0, random_state=7).reset_index(drop=True)  # shuffle input order

    ds = rd.from_pandas(df).repartition(8)

    # --- sliding (small bucket_multiple to force many bucket crossings)
    got = (sliding_count(ds, key="user_id", ts="ts", window="1h",
                         bucket_multiple=3).to_pandas()
           .sort_values(["user_id", "ts"], kind="stable")
           .reset_index(drop=True))
    delta = pd.Timedelta("1h")

    def naive_sliding(g):
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        t = g["ts"].to_numpy()
        left = np.searchsorted(t, t - delta.to_numpy(), side="left")
        right = np.searchsorted(t, t, side="right")
        g["cnt_window"] = (right - left).astype(np.int64)
        return g

    want = (df.groupby("user_id", group_keys=False)[df.columns.tolist()]
            .apply(naive_sliding)
            .sort_values(["user_id", "ts"], kind="stable")
            .reset_index(drop=True))
    assert (got["cnt_window"].to_numpy() == want["cnt_window"].to_numpy()).all()
    assert len(got) == len(df)

    # --- sessions
    got_s = (session_windows(ds, key="user_id", ts="ts", gap="30min",
                             bucket_multiple=3).to_pandas()
             .sort_values(["user_id", "session_start"])
             .reset_index(drop=True))

    def naive_sessions(g):
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        new_s = (g["ts"].diff() > pd.Timedelta("30min")).cumsum()
        out = g.groupby(new_s).agg(session_start=("ts", "min"),
                                   session_end=("ts", "max"),
                                   n_events=("ts", "size"))
        out["user_id"] = g["user_id"].iloc[0]
        return out[["user_id", "session_start", "session_end", "n_events"]]

    want_s = (df.groupby("user_id", group_keys=False)[df.columns.tolist()]
              .apply(naive_sessions)
              .sort_values(["user_id", "session_start"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got_s[["user_id", "session_start", "session_end", "n_events"]],
        want_s, check_dtype=False)


def test_grouped_topk_hot_key(ray_session):
    """Grouped top-k matches pandas ground truth with a hot key and duplicate
    order values (deterministic tie-break)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.windows import grouped_topk

    rng = np.random.default_rng(4)
    n = 20000
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.7, 1, rng.integers(2, 200, n))
        .astype(np.int64),
        "score": rng.integers(0, 50, n).astype(np.int64),  # many ties
        "row": np.arange(n, dtype=np.int64),
    })
    got = (grouped_topk(rd.from_pandas(df).repartition(13), key="k",
                        order_col="score", k=5, tie_col="row")
           .to_pandas().sort_values(["k", "score", "row"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    want = (df.sort_values(["k", "score", "row"],
                           ascending=[True, False, True], kind="stable")
            .groupby("k", sort=True).head(5).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "score", "row"]],
                                  want[["k", "score", "row"]])


def test_sliding_sum_matches_naive(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.windows import sliding_sum

    rng = np.random.default_rng(6)
    n = 8000
    base = pd.Timestamp("2024-02-01").value
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.8, "hot", "cold"),
        "ts": pd.to_datetime(base + np.sort(
            rng.integers(0, 20 * 24 * 3600 * 10 ** 9, n))),
        "v": rng.random(n).round(3),
        "row": np.arange(n, dtype=np.int64),
    }).sample(frac=1.0, random_state=2).reset_index(drop=True)

    got = (sliding_sum(rd.from_pandas(df).repartition(7), key="k", ts="ts",
                       value="v", window="2h", bucket_multiple=3)
           .to_pandas().sort_values("row").reset_index(drop=True))

    delta = pd.Timedelta("2h")

    def naive(g):
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        t = g["ts"].to_numpy()
        v = g["v"].to_numpy()
        out = np.array([v[(t >= t[i] - delta.to_numpy()) & (t <= t[i])].sum()
                        for i in range(len(g))])
        g["want"] = np.round(out, 6)
        return g

    want = (df.groupby("k", group_keys=False)[df.columns.tolist()]
            .apply(naive).sort_values("row").reset_index(drop=True))
    assert np.allclose(got["sum_window"].to_numpy(),
                       want["want"].to_numpy(), atol=2e-6)


def test_sessionize_cross_bucket_chains(ray_session):
    """A session spanning MANY coarse buckets (event every gap/2 over
    4 bucket spans) must collapse into one (start, end) on every event —
    the boundary-summary chain merge at work — while isolated events stay
    singleton sessions."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.windows import sessionize

    base = pd.Timestamp("2024-03-01")
    gap = pd.Timedelta("30min")
    # user 1: one long chain, event every 15 min for 4*64*30min span
    n_chain = 4 * 64 * 2
    chain_ts = [base + i * (gap / 2) for i in range(n_chain)]
    # user 2: isolated events, far apart
    iso_ts = [base + pd.Timedelta(days=10) + i * pd.Timedelta("2h")
              for i in range(5)]
    df = pd.DataFrame({
        "event_id": np.arange(n_chain + 5, dtype=np.int64),
        "user_id": np.array([1] * n_chain + [2] * 5, np.int64),
        "ts": pd.to_datetime(chain_ts + iso_ts),
    })
    out = (sessionize(rd.from_pandas(df).repartition(4), key="user_id",
                      ts="ts", gap="30min")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    u1 = out[out.user_id == 1]
    assert (u1["session_start"] == chain_ts[0]).all()
    assert (u1["session_end"] == chain_ts[-1]).all()
    u2 = out[out.user_id == 2]
    assert (u2["session_start"] == u2["ts"]).all()
    assert (u2["session_end"] == u2["ts"]).all()


def test_sessionize_fallback_matches_fast_path(ray_session):
    """summary_merge_max=0 forces the session_windows + interval_join
    composition; both paths must assign identical bounds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.windows import sessionize

    rng = np.random.default_rng(9)
    base = pd.Timestamp("2024-02-01").value
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(base + rng.integers(0, 8 * 24 * 3600 * 10 ** 9,
                                                 n)),
    })
    fast = (sessionize(rd.from_pandas(df).repartition(3), key="user_id",
                       ts="ts", gap="30min")
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    slow = (sessionize(rd.from_pandas(df).repartition(3), key="user_id",
                       ts="ts", gap="30min", summary_merge_max=0)
            .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(fast) == len(slow) == n
    assert (fast["session_start"].to_numpy()
            == slow["session_start"].to_numpy()).all()
    assert (fast["session_end"].to_numpy()
            == slow["session_end"].to_numpy()).all()


def test_sessionize_duplicate_timestamps(ray_session):
    """Events sharing (key, ts) always land in the same session; bounds are
    order-insensitive for equal timestamps."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from schema_validator_ray.stages.windows import sessionize

    base = pd.Timestamp("2024-06-01")
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": np.ones(6, np.int64),
        "ts": pd.to_datetime([base, base, base + pd.Timedelta("10min"),
                              base + pd.Timedelta("10min"),
                              base + pd.Timedelta("2h"),
                              base + pd.Timedelta("2h")]),
    })
    out = (sessionize(rd.from_pandas(df).repartition(3), key="user_id",
                      ts="ts", gap="30min")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    first = out[out.event_id < 4]
    assert (first["session_start"] == base).all()
    assert (first["session_end"] == base + pd.Timedelta("10min")).all()
    second = out[out.event_id >= 4]
    assert (second["session_start"] == base + pd.Timedelta("2h")).all()
    assert (second["session_end"] == base + pd.Timedelta("2h")).all()


def test_image_quality_stage_metrics(ray_session):
    """Quality metrics vs direct numpy on known payloads; corrupt payloads
    emit ok=False nulls instead of failing the task."""
    import numpy as np
    import pyarrow as pa

    from schema_validator_ray.functions import imagecodec as codec
    from schema_validator_ray.stages.multimodal import ImageQualityStage

    flat = np.full((20, 30), 128, np.uint8)          # zero gradient
    grad = np.tile(np.arange(0, 240, 8, dtype=np.uint8), (20, 1))
    sat = np.full((10, 10), 128, np.uint8); sat[:5] = 255
    t = pa.table({
        "image_id": pa.array(["flat", "grad", "sat", "bad"], pa.string()),
        "bytes": pa.array([codec.encode(flat, "png"),
                           codec.encode(grad, "png"),
                           codec.encode(sat, "png"), b"garbage"],
                          pa.binary())})
    out = ImageQualityStage()(t)
    d = {r["image_id"]: r for r in out.to_pylist()}
    assert d["flat"]["sharpness"] == 0.0
    assert d["flat"]["std_intensity"] == 0.0
    assert d["grad"]["sharpness"] > 1.0
    assert abs(d["sat"]["saturated_frac"] - 0.5) < 1e-9
    assert d["bad"]["ok"] is False and d["bad"]["sharpness"] is None
    assert all(d[k]["ok"] for k in ("flat", "grad", "sat"))
