"""Round-5 batch-8 operators: source dup-rate census, duplicated
sentences, rolling 7-day uniques, temperature-scaled source mixing."""

import numpy as np
import pandas as pd


def _docs(tmp_path, texts, sources=None, langs=None):
    n = len(texts)
    df = pd.DataFrame({
        "doc_id": range(1, n + 1),
        "text": texts,
        "lang": langs or ["en"] * n,
        "source": sources or ["s"] * n,
    })
    df["n_chars"] = df["text"].str.len().fillna(0).astype("int64")
    df.to_parquet(tmp_path / "documents.parquet")
    return df


def test_source_dup_rate_seeded(ray_session, tmp_path):
    _docs(tmp_path,
          texts=["aaa", "aaa", "bbb", "ccc", "ccc", "ccc"],
          sources=["x", "x", "x", "y", "y", "y"])
    import __ray_entry__ as e

    out = (e.queries()["source_dup_rate"](str(tmp_path))
           .to_pandas().set_index("source"))
    assert out.loc["x", "n_docs"] == 3 and out.loc["x", "n_unique"] == 2
    assert out.loc["x", "dup_frac"] == round(1 - 2 / 3, 6)
    assert out.loc["y", "n_docs"] == 3 and out.loc["y", "n_unique"] == 1
    assert out.loc["y", "dup_frac"] == round(1 - 1 / 3, 6)


def test_dup_sentences_topk_seeded(ray_session, tmp_path):
    boiler = "This exact boilerplate sentence repeats everywhere"
    rare = "An entirely unique closing line appears just once"
    _docs(tmp_path, texts=[
        f"{boiler}. Unique first tail one.",
        f"Some lead-in text here! {boiler}. Other tail.",
        f"{boiler}? {rare}.",
        "A document with no repeats at all, plainly written here.",
    ])
    import __ray_entry__ as e

    out = e.queries()["dup_sentences_topk"](str(tmp_path))
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    assert df["sent"].tolist() == [boiler]
    assert df["n"].tolist() == [3]


def test_rolling_7d_users_brute(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    n = 400
    days = rng.integers(0, 20, n)
    df = pd.DataFrame({
        "event_id": range(n),
        "ts": pd.Timestamp("2024-05-01")
        + pd.to_timedelta(days, unit="D")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "user_id": rng.integers(1, 25, n),
        "event_type": "click",
        "value": 0.0,
        "props": "",
    })
    df.to_parquet(tmp_path / "events.parquet")
    import __ray_entry__ as e

    out = (e.queries()["events_rolling_7d_users"](str(tmp_path))
           .to_pandas().set_index("day").sort_index())
    ud = df.assign(day=df["ts"].dt.floor("D")) \
        .drop_duplicates(["user_id", "day"])
    for day, row in out.iterrows():
        d = pd.Timestamp(day)
        expect = ud[(ud["day"] <= d) & (ud["day"] >= d - pd.Timedelta(days=6))
                    ]["user_id"].nunique()
        assert row["n_users_7d"] == expect
    assert len(out) == ud["day"].nunique()


def test_mix_temperature_flattens_shares(ray_session, tmp_path):
    """n^0.7 scaling must RAISE the tail source's share and LOWER the
    head source's share relative to the raw corpus mix, under ~50%
    total budget."""
    texts, sources = [], []
    for i in range(900):
        texts.append(f"head doc {i}")
        sources.append("head")
    for i in range(100):
        texts.append(f"tail doc {i}")
        sources.append("tail")
    _docs(tmp_path, texts=texts, sources=sources)
    import __ray_entry__ as e

    out = e.queries()["mix_docs_temperature"](str(tmp_path)).to_pandas()
    shares = out["source"].value_counts(normalize=True)
    assert 0.35 <= len(out) / 1000 <= 0.65          # ≈50% budget
    assert shares["tail"] > 0.1                     # raw share was 0.10
    assert shares["head"] < 0.9
    # deterministic: a second run picks the identical set
    out2 = e.queries()["mix_docs_temperature"](str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
