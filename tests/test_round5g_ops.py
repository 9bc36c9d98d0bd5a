"""Round-5 batch-7 operators: candidate-key census, langid confusion,
YoY revenue, TPC-H Q7/Q10 shapes, session-duration quantiles."""

import numpy as np
import pandas as pd


def _orders(tmp_path, keys, cust, price, dates):
    df = pd.DataFrame({
        "o_orderkey": keys,
        "o_custkey": cust,
        "o_orderstatus": ["F"] * len(keys),
        "o_totalprice": price,
        "o_orderdate": pd.to_datetime(dates),
        "o_orderpriority": ["1-URGENT"] * len(keys),
    })
    df.to_parquet(tmp_path / "orders.parquet")
    return df


def test_candidate_keys_census(ray_session, tmp_path):
    import __ray_entry__ as e

    _orders(tmp_path,
            keys=[1, 2, 3, 4],
            cust=[10, 10, 20, 30],                    # duplicated → not key
            price=[5.0, 5.0, 7.0, None],              # dup + null
            dates=["2024-01-01"] * 4)
    out = (e.queries()["candidate_keys_orders"](str(tmp_path))
           .to_pandas().set_index("column_name"))
    assert bool(out.loc["o_orderkey", "is_unique"])
    assert out.loc["o_orderkey", "n_distinct"] == 4
    assert not bool(out.loc["o_custkey", "is_unique"])
    assert out.loc["o_custkey", "n_distinct"] == 3
    # null excluded from both distinct and nonnull: 2 distinct of 3 nonnull
    assert out.loc["o_totalprice", "n_nonnull"] == 3
    assert out.loc["o_totalprice", "n_distinct"] == 2
    assert not bool(out.loc["o_totalprice", "is_unique"])


def test_revenue_yoy_gap_year_is_null(ray_session, tmp_path):
    import __ray_entry__ as e

    _orders(tmp_path,
            keys=[1, 2, 3],
            cust=[1, 1, 1],
            price=[100.0, 110.0, 121.0],
            dates=["1995-06-01", "1996-06-01", "1998-06-01"])  # 1997 gap
    out = (e.queries()["revenue_yoy"](str(tmp_path))
           .to_pandas().set_index("year").sort_index())
    assert pd.isna(out.loc[1995, "yoy"])
    assert out.loc[1996, "yoy"] == round(110.0 / 100.0 - 1.0, 6)
    assert pd.isna(out.loc[1998, "yoy"])        # gap year: no growth figure


def test_langid_confusion_totals(ray_session):
    """The confusion counts over the real sf0.001 table must sum to the
    document count and agree with the standalone doc_langid marginals."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    conf = e.queries()["langid_confusion"](sf).to_pandas()
    pred = e.queries()["doc_langid"](sf).to_pandas()
    assert conf["n"].sum() == len(pred)
    marg = conf.groupby("lang_pred")["n"].sum().sort_index()
    marg2 = pred.groupby("lang_pred").size().sort_index()
    assert marg.to_dict() == marg2.to_dict()


def test_session_duration_singleton_is_zero(ray_session, tmp_path):
    """A user with one lone event forms a zero-length session; quartiles
    of a single duration are all that duration."""
    import __ray_entry__ as e

    df = pd.DataFrame({
        "event_id": [1],
        "ts": pd.to_datetime(["2024-01-03 10:00:00"]),   # a Wednesday
        "user_id": [7],
        "event_type": ["click"],
        "value": [0.0],
        "props": [""],
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = (e.queries()["session_duration_quantiles"](str(tmp_path))
           .to_pandas())
    assert out["isodow"].tolist() == [3]
    assert out[["p25", "med", "p75"]].iloc[0].tolist() == [0, 0, 0]
