"""Round-5 batch-6 operators: cross-table reconciliation, inclusion
dependencies, C4 / charset censuses, type-token ratio, hourly
autocorrelation, CUSUM changepoint, bounce rate, TPC-H Q4/Q14/Q18
shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_c4_census_counts(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import c4_census_by_group

    long_ok = ("word " * 60).strip() + ". End! Sure? Done."
    docs = pd.DataFrame({
        "source": ["s"] * 5,
        "text": [
            long_ok,                               # kept
            "short text. one! two? three.",        # short (<50 words)
            long_ok + " {json}",                   # brace
            ("w " * 60).strip() + " no sentences", # few sentence marks
            long_ok.replace("End", "Lorem Ipsum"), # lorem
        ],
    })
    out = c4_census_by_group(rd.from_pandas(docs), "text", "source") \
        .to_pandas().iloc[0]
    assert out["n_docs"] == 5
    assert out["n_short"] == 1
    assert out["n_braces"] == 1
    assert out["n_few_sentences"] == 1
    assert out["n_lorem"] == 1
    assert out["n_kept"] == 1


def test_charset_census_counts(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import charset_census_by_group

    docs = pd.DataFrame({
        "source": ["s", "s", "s"],
        "text": ["Abc 123", "héllo�", None],
    })
    out = charset_census_by_group(rd.from_pandas(docs), "text", "source") \
        .to_pandas().iloc[0]
    assert out["n_docs"] == 3
    assert out["docs_nonascii"] == 1
    assert out["chars_nonascii"] == 2      # é and the replacement char
    assert out["docs_replacement"] == 1
    assert out["chars_upper"] == 1
    assert out["chars_digit"] == 3
    assert out["chars_space"] == 1


def test_doc_ttr_matches_brute(ray_session):
    import ray.data as rd

    from schema_validator_ray.functions.text import doc_ttr

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a B  c", "x x x x", "", "Unique words only here"],
    })
    out = (doc_ttr(rd.from_pandas(docs).repartition(2), "text", "doc_id")
           .to_pandas().set_index("doc_id").sort_index())
    # doc 1: tokens a,b,a,b,c -> 5 tokens, 3 types
    assert out.loc[1, "n_tokens"] == 5 and out.loc[1, "n_types"] == 3
    assert out.loc[1, "ttr"] == round(3 / 5, 6)
    assert out.loc[2, "n_tokens"] == 4 and out.loc[2, "n_types"] == 1
    assert out.loc[3, "n_tokens"] == 0 and pd.isna(out.loc[3, "ttr"])
    assert out.loc[4, "ttr"] == 1.0


def test_run_offsets_expansion():
    from __ray_entry__ import _run_offsets

    reps = np.array([3, 0, 2, 1], np.int64)
    assert _run_offsets(reps).tolist() == [0, 1, 2, 0, 1, 0]
    assert _run_offsets(np.array([], np.int64)).tolist() == []


def test_reconcile_flags_seeded_mismatch(ray_session, tmp_path):
    """Seed one order whose header total disagrees with its lines and one
    order with no lines; the census must classify all three cases."""
    import duckdb

    import __ray_entry__ as e

    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderstatus": ["F", "F", "O"],
        # order 1 matches (2 lines of 10.00 net), order 2 is off by a
        # cent, order 3 has no lines at all
        "o_totalprice": [20.0, 30.01, 5.0],
        "o_custkey": [1, 1, 1],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
        "o_orderpriority": ["1-URGENT"] * 3,
    })
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_extendedprice": [10.0, 10.0, 30.0],
        "l_discount": [0.0, 0.0, 0.0],
        "l_tax": [0.0, 0.0, 0.0],
    })
    for extra in ["l_partkey", "l_suppkey", "l_linenumber", "l_quantity"]:
        li[extra] = 1
    li["l_shipdate"] = pd.to_datetime("2024-01-02")
    orders.to_parquet(tmp_path / "orders.parquet")
    li.to_parquet(tmp_path / "lineitem.parquet")

    out = (e.queries()["orders_lineitem_reconcile"](str(tmp_path))
           .to_pandas().set_index("o_orderstatus").sort_index())
    assert out.loc["F", "n_orders"] == 2
    assert out.loc["F", "n_with_lines"] == 2
    assert out.loc["F", "n_matched"] == 1
    assert out.loc["F", "n_mismatched"] == 1
    assert out.loc["O", "n_orders"] == 1
    assert out.loc["O", "n_with_lines"] == 0
    assert out.loc["O", "n_matched"] == 0


def test_inclusion_deps_partial_containment(ray_session, tmp_path):
    import __ray_entry__ as e

    pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [10, 20, 99],       # 99 dangles
        "o_orderstatus": ["F"] * 3,
        "o_totalprice": [1.0] * 3,
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
        "o_orderpriority": ["1-URGENT"] * 3,
    }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({
        "c_custkey": [10, 20, 30],
        "c_name": ["a", "b", "c"],
        "c_nationkey": np.array([1, 1, 1], np.int32),
        "c_acctbal": [0.0] * 3,
        "c_mktsegment": ["X"] * 3,
    }).to_parquet(tmp_path / "customer.parquet")
    li = pd.DataFrame({
        "l_orderkey": [1], "l_partkey": [5], "l_suppkey": [7],
        "l_linenumber": np.array([1], np.int32), "l_quantity": [1.0],
        "l_extendedprice": [1.0], "l_discount": [0.0], "l_tax": [0.0],
        "l_returnflag": ["N"], "l_linestatus": ["O"],
    })
    li["l_shipdate"] = pd.to_datetime("2024-01-02")
    li.to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({"p_partkey": [5], "p_name": ["p"], "p_brand": ["b"],
                  "p_type": ["PROMO"], "p_size": np.array([1], np.int32),
                  "p_retailprice": [1.0]}) \
        .to_parquet(tmp_path / "part.parquet")
    pd.DataFrame({"s_suppkey": [8], "s_name": ["s"],
                  "s_nationkey": np.array([1], np.int32),
                  "s_acctbal": [0.0]}) \
        .to_parquet(tmp_path / "supplier.parquet")

    out = e.queries()["inclusion_deps"](str(tmp_path)).to_pandas() \
        .set_index("dependency")
    row = out.loc["orders.o_custkey->customer.c_custkey"]
    assert row["n_child"] == 3 and row["n_contained"] == 2
    assert row["containment"] == round(2 / 3, 6)
    # l_suppkey=7 is NOT in supplier(8): containment 0
    row = out.loc["lineitem.l_suppkey->supplier.s_suppkey"]
    assert row["n_child"] == 1 and row["n_contained"] == 0


def test_cusum_changepoint_detects_shift(ray_session, tmp_path):
    """A rate that doubles halfway through must put the CUSUM peak at
    (or adjacent to) the shift hour."""
    import __ray_entry__ as e

    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0
    for h in range(48):
        n = 10 if h < 24 else 30
        for i in range(n):
            rows.append((eid, base + pd.Timedelta(hours=h, seconds=i)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts"])
    df["user_id"] = 1
    df["event_type"] = "click"
    df["value"] = 0.0
    df["props"] = ""
    df.to_parquet(tmp_path / "events.parquet")

    out = e.queries()["events_cusum_changepoint"](str(tmp_path)).to_pandas()
    assert out["n_hours"].iloc[0] == 48
    # minimum of the (negative) cusum is at the last low-rate hour
    assert out["hour"].iloc[0] == "2024-03-01 23:00"


def test_hourly_autocorr_constant_is_null(ray_session, tmp_path):
    """A perfectly constant hourly series has zero variance: the lag-1
    correlation is undefined and must surface as NULL, matching SQL."""
    import __ray_entry__ as e

    base = pd.Timestamp("2024-03-01")
    rows = [(i, base + pd.Timedelta(hours=i % 24, minutes=1), 1, "click",
             0.0, "") for i in range(24)]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    df.to_parquet(tmp_path / "events.parquet")

    out = e.queries()["events_hourly_autocorr"](str(tmp_path)).to_pandas()
    assert out["n_pairs"].iloc[0] == 23
    assert pd.isna(out["autocorr"].iloc[0])


def test_join_empty_first_block_workaround(ray_session):
    """Pin the Ray 2.49 hazard the Q18 rewrite works around: joining a
    heavily-filtered aggregate output (empty first block) crashes the
    hash-shuffle join with ArrowInvalid. If this ever starts passing,
    Dataset.join can be used directly again."""
    import pytest
    import ray
    import ray.data as rd
    from ray.exceptions import RayTaskError

    import pyarrow.compute as pc

    left = (rd.range(1000).repartition(8)
            .map_batches(lambda b: pa.table({"k": b["id"], "v": b["id"]}),
                         batch_format="pyarrow")
            .groupby("k").aggregate()
            .map_batches(lambda b: b.filter(pc.less(b["k"], 2)),
                         batch_format="pyarrow"))
    right = rd.from_arrow(pa.table({"k": list(range(10)),
                                    "w": list(range(10))}))
    try:
        n = left.join(right, join_type="inner", num_partitions=8,
                      on=("k",)).count()
    except (RayTaskError, ray.exceptions.RayTaskError):
        return  # expected on Ray 2.49: schema broadcast lost
    except Exception:
        return
    assert n == 2  # fixed upstream: the workaround can be retired
