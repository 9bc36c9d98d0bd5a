"""Round-5 batch-11 primitives: graph census, sequence n-grams, text IO."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_edge_census_known_graph(ray_session):
    # K4 minus one edge: nodes a,b,c,d; edges ab,ac,ad,bc,bd (no cd)
    # degrees: a=3 b=3 c=2 d=2 -> wedges 3+3+1+1=8; triangles abc, abd = 2
    from schema_validator_ray.stages.graph import undirected_edge_census

    edges = rd.from_arrow(pa.table({
        "a": ["a", "a", "a", "b", "b"],
        "b": ["b", "c", "d", "c", "d"]}))
    t = undirected_edge_census(edges, "a", "b")
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row == {"n_nodes": 4, "n_edges": 5, "n_wedges": 8,
                   "n_triangles": 2,
                   "clustering": round(3 * 2 / 8, 6)}


def test_edge_census_triangle_free_and_empty(ray_session):
    from schema_validator_ray.stages.graph import undirected_edge_census

    star = rd.from_arrow(pa.table({"a": ["x", "x", "x"],
                                   "b": ["p", "q", "r"]}))
    t = undirected_edge_census(star, "a", "b")
    assert t["n_triangles"][0].as_py() == 0
    assert t["n_wedges"][0].as_py() == 3

    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.string()),
                                    "b": pa.array([], pa.string())}))
    t = undirected_edge_census(empty, "a", "b")
    assert t["n_edges"][0].as_py() == 0
    assert t["clustering"][0].as_py() is None


def test_edge_census_orientation_and_dup_invariant(ray_session):
    # same graph given with reversed/duplicated edges must census equal
    from schema_validator_ray.stages.graph import undirected_edge_census

    messy = rd.from_arrow(pa.table({
        "a": ["b", "c", "a", "c", "b", "a", "b"],
        "b": ["a", "a", "d", "b", "c", "b", "d"]}))
    t = undirected_edge_census(messy, "a", "b")
    assert t["n_edges"][0].as_py() == 5
    assert t["n_triangles"][0].as_py() == 2


def test_pagerank_uniform_on_regular_graph(ray_session):
    # triangle (2-regular): uniform 1/3 is stationary at every iteration
    from schema_validator_ray.stages.graph import pagerank_on_edges

    edges = rd.from_arrow(pa.table({"a": ["a", "b", "a"],
                                    "b": ["b", "c", "c"]}))
    t = pagerank_on_edges(edges, "a", "b", iters=3)
    assert sorted(t["pr"].to_pylist()) == [round(1 / 3, 6)] * 3


def test_pagerank_path_matches_numpy_reference(ray_session):
    from schema_validator_ray.stages.graph import pagerank_on_edges

    edges = rd.from_arrow(pa.table({"a": ["a", "b"], "b": ["b", "c"]}))
    t = pagerank_on_edges(edges, "a", "b", iters=3)
    got = dict(zip(t["node"].to_pylist(), t["pr"].to_pylist()))

    # plain-numpy unrolled reference (same update rule)
    deg = {"a": 1.0, "b": 2.0, "c": 1.0}
    pr = {k: 1 / 3 for k in deg}
    for _ in range(3):
        s = {"a": pr["b"] / deg["b"],
             "b": pr["a"] / deg["a"] + pr["c"] / deg["c"],
             "c": pr["b"] / deg["b"]}
        pr = {k: 0.15 / 3 + 0.85 * s[k] for k in deg}
    assert got == {k: round(v, 6) for k, v in pr.items()}
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_sequence_ngram_counts_matches_manual(ray_session):
    from schema_validator_ray.stages.funnel import sequence_ngram_counts

    # user 1: A B A B ; user 2: B A B ; trigrams: 1:(ABA),(BAB); 2:(BAB)
    ev = rd.from_arrow(pa.table({
        "u": [1, 1, 1, 1, 2, 2, 2],
        "ts": pa.array([1, 2, 3, 4, 1, 2, 3], pa.int64()),
        "id": [10, 11, 12, 13, 20, 21, 22],
        "ty": ["A", "B", "A", "B", "B", "A", "B"]}))
    out = sequence_ngram_counts(ev, user_col="u", ts_col="ts",
                                type_col="ty", tiebreak_col="id", n=3)
    rows = {(r["t1"], r["t2"], r["t3"]): r["cnt"] for r in out.take_all()}
    assert rows == {("A", "B", "A"): 1, ("B", "A", "B"): 2}


def test_sequence_ngram_tiebreak_order(ray_session):
    from schema_validator_ray.stages.funnel import sequence_ngram_counts

    # equal ts -> ordered by tiebreak id: sequence is A,B,C not C,B,A
    ev = rd.from_arrow(pa.table({
        "u": [7, 7, 7],
        "ts": pa.array([5, 5, 5], pa.int64()),
        "id": [1, 2, 3],
        "ty": ["A", "B", "C"]}))
    out = sequence_ngram_counts(ev, user_col="u", ts_col="ts",
                                type_col="ty", tiebreak_col="id", n=3)
    rows = [(r["t1"], r["t2"], r["t3"]) for r in out.take_all()]
    assert rows == [("A", "B", "C")]


def test_jsonl_roundtrip_preserves_text(ray_session, tmp_path):
    from schema_validator_ray.sources.text_io import (
        jsonl_from_parquet_cached, read_jsonl)

    src = tmp_path / "docs.parquet"
    texts = ["plain", 'quotes "and" \\backslash\\', "unié中文",
             "new\nline\ttab", None, ""]
    pq.write_table(pa.table({"doc_id": list(range(len(texts))),
                             "text": texts}), src)
    path = jsonl_from_parquet_cached(str(src), ["doc_id", "text"])
    got = read_jsonl(path).to_pandas().sort_values("doc_id")
    assert [None if v is None or v != v else v
            for v in got["text"].tolist()] == texts
    # cache hit: second call returns the same path without rewriting
    assert jsonl_from_parquet_cached(str(src), ["doc_id", "text"]) == path


def test_csv_roundtrip_with_transform(ray_session, tmp_path):
    import pyarrow.compute as pc

    from schema_validator_ray.sources.text_io import (
        csv_from_parquet_cached, read_csv)

    src = tmp_path / "orders.parquet"
    pq.write_table(pa.table({"k": [1, 2, 3],
                             "price": [1.005, 2.5, 10.0]}), src)

    def cents(t):
        return pa.table({"k": t["k"],
                         "cents": pc.cast(pc.round(pc.multiply(
                             t["price"], pa.scalar(100.0))), pa.int64())})

    path = csv_from_parquet_cached(str(src), ["k", "price"],
                                   transform=cents, tag="c")
    got = read_csv(path).to_pandas().sort_values("k")
    assert got["cents"].tolist() == [100, 250, 1000]
