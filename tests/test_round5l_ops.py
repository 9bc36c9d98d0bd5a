"""Round-5 batch-13 primitives: daily PSI drift monitor, session entry/exit
path census, Lorenz spend-concentration curve."""

import numpy as np
import pyarrow as pa
import ray.data as rd

T0 = 1_700_000_000_000_000  # µs epoch base for handmade timestamps


def _ev(rows):
    """rows: list of (event_id, user_id, minutes_offset, event_type)."""
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([T0 + r[2] * 60_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string())}))


def test_daily_psi_identical_days_zero(ray_session):
    from schema_validator_ray.stages.drift import daily_categorical_psi

    rows = [(i, 1, d * 1440 + i, t)
            for d in range(3) for i, t in enumerate(["a", "a", "b", "b"])]
    df = daily_categorical_psi(_ev(rows), ts_col="ts", cat_col="event_type")
    assert list(df["psi"]) == [0.0, 0.0, 0.0]
    assert list(df["drift_ok"]) == [True, True, True]
    assert len(df["day"]) == 3 and df["day"].iloc[0] < df["day"].iloc[2]


def test_daily_psi_vanished_category_matches_formula(ray_session):
    from schema_validator_ray.stages.drift import daily_categorical_psi

    # day 0: a,a,b,b (the reference); day 1: a,a,a,a (b vanished)
    rows = [(0, 1, 0, "a"), (1, 1, 1, "b"), (2, 1, 2, "a"), (3, 1, 3, "b"),
            (4, 1, 1440, "a"), (5, 1, 1441, "a"),
            (6, 1, 1442, "a"), (7, 1, 1443, "a")]
    df = daily_categorical_psi(_ev(rows), ts_col="ts", cat_col="event_type")
    p = np.array([1.0, 1e-6])          # day-1 [a, b], clamped
    q = np.array([0.5, 0.5])           # reference day
    want = round(float(np.sum((p - q) * np.log(p / q))), 6)
    assert df["psi"].iloc[0] == 0.0
    assert df["psi"].iloc[1] == want
    assert not df["drift_ok"].iloc[1]


def test_session_entry_exit_gap_split_and_boundary(ray_session):
    from schema_validator_ray.stages.funnel import session_entry_exit

    # user 1: view@0, click@10 (same session), purchase@50 (gap 40 > 30
    # splits); user 2: error@0 singleton; user 3: a@0, b@30 — gap EXACTLY
    # 30min stays one session (strictly-greater convention)
    rows = [(0, 1, 0, "view"), (1, 1, 10, "click"), (2, 1, 50, "purchase"),
            (3, 2, 0, "error"), (4, 3, 0, "a"), (5, 3, 30, "b")]
    out = session_entry_exit(_ev(rows), user_col="user_id", ts_col="ts",
                             type_col="event_type", tiebreak_col="event_id",
                             gap="30min").to_pandas()
    got = {(r.entry_type, r.exit_type): r.n for r in out.itertuples()}
    assert got == {("view", "click"): 1, ("purchase", "purchase"): 1,
                   ("error", "error"): 1, ("a", "b"): 1}


def test_session_entry_exit_tiebreak_on_equal_ts(ray_session):
    from schema_validator_ray.stages.funnel import session_entry_exit

    # two events at the SAME ts: event_id orders them (entry=id 0's type)
    rows = [(1, 7, 0, "second"), (0, 7, 0, "first")]
    out = session_entry_exit(_ev(rows), user_col="user_id", ts_col="ts",
                             type_col="event_type", tiebreak_col="event_id",
                             gap="30min").to_pandas()
    assert len(out) == 1
    assert out["entry_type"].iloc[0] == "first"
    assert out["exit_type"].iloc[0] == "second"
    assert out["n"].iloc[0] == 1


def test_spend_lorenz_invariants(ray_session):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "_entry_l", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["_entry_l"] = m
    spec.loader.exec_module(m)
    df = m.q_customer_spend_lorenz("/root/testdata/sf0.001")
    assert list(df["decile"]) == list(range(1, 11))
    assert (np.diff(df["cum_share"].to_numpy()) >= 0).all()
    assert df["cum_share"].iloc[-1] == 1.0
    # deciles order by spend ascending: the top decile carries the most
    assert df["spend_cents"].iloc[-1] == df["spend_cents"].max()
    assert int(df["n_customers"].sum()) > 0


def test_k_anonymity_flags_small_classes(ray_session):
    from schema_validator_ray.stages.uniqueness import k_anonymity

    ds = rd.from_arrow(pa.table({
        "zip": ["a", "a", "a", "b", None],
        "age": [1, 1, 1, 2, 2]}))
    out = k_anonymity(ds, ["zip", "age"], k=3).to_pandas()
    got = {(r.zip, r.age): (r.n, r.k_ok) for r in out.itertuples()}
    assert got[("a", 1)] == (3, True)
    assert got[("b", 2)] == (1, False)
    assert got[(None, 2)] == (1, False)      # null is its own class


def test_mutual_information_independent_and_identical(ray_session):
    from schema_validator_ray.stages.stats import mutual_information

    # perfectly independent uniform 2x2 -> MI = 0
    ind = rd.from_arrow(pa.table({
        "a": ["x", "x", "y", "y"], "b": [0, 1, 0, 1]}))
    df = mutual_information(ind, "a", "b")
    assert df["mi"].iloc[0] == 0.0 and df["n"].iloc[0] == 4

    # b == a (deterministic) -> MI = H(a) = ln 2 for a uniform binary a
    det = rd.from_arrow(pa.table({
        "a": ["x", "x", "y", "y"], "b": ["x", "x", "y", "y"]}))
    df = mutual_information(det, "a", "b")
    assert df["mi"].iloc[0] == round(float(np.log(2)), 6)


def test_mutual_information_drops_nulls(ray_session):
    from schema_validator_ray.stages.stats import mutual_information

    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", None, "y"], "b": [0, 1, 0, None]}))
    df = mutual_information(ds, "a", "b")
    assert df["n"].iloc[0] == 2                # only fully-non-null rows


def test_id_islands_known_runs(ray_session):
    from schema_validator_ray.stages.analytics import id_islands

    # ids 1,2,3, 7, 10,11 (with a duplicate 2) -> three islands
    ds = rd.from_arrow(pa.table({
        "id": pa.array([3, 1, 2, 2, 7, 10, 11], pa.int64())}))
    out = id_islands(ds, "id").to_pandas().sort_values("island_start")
    assert out[["island_start", "island_end", "island_len"]].values.tolist() \
        == [[1, 3, 3], [7, 7, 1], [10, 11, 2]]


def test_id_islands_single_run_and_empty(ray_session):
    from schema_validator_ray.stages.analytics import id_islands

    one = rd.from_arrow(pa.table({"id": pa.array([5, 6, 7], pa.int64())}))
    out = id_islands(one, "id").to_pandas()
    assert out.values.tolist() == [[5, 7, 3]]

    empty = rd.from_arrow(pa.table({"id": pa.array([], pa.int64())}))
    assert id_islands(empty, "id").count() == 0


def test_woe_iv_known_2bin(ray_session):
    from schema_validator_ray.stages.analytics import woe_iv

    # 8 rows, 2 bins of 4: bin1 = values 1-4 (3 pos), bin2 = 5-8 (1 pos)
    ds = rd.from_arrow(pa.table({
        "v": pa.array(range(1, 9), pa.int64()),
        "id": pa.array(range(8), pa.int64()),
        "y": pa.array([1, 1, 1, 0, 0, 0, 1, 0], pa.int64())}))
    df = woe_iv(ds, order_col="v", tiebreak="id", target_col="y", n_bins=2)
    assert list(df["bin"]) == [1, 2]
    assert list(df["n"]) == [4, 4] and list(df["n_pos"]) == [3, 1]
    woe1 = round(float(np.log((3 / 4) / (1 / 4))), 6)
    assert df["woe"].iloc[0] == woe1
    assert df["iv_term"].iloc[0] == round(float((3 / 4 - 1 / 4)
                                                * np.log(3)), 6)


def test_woe_iv_degenerate_bin_is_null(ray_session):
    from schema_validator_ray.stages.analytics import woe_iv

    # bin1 all positive -> unsmoothed WOE undefined -> NaN/null
    ds = rd.from_arrow(pa.table({
        "v": pa.array(range(1, 5), pa.int64()),
        "id": pa.array(range(4), pa.int64()),
        "y": pa.array([1, 1, 0, 0], pa.int64())}))
    df = woe_iv(ds, order_col="v", tiebreak="id", target_col="y", n_bins=2)
    assert np.isnan(df["woe"].iloc[0]) and np.isnan(df["woe"].iloc[1])


def test_mahalanobis2_matches_numpy(ray_session):
    from schema_validator_ray.stages.stats import mahalanobis2

    rng = np.random.RandomState(7)
    x = rng.randint(0, 50, 200).astype(np.int64)
    y = (x * 3 + rng.randint(0, 40, 200)).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "rid": pa.array(range(200), pa.int64()),
        "x": pa.array(x), "y": pa.array(y)}))
    out = (mahalanobis2(ds, "x", "y", keep_cols=["rid"])
           .to_pandas().sort_values("rid"))
    pts = np.stack([x, y]).astype(np.float64)
    cov = np.cov(pts, bias=True)
    inv = np.linalg.inv(cov)
    d = pts - pts.mean(axis=1, keepdims=True)
    want = np.einsum("in,ij,jn->n", d, inv, d)
    assert np.allclose(out["d2"].to_numpy(), np.round(want, 6), atol=2e-6)


def test_mahalanobis2_sum_overflows_int64(ray_session):
    """Σy² beyond int64 (the sf0.1 price-cents regime that wrapped the old
    int64 partials negative): exact big-int partials must keep the
    covariance positive and the scores equal to the numpy closed form."""
    from schema_validator_ray.stages.stats import mahalanobis2

    rng = np.random.RandomState(11)
    # y ~ 3e9 → y² ~ 9e18 ≈ int64 max; 40 rows pushes Σy² to ~3.6e20
    y = (rng.randint(0, 10**6, 40) + 3 * 10**9).astype(np.int64)
    x = rng.randint(0, 50, 40).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "rid": pa.array(range(40), pa.int64()),
        "x": pa.array(x), "y": pa.array(y)}))
    out = (mahalanobis2(ds, "x", "y", keep_cols=["rid"])
           .to_pandas().sort_values("rid"))
    pts = np.stack([x, y]).astype(np.float64)
    inv = np.linalg.inv(np.cov(pts, bias=True))
    d = pts - pts.mean(axis=1, keepdims=True)
    want = np.einsum("in,ij,jn->n", d, inv, d)
    assert np.allclose(out["d2"].to_numpy(), np.round(want, 6), atol=1e-4)


def test_mahalanobis2_element_product_overflow_path(ray_session):
    """Values whose element-wise PRODUCT exceeds int64 route through the
    exact Python-int slow path instead of wrapping."""
    from schema_validator_ray.stages.stats import mahalanobis2

    base = np.int64(4 * 10**9)  # base² = 1.6e19 > int64 max
    x = np.array([1, 2, 3, 4, 5], np.int64)
    # spread ≫ the float64 ulp at Σy² scale: the closed form (like its
    # SQL twin) cancels catastrophically when var(y) ≪ ulp(Σy²/n)
    y = base + np.array([0, 5, 1, 9, 4], np.int64) * np.int64(10**7)
    ds = rd.from_arrow(pa.table({
        "rid": pa.array(range(5), pa.int64()),
        "x": pa.array(x), "y": pa.array(y)}))
    out = (mahalanobis2(ds, "x", "y", keep_cols=["rid"])
           .to_pandas().sort_values("rid"))
    pts = np.stack([x, y]).astype(np.float64)
    inv = np.linalg.inv(np.cov(pts, bias=True))
    d = pts - pts.mean(axis=1, keepdims=True)
    want = np.einsum("in,ij,jn->n", d, inv, d)
    assert np.allclose(out["d2"].to_numpy(), np.round(want, 6), atol=1e-3)


def test_mahalanobis2_collinear_raises(ray_session):
    import pytest

    from schema_validator_ray.stages.stats import mahalanobis2

    ds = rd.from_arrow(pa.table({
        "rid": pa.array(range(4), pa.int64()),
        "x": pa.array([1, 2, 3, 4], pa.int64()),
        "y": pa.array([2, 4, 6, 8], pa.int64())}))
    with pytest.raises(ValueError, match="singular"):
        mahalanobis2(ds, "x", "y", keep_cols=["rid"])


def test_grouped_weighted_median_known(ray_session):
    from schema_validator_ray.stages.stats import grouped_weighted_median

    # group g: values 10 (w=1), 20 (w=1), 30 (w=10) -> weighted median 30;
    # unweighted median would be 20. group h: single cell.
    ds = rd.from_arrow(pa.table({
        "g": ["g", "g", "g", "h"],
        "v": pa.array([10, 20, 30, 5], pa.int64()),
        "w": pa.array([1, 1, 10, 3], pa.int64())}))
    out = grouped_weighted_median(ds, group_col="g", value_col="v",
                                  weight_col="w").to_pandas()
    got = {r.g: (r.wmedian, r.total_w) for r in out.itertuples()}
    assert got == {"g": (30, 12), "h": (5, 3)}


def test_grouped_weighted_median_even_split_lower(ray_session):
    from schema_validator_ray.stages.stats import grouped_weighted_median

    # equal halves: 2*cw at v=1 equals total -> LOWER median (1) wins
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a"],
        "v": pa.array([1, 2], pa.int64()),
        "w": pa.array([5, 5], pa.int64())}))
    out = grouped_weighted_median(ds, group_col="g", value_col="v",
                                  weight_col="w").to_pandas()
    assert out["wmedian"].iloc[0] == 1


def test_session_conversion_known(ray_session):
    from schema_validator_ray.stages.funnel import session_conversion

    # user 1 session A: view->purchase (converted, entry view);
    # user 1 session B (gap 40min): view only (not converted);
    # user 2: click->click (not converted, entry click)
    rows = [(0, 1, 0, "view"), (1, 1, 5, "purchase"),
            (2, 1, 60, "view"),
            (3, 2, 0, "click"), (4, 2, 10, "click")]
    out = session_conversion(_ev(rows), user_col="user_id", ts_col="ts",
                             type_col="event_type",
                             tiebreak_col="event_id",
                             target_type="purchase",
                             gap="30min").to_pandas()
    got = {r.entry_type: (r.n_sessions, r.n_converted, r.conv_rate)
           for r in out.itertuples()}
    assert got == {"view": (2, 1, 0.5), "click": (1, 0, 0.0)}


def test_session_conversion_entry_is_purchase(ray_session):
    from schema_validator_ray.stages.funnel import session_conversion

    # a session that ENTERS with the target converts trivially
    rows = [(0, 9, 0, "purchase")]
    out = session_conversion(_ev(rows), user_col="user_id", ts_col="ts",
                             type_col="event_type",
                             tiebreak_col="event_id",
                             target_type="purchase").to_pandas()
    assert out["n_converted"].iloc[0] == 1 and out["conv_rate"].iloc[0] == 1.0


def test_value_ks_known_and_identical(ray_session):
    from schema_validator_ray.stages.drift import value_ks

    # a: {1,2,3,4}; b: {3,4,5,6} -> max gap at v=2: |2/4 - 0/4| = 0.5
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 4 + ["b"] * 4,
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0])}))
    df = value_ks(ds, value_col="v", group_col="g", a="a", b="b")
    assert df["ks"].iloc[0] == 0.5
    assert df["n_a"].iloc[0] == 4 and df["n_b"].iloc[0] == 4

    same = rd.from_arrow(pa.table({
        "g": ["a", "b", "a", "b"], "v": pa.array([1.0, 1.0, 2.0, 2.0])}))
    df = value_ks(same, value_col="v", group_col="g", a="a", b="b")
    assert df["ks"].iloc[0] == 0.0


def test_value_ks_empty_group(ray_session):
    from schema_validator_ray.stages.drift import value_ks

    ds = rd.from_arrow(pa.table({"g": ["a", "a"], "v": [1.0, 2.0]}))
    df = value_ks(ds, value_col="v", group_col="g", a="a", b="b")
    assert len(df) == 0


def test_value_ks_matches_scipy(ray_session):
    from schema_validator_ray.stages.drift import value_ks

    rng = np.random.RandomState(3)
    va = np.round(rng.normal(0, 1, 300), 2)
    vb = np.round(rng.normal(0.4, 1.3, 200), 2)
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 300 + ["b"] * 200,
        "v": pa.array(np.r_[va, vb])}))
    df = value_ks(ds, value_col="v", group_col="g", a="a", b="b")
    # pure-numpy reference: max |F_a - F_b| over the pooled sample points
    pooled = np.sort(np.unique(np.r_[va, vb]))
    fa = np.searchsorted(np.sort(va), pooled, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), pooled, side="right") / len(vb)
    want = float(np.max(np.abs(fa - fb)))
    assert abs(df["ks"].iloc[0] - want) < 1e-6


def test_spearman_perfect_monotone_and_inverse(ray_session):
    from schema_validator_ray.stages.stats import spearman_corr

    x = pa.array([1, 2, 3, 4, 5], pa.int64())
    up = rd.from_arrow(pa.table({"x": x,
                                 "y": pa.array([10, 20, 40, 80, 160],
                                               pa.int64())}))
    assert spearman_corr(up, "x", "y")["spearman"].iloc[0] == 1.0
    dn = rd.from_arrow(pa.table({"x": x,
                                 "y": pa.array([9, 7, 5, 3, 1],
                                               pa.int64())}))
    assert spearman_corr(dn, "x", "y")["spearman"].iloc[0] == -1.0


def test_spearman_ties_midrank_formula(ray_session):
    from schema_validator_ray.stages.stats import spearman_corr

    # hand check vs the midrank definition with ties in both columns
    xs = np.array([1, 1, 2, 3, 3, 3], dtype=np.int64)
    ys = np.array([5, 5, 5, 7, 7, 9], dtype=np.int64)

    def midranks(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r

    rx, ry = midranks(xs), midranks(ys)
    want = np.corrcoef(rx, ry)[0, 1]
    ds = rd.from_arrow(pa.table({"x": pa.array(xs), "y": pa.array(ys)}))
    got = spearman_corr(ds, "x", "y")["spearman"].iloc[0]
    assert abs(got - want) < 1e-6


def test_vocab_jaccard_known_sets(ray_session):
    from schema_validator_ray.functions.text import vocab_jaccard_by_group

    # a: {red, green, blue}; b: {blue, red, pink}; c: {zzz}
    ds = rd.from_arrow(pa.table({
        "source": ["a", "a", "b", "c"],
        "text": ["Red green BLUE", "red", "blue red. pink", "zzz"]}))
    df = vocab_jaccard_by_group(ds, "text", "source")
    got = {(r.source_a, r.source_b):
           (r.n_a, r.n_b, r.n_shared, r.jaccard)
           for r in df.itertuples()}
    # shared {red, blue} of union {red, green, blue, pink} -> 2/4
    assert got == {("a", "b"): (3, 3, 2, 0.5)}   # c shares nothing


def test_systematic_sample_every_k(ray_session):
    from schema_validator_ray.stages.sampling import systematic_sample

    ds = rd.from_arrow(pa.table({
        "k": pa.array(range(100, 0, -1), pa.int64())}))
    out = (systematic_sample(ds, "k", k=10, offset=1)
           .to_pandas().sort_values("pos"))
    assert list(out["pos"]) == [1, 11, 21, 31, 41, 51, 61, 71, 81, 91]
    assert list(out["k"]) == [1, 11, 21, 31, 41, 51, 61, 71, 81, 91]


def test_km_survival_hand_computed(ray_session):
    from schema_validator_ray.stages.funnel import km_survival

    # days-scale fabricated "orders": corpus max = day 100.
    # u1: d0..d10 (t=10, last<=93 -> death); u2: d0..d5 (t=5, death);
    # u3: d50..d60 (t=10, death at 60<=93); u4: d90..d100 (t=10, censored)
    D = 1440  # minutes per day
    rows = [(0, 1, 0, "x"), (1, 1, 10 * D, "x"),
            (2, 2, 0, "x"), (3, 2, 5 * D, "x"),
            (4, 3, 50 * D, "x"), (5, 3, 60 * D, "x"),
            (6, 4, 90 * D, "x"), (7, 4, 100 * D, "x")]
    df = km_survival(_ev(rows), user_col="user_id", ts_col="ts",
                     censor_days=7)
    # death times: t=5 (n_risk 4, d 1), t=10 (n_risk 3, d 2)
    assert list(df["t_days"]) == [5, 10]
    assert list(df["n_risk"]) == [4, 3]
    assert list(df["n_events"]) == [1, 2]
    assert list(df["surv"]) == [0.75, round(0.75 * (1 / 3), 6)]


def test_km_survival_all_censored_empty(ray_session):
    from schema_validator_ray.stages.funnel import km_survival

    rows = [(0, 1, 0, "x"), (1, 1, 10, "x")]   # everyone near corpus end
    df = km_survival(_ev(rows), user_col="user_id", ts_col="ts",
                     censor_days=7)
    assert len(df) == 0


def test_blocking_key_audit_known(ray_session):
    from schema_validator_ray.stages.uniqueness import blocking_key_audit

    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "x", "y"],
        "b": [1, 1, 2, 2]}))
    df = blocking_key_audit(ds, {"a": ["a"], "ab": ["a", "b"]})
    got = {r.key_name: (r.n_blocks, r.n_pairs, r.max_block)
           for r in df.itertuples()}
    # a: blocks {x:3, y:1} -> pairs 3+0; ab: {x1:2, x2:1, y2:1} -> 1
    assert got == {"a": (2, 3, 3), "ab": (3, 1, 2)}


def test_bipartite_degree_census_known(ray_session):
    from schema_validator_ray.stages.graph import bipartite_degree_census

    # parts p1:{s1,s2}, p2:{s1}; supps s1:{p1,p2}, s2:{p1}; dup edge noise
    ds = rd.from_arrow(pa.table({
        "p": ["p1", "p1", "p2", "p1"],
        "s": ["s1", "s2", "s1", "s1"]}))
    out = bipartite_degree_census(ds, "p", "s").to_pandas()
    got = {(r.side, r.degree): r.n_nodes for r in out.itertuples()}
    assert got == {("p", 2): 1, ("p", 1): 1, ("s", 2): 1, ("s", 1): 1}


def test_rare_level_coverage_known(ray_session):
    from schema_validator_ray.stages.stats import rare_level_coverage

    # 98 'a' + 1 'b' + 1 'c': a covers 98% < 99 -> k99 = 2 (a + b by tie
    # order); uniform 4 levels at pct=50 -> k = 2
    skew = rd.from_arrow(pa.table({"v": ["a"] * 98 + ["b", "c"]}))
    df = rare_level_coverage([("skew", skew, "v")], pct=99)
    assert df.values.tolist() == [["skew", 3, 2]]

    uni = rd.from_arrow(pa.table({"v": ["a", "b", "c", "d"]}))
    df = rare_level_coverage([("uni", uni, "v")], pct=50)
    assert df.values.tolist() == [["uni", 4, 2]]


def test_join_cardinality_report_known(ray_session):
    from schema_validator_ray.stages.joins import join_cardinality_report

    # left keys: a x3, b x2, c x1; right: a x2, b x1, d x5
    left = rd.from_arrow(pa.table({"k": list("aaabbc")}))
    right = rd.from_arrow(pa.table({"k": list("aabddddd")}))
    df = join_cardinality_report(left, right, "k")
    # a: 3*2=6, b: 2*1=2 -> est 8, 2 matched keys, max 6
    assert df.values.tolist() == [[8, 2, 6]]


def test_join_cardinality_report_disjoint(ray_session):
    from schema_validator_ray.stages.joins import join_cardinality_report

    left = rd.from_arrow(pa.table({"k": ["x"]}))
    right = rd.from_arrow(pa.table({"k": ["y"]}))
    df = join_cardinality_report(left, right, "k")
    assert df.values.tolist() == [[0, 0, 0]]


def test_chi2_residuals_uniform_zero(ray_session):
    from schema_validator_ray.stages.stats import chi2_residuals

    # perfectly independent 2x2 -> every expected == observed, resid 0
    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "y", "y"], "b": ["0", "1", "0", "1"]}))
    out = chi2_residuals(ds, "a", "b").to_pandas()
    assert len(out) == 4
    assert (out["resid"] == 0.0).all() and (out["e"] == 1.0).all()


def test_chi2_residuals_hand_value(ray_session):
    from schema_validator_ray.stages.stats import chi2_residuals

    # cells: (x,0)=3, (x,1)=1, (y,0)=1, (y,1)=3; n=8, marginals all 4
    ds = rd.from_arrow(pa.table({
        "a": ["x"] * 4 + ["y"] * 4,
        "b": ["0", "0", "0", "1", "0", "1", "1", "1"]}))
    out = chi2_residuals(ds, "a", "b").to_pandas()
    got = {(r.a, r.b): (r.o, r.e, r.resid) for r in out.itertuples()}
    want_r = round((3 - 2.0) / np.sqrt(2.0), 6)
    assert got[("x", "0")] == (3, 2.0, want_r)
    assert got[("x", "1")] == (1, 2.0, -want_r)
