import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pythongis_ray import relational as rel

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/lineitem.parquet")


def test_groupby_aggregate_algebraic(ray_session, lineitem):
    out = rel.groupby_aggregate(
        lineitem, ["l_returnflag", "l_linestatus"],
        [("sum_qty", "l_quantity", "sum"),
         ("cnt", "l_orderkey", "count"),
         ("min_qty", "l_quantity", "min"),
         ("max_qty", "l_quantity", "max"),
         ("avg_qty", "l_quantity", "mean")],
    ).to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    pdf = pd.read_parquet(f"{SF}/lineitem.parquet")
    exp = (pdf.groupby(["l_returnflag", "l_linestatus"])
           .agg(sum_qty=("l_quantity", "sum"), cnt=("l_orderkey", "count"),
                min_qty=("l_quantity", "min"), max_qty=("l_quantity", "max"))
           .reset_index().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True))
    exp["avg_qty"] = exp.sum_qty / exp.cnt
    pd.testing.assert_frame_equal(
        out[exp.columns.tolist()].astype({"cnt": np.int64}), exp.astype({"cnt": np.int64}))


def test_groupby_aggregate_holistic(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b"],
        "ord": [3, 1, 2, 10, 9],
        "v": [5.0, 7.0, 5.0, None, 4.0],
        "s": ["x", "y", "x", "z", "z"],
    })
    out = rel.groupby_aggregate(
        rd.from_pandas(df), "k",
        [("first_v", "v", "first"), ("last_v", "v", "last"),
         ("maj_s", "s", "majority"), ("min_s", "s", "minority"),
         ("cat_s", "s", "concat:|")],
        order_col="ord",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    a = out[out.k == "a"].iloc[0]
    assert a.first_v == 7.0  # ord=1 row
    assert a.last_v == 5.0   # ord=3 row
    assert a.maj_s == "x" and a.min_s == "y"
    assert a.cat_s == "y|x|x"
    b = out[out.k == "b"].iloc[0]
    assert b.first_v == 4.0  # None dropped
    assert b.maj_s == "z"


def test_all_missing_group_sum_is_null(ray_session):
    """SQL SUM semantics on BOTH aggregate paths: a group whose values
    are all missing yields NULL, not 0 (round-1 advisor: the partial
    combine used pandas' default min_count=0)."""
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", "a", "b", "b"],
                       "v": [1.0, 2.0, None, None]})
    out = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                [("s", "v", "sum")]) \
        .to_pandas().set_index("k")
    assert out.loc["a", "s"] == 3.0
    assert pd.isna(out.loc["b", "s"])


def test_multi_column_order_col(ray_session):
    """order_col as a list: (ts, id) pair ordering without a derived
    combined key (which can overflow int64)."""
    import ray.data as rd

    big = 1_700_000_000_000_000  # epoch-us scale, like the events table
    df = pd.DataFrame({
        "k": ["a"] * 4,
        "ts": [big, big, big + 1, big + 1],
        "id": [2, 1, 2, 1],
        "v": [10.0, 20.0, 30.0, 40.0],
    })
    out = rel.groupby_aggregate(
        rd.from_pandas(df), "k",
        [("first_v", "v", "first"), ("last_v", "v", "last")],
        order_col=["ts", "id"]).to_pandas().iloc[0]
    assert out.first_v == 20.0  # (big, 1)
    assert out.last_v == 30.0   # (big+1, 2)


def test_majority_tiebreak_smallest(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1, 1, 1], "v": ["b", "a", "a", "b"], "o": range(4)})
    out = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                [("m", "v", "majority")], order_col="o").to_pandas()
    assert out.m.iloc[0] == "a"


def test_hash_join_broadcast(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    out = rel.hash_join(orders, cust, on="o_custkey_join", how="inner") \
        if False else None
    # join on differing key names → pre-rename
    cust2 = cust.rename(columns={"c_custkey": "o_custkey"})
    out = rel.hash_join(orders, cust2[["o_custkey", "c_mktsegment"]],
                        on="o_custkey").to_pandas()
    exp = pd.read_parquet(f"{SF}/orders.parquet").merge(
        cust2[["o_custkey", "c_mktsegment"]], on="o_custkey")
    assert len(out) == len(exp)
    assert out.c_mktsegment.value_counts().to_dict() == exp.c_mktsegment.value_counts().to_dict()


def test_join_large_matches_broadcast(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust_pd = pd.read_parquet(f"{SF}/customer.parquet").rename(
        columns={"c_custkey": "o_custkey"})[["o_custkey", "c_acctbal"]]
    bc = rel.hash_join(orders, cust_pd, on="o_custkey").to_pandas()
    lg = rel.join_large(orders, rd.from_pandas(cust_pd), on="o_custkey").to_pandas()
    k = lambda d: sorted(zip(d.o_orderkey.astype(int), d.c_acctbal.round(2)))
    assert k(bc) == k(lg)


def test_dedup(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1, 2, 2, 3], "o": [5, 2, 1, 9, 4], "v": list("abcde")})
    out = rel.dedup(rd.from_pandas(df), "k", order_col="o").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out.v.tolist() == ["b", "c", "e"]


def test_moving_window(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"g": [1] * 5, "t": [1, 2, 3, 4, 5], "v": [2.0, 4.0, 6.0, 8.0, 10.0]})
    out = rel.moving_window(rd.from_pandas(df), "g", "t", "v", 3, "mean") \
        .to_pandas().sort_values("t")
    assert out.v_mean3.tolist() == [2.0, 3.0, 4.0, 6.0, 8.0]


def test_merge_schema_harmonization(ray_session):
    import ray.data as rd

    a = rd.from_pandas(pd.DataFrame({"x": [1, 2], "y": ["p", "q"]}))
    b = rd.from_pandas(pd.DataFrame({"x": [3], "z": [9.5]}))
    out = rel.merge(a, b).to_pandas().sort_values("x").reset_index(drop=True)
    assert set(out.columns) == {"x", "y", "z"}
    assert out.y.isna().tolist() == [False, False, True]
    assert out.z.isna().tolist() == [True, True, False]


def test_split_by_class(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"v": [0.5, 10.0, 25.0, 49.9, 50.0]})
    breaks = rel.equal_breaks(0, 50, 5)
    out = rel.split_by_class(rd.from_pandas(df), "v", breaks).to_pandas()
    assert out["class"].tolist() == [0, 0, 2, 4, 4]


def test_hopping_window(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", "a", "a"], "ts": [5, 15, 25],
                       "v": [1.0, 10.0, 100.0]})
    out = rel.hopping_window(rd.from_pandas(df), "k", "ts", size=20, hop=10,
                             specs=[("n", "v", "count"), ("s", "v", "sum")]) \
        .to_pandas().sort_values("win_start").reset_index(drop=True)
    # ts=5 -> windows starting -10, 0; ts=15 -> 0, 10; ts=25 -> 10, 20
    assert out.win_start.tolist() == [-10, 0, 10, 20]
    assert out.n.tolist() == [1, 2, 2, 1]
    assert out.s.tolist() == [1.0, 11.0, 110.0, 100.0]


def test_hopping_window_rejects_bad_hop(ray_session):
    import pytest
    import ray.data as rd

    df = pd.DataFrame({"k": ["a"], "ts": [0], "v": [1.0]})
    with pytest.raises(ValueError):
        rel.hopping_window(rd.from_pandas(df), "k", "ts", size=25, hop=10,
                           specs=[("n", "v", "count")])


def test_running_sum(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a", "a", "b", "a"], "o": [2, 1, 1, 3],
                       "v": [10, 20, 5, 30]})
    out = rel.running_sum(rd.from_pandas(df), "k", "o", "v") \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert out.running_sum.tolist() == [20, 30, 60, 5]


def test_global_rank_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": np.arange(5000),
                       "v": rng.integers(0, 300, 5000)})
    out = rel.add_global_rank(rd.from_pandas(df), ["v", "id"],
                              num_buckets=16).to_pandas()
    exp = df.sort_values(["v", "id"], kind="stable").reset_index(drop=True)
    exp["rank"] = np.arange(1, len(exp) + 1)
    got = out.sort_values("rank").reset_index(drop=True)
    assert got.id.tolist() == exp.id.tolist()
    # descending too
    outd = rel.add_global_rank(rd.from_pandas(df), ["v", "id"],
                               descending=True, num_buckets=16).to_pandas()
    expd = df.sort_values(["v", "id"], ascending=False, kind="stable")
    assert outd.sort_values("rank").id.tolist() == expd.id.tolist()


def test_quantile_stat(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["a"] * 6, "v": [10, 20, 30, 40, 50, 60]})
    out = rel.groupby_aggregate(rd.from_pandas(df), "k",
                                [("p25", "v", "quantile:0.25"),
                                 ("p75", "v", "quantile:0.75")]).to_pandas()
    # DuckDB quantile_disc convention: sorted[ceil(q*n)-1]
    assert out.p25.iloc[0] == 20 and out.p75.iloc[0] == 50


def _asof_expected(ldf, rdf, direction="backward", tolerance=None,
                   how="left"):
    lg = ldf.sort_values("t", kind="mergesort")
    rg = rdf.sort_values(["t", "rv"], kind="mergesort")
    out = pd.merge_asof(lg, rg, on="t", by="k", direction=direction,
                        tolerance=tolerance)
    if how == "inner":
        out = out[out["rv"].notna()].copy()
        out["rv"] = out["rv"].astype("int64")
    return out.sort_values(["k", "t", "lid"]).reset_index(drop=True)


def test_asof_join_directions(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    ldf = pd.DataFrame({"k": rng.integers(0, 20, 400),
                        "t": rng.integers(0, 1000, 400).astype("int64"),
                        "lid": np.arange(400)})
    rdf = pd.DataFrame({"k": rng.integers(0, 25, 300),
                        "t": rng.integers(0, 1000, 300).astype("int64"),
                        "rv": rng.integers(0, 10**6, 300).astype("int64")})
    # dedupe right on (k, t) keeping max rv — the tie_cols contract
    for direction in ("backward", "forward", "nearest"):
        got = rel.asof_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf),
            left_on="t", right_on="t", left_by="k", right_by="k",
            right_cols=["rv"], tie_cols=["rv"], direction=direction,
            how="inner", num_buckets=8,
        ).to_pandas().sort_values(["k", "t", "lid"]).reset_index(drop=True)
        rmax = rdf.groupby(["k", "t"], as_index=False)["rv"].max()
        exp = _asof_expected(ldf, rmax, direction=direction, how="inner")
        pd.testing.assert_frame_equal(
            got[["k", "t", "lid", "rv"]], exp[["k", "t", "lid", "rv"]])


def test_asof_join_left_and_tolerance(ray_session):
    import ray.data as rd

    ldf = pd.DataFrame({"k": [1, 1, 2, 3], "t": [5, 50, 7, 9],
                        "lid": [0, 1, 2, 3]})
    rdf = pd.DataFrame({"k": [1, 1, 2], "t": [3, 10, 100],
                        "rv": [30, 100, 999]})
    got = rel.asof_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                        left_on="t", right_on="t", left_by="k",
                        right_by="k", right_cols=["rv"], tolerance=4,
                        how="left", num_buckets=4) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    # lid0: t=5, nearest-before within 4 is t=3 -> 30; lid1: t=50,
    # before is t=10 but |50-10|>4 -> NaN; lid2/3: no right within tol
    assert got.rv.iloc[0] == 30
    assert got.rv.isna().tolist() == [False, True, True, True]


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(13)
    ldf = pd.DataFrame({"k": rng.integers(0, 15, 500),
                        "t": rng.integers(0, 500, 500).astype("int64"),
                        "lid": np.arange(500)})
    s = rng.integers(0, 500, 200).astype("int64")
    rdf = pd.DataFrame({"k": rng.integers(0, 18, 200), "s": s,
                        "e": s + rng.integers(1, 60, 200),
                        "rid": np.arange(200)})
    for closed in ("left", "both"):
        got = rel.interval_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf), left_by="k",
            right_by="k", left_time="t", right_start="s", right_end="e",
            right_cols=["rid"], closed=closed, num_buckets=8,
        ).to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
        m = ldf.merge(rdf, on="k")
        keep = (m.t >= m.s) & ((m.t <= m.e) if closed == "both"
                               else (m.t < m.e))
        exp = m[keep].sort_values(["lid", "rid"]).reset_index(drop=True)
        assert got.lid.tolist() == exp.lid.tolist()
        assert got.rid.tolist() == exp.rid.tolist()


def test_interval_join_empty_side(ray_session):
    import ray.data as rd

    ldf = pd.DataFrame({"k": [1, 2], "t": [5, 6], "lid": [0, 1]})
    rdf = pd.DataFrame({"k": [9], "s": [0], "e": [10], "rid": [0]})
    got = rel.interval_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                            left_by="k", right_by="k", left_time="t",
                            right_start="s", right_end="e",
                            right_cols=["rid"], num_buckets=4).to_pandas()
    # no rows anywhere: the empty per-bucket frames must not crash the
    # pipeline (Ray drops the schema of an all-empty pandas dataset, so
    # only the row count is asserted)
    assert len(got) == 0


def test_bloom_check_superset_and_fp_rate(ray_session):
    from pythongis_ray import relational as rel

    rng = np.random.default_rng(7)
    members = rng.choice(10**9, 5000, replace=False).astype(np.int64)
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": pa.array(members)}))
    bits = rel.bloom_build(ds, "k", nhash=4, log2_bits=20)
    # every member passes (no false negatives)
    assert rel.bloom_check(bits, members).all()
    # false-positive rate near (1 - e^{-kn/m})^k ~ 1.2e-5 at these params
    probe = rng.choice(10**9, 20000, replace=False).astype(np.int64)
    probe = probe[~np.isin(probe, members)]
    fp = rel.bloom_check(bits, probe).mean()
    assert fp < 0.01


def test_bloom_semi_join_exact(ray_session):
    from pythongis_ray import relational as rel
    import ray.data as rd

    rng = np.random.default_rng(11)
    big_keys = rng.integers(0, 300, 5000).astype(np.int64)
    big = rd.from_arrow(pa.table({
        "k": pa.array(big_keys),
        "v": pa.array(np.arange(5000, dtype=np.int64))}))
    small_keys = np.unique(rng.integers(0, 300, 80)).astype(np.int64)
    # duplicate keys on the small side must not duplicate output rows
    dup = np.concatenate([small_keys, small_keys[:10]])
    small = rd.from_arrow(pa.table({"sk": pa.array(dup)}))
    out = rel.bloom_semi_join(big, small, key="k", small_key="sk") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    exp_mask = np.isin(big_keys, small_keys)
    assert len(out) == int(exp_mask.sum())
    assert (out.v.to_numpy() == np.arange(5000)[exp_mask]).all()
    assert set(out.columns) == {"k", "v"}


def test_windowed_distinct_matches_pandas(ray_session):
    """Hopping-window COUNT DISTINCT == pandas expand/dedup/nunique."""
    import ray.data as rd

    from pythongis_ray import relational as rel

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c"], n),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
        "user": rng.integers(0, 25, n).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    got = rel.windowed_distinct(ds, "grp", "ts", size=100, hop=50,
                                user_col="user", out_col="nu") \
        .to_pandas().sort_values(["grp", "win_start"]) \
        .reset_index(drop=True)

    rows = []
    for k in (0, 1):
        e = df.copy()
        e["win_start"] = (e["ts"] // 50 - k) * 50
        rows.append(e)
    exp = (pd.concat(rows).groupby(["grp", "win_start"])["user"]
           .nunique().rename("nu").reset_index()
           .sort_values(["grp", "win_start"]).reset_index(drop=True))
    assert got["grp"].tolist() == exp["grp"].tolist()
    assert got["win_start"].tolist() == exp["win_start"].tolist()
    assert got["nu"].tolist() == exp["nu"].tolist()
