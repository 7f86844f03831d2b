"""Query registry: every operator exposed as `fn(sf_dir)` + DuckDB oracle SQL.

This is the driver-facing correctness surface (`__ray_entry__.queries` /
`oracle_sql`). Each entry exercises one operator family from SURVEY.md §2
on the driver's parquet tables; the SQL string computes the *same* result
in DuckDB — bit-exact by construction (integer arithmetic + dyadic
lattice coordinates + single-division means; see fixtures.py).

Entries without SQL (IVF training, geodetic/projection
transcendentals, raster warp/resample value paths) are
non-SQL-expressible; the driver records rows-only checks for those.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pythongis_ray import embed, fixtures, grid, pipelines, relational as rel, spatial, text
from pythongis_ray.geom import geodesy

# --------------------------------------------------------------- helpers

def _rd():
    import ray.data as rd
    return rd


def points_lineitem(sf_dir: str, replicate: int = 1):
    """lineitem → geocoded point Dataset (pk, qty, ix, iy, lon, lat).

    ``replicate`` deterministically upsamples rows (pk' = pk*R + r) for
    benchmark scale — never used by the oracle-checked queries."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def to_points(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = ok * 8 + ln
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        if replicate > 1:
            idx = np.repeat(np.arange(len(pk), dtype=np.int64), replicate)
            rep = np.tile(np.arange(replicate, dtype=np.int64), len(pk))
            pk = pk[idx] * replicate + rep
            qty = qty[idx]
        ix, iy = fixtures.geocode_units(pk)
        lon, lat = fixtures.units_to_deg(ix, iy)
        return pa.table({"pk": pk, "qty": qty, "ix": ix, "iy": iy,
                         "lon": lon, "lat": lat})

    return ds.map_batches(to_points, batch_format="pyarrow", batch_size=16384)


def SQL_PTS_LINEITEM():
    src = ("(SELECT l_orderkey*8+l_linenumber AS pk, "
           "CAST(l_quantity AS BIGINT) AS qty FROM lineitem)")
    g = fixtures.sql_geocode("pk").replace("__SRC__", src)
    return f"SELECT pk, qty, ix, iy, {fixtures.SQL_UNITS_TO_DEG} FROM ({g}) _pts"


def _keyed_points(sf_dir: str, table: str, key_col: str, mult: int, add: int,
                  out_key: str):
    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=[key_col])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = k * mult + add
        ix, iy = fixtures.geocode_units(key)
        lon, lat = fixtures.units_to_deg(ix, iy)
        return pa.table({out_key: key, "lon": lon, "lat": lat})

    return ds.map_batches(to_points, batch_format="pyarrow", batch_size=65536)


def _sql_keyed_points(table: str, key_col: str, mult: int, add: int, out_key: str):
    src = f"(SELECT {key_col}*{mult}+{add} AS {out_key} FROM {table})"
    g = fixtures.sql_geocode(out_key).replace("__SRC__", src)
    return f"SELECT {out_key}, ix, iy, {fixtures.SQL_UNITS_TO_DEG} FROM ({g}) _kp"


# --------------------------------------------------------- query functions

def q_agg_pricing(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate (partial-combine path)."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_linestatus", "l_quantity",
                                     "l_extendedprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        return batch.append_column("price_cents", pa.array(c))

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
    out = rel.groupby_aggregate(
        ds, ["l_returnflag", "l_linestatus"],
        [("sum_qty", "l_quantity", "sum"), ("cnt", "l_quantity", "count"),
         ("min_qty", "l_quantity", "min"), ("max_qty", "l_quantity", "max"),
         ("avg_qty", "l_quantity", "mean"),
         ("sum_price_cents", "price_cents", "sum")])

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["sum_price_cents"] = batch["sum_price_cents"].astype(np.int64)
        return batch

    return out.map_batches(fix, batch_format="pandas")


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(COUNT(l_quantity) AS BIGINT) AS cnt,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_join_segment(sf_dir: str):
    """Broadcast hash join orders×customer + grouped aggregate."""
    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .rename(columns={"c_custkey": "o_custkey"})

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        return batch.append_column("total_cents", pa.array(c))

    joined = rel.hash_join(orders.map_batches(cents, batch_format="pyarrow"),
                           cust, on="o_custkey")
    out = rel.groupby_aggregate(
        joined, "c_mktsegment",
        [("n_orders", "o_custkey", "count"), ("sum_total_cents", "total_cents", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_total_cents"] = b["sum_total_cents"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_JOIN_SEGMENT = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join_large(sf_dir: str):
    """Partitioned (shuffle) hash join lineitem×orders + aggregate."""
    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda b: b.rename_columns(["l_orderkey", "o_orderpriority"]),
                     batch_format="pyarrow")
    joined = rel.join_large(li, orders, on="l_orderkey")
    return rel.groupby_aggregate(
        joined, "o_orderpriority",
        [("n_items", "l_orderkey", "count"), ("sum_qty", "l_quantity", "sum")])


SQL_JOIN_LARGE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       SUM(l_quantity) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_topk_orders(sf_dir: str):
    """sort + limit (top-k), deterministic tie-break."""
    ds = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
    return ds.sort([("o_totalprice"), ("o_orderkey")],
                   descending=[True, False]).limit(10)


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct_flags(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_linestatus"])
    out = rel.groupby_aggregate(ds, ["l_returnflag", "l_linestatus"],
                                [("n", "l_returnflag", "count")])
    return out.select_columns(["l_returnflag", "l_linestatus"])


SQL_DISTINCT_FLAGS = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_dedup_docs(sf_dir: str):
    """Exact content dedup: fingerprint → keep min id per content."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ds = ds.map_batches(text.fingerprint, batch_format="pyarrow", batch_size=4096)
    out = rel.groupby_aggregate(ds, "fp", [("doc_id", "doc_id", "min"),
                                           ("n_copies", "doc_id", "count")])
    return out.select_columns(["doc_id", "n_copies"])


SQL_DEDUP_DOCS = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text
"""


def q_window_events(sf_dir: str):
    """Tumbling 1-minute window per user (event-time bucketing)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        cents = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        t = pa.table({"user_id": batch["user_id"],
                      "minute": pa.array(us // 60_000_000),
                      "cents": pa.array(cents)})
        return t

    ds = ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
    out = rel.groupby_aggregate(ds, ["user_id", "minute"],
                                [("n_events", "cents", "count"),
                                 ("sum_cents", "cents", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_cents"] = b["sum_cents"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_WINDOW_EVENTS = """
SELECT user_id, epoch_us(ts) // 60000000 AS minute,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY user_id, epoch_us(ts) // 60000000
"""


def q_moving_avg(sf_dir: str):
    """Ordered trailing-3 window per user (order-dependent operator)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({"event_id": batch["event_id"], "user_id": batch["user_id"],
                         "ts_us": pa.array(us), "cents": pa.array(c)})

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
    out = rel.moving_window(ds, "user_id", ["ts_us", "event_id"], "cents", 3,
                            "mean", out_col="avg3_cents")
    return out.select_columns(["event_id", "avg3_cents"])


SQL_MOVING_AVG = """
SELECT event_id,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS avg3_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_hopping_window(sf_dir: str):
    """Hopping event-time windows (2-minute windows, 1-minute hop —
    every event lands in two windows)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        cents = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"user_id": batch["user_id"], "ts_us": pa.array(us),
                         "cents": pa.array(cents)})

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = rel.hopping_window(ds, "user_id", "ts_us",
                             size=120_000_000, hop=60_000_000,
                             specs=[("n_events", "cents", "count"),
                                    ("sum_cents", "cents", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_cents"] = b["sum_cents"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_HOPPING_WINDOW = """
SELECT user_id, (epoch_us(ts) // 60000000 - k) * 60000000 AS win_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) _k
GROUP BY user_id, (epoch_us(ts) // 60000000 - k) * 60000000
"""


def q_embed_neardup(sf_dir: str):
    """Exact embedding near-dup pairs: quantized dot ≥ 400000
    (cosine ≈ 0.4 on the unit-normalized fixture embeddings).
    Distributed 1-Bucket-Theta block self-join — no driver-side
    corpus materialization (r2 used a whole-corpus broadcast)."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    return rel.driver_safe(
        embed.neardup_pairs_blocked(emb, threshold=400_000),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("score", pa.int64())]))


SQL_EMBED_NEARDUP = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS q
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_dot_product(a.q, b.q) AS BIGINT) AS score
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.q, b.q) >= 400000
"""


def q_moving_median(sf_dir: str):
    """Holistic trailing-window stat (full fieldmapping vocabulary in
    moving_window — reference data.py:679-688)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({"event_id": batch["event_id"], "user_id": batch["user_id"],
                         "ts_us": pa.array(us), "cents": pa.array(c)})

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
    out = rel.moving_window(ds, "user_id", ["ts_us", "event_id"], "cents", 5,
                            "median", out_col="med5")
    return out.select_columns(["event_id", "med5"])


SQL_MOVING_MEDIAN = """
SELECT event_id,
       median(CAST(round(value*100) AS BIGINT)) OVER w AS med5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_moving_concat(sf_dir: str):
    """Ordered trailing-window concat (holistic, order-dependent)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return batch.append_column("ts_us", pa.array(us))

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = rel.moving_window(ds, "user_id", ["ts_us", "event_id"], "event_type",
                            3, "concat:|", out_col="cat3")
    return out.select_columns(["event_id", "cat3"])


SQL_MOVING_CONCAT = """
SELECT event_id,
       string_agg(event_type, '|') OVER w AS cat3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_majority_events(sf_dir: str):
    """Holistic stats: majority/minority/first/last/concat per user."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        # order by the (ts, event_id) PAIR — a combined ts_us*K+id key
        # would overflow int64 (ts_us ~ 1.7e15), violating the
        # exactness discipline
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return batch.append_column("ts_us", pa.array(us))

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return rel.groupby_aggregate(
        ds, "user_id",
        [("maj_type", "event_type", "majority"),
         ("min_type", "event_type", "minority"),
         ("first_val", "value", "first"), ("last_val", "value", "last"),
         ("types_cat", "event_type", "concat:|")],
        order_col=["ts_us", "event_id"])


SQL_MAJORITY_EVENTS = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2
), ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rmaj,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt ASC, event_type) AS rmin
  FROM c
)
SELECT e.user_id,
       (SELECT event_type FROM ranked r WHERE r.user_id = e.user_id AND rmaj = 1) AS maj_type,
       (SELECT event_type FROM ranked r WHERE r.user_id = e.user_id AND rmin = 1) AS min_type,
       first(e.value ORDER BY e.ts, e.event_id) AS first_val,
       last(e.value ORDER BY e.ts, e.event_id) AS last_val,
       string_agg(e.event_type, '|' ORDER BY e.ts, e.event_id) AS types_cat
FROM events e GROUP BY e.user_id
"""


def q_global_rank(sf_dir: str):
    """Distributed exact global row_number (two-pass range ranking)."""
    ds = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "cents": pa.array(c)})

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
    out = rel.add_global_rank(ds, ["cents", "o_orderkey"], out_col="rnk",
                              descending=True)
    return out.select_columns(["o_orderkey", "rnk"])


SQL_GLOBAL_RANK = """
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY CAST(round(o_totalprice*100) AS BIGINT)
                          DESC, o_orderkey DESC) AS rnk
FROM orders
"""


def q_running_sum(sf_dir: str):
    """Per-user running sum of event value (unbounded-preceding
    frame), exact integer cents."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts_us": pa.array(us), "cents": pa.array(c)})

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = rel.running_sum(ds, "user_id", ["ts_us", "event_id"], "cents",
                          out_col="run_cents")
    return out.select_columns(["event_id", "run_cents"])


SQL_RUNNING_SUM = """
SELECT event_id,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
FROM events
"""


def q_quantiles(sf_dir: str):
    """Discrete quantiles per group (quantile_disc semantics:
    sorted[ceil(q*n) - 1] — probed in relational.py; at q=0.25/0.75
    this coincides with floor((n-1)q) for every n, at q=0.9 it does
    not — see q_arrival_gaps)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "cents": pa.array(c)})

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
    return rel.groupby_aggregate(
        ds, "event_type",
        [("p25", "cents", "quantile:0.25"),
         ("p75", "cents", "quantile:0.75")])


SQL_QUANTILES = """
SELECT event_type,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.25) AS p25,
       quantile_disc(CAST(round(value*100) AS BIGINT), 0.75) AS p75
FROM events GROUP BY event_type
"""


def q_merge_union(sf_dir: str):
    """Union-all of two tables + groupby count (merge operator)."""
    o = _rd().read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"]) \
        .map_batches(lambda b: b.rename_columns(["key"]), batch_format="pyarrow")
    l = _rd().read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]) \
        .map_batches(lambda b: b.rename_columns(["key"]), batch_format="pyarrow")
    merged = rel.merge(o, l)
    return rel.groupby_aggregate(merged, "key", [("n_rows", "key", "count")])


SQL_MERGE_UNION = """
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows FROM (
  SELECT o_orderkey AS key FROM orders
  UNION ALL SELECT l_orderkey FROM lineitem
) GROUP BY key
"""


def q_filter_revenue(sf_dir: str):
    """filter + computed column + aggregate (exact integer revenue)."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_shipdate",
                                     "l_extendedprice", "l_discount"])
    cutoff = np.datetime64("1995-06-01", "us")

    def prep(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship < cutoff
        batch = batch.filter(pa.array(keep))
        cents = np.rint(batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        disc = np.rint(batch["l_discount"].to_numpy(zero_copy_only=False)
                       * 100.0).astype(np.int64)
        rev = cents * (100 - disc)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "rev": pa.array(rev)})

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = rel.groupby_aggregate(ds, "l_returnflag",
                                [("n", "rev", "count"), ("revenue_u", "rev", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue_u"] = b["revenue_u"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_FILTER_REVENUE = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_u
FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
GROUP BY l_returnflag
"""


def q_classify_quantity(sf_dir: str):
    """Equal-interval classification (classypie 'equal' breaks)."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def classify(batch: pa.Table) -> pa.Table:
        v = batch["l_quantity"].to_numpy(zero_copy_only=False)
        cls = np.minimum(np.floor(v / 10.0), 4.0).astype(np.int64)
        return pa.table({"class": pa.array(cls)})

    ds = ds.map_batches(classify, batch_format="pyarrow", batch_size=65536)
    return rel.groupby_aggregate(ds, "class", [("n", "class", "count")])


SQL_CLASSIFY_QUANTITY = """
SELECT CAST(LEAST(FLOOR(l_quantity / 10.0), 4.0) AS BIGINT) AS class,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1
"""


# ------------------------------------------------------------ spatial set

def q_spjoin_rect_pairs(sf_dir: str):
    """Flagship spatial join (broadcast path): point-in-polygon pairs."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    joined = spatial.spatial_join(pts, zones[["zone_id", "geometry"]],
                                  predicate="within")
    return joined.select_columns(["pk", "zone_id"])


def SQL_SPJOIN_RECT_PAIRS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT pk, zone_id FROM pts JOIN z
  ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
"""


def q_spjoin_rect_pairs_shuffle(sf_dir: str):
    """Same join via the salted groupby-shuffle path (same oracle)."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    zds = _rd().from_pandas(zones[["zone_id", "geometry"]])
    # rows_per_task=500 < the hottest city cell at sf0.01 (~1.3k rows)
    # so the driver's correctness run exercises the SALTED path
    joined = spatial.spatial_join_shuffle(pts, zds, predicate="within",
                                          rows_per_task=500)
    return joined.select_columns(["pk", "zone_id"])


def q_spjoin_rect_agg(sf_dir: str):
    """Fused spatial join + per-zone aggregate (partial combine)."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_agg(pts, zones, value_col="qty", predicate="within")
    return out


def SQL_SPJOIN_RECT_AGG():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT zone_id, CAST(SUM(qty) AS BIGINT) AS sum_val,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(MIN(qty) AS BIGINT) AS min_val, CAST(MAX(qty) AS BIGINT) AS max_val,
       CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS mean_val
FROM pts JOIN z ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
GROUP BY zone_id
"""


def q_spjoin_diamond(sf_dir: str):
    """General convex-polygon PIP via ray-casting refine."""
    pts = points_lineitem(sf_dir)
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    dia = fixtures.diamonds_from_region(region)
    joined = spatial.spatial_join(pts, dia[["region_id", "geometry"]],
                                  predicate="within")
    return joined.select_columns(["pk", "region_id"])


def SQL_SPJOIN_DIAMOND():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()})
SELECT pk, r_regionkey AS region_id
FROM pts CROSS JOIN region
WHERE {fixtures.sql_diamond_pred("ix", "iy")}
"""


def q_spatial_semi(sf_dir: str):
    """Spatial semi-join (reference `where`)."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_where(pts, zones[["zone_id", "geometry"]],
                                predicate="within")
    return out.select_columns(["pk"])


def SQL_SPATIAL_SEMI():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT pk FROM pts WHERE EXISTS (
  SELECT 1 FROM z WHERE lon > x0 AND lon < x1 AND lat > y0 AND lat < y1)
"""


def q_spatial_disjoint(sf_dir: str):
    """Spatial anti-join (reference `disjoint`)."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_join(pts, zones[["zone_id", "geometry"]],
                               predicate="disjoint")
    return out.select_columns(["pk"])


def SQL_SPATIAL_DISJOINT():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT pk FROM pts WHERE NOT EXISTS (
  SELECT 1 FROM z WHERE lon > x0 AND lon < x1 AND lat > y0 AND lat < y1)
"""


def q_spjoin_left(sf_dir: str):
    """Left-outer spatial join (reference `keepall`)."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    joined = spatial.spatial_join(pts, zones[["zone_id", "geometry"]],
                                  predicate="within", how="left")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["pk", "zone_id"]]

    return joined.map_batches(fix, batch_format="pandas")


def SQL_SPJOIN_LEFT():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT pk, zone_id FROM pts LEFT JOIN z
  ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
"""


def q_knn(sf_dir: str):
    """kNN join: customer points → 3 nearest part 'places'."""
    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    ppts = _keyed_points(sf_dir, "part", "p_partkey", 4, 2, "place_id") \
        .to_pandas()
    out = spatial.knn_join(cpts, ppts, k=3, id_col="place_id")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["ck", "nn_id", "nn_rank", "nn_dist_sq"]].copy()
        b.columns = ["ck", "place_id", "nn_rank", "dist_sq"]
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_KNN():
    return f"""
WITH cpts AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
     ppts AS ({_sql_keyed_points("part", "p_partkey", 4, 2, "place_id")}),
     d AS (
  SELECT c.ck, p.place_id,
         (c.lon-p.lon)*(c.lon-p.lon) + (c.lat-p.lat)*(c.lat-p.lat) AS dist_sq,
         ROW_NUMBER() OVER (PARTITION BY c.ck ORDER BY
           (c.lon-p.lon)*(c.lon-p.lon) + (c.lat-p.lat)*(c.lat-p.lat), p.place_id)
           AS nn_rank
  FROM cpts c CROSS JOIN ppts p)
SELECT ck, place_id, CAST(nn_rank AS BIGINT) AS nn_rank, dist_sq
FROM d WHERE nn_rank <= 3
"""


def fused_geocode_zonal(sf_dir: str, replicate: int = 1,
                        batch_size: int | None = None):
    """Single-stage flagship: key → geocode → PIP refine → per-zone
    partial aggregate, all inside ONE map_batches (no intermediate
    point table ever hits the object store), then a 25-key combine.

    This is the headline scaling job: at 10^12 rows the only data that
    moves is the input scan and one partial row per (zone, task).
    Returns the per-zone aggregate DataFrame."""
    import ray

    from pythongis_ray import pipelines, state as _state
    from ray.data.aggregate import Sum

    if batch_size is None:
        # FEW, BIG tasks: per-task dispatch costs ~4 ms of driver-side
        # serial time on this VM, so hundreds of tasks add seconds of
        # non-scaling overhead. Large batches are safe because the
        # kernel below chunks INTERNALLY at ~128k points — repeated
        # same-size allocations migrate into glibc's heap reuse pool
        # after the first chunks, dodging the first-touch fault tax
        # that made one huge flat allocation slow (see CLAUDE.md).
        batch_size = 8192
    chunk_rows = max(256, 131072 // max(1, replicate))
    zones = pipelines.load_zones(sf_dir)
    index = spatial.ZoneIndex.from_pandas(zones[["zone_id", "geometry"]])
    ref = ray.put(index)
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def _chunk(idx, ok, ln, qty, psum_acc, pcnt_acc):
        pk = ok * 8 + ln
        if replicate > 1:
            i2 = np.repeat(np.arange(len(pk), dtype=np.int64), replicate)
            rep = np.tile(np.arange(replicate, dtype=np.int64), len(pk))
            pk = pk[i2] * replicate + rep
            qty = qty[i2]
        ix, iy = fixtures.geocode_units(pk)
        lon, lat = fixtures.units_to_deg(ix, iy)
        pidx, zidx = idx.match_points(lon, lat, "within")
        nz = idx.n_zones()
        psum_acc += np.bincount(zidx, weights=qty[pidx], minlength=nz)
        pcnt_acc += np.bincount(zidx, minlength=nz)

    def fused(batch: pa.Table) -> pd.DataFrame:
        idx: spatial.ZoneIndex = _state.get_broadcast(ref, key_extra=("fz",))
        nz = idx.n_zones()
        ok_a = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln_a = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty_a = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        psum = np.zeros(nz, np.float64)
        pcnt = np.zeros(nz, np.int64)
        for s in range(0, len(ok_a), chunk_rows):
            e = min(len(ok_a), s + chunk_rows)
            _chunk(idx, ok_a[s:e], ln_a[s:e], qty_a[s:e], psum, pcnt)
        m = pcnt > 0
        return pd.DataFrame({"zone_idx": np.flatnonzero(m).astype(np.int64),
                             "psum": psum[m].astype(np.int64),
                             "pcnt": pcnt[m].astype(np.int64)})

    parts = ds.map_batches(fused, batch_format="pyarrow", batch_size=batch_size)
    # two-level aggregate: per-batch partials → bounded
    # (batches × 25 zones) driver reduce (Ray's sort aggregate costs
    # ~seconds even at 25 keys; exact int sums are order-free)
    pdf = parts.to_pandas()
    agg = pdf.groupby("zone_idx", sort=True)[["psum", "pcnt"]].sum() \
        .reset_index()
    agg.columns = ["zone_idx", "sum_val", "cnt"]
    agg.insert(0, "zone_id",
               zones["zone_id"].to_numpy()[agg["zone_idx"].to_numpy()])
    return agg.drop(columns=["zone_idx"]).sort_values("zone_id") \
        .reset_index(drop=True)


def q_dwithin(sf_dir: str):
    """Distance join: all (customer point, part place) pairs within a
    2-degree planar radius (reference spatial_join distance+radius)."""
    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    ppts = _keyed_points(sf_dir, "part", "p_partkey", 4, 2, "place_id").to_pandas()
    out = spatial.radius_join(cpts, ppts, radius=2.0, id_col="place_id")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["ck", "nn_id", "nn_dist_sq"]].copy()
        b.columns = ["ck", "place_id", "dist_sq"]
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_DWITHIN():
    return f"""
WITH cpts AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
     ppts AS ({_sql_keyed_points("part", "p_partkey", 4, 2, "place_id")})
SELECT c.ck, p.place_id,
       (c.lon-p.lon)*(c.lon-p.lon) + (c.lat-p.lat)*(c.lat-p.lat) AS dist_sq
FROM cpts c CROSS JOIN ppts p
WHERE (c.lon-p.lon)*(c.lon-p.lon) + (c.lat-p.lat)*(c.lat-p.lat) <= 4.0
"""


def q_crop_points(sf_dir: str):
    """bbox crop (reference manager.crop for points)."""
    from pythongis_ray import vector as vec

    pts = points_lineitem(sf_dir)
    out = vec.crop(pts, (-90.0, -45.0, 90.0, 45.0))
    return out.select_columns(["pk", "lon", "lat"])


def SQL_CROP_POINTS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()})
SELECT pk, lon, lat FROM pts
WHERE lon >= -90.0 AND lon <= 90.0 AND lat >= -45.0 AND lat <= 45.0
"""


def q_zonal_stats(sf_dir: str):
    """Raster zonal statistics: grid cells aggregated per zone."""
    cells = fixtures.raster_cells()
    ds = _rd().from_pandas(cells)
    zones = pipelines.load_zones(sf_dir)
    return spatial.spatial_agg(ds, zones, value_col="value", predicate="within")


def SQL_ZONAL_STATS():
    return f"""
WITH cells AS ({fixtures.SQL_RASTER_CELLS}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT zone_id, CAST(SUM(value) AS BIGINT) AS sum_val,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(MIN(value) AS BIGINT) AS min_val, CAST(MAX(value) AS BIGINT) AS max_val,
       CAST(SUM(value) AS DOUBLE) / COUNT(*) AS mean_val
FROM cells JOIN z ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
GROUP BY zone_id
"""


def q_upscale(sf_dir: str):
    """Raster upscale: 2×2 cell aggregation to parent cells
    (cell_to_parent groupby — reference raster upscale)."""
    cells = fixtures.raster_cells()
    ds = _rd().from_pandas(cells[["ci", "cj", "value"]])

    def parent(batch: pa.Table) -> pa.Table:
        ci = batch["ci"].to_numpy(zero_copy_only=False)
        cj = batch["cj"].to_numpy(zero_copy_only=False)
        return pa.table({"pci": pa.array(ci // 2), "pcj": pa.array(cj // 2),
                         "value": batch["value"]})

    ds = ds.map_batches(parent, batch_format="pyarrow", batch_size=65536)
    out = rel.groupby_aggregate(ds, ["pci", "pcj"],
                                [("sum_val", "value", "sum"),
                                 ("cnt", "value", "count")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_val"] = b["sum_val"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_UPSCALE():
    return f"""
WITH cells AS ({fixtures.SQL_RASTER_CELLS})
SELECT ci // 2 AS pci, cj // 2 AS pcj,
       CAST(SUM(value) AS BIGINT) AS sum_val, CAST(COUNT(*) AS BIGINT) AS cnt
FROM cells GROUP BY ci // 2, cj // 2
"""


def q_rasterize(sf_dir: str):
    """Rasterize points: per-1°-cell point counts (density grid)."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 1024), "cy": pa.array(iy // 1024)})

    ds = pts.map_batches(cellify, batch_format="pyarrow", batch_size=65536)
    return rel.groupby_aggregate(ds, ["cx", "cy"], [("n", "cx", "count")])


def SQL_RASTERIZE():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()})
SELECT ix // 1024 AS cx, iy // 1024 AS cy, CAST(COUNT(*) AS BIGINT) AS n
FROM pts GROUP BY ix // 1024, iy // 1024
"""


def q_slope_grid(sf_dir: str):
    """Terrain-style slope over the sparse point-density grid
    (realizes the reference's empty `slope` stub,
    /root/reference/pythongis/raster/analyzer.py:655): squared
    central-difference gradient (E−W)² + (S−N)² per cell, defined
    only where all four neighbors exist. The sparse-stencil shape:
    each cell EMITS its value to its four neighbors (5 tagged rows),
    one (cx, cy)-bucketed combine assembles the stencil — neighbor
    access without a dense array or a sort."""
    pts = points_lineitem(sf_dir)

    # 8° cells (8192 units): dense enough at sf0.001 that interior
    # cells have all four neighbors (a 1° stencil grid is empty there)
    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    # tag = where the SOURCE sits relative to the TARGET:
    # 0=center 1=east 2=west 3=south(y+1) 4=north(y-1)
    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx, cx - 1, cx + 1, cx, cx])
        ty = np.concatenate([cy, cy, cy, cy - 1, cy + 1])
        tag = np.repeat(np.arange(5, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 5)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(5))
        ok = p.notna().all(axis=1)
        p = p[ok]
        c = p[0].to_numpy(np.int64)
        e = p[1].to_numpy(np.int64)
        w = p[2].to_numpy(np.int64)
        s = p[3].to_numpy(np.int64)
        n_ = p[4].to_numpy(np.int64)
        idx = p.index.to_frame(index=False)
        # aspect: direction of steepest DESCENT among the 4 drops,
        # first-index tie-break (E, W, N, S); -1 for pits/flats
        drops = np.stack([c - e, c - w, c - n_, c - s])
        aspect = np.argmax(drops, axis=0).astype(np.int64)
        aspect[drops.max(axis=0) <= 0] = -1
        return pd.DataFrame({
            "cx": idx["cx"].to_numpy(np.int64),
            "cy": idx["cy"].to_numpy(np.int64),
            "slope_sq": (e - w) ** 2 + (s - n_) ** 2,
            "aspect": aspect})

    out = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)
    return rel.with_empty_schema(out, pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()),
         ("slope_sq", pa.int64()), ("aspect", pa.int64())]))


def SQL_SLOPE_GRID():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY ix // 8192, iy // 8192)
SELECT c.cx, c.cy,
       CAST((e.n - w.n) * (e.n - w.n)
            + (s.n - n_.n) * (s.n - n_.n) AS BIGINT) AS slope_sq,
       CAST(CASE
         WHEN GREATEST(c.n - e.n, c.n - w.n,
                       c.n - n_.n, c.n - s.n) <= 0 THEN -1
         WHEN c.n - e.n >= c.n - w.n AND c.n - e.n >= c.n - n_.n
          AND c.n - e.n >= c.n - s.n THEN 0
         WHEN c.n - w.n >= c.n - n_.n
          AND c.n - w.n >= c.n - s.n THEN 1
         WHEN c.n - n_.n >= c.n - s.n THEN 2
         ELSE 3 END AS BIGINT) AS aspect
FROM g c
JOIN g e  ON e.cx = c.cx + 1 AND e.cy = c.cy
JOIN g w  ON w.cx = c.cx - 1 AND w.cy = c.cy
JOIN g n_ ON n_.cx = c.cx AND n_.cy = c.cy - 1
JOIN g s  ON s.cx = c.cx AND s.cy = c.cy + 1
"""


def q_tri_grid(sf_dir: str):
    """Terrain Ruggedness Index over the sparse density grid (Riley
    1999: Σ|z−z_k| over the 8-neighborhood), defined only where all
    eight neighbors exist — the first DIAGONAL stencil (slope/flow use
    the 4-neighborhood). Same sparse-stencil shape as slope_grid:
    every cell emits its value to its 8 neighbors plus itself (9
    tagged rows), one (cx,cy)-bucketed combine assembles the window;
    no dense array, no sort. Exact integers end to end."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    _OFF = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
            (1, 1), (1, -1), (-1, 1), (-1, -1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx + dx for dx, _ in _OFF])
        ty = np.concatenate([cy + dy for _, dy in _OFF])
        tag = np.repeat(np.arange(9, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 9)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(9))
        p = p[p.notna().all(axis=1)]
        c = p[0].to_numpy(np.int64)
        tri = np.zeros(len(p), np.int64)
        for t in range(1, 9):
            tri += np.abs(p[t].to_numpy(np.int64) - c)
        idx = p.index.to_frame(index=False)
        return pd.DataFrame({
            "cx": idx["cx"].to_numpy(np.int64),
            "cy": idx["cy"].to_numpy(np.int64),
            "tri": tri})

    out = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)
    return rel.with_empty_schema(out, pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()), ("tri", pa.int64())]))


def SQL_TRI_GRID():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY ix // 8192, iy // 8192)
SELECT c.cx, c.cy,
       CAST(ABS(a1.n - c.n) + ABS(a2.n - c.n) + ABS(a3.n - c.n)
          + ABS(a4.n - c.n) + ABS(a5.n - c.n) + ABS(a6.n - c.n)
          + ABS(a7.n - c.n) + ABS(a8.n - c.n) AS BIGINT) AS tri
FROM g c
JOIN g a1 ON a1.cx = c.cx + 1 AND a1.cy = c.cy
JOIN g a2 ON a2.cx = c.cx - 1 AND a2.cy = c.cy
JOIN g a3 ON a3.cx = c.cx AND a3.cy = c.cy + 1
JOIN g a4 ON a4.cx = c.cx AND a4.cy = c.cy - 1
JOIN g a5 ON a5.cx = c.cx + 1 AND a5.cy = c.cy + 1
JOIN g a6 ON a6.cx = c.cx + 1 AND a6.cy = c.cy - 1
JOIN g a7 ON a7.cx = c.cx - 1 AND a7.cy = c.cy + 1
JOIN g a8 ON a8.cx = c.cx - 1 AND a8.cy = c.cy - 1
"""


def q_focal_majority(sf_dir: str):
    """3×3 focal majority (mode) filter over the sparse density grid —
    the classic categorical-raster smoother the reference's
    morphology/recode family gestures at. Each cell broadcasts its
    value to the 9 window positions; per target cell the mode of
    received values wins, ties broken by SMALLEST value; only cells
    that themselves exist in the grid are emitted (no halo). One
    bucketed shuffle, vectorized mode via pandas value counts."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    _OFF = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
            (1, 1), (1, -1), (-1, 1), (-1, -1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx + dx for dx, _ in _OFF])
        ty = np.concatenate([cy + dy for _, dy in _OFF])
        # tag 0 marks "this target is the source itself" (center row):
        # targets without a center row are halo cells, dropped
        tag = np.repeat(
            np.array([0] + [1] * 8, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 9)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def mode(b: pd.DataFrame) -> pd.DataFrame:
        has_center = b[b["tag"] == 0][["cx", "cy"]]
        cnt = (b.groupby(["cx", "cy", "v"], sort=False).size()
               .reset_index(name="k"))
        cnt = cnt.merge(has_center, on=["cx", "cy"])
        cnt = cnt.sort_values(["cx", "cy", "k", "v"],
                              ascending=[True, True, False, True])
        top = cnt.drop_duplicates(["cx", "cy"], keep="first")
        return pd.DataFrame({
            "cx": top["cx"].to_numpy(np.int64),
            "cy": top["cy"].to_numpy(np.int64),
            "mode_val": top["v"].to_numpy(np.int64),
            "mode_n": top["k"].to_numpy(np.int64)})

    out = rel.bucketed_group_apply(tagged, ["cx", "cy"], mode)
    return rel.with_empty_schema(out, pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()),
         ("mode_val", pa.int64()), ("mode_n", pa.int64())]))


def SQL_FOCAL_MAJORITY():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY ix // 8192, iy // 8192),
off(dx, dy) AS (VALUES (0,0),(1,0),(-1,0),(0,1),(0,-1),
                       (1,1),(1,-1),(-1,1),(-1,-1)),
nb AS (SELECT c.cx, c.cy, s.n AS v
       FROM g c JOIN off o ON TRUE
       JOIN g s ON s.cx = c.cx + o.dx AND s.cy = c.cy + o.dy),
cnt AS (SELECT cx, cy, v, CAST(COUNT(*) AS BIGINT) AS k
        FROM nb GROUP BY cx, cy, v)
SELECT cx, cy, CAST(v AS BIGINT) AS mode_val, k AS mode_n
FROM cnt
QUALIFY ROW_NUMBER() OVER (PARTITION BY cx, cy
                           ORDER BY k DESC, v) = 1
"""


def q_asc_roundtrip(sf_dir: str):
    """Raster interchange loop: point-density grid → dense ESRI ASCII
    grid file → read back → re-sparsify. A hash match against the
    plain rasterize oracle proves header georef and %.17g cell values
    survive the text format exactly. The densify/write is
    driver-side but GRID-bounded (360×180 cells), not corpus-bounded."""
    import shutil
    import tempfile

    from pythongis_ray import raster as R

    cells = q_rasterize(sf_dir).to_pandas()
    w, h = 360, 180
    arr = np.full((h, w), -9999.0, np.float64)
    arr[179 - cells["cy"].to_numpy(np.int64),
        cells["cx"].to_numpy(np.int64)] = cells["n"].to_numpy(np.int64)
    d = tempfile.mkdtemp(prefix="asc_q_", dir="/tmp")
    try:
        R.write_ascii_grid(f"{d}/g.asc", arr, (-180.0, 1.0, 90.0, 1.0))
        back, meta = R.read_ascii_grid(f"{d}/g.asc")
        assert meta["transform"] == (-180.0, 1.0, 90.0, 1.0)
        rr, cc = np.nonzero(back != meta["nodata"])
        return pa.table({
            "cx": pa.array(cc.astype(np.int64)),
            "cy": pa.array((179 - rr).astype(np.int64)),
            "n": pa.array(back[rr, cc].astype(np.int64))})
    finally:
        shutil.rmtree(d, ignore_errors=True)


BUFJOIN_D2_UNITS = 1025   # buffer diameter×2 in lattice units: d = 512.5


def llines_supplier(sf_dir: str) -> pd.DataFrame:
    """supplier → one rectilinear L-polyline per supplier:
    A = geocode(sk), horizontal run +dx units, then vertical +dy.
    Endpoints on INTEGER lattice units; the square-cap buffer at
    d = 512.5 units puts every buffer edge on HALF units, so no
    lineitem point (integer units) ever touches a buffer boundary —
    the PIP is unambiguous and exact."""
    from pythongis_ray.geom import wkb as _wkb

    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64) * 8 + 5
    ixa, iya = fixtures.geocode_units(sk)
    dx = (sk * 48271) % 4096 + 1
    dy = (sk * 16807) % 4096 + 1
    ax, ay = fixtures.units_to_deg(ixa, iya)
    bx, _ = fixtures.units_to_deg(ixa + dx, iya)
    _, cy2 = fixtures.units_to_deg(ixa + dx, iya + dy)
    geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y1], [x2, y3]]))
             for x1, y1, x2, y3 in zip(ax, ay, bx, cy2)]
    return pd.DataFrame({"sk": sk, "geometry": geoms})


def q_buffer_join(sf_dir: str):
    """Buffer→overlay, the top-5 GIS workflow (reference buffers any
    geometry then spatial-joins, manager.py:726-780 + 160-266): each
    supplier's rectilinear L-polyline is buffered by d = 512.5 lattice
    units with SQUARE caps through the real ``vector.buffer`` operator
    (per-segment extended rectangles unioned by the exact rational
    sweep — exact miter at the right-angle joint), then lineitem
    points spatial-join INTO the buffered zones (broadcast prepared-
    polygon PIP) and aggregate to per-supplier point counts. The SQL
    oracle states the same region as the union of the two cap-extended
    rectangles in doubled integer units (edges at half-units can never
    equal an integer point coordinate)."""
    import ray.data as _rd2

    from pythongis_ray import vector

    lines = llines_supplier(sf_dir)
    d_deg = (BUFJOIN_D2_UNITS / 2) / 1024.0
    buffered = vector.buffer(_rd2.from_pandas(lines), d_deg, cap="square")
    bdf = buffered.to_pandas()             # supplier-bounded small side
    pts = points_lineitem(sf_dir)
    out = spatial.spatial_join(pts, bdf[["sk", "geometry"]],
                               predicate="within")
    return rel.groupby_aggregate(out.select_columns(["sk"]), ["sk"],
                                 [("n_pts", "sk", "count")])


def SQL_BUFFER_JOIN():
    kp = _sql_keyed_points("supplier", "s_suppkey", 8, 5, "sk")
    B = BUFJOIN_D2_UNITS
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
L AS (SELECT sk, ix AS ixa, iy AS iya,
             (sk * 48271) % 4096 + 1 AS dx,
             (sk * 16807) % 4096 + 1 AS dy
      FROM ({kp}) _l)
SELECT sk, CAST(COUNT(*) AS BIGINT) AS n_pts
FROM L JOIN pts ON
     (2 * pts.ix > 2 * L.ixa - {B} AND 2 * pts.ix < 2 * (L.ixa + L.dx) + {B}
      AND 2 * pts.iy > 2 * L.iya - {B} AND 2 * pts.iy < 2 * L.iya + {B})
  OR (2 * pts.ix > 2 * (L.ixa + L.dx) - {B}
      AND 2 * pts.ix < 2 * (L.ixa + L.dx) + {B}
      AND 2 * pts.iy > 2 * L.iya - {B}
      AND 2 * pts.iy < 2 * (L.iya + L.dy) + {B})
GROUP BY sk
"""


def q_multiband_stats(sf_dir: str):
    """Multiband (RGB-style) GeoTIFF interchange loop + per-band
    coarse-zone stats: the point-density grid becomes a 3-band
    float32 GeoTIFF (band b = (b+1)·n + b on occupied cells, nodata
    elsewhere) written chunky-interleaved with deflate compression,
    read back through the multiband reader, and reduced to
    (band, zx = cx//90) cell counts + exact integer value sums. A
    hash match proves per-band values survive the multiband format
    bit-exactly (reference multiband ingest via PIL band split,
    /root/reference/pythongis/raster/loader.py:236-334). Driver-side
    but GRID-bounded (3×360×180), not corpus-bounded."""
    import shutil
    import tempfile

    from pythongis_ray import raster as R

    cells = q_rasterize(sf_dir).to_pandas()
    w, h, nd = 360, 180, -1.0
    arr = np.full((3, h, w), nd, np.float32)
    cx = cells["cx"].to_numpy(np.int64)
    cy = cells["cy"].to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    for b in range(3):
        arr[b, 179 - cy, cx] = ((b + 1) * n + b).astype(np.float32)
    d = tempfile.mkdtemp(prefix="mb_q_", dir="/tmp")
    try:
        R.write_geotiff(f"{d}/m.tif", arr, (-180.0, 1.0, 90.0, 1.0),
                        nodata=nd, compression="deflate")
        back, meta = R.read_geotiff(f"{d}/m.tif")
        assert meta["bands"] == 3 and back.shape == (3, h, w)
        bs, rr, cc = np.nonzero(back != meta["nodata"])
        df = pd.DataFrame({"band": bs.astype(np.int64),
                           "zx": cc.astype(np.int64) // 90,
                           "v": back[bs, rr, cc].astype(np.int64)})
        g = df.groupby(["band", "zx"], sort=True).agg(
            n_cells=("v", "size"), sum_v=("v", "sum")).reset_index()
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def SQL_MULTIBAND_STATS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
r AS (SELECT ix // 1024 AS cx, iy // 1024 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
b AS (SELECT 0 AS band, cx, n AS v FROM r
      UNION ALL SELECT 1, cx, 2 * n + 1 FROM r
      UNION ALL SELECT 2, cx, 3 * n + 2 FROM r)
SELECT CAST(band AS BIGINT) AS band, CAST(cx // 90 AS BIGINT) AS zx,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS sum_v
FROM b GROUP BY band, cx // 90 ORDER BY band, zx
"""


def q_flagship(sf_dir: str):
    """The headline pipeline: pages → geocode → spatial join → agg."""
    return pipelines.flagship(sf_dir)


def SQL_FLAGSHIP():
    src = "(SELECT doc_id, text, lang FROM documents)"
    g = fixtures.sql_geocode("doc_id").replace("__SRC__", src)
    return f"""
WITH pages AS (
  SELECT doc_id, lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         ix / 1024.0 - 180.0 AS lon, iy / 1024.0 - 90.0 AS lat
  FROM ({g}) _p
), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT zone_id, name, lang,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM pages JOIN z ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
GROUP BY zone_id, name, lang
"""


# ---------------------------------------------------------------- text set

def q_doc_tokens(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(text.token_count, batch_format="pyarrow", batch_size=8192)
    return ds.select_columns(["doc_id", "lang", "n_tokens"])


SQL_DOC_TOKENS = """
SELECT doc_id, lang,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
FROM documents
"""


def q_token_regex(sf_dir: str):
    """Regex (BPE-ish) token counting — RE2 in both engines, counts
    match exactly."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ds = ds.map_batches(text.token_count_regex, batch_format="pyarrow",
                        batch_size=8192)
    return ds.select_columns(["doc_id", "n_tokens_re"])


SQL_TOKEN_REGEX = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{text.BPE_TOKEN_PATTERN}')) AS BIGINT)
         AS n_tokens_re
FROM documents
"""


def q_word_topk(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = text.word_frequency(ds, top_k=20)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


SQL_WORD_TOPK = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY cnt DESC, word LIMIT 20
"""


def q_gopher_rules(sf_dir: str):
    """The remaining Gopher quality rules (mean-word-length bounds,
    stopword variety ≥ 2, type-token ratio) as exact integer
    predicates — one stateless map_batches pass."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(text.gopher_rules, batch_format="pyarrow",
                          batch_size=8192)


SQL_GOPHER_RULES = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
           FROM documents),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT wd) AS BIGINT) AS n_distinct,
         CAST(COUNT(DISTINCT CASE WHEN wd IN {tuple(text.STOPWORDS)!r}
                             THEN wd END) AS BIGINT) AS n_stop_distinct
  FROM w GROUP BY doc_id),
base AS (SELECT doc_id,
                CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha
         FROM documents)
SELECT a.doc_id, a.n_tokens, a.n_distinct, a.n_stop_distinct,
       CAST(CASE WHEN 3 * a.n_tokens <= b.n_alpha
                  AND b.n_alpha <= 10 * a.n_tokens
                 THEN 1 ELSE 0 END AS BIGINT) AS ok_wordlen,
       CAST(CASE WHEN a.n_stop_distinct >= 2
                 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopvariety,
       CAST(CASE WHEN 2 * a.n_distinct >= a.n_tokens
                 THEN 1 ELSE 0 END AS BIGINT) AS ok_ttr
FROM agg a JOIN base b USING (doc_id)
"""


def q_lm_score(sf_dir: str):
    """Bigram-LM quality scoring: the corpus trains its own integer
    conditional-frequency bigram model, each doc scores the sum of
    floor(C(w1,w2)·10^6 / C(w1)) over consecutive space-split token
    pairs — the KenLM-style LM quality filter, exact in int64."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = text.lm_score(ds)
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "lm_score": pc.cast(b["lm_score"], pa.int64()),
            "n_bigrams": pc.cast(b["n_bigrams"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_LM_SCORE = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pairs AS MATERIALIZED (
  SELECT doc_id, pr[1] AS w1, pr[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS pr
        FROM toks)),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        FROM pairs GROUP BY w1, w2),
model AS MATERIALIZED (
  SELECT w1, w2,
         (c * {text.LM_SCALE}) // (SUM(c) OVER (PARTITION BY w1)) AS r
  FROM c12),
scored AS (SELECT p.doc_id, SUM(m.r) AS score, COUNT(*) AS nb
           FROM pairs p JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2
           GROUP BY p.doc_id)
SELECT d.doc_id, CAST(COALESCE(s.score, 0) AS BIGINT) AS lm_score,
       CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


SEARCH_TERMS = ("hash", "vector", "stream")
SEARCH_SCALE = 1_000_000
SEARCH_K = 20


def q_search_topk(sf_dir: str):
    """Keyword retrieval: integer tf-idf top-k for a fixed query
    (idf = floor(10^6·N / df), score = Σ tf·idf, ties by doc_id).
    Pass 1 computes per-doc term frequencies with one vectorized
    equality kernel per term (cumsum-diff per-doc sums); the df/N
    reduction ships ONE row per block to the driver (block-count
    bounded, not corpus bounded); pass 2 scores and takes a
    distributed sort-limit top-k."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def tf_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        offs = np.asarray(flat.offsets)
        vals = flat.values
        cols = {"doc_id": pc.cast(batch["doc_id"], pa.int64())}
        for t in SEARCH_TERMS:
            eq = pc.equal(vals, t).to_numpy(zero_copy_only=False)
            c = np.concatenate([[0], np.cumsum(eq.astype(np.int64))])
            cols[f"tf_{t}"] = pa.array(c[offs[1:]] - c[offs[:-1]])
        return pa.table(cols)

    # two consumers (df reduction, scoring) — materialize the NARROW
    # tf table (4 int columns) so the wide corpus isn't re-read and
    # re-tokenized per consumer
    tfs = ds.map_batches(tf_batch, batch_format="pyarrow",
                         batch_size=8192).materialize()

    def partial(batch: pa.Table) -> pa.Table:
        row = {"n": [len(batch)]}
        for t in SEARCH_TERMS:
            row[f"df_{t}"] = [int(pc.sum(pc.greater(
                batch[f"tf_{t}"], 0)).as_py() or 0)]
        return pa.table(row)

    tot = tfs.map_batches(partial, batch_format="pyarrow",
                          batch_size=8192).to_pandas().sum()
    n_docs = int(tot["n"])
    idf = {t: (SEARCH_SCALE * n_docs) // int(tot[f"df_{t}"])
           for t in SEARCH_TERMS if int(tot[f"df_{t}"]) > 0}

    def score(batch: pa.Table) -> pa.Table:
        s = np.zeros(len(batch), np.int64)
        for t, w in idf.items():
            s += batch[f"tf_{t}"].to_numpy(zero_copy_only=False) \
                 * np.int64(w)
        keep = s > 0
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64())
            .filter(pa.array(keep)),
            "score": pa.array(s[keep])})

    out = tfs.map_batches(score, batch_format="pyarrow",
                          batch_size=65536)
    return out.sort([("score"), ("doc_id")],
                    descending=[True, False]).limit(SEARCH_K)


SQL_SEARCH_TOPK = f"""
WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM p
       WHERE w IN ('hash', 'vector', 'stream') GROUP BY doc_id, w),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
idf AS (SELECT w, ({SEARCH_SCALE} * (SELECT COUNT(*) FROM documents))
               // df AS idf FROM df),
s AS (SELECT t.doc_id, SUM(t.tf * i.idf) AS score
      FROM tf t JOIN idf i USING (w) GROUP BY t.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(score AS BIGINT) AS score
FROM s ORDER BY score DESC, doc_id LIMIT {SEARCH_K}
"""


def q_lang_stats(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])
    out = rel.groupby_aggregate(ds, "lang",
                                [("n_docs", "n_chars", "count"),
                                 ("sum_chars", "n_chars", "sum"),
                                 ("avg_chars", "n_chars", "mean")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_chars"] = b["sum_chars"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_LANG_STATS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents GROUP BY lang
"""


def q_quality(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ds = ds.map_batches(text.quality_score, batch_format="pyarrow", batch_size=8192)
    return ds.select_columns(["doc_id", "n_tokens", "n_stop", "stop_ratio"])


SQL_QUALITY = f"""
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split(text, ' '),
            w -> w IN {tuple(text.STOPWORDS)!r})) AS BIGINT) AS n_stop,
       CAST(len(list_filter(string_split(text, ' '),
            w -> w IN {tuple(text.STOPWORDS)!r})) AS DOUBLE)
         / (length(text) - length(replace(text, ' ', '')) + 1) AS stop_ratio
FROM documents
"""


LM_VOCAB = 256


def q_lm_surprisal(sf_dir: str):
    """Corpus-trained unigram LM surprisal (the CCNet perplexity-filter
    slot): train pass = distributed word counts -> top-V vocab + total;
    score pass = broadcast table lookup + integer bit-length surprisal
    per token, summed per doc. Fully oracle-paired: the per-token score
    is LENGTH(bin(total // count)) — exact integers on both sides."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.lm_surprisal(ds, vocab_size=LM_VOCAB)


SQL_LM_SURPRISAL = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
cnt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY word),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
top AS (SELECT word, c FROM cnt ORDER BY c DESC, word LIMIT {LM_VOCAB}),
s AS (SELECT w.doc_id,
             LENGTH(bin((SELECT t FROM tot) // COALESCE(top.c, 1))) AS bits
      FROM w LEFT JOIN top ON top.word = w.word)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(bits) AS BIGINT) AS surprisal_bits
FROM s GROUP BY doc_id
"""


PYR_BASE_RES = 9
PYR_MIN_RES = 5


def q_cell_pyramid(sf_dir: str):
    """Tile-pyramid build — the web-map/tile-server aggregation path:
    ONE streaming pass computes per-batch partial counts at the base
    cell resolution (the corpus is touched exactly once); every coarser
    level then derives from the PREVIOUS level's cell table by integer
    parent-cell arithmetic + a cell-bounded combine (4:1 per step, the
    classic pyramid recurrence). At 100 TB the base pass is the only
    corpus-sized work; each rollup shuffles at most 2^(2r+1) rows.
    Emits (res, cell_ix, cell_iy, n_points) for res 9..5. Exact on the
    fixture lattice: cell indices are integer divisions of the dyadic
    lattice units, mirrored 1:1 in SQL."""
    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def base_cells(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cell = grid.point_to_cell(lon, lat, res=PYR_BASE_RES)
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = cpts.map_batches(base_cells, batch_format="pyarrow",
                             batch_size=65536)
    combine = lambda b: (b.groupby("cell", sort=False)["n"].sum()
                         .reset_index())
    # each level feeds BOTH the output union and the next rollup; Ray
    # Datasets re-execute per consumer, so materialize the (tiny,
    # cell-bounded) level tables — otherwise the corpus base pass
    # re-runs once per level
    level = rel.bucketed_group_apply(parts, ["cell"], combine).materialize()
    levels = [level]
    for _ in range(PYR_BASE_RES - PYR_MIN_RES):
        def up(batch: pa.Table) -> pa.Table:
            cell = batch["cell"].to_numpy(zero_copy_only=False) \
                .view(np.uint64)
            p = grid.parent(cell).view(np.int64)
            n = batch["n"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(p, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, n)
            return pa.table({"cell": pa.array(u), "n": pa.array(s)})

        level = rel.bucketed_group_apply(
            level.map_batches(up, batch_format="pyarrow",
                              batch_size=65536),
            ["cell"], combine).materialize()
        levels.append(level)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def finish(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False).view(np.uint64)
        res, ix, iy = grid.unpack(cell)
        return pa.table({
            "res": pa.array(res.astype(np.int64)),
            "cell_ix": pa.array(ix.astype(np.int64)),
            "cell_iy": pa.array(iy.astype(np.int64)),
            "n_points": batch["n"],
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           batch_size=65536)


def _sql_cell_pyramid() -> str:
    """Replays the pyramid: base-level cell indices are exact integer
    divisions of the lattice units (cell width at res r =
    LX / 2^(r+1) = 184320 / 2^r units, integral for r <= 12); coarser
    levels are ix >> steps (equivalently a direct division — the
    recurrence and the direct formula agree exactly)."""
    per_level = []
    for r in range(PYR_MIN_RES, PYR_BASE_RES + 1):
        ux = fixtures.LX // (2 << r)    # units per cell side at res r
        per_level.append(f"""
SELECT {r} AS res, ix // {ux} AS cell_ix, iy // {ux} AS cell_iy,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM cpts GROUP BY 2, 3""")
    body = "\nUNION ALL".join(per_level)
    return f"""
WITH cpts AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")})
{body}
"""


BPE_MERGES = 48


def q_image_neardup(sf_dir: str):
    """Image near-dup pairs over a deterministic synthetic media table
    (decode stub → perceptual aHash → banded-Hamming buckets → popcount
    verify). Rows-only: the media table is synthesized in-process (the
    container has no image codecs and the driver registers no media
    parquet); exactness vs an independent reference aHash + brute-force
    Hamming is unit-tested (test_image_neardup_pairs_matches_bruteforce)."""
    import pandas as _pd

    from pythongis_ray import multimodal as mm

    df = mm.synthesize_media(192, "image", payload_bytes=4096)
    dups = df.head(24).copy()
    dups["id"] = dups["id"] + 1000
    dups["payload"] = [
        bytes([(b + 1) % 256 if j == 17 else b for j, b in enumerate(p)])
        for p in dups["payload"]]
    full = _pd.concat([df, dups], ignore_index=True)
    out = mm.image_neardup_pairs(_rd().from_pandas(full), max_hamming=6)
    return out


def q_bpe_tokens(sf_dir: str):
    """BPE tokenizer training + encoding (the tokenizer slot): one
    streaming pass builds the word-frequency table, merge learning
    iterates driver-side on that vocab-bounded table, and the encode
    pass counts BPE tokens per doc with a per-actor encode cache.
    Rows-only: iterative data-dependent merge application is not
    SQL-expressible; encode parity is brute-force-tested
    (test_bpe_matches_reference_implementation)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    merges = text.bpe_learn(ds, n_merges=BPE_MERGES)
    return text.bpe_token_counts(ds, merges)


def q_doc_topk_chars(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    return ds.sort([("n_chars"), ("doc_id")], descending=[True, False]).limit(10)


SQL_DOC_TOPK_CHARS = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
"""


# ----------------------------------------------------------- embeddings set

def q_ann_topk(sf_dir: str):
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    # query set filter pushed into the parquet read (row-group pruning)
    queries_df = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 filters=[("vec_id", "<", 8)])
    out = embed.ann_topk(emb, queries_df, k=5)
    out = out[["query_id", "neighbor_id", "score", "rank"]].copy()
    out["score"] = out["score"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    return out


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qe
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe,
              list_transform(e.embedding, x -> round(CAST(x AS DOUBLE) * 1000))) AS BIGINT) AS score
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def q_knn_classify(sf_dir: str):
    """k-NN classification (the embedding-space 'model inference'
    slot): majority label of the 5 exact nearest neighbors per query
    (ties -> smallest label). The distributed part is the exact
    quantized top-k (per-batch partial top-k, driver combine over
    nq*k rows); the label fetch is a k*nq-bounded filtered read and
    the vote is a driver-side fold over those same rows."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 8)])
    nn = embed.ann_topk(emb, qdf, k=5)
    lab = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
        filters=[("vec_id", "in", sorted(set(nn.neighbor_id.tolist())))])
    m = nn.merge(lab, left_on="neighbor_id", right_on="vec_id")
    votes = m.groupby(["query_id", "label"]).size().reset_index(name="v")
    votes = votes.sort_values(["query_id", "v", "label"],
                              ascending=[True, False, True], kind="stable")
    out = votes.groupby("query_id", sort=True).head(1)
    return pd.DataFrame({
        "query_id": out["query_id"].to_numpy(np.int64),
        "pred_label": out["label"].to_numpy(np.int64),
    })


SQL_KNN_CLASSIFY = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qe
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe,
              list_transform(e.embedding, x -> round(CAST(x AS DOUBLE) * 1000))) AS BIGINT) AS score
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
), votes AS (
  SELECT r.query_id, e2.label, COUNT(*) AS v
  FROM ranked r JOIN embeddings e2 ON e2.vec_id = r.neighbor_id
  WHERE r.rank <= 5 GROUP BY 1, 2
)
SELECT query_id, CAST(label AS BIGINT) AS pred_label FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY v DESC, label) AS rn
  FROM votes) WHERE rn = 1
"""


def q_embed_label_stats(sf_dir: str):
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")

    def partial(batch: pa.Table) -> pd.DataFrame:
        mat = embed.quantize(embed._as_matrix(batch["embedding"]))
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"label": labels, "d0": mat[:, 0]})

    ds = emb.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    out = rel.groupby_aggregate(ds, "label",
                                [("n", "d0", "count"), ("sum_d0", "d0", "sum"),
                                 ("mean_d0", "d0", "mean")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_d0"] = b["sum_d0"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_EMBED_LABEL_STATS = """
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS sum_d0,
       CAST(SUM(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)) AS DOUBLE) / COUNT(*) AS mean_d0
FROM embeddings GROUP BY label
"""


def q_median_events(sf_dir: str):
    """Holistic median per group (reference summarystats 'median' —
    exact, unlike the reference's approximate tiled fallback,
    raster/data.py:689)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "cents": pa.array(c)})

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
    return rel.groupby_aggregate(ds, "event_type",
                                 [("med_cents", "cents", "median")])


SQL_MEDIAN_EVENTS = """
SELECT event_type,
       median(CAST(round(value * 100) AS BIGINT)) AS med_cents
FROM events GROUP BY event_type
"""


def q_json_extract(sf_dir: str):
    """Semi-structured parsing: extract the integer `k` from the JSON
    `props` column (vectorized Arrow regex) and aggregate per
    event_type — the web-data payload-parsing shape."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], r'"k": (?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": batch["event_type"], "k": k})

    ds = ds.map_batches(extract, batch_format="pyarrow", batch_size=65536)
    out = rel.groupby_aggregate(ds, "event_type",
                                [("n", "k", "count"), ("sum_k", "k", "sum"),
                                 ("min_k", "k", "min"), ("max_k", "k", "max")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_k", "min_k", "max_k"):
            b[c] = b[c].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_JSON_EXTRACT = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""


SUP_HALF_X = 4000.25  # supplier rect half-extents, quarter-lattice units:
SUP_HALF_Y = 3000.25  # bounds at x.25/.75 never touch zone bounds at x.5


def q_polyjoin(sf_dir: str):
    """Polygon×polygon spatial join: supplier-derived rectangles vs the
    nation zone rectangles (axis-aligned ⇒ intersects ≡ bbox overlap,
    which the SQL oracle expresses exactly; boundary contact is
    impossible by lattice construction)."""
    left = supplier_rects(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    ds = _rd().from_pandas(left)
    out = spatial.spatial_join_polygons(ds, zones[["zone_id", "geometry"]],
                                        predicate="intersects")
    return out.select_columns(["sup_id", "zone_id"])


def SQL_POLYJOIN():
    sup_pts = _sql_keyed_points("supplier", "s_suppkey", 4, 3, "sup_id")
    return f"""
WITH sup AS (
  SELECT sup_id,
         lon - {SUP_HALF_X} / 1024.0 AS sx0, lon + {SUP_HALF_X} / 1024.0 AS sx1,
         lat - {SUP_HALF_Y} / 1024.0 AS sy0, lat + {SUP_HALF_Y} / 1024.0 AS sy1
  FROM ({sup_pts}) _sp
), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT sup_id, zone_id FROM sup CROSS JOIN z
WHERE sx0 < x1 AND x0 < sx1 AND sy0 < y1 AND y0 < sy1
"""


# ----------------------------------------------------- line-geometry set

def lines_customer(sf_dir: str):
    """customer → one diagonal segment per customer: A = geocode(ck),
    B = A + hash-derived delta (±4°). Endpoints sit on INTEGER lattice
    units while zone bounds sit on half-units, so no endpoint ever
    touches a zone boundary; every orientation test is exact."""
    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def to_lines(batch: pa.Table) -> pa.Table:
        from pythongis_ray.geom import wkb as _wkb
        c = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = c * 4 + 1
        ixa, iya = fixtures.geocode_units(ck)
        dx = (ck * 48271) % 8192 - 4096
        dy = (ck * 16807) % 8192 - 4096
        ax, ay = fixtures.units_to_deg(ixa, iya)
        bx, by = fixtures.units_to_deg(ixa + dx, iya + dy)
        geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y2]]))
                 for x1, y1, x2, y2 in zip(ax, ay, bx, by)]
        return pa.table({"ck": pa.array(ck),
                         "geometry": pa.array(geoms, pa.binary())})

    return ds.map_batches(to_lines, batch_format="pyarrow", batch_size=16384)


def SQL_LINES_CUSTOMER():
    kp = _sql_keyed_points("customer", "c_custkey", 4, 1, "ck")
    return f"""
    SELECT ck, ix / 1024.0 - 180.0 AS ax, iy / 1024.0 - 90.0 AS ay,
           (ix + (ck * 48271) % 8192 - 4096) / 1024.0 - 180.0 AS bx,
           (iy + (ck * 16807) % 8192 - 4096) / 1024.0 - 90.0 AS by
    FROM ({kp}) _sg
    """


def _sql_seg_rect_intersects() -> str:
    """Closed SAT segment×rect test: bbox overlap AND rect corners not
    strictly on one side of the segment line — exact and equal to the
    engine's orientation-test predicate on the lattice."""
    def s(cx, cy):
        return f"((bx-ax)*(({cy})-ay) - (by-ay)*(({cx})-ax))"
    s00, s10 = s("x0", "y0"), s("x1", "y0")
    s11, s01 = s("x1", "y1"), s("x0", "y1")
    # bbox overlap spelled with plain comparisons: DuckDB 1.0.0's
    # greatest/least hit 'Operation requires a flat vector' inside
    # this cross-join plan
    return (f"(ax >= x0 OR bx >= x0) AND (ax <= x1 OR bx <= x1) AND "
            f"(ay >= y0 OR by >= y0) AND (ay <= y1 OR by <= y1) AND "
            f"NOT ({s00} > 0 AND {s10} > 0 AND {s11} > 0 AND {s01} > 0) AND "
            f"NOT ({s00} < 0 AND {s10} < 0 AND {s11} < 0 AND {s01} < 0)")


_SQL_SEG_IN_RECT = ("ax > x0 AND ax < x1 AND ay > y0 AND ay < y1 AND "
                    "bx > x0 AND bx < x1 AND by > y0 AND by < y1")


def q_line_join(sf_dir: str):
    """Line×polygon spatial join, predicate=intersects (the reference's
    line branch, manager.py:381-431 — e.g. railroads × countries)."""
    lines = lines_customer(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_join_lines(lines, zones[["zone_id", "geometry"]],
                                     predicate="intersects")
    return out.select_columns(["ck", "zone_id"])


def SQL_LINE_JOIN():
    return f"""
WITH seg AS ({SQL_LINES_CUSTOMER()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT ck, zone_id FROM seg CROSS JOIN z
WHERE {_sql_seg_rect_intersects()}
"""


def q_line_join_shuffle(sf_dir: str):
    """Same join as line_join but through the large×large SHUFFLE
    path (cover explosion + salted buckets + canonical-cell
    exactly-once emission) — the driver-checked proof that both
    plans agree bit-for-bit."""
    import ray.data as _rd2

    lines = lines_customer(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_join_lines_shuffle(
        lines, _rd2.from_pandas(zones[["zone_id", "geometry"]]),
        predicate="intersects", rows_per_task=20_000)
    return out.select_columns(["ck", "zone_id"])


def SQL_LINE_JOIN_SHUFFLE():
    return SQL_LINE_JOIN()


def q_line_crosses(sf_dir: str):
    """Line×polygon crosses: interior points on both sides of the zone
    boundary (fixture has no touch-degenerate contact, so crosses ≡
    intersects ∧ ¬within — which is what the oracle states)."""
    lines = lines_customer(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_join_lines(lines, zones[["zone_id", "geometry"]],
                                     predicate="crosses")
    return out.select_columns(["ck", "zone_id"])


def SQL_LINE_CROSSES():
    return f"""
WITH seg AS ({SQL_LINES_CUSTOMER()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT ck, zone_id FROM seg CROSS JOIN z
WHERE {_sql_seg_rect_intersects()} AND NOT ({_SQL_SEG_IN_RECT})
"""


def q_line_within(sf_dir: str):
    lines = lines_customer(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_join_lines(lines, zones[["zone_id", "geometry"]],
                                     predicate="within")
    return out.select_columns(["ck", "zone_id"])


def SQL_LINE_WITHIN():
    return f"""
WITH seg AS ({SQL_LINES_CUSTOMER()}), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT ck, zone_id FROM seg CROSS JOIN z
WHERE {_SQL_SEG_IN_RECT}
"""


def seglines_supplier(sf_dir: str) -> pd.DataFrame:
    """supplier → one diagonal segment per supplier (the small right
    side of the line×line join)."""
    from pythongis_ray.geom import wkb as _wkb

    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64) * 8 + 7
    ixa, iya = fixtures.geocode_units(sk)
    dx = (sk * 48271) % 8192 - 4096
    dy = (sk * 16807) % 8192 - 4096
    ax, ay = fixtures.units_to_deg(ixa, iya)
    bx, by = fixtures.units_to_deg(ixa + dx, iya + dy)
    geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y2]]))
             for x1, y1, x2, y2 in zip(ax, ay, bx, by)]
    return pd.DataFrame({"sup_id": sk, "geometry": geoms})


def q_line_line_join(sf_dir: str):
    """Line×line spatial join: customer segments × broadcast supplier
    segments, exact segment-intersection refine (incl. collinear /
    endpoint touch terms — mirrored exactly in the oracle)."""
    lines = lines_customer(sf_dir)
    right = seglines_supplier(sf_dir)
    out = spatial.spatial_join_line_line(lines, right)
    return out.select_columns(["ck", "sup_id"])


def SQL_LINE_LINE_JOIN():
    kp = _sql_keyed_points("supplier", "s_suppkey", 8, 7, "sup_id")
    d1 = "((bx-ax)*(cy-ay) - (by-ay)*(cx-ax))"
    d2 = "((bx-ax)*(dy2-ay) - (by-ay)*(dx2-ax))"
    d3 = "((dx2-cx)*(ay-cy) - (dy2-cy)*(ax-cx))"
    d4 = "((dx2-cx)*(by-cy) - (dy2-cy)*(bx-cx))"

    def touch(d, p1x, p1y, p2x, p2y, qx, qy):
        # collinear + within-bbox: (q-p1)(q-p2) <= 0 per axis
        return (f"({d} = 0 AND ({qx}-{p1x})*({qx}-{p2x}) <= 0 "
                f"AND ({qy}-{p1y})*({qy}-{p2y}) <= 0)")

    proper = (f"(({d1} > 0) <> ({d2} > 0)) AND (({d3} > 0) <> ({d4} > 0)) "
              f"AND {d1} <> 0 AND {d2} <> 0 AND {d3} <> 0 AND {d4} <> 0")
    touches = " OR ".join([
        touch(d1, "ax", "ay", "bx", "by", "cx", "cy"),
        touch(d2, "ax", "ay", "bx", "by", "dx2", "dy2"),
        touch(d3, "cx", "cy", "dx2", "dy2", "ax", "ay"),
        touch(d4, "cx", "cy", "dx2", "dy2", "bx", "by"),
    ])
    return f"""
WITH seg AS ({SQL_LINES_CUSTOMER()}),
rseg AS (
  SELECT sup_id, ix / 1024.0 - 180.0 AS cx, iy / 1024.0 - 90.0 AS cy,
         (ix + (sup_id * 48271) % 8192 - 4096) / 1024.0 - 180.0 AS dx2,
         (iy + (sup_id * 16807) % 8192 - 4096) / 1024.0 - 90.0 AS dy2
  FROM ({kp}) _rs
)
SELECT ck, sup_id FROM seg CROSS JOIN rseg
WHERE ({proper}) OR ({touches})
"""


def hlines_customer(sf_dir: str):
    """customer → one HORIZONTAL segment (A → A + 8000 units east):
    the axis-aligned fixture whose rect clip is exact interval
    arithmetic in both engines."""
    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def to_lines(batch: pa.Table) -> pa.Table:
        from pythongis_ray.geom import wkb as _wkb
        c = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hk = c * 8 + 5
        ixa, iya = fixtures.geocode_units(hk)
        ax, ay = fixtures.units_to_deg(ixa, iya)
        bx, _ = fixtures.units_to_deg(ixa + 8000, iya)
        geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y1]]))
                 for x1, y1, x2 in zip(ax, ay, bx)]
        return pa.table({"hk": pa.array(hk),
                         "geometry": pa.array(geoms, pa.binary())})

    return ds.map_batches(to_lines, batch_format="pyarrow", batch_size=16384)


def q_line_clip(sf_dir: str):
    """Spatial-join `clip` overlay rewrite for lines (reference
    manager.py:208-266): intersection pieces + exact clipped length."""
    lines = hlines_customer(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    out = spatial.spatial_join_lines(lines, zones[["zone_id", "geometry"]],
                                     predicate="intersects",
                                     clip="intersection")
    return out.select_columns(["hk", "zone_id", "clip_len"])


def SQL_LINE_CLIP():
    kp = _sql_keyed_points("customer", "c_custkey", 8, 5, "hk")
    return f"""
WITH seg AS (
  SELECT hk, ix / 1024.0 - 180.0 AS ax, iy / 1024.0 - 90.0 AS ay,
         (ix + 8000) / 1024.0 - 180.0 AS bx
  FROM ({kp}) _hs
), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT hk, zone_id, least(bx, x1) - greatest(ax, x0) AS clip_len
FROM seg CROSS JOIN z
WHERE ay > y0 AND ay < y1 AND least(bx, x1) > greatest(ax, x0)
"""


def supplier_rects(sf_dir: str) -> pd.DataFrame:
    """Supplier-derived axis-aligned rectangles (quarter-unit bounds —
    never touch the half-unit zone bounds). Shared by polyjoin and the
    polygon clip overlay."""
    from pythongis_ray.geom import wkb as _wkb

    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    k = sup["s_suppkey"].to_numpy().astype(np.int64) * 4 + 3
    ix, iy = fixtures.geocode_units(k)
    cx, cy = fixtures.units_to_deg(ix, iy)
    hx = SUP_HALF_X / 1024.0
    hy = SUP_HALF_Y / 1024.0
    geoms = [
        _wkb.encode_polygon([np.array([[x - hx, y - hy], [x + hx, y - hy],
                                       [x + hx, y + hy], [x - hx, y + hy],
                                       [x - hx, y - hy]])])
        for x, y in zip(cx, cy)
    ]
    return pd.DataFrame({"sup_id": k, "geometry": geoms})


def q_poly_clip(sf_dir: str):
    """Polygon×polygon intersection overlay: clipped geometry + exact
    area (reference clip branch, manager.py:208-266)."""
    left = supplier_rects(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    ds = _rd().from_pandas(left)
    out = spatial.spatial_join_polygons(ds, zones[["zone_id", "geometry"]],
                                        predicate="intersects",
                                        clip="intersection")
    return out.select_columns(["sup_id", "zone_id", "clip_area"])


def SQL_POLY_CLIP():
    sup_pts = _sql_keyed_points("supplier", "s_suppkey", 4, 3, "sup_id")
    return f"""
WITH sup AS (
  SELECT sup_id,
         lon - {SUP_HALF_X} / 1024.0 AS sx0, lon + {SUP_HALF_X} / 1024.0 AS sx1,
         lat - {SUP_HALF_Y} / 1024.0 AS sy0, lat + {SUP_HALF_Y} / 1024.0 AS sy1
  FROM ({sup_pts}) _sp
), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT sup_id, zone_id,
       (least(sx1, x1) - greatest(sx0, x0))
         * (least(sy1, y1) - greatest(sy0, y0)) AS clip_area
FROM sup CROSS JOIN z
WHERE sx0 < x1 AND x0 < sx1 AND sy0 < y1 AND y0 < sy1
"""


def q_knn_lines(sf_dir: str):
    """kNN join of customer points against a LINE layer (part-derived
    horizontal segments) — the non-point extension of closest_point
    (reference analyzer.py:289-310). Distance kernel is the
    single-division point-to-segment form, mirrored op-for-op in the
    oracle so even the one rounded division is bit-identical."""
    from pythongis_ray.geom import wkb as _wkb

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    pp = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    sid = pp["p_partkey"].to_numpy().astype(np.int64) * 8 + 7
    ix, iy = fixtures.geocode_units(sid)
    ax, ay = fixtures.units_to_deg(ix, iy)
    bx, _ = fixtures.units_to_deg(ix + 8000, iy)
    geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y1]]))
             for x1, y1, x2 in zip(ax, ay, bx)]
    right = pd.DataFrame({"sid": sid, "geometry": geoms})
    out = spatial.knn_join_geoms(cpts, right, k=2, id_col="sid")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["ck", "nn_id", "nn_rank", "nn_dist_sq"]].copy()
        b.columns = ["ck", "sid", "nn_rank", "dist_sq"]
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_KNN_LINES():
    return f"""
WITH cpts AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
     sraw AS ({_sql_keyed_points("part", "p_partkey", 8, 7, "sid")}),
     seg AS (
  SELECT sid, lon AS axx, lat AS ayy,
         (ix + 8000) / 1024.0 - 180.0 AS bxx, lat AS byy
  FROM sraw),
     d AS (
  SELECT c.ck, s.sid,
         CASE
           WHEN (c.lon - axx) * (bxx - axx) + (c.lat - ayy) * (byy - ayy) <= 0
             THEN (c.lon - axx) * (c.lon - axx) + (c.lat - ayy) * (c.lat - ayy)
           WHEN (c.lon - axx) * (bxx - axx) + (c.lat - ayy) * (byy - ayy)
                >= (bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy)
             THEN (c.lon - bxx) * (c.lon - bxx) + (c.lat - byy) * (c.lat - byy)
           ELSE ((c.lon - axx) * (byy - ayy) - (c.lat - ayy) * (bxx - axx))
                * ((c.lon - axx) * (byy - ayy) - (c.lat - ayy) * (bxx - axx))
                / ((bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy))
         END AS dist_sq
  FROM cpts c CROSS JOIN seg s),
     r AS (
  SELECT ck, sid, dist_sq,
         ROW_NUMBER() OVER (PARTITION BY ck ORDER BY dist_sq, sid) AS nn_rank
  FROM d)
SELECT ck, sid, CAST(nn_rank AS BIGINT) AS nn_rank, dist_sq
FROM r WHERE nn_rank <= 2
"""


def q_dwithin_lines(sf_dir: str):
    """Distance join of customer points against the part-derived line
    layer: all segments within 2.0 planar degrees (reference
    spatial_join distance+radius on any geometry; non-point analog of
    dwithin). Same bit-exact single-division distance kernel as
    knn_lines."""
    from pythongis_ray.geom import wkb as _wkb

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    pp = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    sid = pp["p_partkey"].to_numpy().astype(np.int64) * 8 + 7
    ix, iy = fixtures.geocode_units(sid)
    ax, ay = fixtures.units_to_deg(ix, iy)
    bx, _ = fixtures.units_to_deg(ix + 8000, iy)
    geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y1]]))
             for x1, y1, x2 in zip(ax, ay, bx)]
    right = pd.DataFrame({"sid": sid, "geometry": geoms})
    out = spatial.radius_join_geoms(cpts, right, radius=2.0, id_col="sid")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["ck", "nn_id", "nn_dist_sq"]].copy()
        b.columns = ["ck", "sid", "dist_sq"]
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_DWITHIN_LINES():
    return f"""
WITH cpts AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
     sraw AS ({_sql_keyed_points("part", "p_partkey", 8, 7, "sid")}),
     seg AS (
  SELECT sid, lon AS axx, lat AS ayy,
         (ix + 8000) / 1024.0 - 180.0 AS bxx, lat AS byy
  FROM sraw),
     d AS (
  SELECT c.ck, s.sid,
         CASE
           WHEN (c.lon - axx) * (bxx - axx) + (c.lat - ayy) * (byy - ayy) <= 0
             THEN (c.lon - axx) * (c.lon - axx) + (c.lat - ayy) * (c.lat - ayy)
           WHEN (c.lon - axx) * (bxx - axx) + (c.lat - ayy) * (byy - ayy)
                >= (bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy)
             THEN (c.lon - bxx) * (c.lon - bxx) + (c.lat - byy) * (c.lat - byy)
           ELSE ((c.lon - axx) * (byy - ayy) - (c.lat - ayy) * (bxx - axx))
                * ((c.lon - axx) * (byy - ayy) - (c.lat - ayy) * (bxx - axx))
                / ((bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy))
         END AS dist_sq
  FROM cpts c CROSS JOIN seg s)
SELECT ck, sid, dist_sq FROM d WHERE dist_sq <= 4.0
"""


def q_poly_clip_diff(sf_dir: str):
    """Polygon×polygon DIFFERENCE overlay (left − zone) via the exact
    rational slab-sweep overlay kernel (reference difference branch,
    manager.py:208-266). Fixture note: sup bounds sit at .25/.75 unit
    fractions and zone bounds on half-units, so every intersecting
    pair overlaps strictly (no touch-only) and the difference area is
    the closed-form sup_area − overlap; fully-covered pairs (area 0)
    are dropped by both sides."""
    left = supplier_rects(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    ds = _rd().from_pandas(left)
    out = spatial.spatial_join_polygons(ds, zones[["zone_id", "geometry"]],
                                        predicate="intersects",
                                        clip="difference")
    return out.select_columns(["sup_id", "zone_id", "clip_area"])


def SQL_POLY_CLIP_DIFF():
    sup_pts = _sql_keyed_points("supplier", "s_suppkey", 4, 3, "sup_id")
    return f"""
WITH sup AS (
  SELECT sup_id,
         lon - {SUP_HALF_X} / 1024.0 AS sx0, lon + {SUP_HALF_X} / 1024.0 AS sx1,
         lat - {SUP_HALF_Y} / 1024.0 AS sy0, lat + {SUP_HALF_Y} / 1024.0 AS sy1
  FROM ({sup_pts}) _sp
), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT sup_id, zone_id,
       (sx1 - sx0) * (sy1 - sy0)
         - (least(sx1, x1) - greatest(sx0, x0))
         * (least(sy1, y1) - greatest(sy0, y0)) AS clip_area
FROM sup CROSS JOIN z
WHERE sx0 < x1 AND x0 < sx1 AND sy0 < y1 AND y0 < sy1
  AND NOT (sx0 >= x0 AND sx1 <= x1 AND sy0 >= y0 AND sy1 <= y1)
"""


def q_poly_clip_union(sf_dir: str):
    """Polygon×polygon UNION overlay per intersecting pair (exact
    slab-sweep kernel); area = sup + zone − overlap, closed-form in
    the oracle."""
    left = supplier_rects(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    ds = _rd().from_pandas(left)
    out = spatial.spatial_join_polygons(ds, zones[["zone_id", "geometry"]],
                                        predicate="intersects",
                                        clip="union")
    return out.select_columns(["sup_id", "zone_id", "clip_area"])


def SQL_POLY_CLIP_UNION():
    sup_pts = _sql_keyed_points("supplier", "s_suppkey", 4, 3, "sup_id")
    return f"""
WITH sup AS (
  SELECT sup_id,
         lon - {SUP_HALF_X} / 1024.0 AS sx0, lon + {SUP_HALF_X} / 1024.0 AS sx1,
         lat - {SUP_HALF_Y} / 1024.0 AS sy0, lat + {SUP_HALF_Y} / 1024.0 AS sy1
  FROM ({sup_pts}) _sp
), z AS ({fixtures.SQL_ZONES_FROM_NATION})
SELECT sup_id, zone_id,
       (sx1 - sx0) * (sy1 - sy0) + (x1 - x0) * (y1 - y0)
         - (least(sx1, x1) - greatest(sx0, x0))
         * (least(sy1, y1) - greatest(sy0, y0)) AS clip_area
FROM sup CROSS JOIN z
WHERE sx0 < x1 AND x0 < sx1 AND sy0 < y1 AND y0 < sy1
"""


# ------------------------------------------- rasterize / dissolve set

def q_rasterize_poly(sf_dir: str):
    """Rasterize POLYGONS with valuekey + per-cell conflict stats
    (reference raster/manager.py:790-974): supplier rects burned by
    center sampling onto the 1024-unit cell grid."""
    from pythongis_ray import raster

    left = supplier_rects(sf_dir)
    left["val"] = (left["sup_id"] * 7) % 100
    ds = _rd().from_pandas(left)
    out = raster.rasterize_vector(
        ds, value_col="val",
        specs=[("n", "val", "count"), ("sum_val", "val", "sum"),
               ("max_val", "val", "max")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_val", "max_val"):
            b[c] = b[c].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_RASTERIZE_POLY():
    kp = _sql_keyed_points("supplier", "s_suppkey", 4, 3, "sup_id")
    hx, hy = SUP_HALF_X, SUP_HALF_Y  # 4000.25 / 3000.25 units
    return f"""
WITH sup AS (
  SELECT sup_id, (sup_id * 7) % 100 AS val, ix, iy FROM ({kp}) _sp
), cx_cells AS (
  SELECT sup_id, val, iy,
         unnest(generate_series(
           CAST(floor((ix - {hx} - 512) / 1024.0) AS BIGINT) + 1,
           CAST(ceil((ix + {hx} - 512) / 1024.0) AS BIGINT) - 1)) AS cx
  FROM sup
), cells AS (
  SELECT sup_id, val, cx,
         unnest(generate_series(
           CAST(floor((iy - {hy} - 512) / 1024.0) AS BIGINT) + 1,
           CAST(ceil((iy + {hy} - 512) / 1024.0) AS BIGINT) - 1)) AS cy
  FROM cx_cells
)
SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(MAX(val) AS BIGINT) AS max_val
FROM cells GROUP BY cx, cy
"""


def q_rasterize_line(sf_dir: str):
    """Rasterize LINES: a cell is burned iff the segment intersects
    the closed cell square (exact SAT); horizontal fixture makes the
    covered ranges pure integer arithmetic in the oracle."""
    from pythongis_ray import raster

    lines = hlines_customer(sf_dir)

    def add_val(batch: pa.Table) -> pa.Table:
        hk = batch["hk"].to_numpy(zero_copy_only=False)
        return batch.append_column("val", pa.array(hk % 50))

    ds = lines.map_batches(add_val, batch_format="pyarrow")
    out = raster.rasterize_vector(
        ds, value_col="val",
        specs=[("n", "val", "count"), ("sum_val", "val", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_val"] = b["sum_val"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_RASTERIZE_LINE():
    kp = _sql_keyed_points("customer", "c_custkey", 8, 5, "hk")
    return f"""
WITH seg AS (
  SELECT hk, hk % 50 AS val, ix, iy FROM ({kp}) _hs
), cx_cells AS (
  SELECT hk, val, iy,
         unnest(generate_series(
           CAST(ceil(ix / 1024.0 - 1) AS BIGINT),
           (ix + 8000) // 1024)) AS cx
  FROM seg
), cells AS (
  SELECT hk, val, cx,
         unnest(generate_series(
           CAST(ceil(iy / 1024.0 - 1) AS BIGINT), iy // 1024)) AS cy
  FROM cx_cells
)
SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(val) AS BIGINT) AS sum_val
FROM cells GROUP BY cx, cy
"""


DIS_GRP_MOD = 8
DIS_X_RANGE = 32768   # group x spread in units
DIS_X_BASE = 100000
DIS_Y_BASE = 50000
DIS_Y_STEP = 8192


def q_dissolve(sf_dir: str):
    """Geometry union (dissolve) aggregation: supplier rects grouped
    into 8 bands; within a band every rect shares the same y-extent,
    so the exact 2-D sweep union equals height × 1-D x-interval union
    — which the oracle computes with gaps-and-islands SQL."""
    from pythongis_ray.geom import wkb as _wkb

    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    k = sup["s_suppkey"].to_numpy().astype(np.int64)
    grp = k % DIS_GRP_MOD
    xcu = (k * 48271) % DIS_X_RANGE + DIS_X_BASE
    ycu = DIS_Y_BASE + grp * DIS_Y_STEP
    hx = SUP_HALF_X / 1024.0
    hy = SUP_HALF_Y / 1024.0
    cx, cy = fixtures.units_to_deg(xcu, ycu)
    geoms = [
        _wkb.encode_polygon([np.array([[x - hx, y - hy], [x + hx, y - hy],
                                       [x + hx, y + hy], [x - hx, y + hy],
                                       [x - hx, y - hy]])])
        for x, y in zip(cx, cy)
    ]
    ds = _rd().from_pandas(pd.DataFrame({"grp": grp, "geometry": geoms}))
    out = spatial.dissolve(ds, "grp")
    return out.select_columns(["grp", "union_area", "n_parts"])


def SQL_DISSOLVE():
    return f"""
WITH r AS (
  SELECT s_suppkey % {DIS_GRP_MOD} AS grp,
         ((s_suppkey * 48271) % {DIS_X_RANGE} + {DIS_X_BASE} - {SUP_HALF_X})
           / 1024.0 - 180.0 AS x0,
         ((s_suppkey * 48271) % {DIS_X_RANGE} + {DIS_X_BASE} + {SUP_HALF_X})
           / 1024.0 - 180.0 AS x1
  FROM supplier
), o AS (
  SELECT grp, x0, x1,
         MAX(x1) OVER (PARTITION BY grp ORDER BY x0, x1
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM r
), g AS (
  SELECT grp, x0, x1,
         SUM(CASE WHEN pm IS NULL OR x0 > pm THEN 1 ELSE 0 END)
           OVER (PARTITION BY grp ORDER BY x0, x1
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM o
), isl AS (
  SELECT grp, island, MIN(x0) AS s, MAX(x1) AS e FROM g GROUP BY grp, island
)
SELECT grp, SUM((e - s) * (2 * {SUP_HALF_Y} / 1024.0)) AS union_area,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM isl GROUP BY grp
"""


def q_dissolve_poly(sf_dir: str):
    """GENERAL-polygon dissolve: per-group exact union of 45°
    diamonds via the rational slab sweep (geom.union). The fixture
    places each group's diamonds along a line at step 1024 units with
    half-diagonals r ≡ 1 (mod 4), so only consecutive diamonds can
    overlap (r_i + r_j ≤ 2046 < 2048 rules out skip-pairs) and
    touch-at-a-point is impossible (r_i + r_j ≡ 2 mod 4 ≠ 1024) —
    union area reduces to inclusion–exclusion over consecutive pairs
    in the rotated (u,v) = (x+y, x−y) frame, and component count to
    counting gaps: both closed-form in the oracle. Exactness: vertex
    coords are lattice units/1024, areas are N/2^21 → float-exact."""
    from pythongis_ray.geom import wkb as _wkb

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def mk(batch: pa.Table) -> pa.Table:
        s = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = s % 8
        pos = (s - 1) // 8
        r = 401 + 4 * ((s * 7) % 156)
        cxu = 10000 + pos * 1024
        cyu = 20000 + grp * 8192
        cx, cy = fixtures.units_to_deg(cxu, cyu)
        rd_ = r / 1024.0
        rings = np.empty((len(s), 5, 2), np.float64)
        rings[:, 0] = np.column_stack([cx - rd_, cy])
        rings[:, 1] = np.column_stack([cx, cy - rd_])
        rings[:, 2] = np.column_stack([cx + rd_, cy])
        rings[:, 3] = np.column_stack([cx, cy + rd_])
        rings[:, 4] = rings[:, 0]
        return pa.table({"grp": pa.array(grp),
                         "geometry": pa.array(
                             _wkb.encode_polygons_uniform(rings),
                             pa.binary())})

    dia = ds.map_batches(mk, batch_format="pyarrow", batch_size=16384)
    out = spatial.dissolve(dia, "grp")
    return out.select_columns(["grp", "union_area", "n_parts"])


SQL_DISSOLVE_POLY = """
WITH s AS (
  SELECT s_suppkey % 8 AS grp, (s_suppkey - 1) // 8 AS pos,
         401 + 4 * ((s_suppkey * 7) % 156) AS r
  FROM supplier
), p AS (
  SELECT grp, r, LAG(r) OVER (PARTITION BY grp ORDER BY pos) AS rp FROM s
)
SELECT grp,
  (CAST(SUM(4 * r * r) AS DOUBLE)
   - CAST(SUM(CASE WHEN rp IS NOT NULL AND rp + r > 1024
                   THEN (rp + r - 1024) * (rp + r - 1024)
                   ELSE 0 END) AS DOUBLE)) / 2097152.0 AS union_area,
  CAST(1 + SUM(CASE WHEN rp IS NOT NULL AND rp + r <= 1024
               THEN 1 ELSE 0 END) AS BIGINT) AS n_parts
FROM p GROUP BY grp
"""


def q_dissolve_inter(sf_dir: str):
    """Geometry intersection aggregation: pairs of supplier rects per
    group; common-rect area (reference aggreg geomfunc intersection,
    sql.py:129-137)."""
    from pythongis_ray.geom import wkb as _wkb

    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    k = sup["s_suppkey"].to_numpy().astype(np.int64)
    grp = k % 50
    xcu = (k * 48271) % 4096 + 200000
    ycu = (k * 16807) % 4096 + 60000
    hx = SUP_HALF_X / 1024.0
    hy = SUP_HALF_Y / 1024.0
    cx, cy = fixtures.units_to_deg(xcu, ycu)
    geoms = [
        _wkb.encode_polygon([np.array([[x - hx, y - hy], [x + hx, y - hy],
                                       [x + hx, y + hy], [x - hx, y + hy],
                                       [x - hx, y - hy]])])
        for x, y in zip(cx, cy)
    ]
    ds = _rd().from_pandas(pd.DataFrame({"grp": grp, "geometry": geoms}))
    out = spatial.dissolve(ds, "grp", geomfunc="intersection")
    return out.select_columns(["grp", "inter_area"])


def SQL_DISSOLVE_INTER():
    return f"""
WITH r AS (
  SELECT s_suppkey % 50 AS grp,
    ((s_suppkey*48271) % 4096 + 200000 - {SUP_HALF_X})/1024.0 - 180.0 AS x0,
    ((s_suppkey*48271) % 4096 + 200000 + {SUP_HALF_X})/1024.0 - 180.0 AS x1,
    ((s_suppkey*16807) % 4096 + 60000 - {SUP_HALF_Y})/1024.0 - 90.0 AS y0,
    ((s_suppkey*16807) % 4096 + 60000 + {SUP_HALF_Y})/1024.0 - 90.0 AS y1
  FROM supplier
)
SELECT grp, (MIN(x1) - MAX(x0)) * (MIN(y1) - MAX(y0)) AS inter_area
FROM r GROUP BY grp
HAVING MIN(x1) > MAX(x0) AND MIN(y1) > MAX(y0)
"""


def q_compute_grouped(sf_dir: str):
    """Grouped stat written back to member rows (reference
    VectorData.compute(by=, stat=), data.py:602-639)."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_returnflag", "l_quantity"])

    def pk(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array(ok * 8 + ln),
                         "l_returnflag": batch["l_returnflag"],
                         "l_quantity": batch["l_quantity"]})

    ds = ds.map_batches(pk, batch_format="pyarrow", batch_size=65536)
    out = rel.compute_grouped(ds, "l_returnflag", "l_quantity", "mean",
                              "grp_avg_qty")
    return out.select_columns(["pk", "l_returnflag", "l_quantity",
                               "grp_avg_qty"])


SQL_COMPUTE_GROUPED = """
SELECT l_orderkey * 8 + l_linenumber AS pk, l_returnflag, l_quantity,
       CAST(SUM(l_quantity) OVER w AS DOUBLE) / COUNT(*) OVER w AS grp_avg_qty
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag)
"""


def q_join_collapse(sf_dir: str):
    """Join with collapse fusion: per-customer order stats aggregated
    BEFORE attaching (reference join collapse=True, data.py:1017-1114)."""
    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"]) \
        .rename(columns={"o_custkey": "c_custkey"})
    orders["price_cents"] = np.rint(orders["o_totalprice"].to_numpy()
                                    * 100.0).astype(np.int64)
    out = rel.hash_join(cust, orders[["c_custkey", "price_cents"]],
                        on="c_custkey", how="inner",
                        collapse=[("n_orders", "price_cents", "count"),
                                  ("sum_cents", "price_cents", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["n_orders"] = b["n_orders"].astype(np.int64)
        b["sum_cents"] = b["sum_cents"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_JOIN_COLLAPSE = """
SELECT c_custkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
"""


def q_sessionize(sf_dir: str):
    """Gap-based sessionization of the event log (5-minute gap)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"], "ts_us": pa.array(us)})

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = rel.sessionize(ds, "user_id", ["ts_us", "event_id"], "ts_us",
                         gap=300_000_000)
    return out.select_columns(["event_id", "user_id", "session_id"])


SQL_SESSIONIZE = """
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN prev_us IS NOT NULL
                      AND epoch_us(ts) - prev_us > 300000000
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS session_id
FROM (SELECT event_id, user_id, ts,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events)
"""


def q_asof_orders(sf_dir: str):
    """As-of join: each event picks the user's most recent order at or
    before the event time (distributed merge_asof; DuckDB ASOF JOIN is
    the oracle). Right side pre-deduped to max orderkey per
    (custkey, orderdate) so ties are deterministic in both engines."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
    od = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate", "o_orderkey"])
    out = rel.asof_join(ev, od, left_on="ts", right_on="o_orderdate",
                        left_by="user_id", right_by="o_custkey",
                        right_cols=["o_orderkey"], tie_cols=["o_orderkey"],
                        how="inner")
    return out.select_columns(["event_id", "user_id", "o_orderkey"])


SQL_ASOF_ORDERS = """
WITH od AS (SELECT o_custkey, o_orderdate,
                   max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, od.o_orderkey
FROM events e ASOF JOIN od
  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
"""


def q_interval_events(sf_dir: str):
    """Range (interval) join: every non-purchase event landing inside a
    same-user purchase's 1-hour attribution window — the 1-D analogue
    of the spatial cell join, matched per key by a vectorized
    lexicographic-merge range scan."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "event_type"])
    left = ev.filter(expr="event_type != 'purchase'") \
        .select_columns(["event_id", "user_id", "ts"])

    def windows(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["event_type"], "purchase")
        b = batch.filter(m)
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table({"user_id": b["user_id"],
                         "w_start": pa.array(ts),
                         "w_end": pa.array(ts + np.timedelta64(3600, "s")),
                         "purchase_id": b["event_id"]})

    right = ev.map_batches(windows, batch_format="pyarrow", batch_size=65536)
    out = rel.interval_join(left, right, left_by="user_id",
                            right_by="user_id", left_time="ts",
                            right_start="w_start", right_end="w_end",
                            right_cols=["purchase_id"])
    return out.select_columns(["event_id", "purchase_id", "user_id"])


SQL_INTERVAL_EVENTS = """
SELECT c.event_id, p.event_id AS purchase_id, c.user_id
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type <> 'purchase'
 AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
"""


def q_reproject_x(sf_dir: str):
    """WebMercator reprojection (x axis; y involves tan/log whose last
    ulp differs between libm builds — verified here on the exactly
    matching axis, full reproject covered by unit tests)."""
    from pythongis_ray import vector as vec

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    out = vec.reproject(cpts, "to_webmercator")
    return out.select_columns(["ck", "lon", "x"])


SQL_REPROJECT_X = f"""
WITH cpts AS ({{CPTS}})
SELECT ck, lon, radians(lon) * 6378137.0 AS x FROM cpts
"""


def SQL_REPROJECT_X_F():
    return SQL_REPROJECT_X.replace(
        "{CPTS}", _sql_keyed_points("customer", "c_custkey", 4, 1, "ck"))


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs: 4×16-bit banded candidates + popcount
    Hamming verify ≤ 8, capped buckets. Oracle: the engine's 64-bit
    polynomial token hash replayed in DuckDB HUGEINT arithmetic
    (fold h = h*P + byte mod 2^64 per char), per-bit majority vote,
    banded self-join + bit_count Hamming — bit-exact because every
    step is integer. The ``bucket_cap`` guard is a no-op below 1024
    bucket members (true at every test sf), so the SQL omits it."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return rel.driver_safe(
        text.simhash_dedup_pairs(ds, max_hamming=8, bucket_cap=1024),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("hamming", pa.int64())]))


# shared SQL prelude: uint64 SimHash per doc replayed in HUGEINT
# (token hash = fold h*P + byte mod 2^64 over chars — same P and
# semantics as text._poly_hash_segments; bit j of the simhash set iff
# a strict majority of token OCCURRENCES have bit j set)
_SQL_SIMHASH_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS word FROM toks),
h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT),
        [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
        (acc, x) -> (acc * 1099511628211 + x)
                    % CAST('18446744073709551616' AS HUGEINT)) AS th
      FROM w),
bitpow(bit, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL SELECT bit + 1, p * 2 FROM bitpow WHERE bit < 63),
bits AS (SELECT h.doc_id, b.bit, b.p, (h.th // b.p) % 2 AS v
         FROM h CROSS JOIN bitpow b),
agg AS (SELECT doc_id, bit, ANY_VALUE(p) AS p, SUM(v) AS cnt1,
               COUNT(*) AS ntok
        FROM bits GROUP BY doc_id, bit),
sh AS (SELECT doc_id,
         SUM(CASE WHEN 2 * cnt1 > ntok THEN p
                  ELSE CAST(0 AS HUGEINT) END) AS u
       FROM agg GROUP BY doc_id)
"""

SQL_SIMHASH_PAIRS = """
WITH RECURSIVE
""" + _SQL_SIMHASH_CTE + """,
sv AS (SELECT doc_id, u,
         CAST(u - CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS s
       FROM sh),
bands AS (SELECT doc_id, bp.bb AS band_id,
                 CAST((u // CAST(bp.p AS HUGEINT)) % 65536 AS BIGINT)
                   AS band_val, s
          FROM sv CROSS JOIN (VALUES (0, 1), (1, 65536),
                                     (2, 4294967296),
                                     (3, 281474976710656)) bp(bb, p)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                a.s AS sa, b.s AS sb
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 8
"""


def q_minhash_pairs(sf_dir: str):
    """Near-dup detection (MinHash-LSH candidates + exact shingle-set
    Jaccard verify). Oracle: all-pairs shingle Jaccard in DuckDB —
    equality holds because the fixed 32x2 band family has
    deterministic full recall on the fixture (miss prob ≤ 6e-15 at
    the J ≥ 0.8 of every true pair; verified exhaustively)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return rel.driver_safe(
        text.minhash_dedup_pairs(ds, threshold=0.5),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("jaccard", pa.float64())]))


def q_ngram_jaccard(sf_dir: str):
    """EXACT shingle-Jaccard near-dup pairs (inverted-index
    candidates, full recall by construction) — same oracle family as
    minhash_pairs but at a threshold the banding can't guarantee."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return rel.driver_safe(
        text.ngram_jaccard_pairs(ds, threshold=0.3),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("jaccard", pa.float64())]))


SQL_NGRAM_JACCARD = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3
"""


SQL_MINHASH_PAIRS = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
"""


# --------------------------------------------------- non-SQL (rows-only)


def q_simhash(sf_dir: str):
    """Per-doc 64-bit SimHash (stored signed as value - 2^63). Oracle:
    the same polynomial-hash + bit-majority computation in DuckDB
    HUGEINT arithmetic (see SQL_SIMHASH_PAIRS prelude)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.add_simhash(ds).select_columns(["doc_id", "simhash"])


SQL_SIMHASH = """
WITH RECURSIVE
""" + _SQL_SIMHASH_CTE + """
SELECT doc_id,
       CAST(u - CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
         AS simhash
FROM sh
"""


SQL_LANGID = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS word FROM toks),
sc AS (SELECT doc_id,
  COUNT(*) FILTER (word IN ('der','die','das','und','ist','nicht')) AS de,
  COUNT(*) FILTER (word IN ('the','and','of','to','a','in','is')) AS en,
  COUNT(*) FILTER (word IN ('el','la','los','y','es','una')) AS es,
  COUNT(*) FILTER (word IN ('le','la','les','et','est','une')) AS fr
  FROM w GROUP BY 1)
SELECT doc_id,
  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
       WHEN en >= es AND en >= fr THEN 'en'
       WHEN es >= fr THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM sc
"""


def q_langid(sf_dir: str):
    """Stopword-table language ID (actor pool; one is_in kernel per
    language per batch). Oracle-paired: the count-argmax with
    alphabetical-first tie-break is plain SQL (SQL_LANGID)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(text.LanguageId, batch_format="pyarrow", batch_size=8192,
                         concurrency=2)
    return out.select_columns(["doc_id", "lang_pred"])


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate top-k, fully oracle-paired: quantized
    int64 hyperplane signs make bucket assignment exact, so the SQL
    replay (plane literals + list_dot_product sign bits + the same
    quantized re-rank) reproduces the identical candidate set AND
    ranking."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 8)])
    out = embed.ann_lsh(emb, qdf, k=5)
    out = out[["query_id", "neighbor_id", "score", "rank"]].copy()
    out["score"] = out["score"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    return out


def _sql_ann_lsh(k: int = 5, n_planes: int = 16, dim: int = 64) -> str:
    """Replays ann_lsh end-to-end: the plane literals are the SAME
    deterministic quantized hyperplanes the engine builds
    (embed.lsh_planes, seed 42); per-term products stay < 2^31 so
    list_dot_product's doubles are exact."""
    from pythongis_ray import embed as _embed

    planes = _embed.lsh_planes(n_planes, dim)
    rows = ",\n    ".join(
        f"({j}, [{', '.join(map(str, planes[j].tolist()))}])"
        for j in range(n_planes))
    return f"""
WITH planes(j, p) AS (VALUES
    {rows}),
eq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(CAST(x AS DOUBLE) * 1000)) AS e
  FROM embeddings),
buck AS (
  SELECT eq.vec_id,
         CAST(SUM(CASE WHEN list_dot_product(eq.e, p.p) > 0
                  THEN 1 << p.j ELSE 0 END) AS BIGINT) AS b
  FROM eq CROSS JOIN planes p GROUP BY eq.vec_id),
qb AS (SELECT DISTINCT b FROM buck WHERE vec_id < 8),
cand AS (
  SELECT eq.vec_id, eq.e FROM eq
  JOIN buck ON buck.vec_id = eq.vec_id
  JOIN qb ON qb.b = buck.b),
q AS (SELECT vec_id AS query_id, e AS qe FROM eq WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe, c.e) AS BIGINT) AS score
  FROM q CROSS JOIN cand c WHERE c.vec_id != q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k (coarse k-means lists + nprobe probing);
    rows-only — iterative float training is not SQL-expressible;
    exactness at nprobe=n_centroids is unit-tested."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 8)])
    return embed.ann_ivf(emb, qdf, k=5, n_centroids=16, nprobe=4)


IVF_INT_CENTROIDS = 16
IVF_INT_NPROBE = 4
IVF_INT_ITERS = 4


def q_ann_ivf_int(sf_dir: str):
    """IVF approximate top-k with an integer-lattice k-means coarse
    quantizer (embed.ann_ivf_int): distributed Lloyd training,
    exact-integer probe selection + list assignment, exact quantized
    re-rank. Fully oracle-paired — the SQL replays the iterative fit
    (chained CTEs), the nprobe probe lists, the candidate union, and
    the final ranking bit-exactly."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 8)])
    out = embed.ann_ivf_int(emb, qdf, k=5, n_centroids=IVF_INT_CENTROIDS,
                            nprobe=IVF_INT_NPROBE, iters=IVF_INT_ITERS)
    out = out[["query_id", "neighbor_id", "score", "rank"]].copy()
    out["score"] = out["score"].astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    return out


def _sql_ann_ivf_int(k: int = 5) -> str:
    """Replays ann_ivf_int end-to-end: the kmeans CTE chain yields the
    trained centroids c{iters} and the final assignment ``af``; probe
    lists rank centroids by exact integer distance (ties -> lowest id),
    candidates are the union of probed lists, and the re-rank matches
    TopKDot (score DESC, neighbor_id; self excluded)."""
    it = IVF_INT_ITERS
    return f"""
WITH {_sql_kmeans_ctes(IVF_INT_CENTROIDS, it)},
q AS (SELECT vec_id AS query_id, e AS qe FROM eq WHERE vec_id < 8),
qprobe AS (
  SELECT query_id, i FROM (
    SELECT q.query_id, c.i,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.qe, q.qe)
             - 2 * list_dot_product(q.qe, c.c)
             + list_dot_product(c.c, c.c), c.i) AS rn
    FROM q CROSS JOIN c{it} c) WHERE rn <= {IVF_INT_NPROBE}),
probe AS (SELECT DISTINCT i FROM qprobe),
cand AS (SELECT a.vec_id, a.e FROM af a JOIN probe p ON p.i = a.cluster),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe, c.e) AS BIGINT) AS score
  FROM q CROSS JOIN cand c WHERE c.vec_id != q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def q_geodetic_buffer(sf_dir: str):
    """Geodetic point buffers (Vincenty rings) around customer points."""
    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def buf(batch: pa.Table) -> pd.DataFrame:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = np.clip(batch["lat"].to_numpy(zero_copy_only=False), -85, 85)
        from pythongis_ray.geom import wkb as _wkb
        rings = geodesy.geodetic_point_buffers(lon, lat, 50_000.0, n=16)
        return pd.DataFrame({
            "ck": batch["ck"].to_numpy(zero_copy_only=False),
            "buffer_wkb": _wkb.encode_polygons_uniform(rings),
            "ring_n": np.full(len(lon), rings.shape[1], np.int64),
        })

    return cpts.map_batches(buf, batch_format="pyarrow", batch_size=2048)


def q_reproject_utm(sf_dir: str):
    """Per-point UTM projection (Snyder ellipsoidal TM, geom/proj.py):
    each point projects in its own 6° zone. Rows-only: the series uses
    transcendentals whose last ulp varies across libm builds."""
    from pythongis_ray.geom import proj as _proj
    from pythongis_ray import vector as vec   # noqa: F401  (API surface)

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = np.clip(batch["lat"].to_numpy(zero_copy_only=False), -79.9, 83.9)
        zone = np.clip(np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1,
                       1, 60)
        x = np.empty(len(lon))
        y = np.empty(len(lon))
        for z in np.unique(zone):
            m = zone == z
            x[m], y[m] = _proj.utm_forward(lon[m], lat[m], int(z))
        return pa.table({"ck": batch["ck"], "zone": pa.array(zone),
                         "easting": pa.array(x), "northing": pa.array(y)})

    return cpts.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def q_geodetic_area(sf_dir: str):
    """Ellipsoidal polygon areas of the supplier rects (rows-only:
    the authalic-latitude formula uses sin/ln whose last ulp differs
    across libm builds; exactness covered by unit tests)."""
    from pythongis_ray import vector as vec

    left = supplier_rects(sf_dir)
    out = vec.geodetic_area(_rd().from_pandas(left))
    return out.select_columns(["sup_id", "area_m2"])


def q_resample_bilinear(sf_dir: str):
    """Bilinear tile-grid resample (rows-only; exactness covered by
    the linear-field reproduction unit test)."""
    from pythongis_ray import raster

    src = raster.make_raster(
        lambda lon, lat, b: (lon + 2.0 * lat).astype(np.float32), res=2)
    out = raster.resample_bilinear(_rd().from_pandas(src), 2, 3)
    return out.select_columns(["cell_id", "band", "nodata"])


def q_warp_mercator(sf_dir: str):
    """Raster mesh warp lonlat → WebMercator (rows-only: the mercator
    inverse uses log/atan transcendentals; exactness covered by the
    lon-field reproduction unit test)."""
    from pythongis_ray import raster

    src = raster.make_raster(lambda lon, lat, b: lon.astype(np.float32),
                             res=2)
    out = raster.warp_to_mercator(_rd().from_pandas(src), src_res=2, zoom=3)
    return out.select_columns(["mcell", "band", "nodata"])


def q_warp_utm(sf_dir: str):
    """Raster mesh warp lonlat → UTM 33N through the generalized
    projected-warp path (rows-only: the Snyder series inverse is
    transcendental; value parity is covered by the lon-field
    reproduction unit test at mm-grade inverse accuracy, the same
    protocol as reproject_utm)."""
    from pythongis_ray import raster

    src = raster.make_raster(lambda lon, lat, b: lon.astype(np.float32),
                             res=2)
    out = raster.warp_to_projection(
        _rd().from_pandas(src), src_res=2, crs="utm:33N",
        x_min=166_000.0, y_min=4_000_000.0, cell_m=8000.0,
        width_px=4 * 64, height_px=4 * 64)
    return out.select_columns(["dcell", "band", "nodata"])


def q_reproject_conic(sf_dir: str):
    """Per-point Albers Equal-Area Conic + Lambert Conformal Conic
    (CONUS parameters, Snyder ellipsoidal 2SP, geom/proj.py) over the
    customer points — the conic national-grid workflow (rows-only:
    transcendental series; correctness is locked by the
    invariant-based unit tests: exact local equal-area for Albers,
    conformality + unit scale on standard parallels for LCC)."""
    from pythongis_ray.geom import proj as _proj

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = np.clip(batch["lat"].to_numpy(zero_copy_only=False),
                      -85.0, 85.0)
        ax, ay = _proj.albers_forward(lon, lat, -96.0, 23.0, 29.5, 45.5)
        lx, ly = _proj.lcc_forward(lon, lat, -96.0, 23.0, 33.0, 45.0)
        return pa.table({"ck": batch["ck"],
                         "albers_x": pa.array(ax), "albers_y": pa.array(ay),
                         "lcc_x": pa.array(lx), "lcc_y": pa.array(ly)})

    return cpts.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def q_warp_albers(sf_dir: str):
    """Raster mesh warp lonlat → CONUS Albers through the generalized
    projected-warp path (rows-only, same protocol as warp_utm; value
    parity covered by the lat-field reproduction unit test)."""
    from pythongis_ray import raster

    src = raster.make_raster(lambda lon, lat, b: lat.astype(np.float32),
                             res=2)
    out = raster.warp_to_projection(
        _rd().from_pandas(src), src_res=2, crs="albers:-96,23,29.5,45.5",
        x_min=-1_200_000.0, y_min=800_000.0, cell_m=20_000.0,
        width_px=4 * 64, height_px=4 * 64)
    return out.select_columns(["dcell", "band", "nodata"])


def q_dedup_near_embed(sf_dir: str):
    """Nearest-neighbor (rank-1) per query over the quantized-dot
    metric — the per-doc "closest near-dup" view of the embedding
    dedup plan. Oracle: same int64-quantized dot + deterministic
    (score DESC, neighbor_id) ordering as SQL_ANN_TOPK."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 64)])
    out = embed.ann_topk(emb, qdf, k=2)
    out = out[out["rank"] == 1][["query_id", "neighbor_id", "score"]].copy()
    out["score"] = out["score"].astype(np.int64)
    return out


SQL_DEDUP_NEAR_EMBED = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qe
  FROM embeddings WHERE vec_id < 64
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe,
              list_transform(e.embedding,
                             x -> round(CAST(x AS DOUBLE) * 1000)))
              AS BIGINT) AS score
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, score FROM ranked WHERE rnk = 1
"""


# -------------------------------------------------------------- web ops

def q_extract_text(sf_dir: str):
    """HTML → text extraction over the synthesized pages table; the
    north-rule invariant (extracted text byte-identical to the carried
    `text` per url) is what the value hash checks."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False)
    ds = ds.map_batches(pages.extract_text, batch_format="pyarrow",
                        batch_size=4096)
    return ds.select_columns(["url", "text_extracted"])


SQL_EXTRACT_TEXT = """
SELECT 'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/'
         || CAST(doc_id AS VARCHAR) AS url,
       regexp_replace('<html><body>' || text || '</body></html>',
                      '<[^>]*>', '', 'g') AS text_extracted
FROM documents
"""


def q_url_hosts(sf_dir: str):
    """Per-host page counts via the vectorized URL parser (both
    engines parse the SAME constructed url strings with the same RE2
    class, so host extraction parity is what's checked)."""
    from pythongis_ray import pages, urltools

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url"])
    ds = ds.map_batches(
        lambda b: urltools.add_url_parts(b, parts=("host",)),
        batch_format="pyarrow", batch_size=8192)
    return rel.groupby_aggregate(ds, "url_host",
                                 [("n_pages", "page_id", "count")])


SQL_URL_HOSTS = """
WITH p AS (
  SELECT 'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents)
SELECT regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)
         AS url_host,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM p GROUP BY 1
"""


def q_url_canon(sf_dir: str):
    """URL canonicalization + exact canonical dedup: every doc yields
    two deterministic spellings of the same logical URL (an upper-cased
    host:443 + utm params + fragment + trailing-slash variant, and the
    clean form); canonicalization must collapse each pair to one key
    with count 2 — the first dedup pass of a web-corpus build."""
    from pythongis_ray import urltools

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def two_forms(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        site = pc.cast(pa.array(did % 50), pa.string())
        pid = pc.cast(pa.array(did), pa.string())
        ref = pc.cast(pa.array(did % 7), pa.string())
        n = len(did)
        messy = pc.binary_join_element_wise(
            pa.array(["HTTPS://Site"] * n), site,
            pa.array([".Example:443/p/"] * n), pid,
            pa.array(["/?utm_source=feed&ref="] * n), ref,
            pa.array(["#s"] * n), "")
        clean = pc.binary_join_element_wise(
            pa.array(["https://site"] * n), site,
            pa.array([".example/p/"] * n), pid,
            pa.array(["?ref="] * n), ref, "")
        return pa.table({"url": pa.concat_arrays([messy, clean])})

    ds = ds.map_batches(two_forms, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(urltools.add_canonical_url, batch_format="pyarrow",
                        batch_size=16384)
    return rel.groupby_aggregate(ds, "url_canon",
                                 [("n_spellings", "url", "count")])


SQL_URL_CANON = """
WITH forms AS (
  SELECT 'HTTPS://Site' || CAST(doc_id % 50 AS VARCHAR) || '.Example:443/p/'
           || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&ref='
           || CAST(doc_id % 7 AS VARCHAR) || '#s' AS url FROM documents
  UNION ALL
  SELECT 'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) || '?ref='
           || CAST(doc_id % 7 AS VARCHAR) FROM documents),
parts AS (
  SELECT lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(url, '://([^/?#:]*)', 1)) AS host,
         regexp_extract(url, '://[^/?#:]*:?([0-9]*)', 1) AS port,
         regexp_extract(url, '://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM forms),
canon AS (
  SELECT scheme || '://' || host
      || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                OR (scheme = 'https' AND port = '443')
              THEN '' ELSE ':' || port END
      || CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(path, '/+$', '') END
      || CASE WHEN regexp_replace(regexp_replace(
                     query, '(^|&)utm_[^&]*', '', 'g'), '^&', '') = ''
              THEN ''
              ELSE '?' || regexp_replace(regexp_replace(
                     query, '(^|&)utm_[^&]*', '', 'g'), '^&', '') END
         AS url_canon
  FROM parts)
SELECT url_canon, CAST(COUNT(*) AS BIGINT) AS n_spellings
FROM canon GROUP BY 1
"""


def q_repetition(sf_dir: str):
    """Gopher-style duplicate word-bigram statistics per document."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(text.repetition_stats, batch_format="pyarrow",
                          batch_size=8192)


SQL_REPETITION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bg AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g
       FROM toks, UNNEST(range(1, len(l))) AS t(i)),
cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
agg AS (SELECT doc_id, SUM(c) AS n_ngrams,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_ngrams,
               MAX(c) AS top_count
        FROM cnt GROUP BY 1)
SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
       CAST(dup_ngrams AS BIGINT) AS dup_ngrams,
       CAST(top_count AS BIGINT) AS top_count,
       CAST(dup_ngrams AS DOUBLE) / n_ngrams AS dup_frac
FROM agg
"""


FEATHASH_DIMS = 16


def q_feature_hash(sf_dir: str):
    """Hashing-trick doc features in long form (doc_id, dim, cnt>0):
    stateless featurization, one token-hash pass + bincount per batch.
    Oracle: the engine's polynomial token hash replayed in DuckDB
    HUGEINT arithmetic (same CTE family as the SimHash oracle)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = text.feature_hash_vectors(ds, dims=FEATHASH_DIMS)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vec = batch["vec"]
        vec = vec.combine_chunks() if isinstance(vec, pa.ChunkedArray) \
            else vec
        flat = vec.values.to_numpy(zero_copy_only=False)
        n = len(ids)
        did = np.repeat(ids, FEATHASH_DIMS)
        dim = np.tile(np.arange(FEATHASH_DIMS, dtype=np.int64), n)
        m = flat > 0
        return pa.table({"doc_id": pa.array(did[m]),
                         "dim": pa.array(dim[m]),
                         "cnt": pa.array(flat[m])})

    return out.map_batches(explode, batch_format="pyarrow",
                           batch_size=8192)


SQL_FEATURE_HASH = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS word FROM toks),
h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT),
        [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
        (acc, x) -> (acc * 1099511628211 + x)
                    % CAST('18446744073709551616' AS HUGEINT)) AS th
      FROM w)
SELECT doc_id, CAST(th % {FEATHASH_DIMS} AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM h GROUP BY 1, 2
"""


def q_quality_funnel(sf_dir: str):
    """Filter-funnel verdict per doc (first failing rule or 'kept'):
    the per-stage rejection report of a production corpus build, as
    one fused streaming pass (token/stopword counts + Gopher bigram
    repetition in the same batch). Integer predicates only — replays
    bit-exactly in SQL."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(text.quality_funnel, batch_format="pyarrow",
                          batch_size=8192)


SQL_QUALITY_FUNNEL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
f AS (SELECT doc_id, len(l) AS n_tokens,
             len(list_filter(l, w -> w IN {tuple(text.STOPWORDS)!r})) AS n_stop
      FROM toks),
bg AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g
       FROM toks, UNNEST(range(1, len(l))) AS t(i)),
cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
agg AS (SELECT doc_id, SUM(c) AS n_ngrams,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_ngrams
        FROM cnt GROUP BY 1)
SELECT f.doc_id,
       CASE WHEN f.n_tokens < {text.FUNNEL_MIN_TOKENS} THEN 'too_short'
            WHEN f.n_stop * {text.FUNNEL_STOP_DENOM} < f.n_tokens
                 THEN 'low_stopword'
            WHEN COALESCE(a.dup_ngrams, 0) * {text.FUNNEL_REP_NUM}
                 > COALESCE(a.n_ngrams, 1) THEN 'repetitive'
            ELSE 'kept' END AS verdict
FROM f LEFT JOIN agg a ON a.doc_id = f.doc_id
"""


def q_decontam(sf_dir: str):
    """Benchmark decontamination: corpus docs sharing a 4-token shingle
    with the benchmark subset (doc_id % 101 == 0), with the count of
    contaminated shingle occurrences."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.decontaminate(ds, n=4, bench_mod=101)


SQL_DECONTAM = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sh AS (SELECT doc_id, array_to_string(l[i:i+3], ' ') AS g
       FROM toks, UNNEST(range(1, len(l) - 2)) AS t(i)),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 101 = 0),
hits AS (SELECT s.doc_id, COUNT(*) AS n_hits
         FROM sh s JOIN bench b USING (g)
         WHERE s.doc_id % 101 <> 0 GROUP BY 1)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_contaminated FROM hits
"""


def q_dedup_components(sf_dir: str):
    """Near-dup CLUSTERING: MinHash-LSH pairs → distributed
    connected components (hash-min label propagation, graph.py) →
    one component id per clustered doc + the keep flag (component
    representative = min doc_id). Pairwise near-dup alone
    under-deletes transitive chains; this is the step that turns
    pairs into a dedup decision."""
    from pythongis_ray import graph

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    pairs = text.minhash_dedup_pairs(ds, threshold=0.5).materialize()
    comp = graph.connected_components(
        pairs.select_columns(["id_a", "id_b"]))

    def finish(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        lab = batch["component"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(node),
                         "component": pa.array(lab),
                         "keep": pa.array((node == lab).astype(np.int64))})

    return comp.map_batches(finish, batch_format="pyarrow",
                            batch_size=65536)


SQL_DEDUP_COMPONENTS = """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
SELECT src AS doc_id, MIN(dst) AS component,
       CAST(src = MIN(dst) AS BIGINT) AS keep
FROM reach GROUP BY src
"""


def q_canonical_docs(sf_dir: str):
    """Quality-aware canonical selection per near-dup cluster: rather
    than keep-FIRST (dedup_components), each cluster keeps its
    longest member (ties -> lowest doc_id) — the
    keep-the-best-version policy of production dedup (e.g. CCNet
    keeps the highest-LM-score copy). Pipeline: MinHash-LSH pairs →
    connected components → distributed hash join with per-doc token
    counts → per-component argmax. One rollup row per cluster."""
    from pythongis_ray import graph

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    # the verified pair table is tiny (near-dup candidates only);
    # materializing it stops Ray fusing the small-batch verify chain
    # into the CC route map (bundle-size collapse, ~2x wall time)
    pairs = text.minhash_dedup_pairs(ds, threshold=0.5).materialize()
    comp = graph.connected_components(
        pairs.select_columns(["id_a", "id_b"]))
    comp = comp.map_batches(
        lambda b: b.rename_columns(["doc_id", "component"]),
        batch_format="pyarrow", batch_size=65536)
    toks = ds.map_batches(text.token_count, batch_format="pyarrow",
                          batch_size=8192).select_columns(
                              ["doc_id", "n_tokens"])
    joined = rel.join_large(comp, toks, on="doc_id")

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["component", "n_tokens", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        top = g.groupby("component", sort=False).head(1)
        size = g.groupby("component", sort=False).size()
        return pd.DataFrame({
            "component": top["component"].to_numpy(np.int64),
            "canonical_id": top["doc_id"].to_numpy(np.int64),
            "canonical_tokens": top["n_tokens"].to_numpy(np.int64),
            "n_docs": size.loc[top["component"]].to_numpy(np.int64)})

    return rel.bucketed_group_apply(joined, ["component"], best)


SQL_CANONICAL_DOCS = """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
comp AS (SELECT src AS doc_id, MIN(dst) AS component
         FROM reach GROUP BY src),
t AS (SELECT doc_id,
             CAST(length(text) - length(replace(text, ' ', '')) + 1
                  AS BIGINT) AS n_tokens
      FROM documents),
j AS (SELECT c.component, c.doc_id, t.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY c.component
                 ORDER BY t.n_tokens DESC, c.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY c.component) AS n_docs
      FROM comp c JOIN t ON t.doc_id = c.doc_id)
SELECT component, doc_id AS canonical_id,
       n_tokens AS canonical_tokens, CAST(n_docs AS BIGINT) AS n_docs
FROM j WHERE rn = 1
"""


def q_line_dedup(sf_dir: str):
    """Cross-document line-level dedup (C4-style): disjoint 10-token
    lines, keep-first by (doc_id, line_idx); per-doc kept/total
    counts."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.line_dedup(ds, line_len=10)


SQL_LINE_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
lines AS (
  SELECT doc_id, ci AS line_idx,
         array_to_string(l[ci*10+1 : ci*10+10], ' ') AS line,
         doc_id * 1048576 + ci AS rnk
  FROM toks, UNNEST(range(0, (len(l) + 9) // 10)) AS t(ci)),
flagged AS (
  SELECT doc_id,
         CASE WHEN rnk = MIN(rnk) OVER (PARTITION BY line)
              THEN 1 ELSE 0 END AS kept
  FROM lines)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(kept) AS BIGINT) AS n_kept
FROM flagged GROUP BY doc_id
"""


def q_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document (raw-ratio idf; exact-integer
    product + one division so score doubles are bit-identical across
    engines)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.tfidf_topk(ds, k=3)


SQL_TFIDF_TOPK = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS word FROM toks),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.word, t.tf, d.df,
         CAST(t.tf * (SELECT n_docs FROM n) AS DOUBLE) / d.df AS score
  FROM tf t JOIN df d USING (word)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, word ASC) AS rnk
  FROM scored)
SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       score, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""


def q_pii_scrub(sf_dir: str):
    """PII redaction over deterministically-augmented doc text (every
    doc gets a constructed email/phone/IP so both engines scrub the
    SAME strings); value hash checks the scrubbed text and the match
    counts."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pc.cast(pa.array(did), pa.string())
        d50 = pc.cast(pa.array(did % 50), pa.string())
        d90 = pc.cast(pa.array(did % 90 + 10), pa.string())
        d200 = pc.cast(pa.array(did % 200), pa.string())
        d250 = pc.cast(pa.array(did % 250), pa.string())
        n = len(did)
        t = pc.binary_join_element_wise(
            batch["text"], pa.array([" contact user"] * n), d,
            pa.array(["@mail"] * n), d50,
            pa.array([".example call 555-0"] * n), d90,
            pa.array([" from 10."] * n), d200,
            pa.array([".0."] * n), d250, "")
        return pa.table({"doc_id": batch["doc_id"], "text": t})

    ds = ds.map_batches(augment, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(text.pii_scrub, batch_format="pyarrow",
                        batch_size=8192)
    return ds.select_columns(["doc_id", "text_scrubbed",
                              "n_emails", "n_phones", "n_ips"])


SQL_PII_SCRUB = """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail' || CAST(doc_id % 50 AS VARCHAR)
              || '.example call 555-0' || CAST(doc_id % 90 + 10 AS VARCHAR)
              || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.' || CAST(doc_id % 250 AS VARCHAR) AS t
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\\b555-[0-9]{2,4}\\b', '<PHONE>', 'g'),
      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')
    AS text_scrubbed,
  CAST(len(regexp_extract_all(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(t, '\\b555-[0-9]{2,4}\\b')) AS BIGINT)
    AS n_phones,
  CAST(len(regexp_extract_all(t,
      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
    AS n_ips
FROM aug
"""


def q_corpus_build(sf_dir: str):
    """Full web-corpus build (quality filter → exact dedup → near-dup
    cluster removal → PII scrub) composed end-to-end; the oracle
    composes the same stages as CTEs."""
    from pythongis_ray import pipelines

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return pipelines.corpus_build(ds)


SQL_CORPUS_BUILD = """
WITH RECURSIVE
docs0 AS (SELECT doc_id, text, string_split(text, ' ') AS l
          FROM documents),
q AS (SELECT doc_id, text, len(l) AS ntok,
        len(list_filter(l, x -> x IN ('the','a','and','of','to','in',
                                      'is','on','for','with'))) AS nstop
      FROM docs0),
qual AS (SELECT doc_id, text, ntok FROM q WHERE nstop * 20 >= ntok),
ex AS (SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY text),
surv AS (SELECT q2.doc_id, q2.text, q2.ntok
         FROM qual q2 JOIN ex USING (doc_id)),
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM surv),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT id_a, id_a FROM pairs
  UNION SELECT id_b, id_b FROM pairs),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
comp AS (SELECT src AS doc_id, MIN(dst) AS component
         FROM reach GROUP BY src),
kept AS (SELECT s2.doc_id, s2.text, s2.ntok
         FROM surv s2 LEFT JOIN comp c USING (doc_id)
         WHERE c.component IS NULL OR c.component = s2.doc_id)
SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
  regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\\b555-[0-9]{2,4}\\b', '<PHONE>', 'g'),
      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')
    AS text_final
FROM kept
"""


def q_pmi_bigrams(sf_dir: str):
    """Top-20 bigram associations by exact-integer PMI ratio
    (c(ab)*N / (c(a)*c(b)), min_count 5)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.pmi_bigrams(ds, k=20, min_count=5)


SQL_PMI_BIGRAMS = """
WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
bg AS (SELECT l[i] AS w1, l[i+1] AS w2
       FROM toks, UNNEST(range(1, len(l))) AS t(i)),
bi AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
uni AS (SELECT word, COUNT(*) AS c
        FROM (SELECT UNNEST(l) AS word FROM toks) GROUP BY 1),
n AS (SELECT COUNT(*) AS nn FROM bg),
sc AS (SELECT b.w1, b.w2, b.n_ab, a.c AS n_a, c2.c AS n_b,
              CAST(b.n_ab * (SELECT nn FROM n) AS DOUBLE)
                / CAST(a.c * c2.c AS DOUBLE) AS score
       FROM bi b JOIN uni a ON b.w1 = a.word
                 JOIN uni c2 ON b.w2 = c2.word
       WHERE b.n_ab >= 5),
ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, w1, w2)
                       AS rnk FROM sc)
SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b, score, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 20
"""


def q_dup_spans(sf_dir: str):
    """Exact duplicated-substring spans: rolling 8-token windows
    occurring >1x corpus-wide; per-doc window count + union-of-spans
    covered-token count (the Lee-et-al exact-substring dedup pass)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return rel.driver_safe(
        text.dup_spans(ds, w=8),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("lcs_run", pa.int64())]))


SQL_DUP_SPANS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, i, array_to_string(l[i:i+7], ' ') AS g,
             len(l) AS ntok
      FROM toks, UNNEST(range(1, len(l) - 6)) AS t(i)),
dup AS (SELECT g FROM w GROUP BY g HAVING COUNT(*) > 1),
hits AS (SELECT w.doc_id, w.i, w.ntok FROM w JOIN dup USING (g)),
cov AS (SELECT doc_id, COUNT(DISTINCT j) AS n_cov
        FROM hits, UNNEST(range(i, i + 8)) AS t(j) GROUP BY doc_id)
SELECT h.doc_id, CAST(ANY_VALUE(h.ntok) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
       CAST(ANY_VALUE(c.n_cov) AS BIGINT) AS n_tokens_covered
FROM hits h JOIN cov c USING (doc_id)
GROUP BY h.doc_id
"""


def q_kmv_distinct(sf_dir: str):
    """Approximate distinct-token count via a mergeable K-Minimum-
    Values sketch (k=16 so the ESTIMATOR path runs on the 31-word
    fixture vocabulary). Deterministic given the token hash, so the
    oracle replays hash + formula exactly."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return text.kmv_distinct(ds, k=16)


SQL_KMV_DISTINCT = """
WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
w AS (SELECT UNNEST(l) AS word FROM toks),
h0 AS (SELECT DISTINCT list_reduce(list_prepend(CAST(0 AS HUGEINT),
        [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
        (acc, x) -> (acc * 1099511628211 + x)
                    % CAST('18446744073709551616' AS HUGEINT)) AS th0
      FROM w),
-- (th0 * MIX) mod 2^64 without INT128 overflow: split th0 into
-- 32-bit halves (every intermediate < 2^97)
h AS (SELECT ((((th0 // 4294967296)
                * CAST('11400714819323198485' AS HUGEINT)) % 4294967296)
               * 4294967296
              + (th0 % 4294967296)
                * CAST('11400714819323198485' AS HUGEINT))
             % CAST('18446744073709551616' AS HUGEINT) AS th FROM h0),
ord AS (SELECT th FROM h ORDER BY th LIMIT 16),
agg AS (SELECT MAX(th) AS kth, COUNT(*) AS n FROM ord)
SELECT CASE WHEN n < 16 THEN CAST(n AS DOUBLE)
            ELSE CAST(15 * CAST('18446744073709551616' AS HUGEINT)
                      AS DOUBLE) / CAST(kth AS DOUBLE) END AS est,
       CASE WHEN n < 16 THEN CAST(-1 AS BIGINT)
            ELSE CAST(kth - CASE WHEN kth >=
                     CAST('9223372036854775808' AS HUGEINT)
                   THEN CAST('18446744073709551616' AS HUGEINT)
                   ELSE 0 END AS BIGINT) END AS kth_hash,
       CAST(n AS BIGINT) AS n_seen
FROM agg
"""


def q_kmv_by_host(sf_dir: str):
    """Per-host approximate distinct-token counts (grouped KMV, k=16)
    — the distinct-URLs-per-domain shape at sketch cost: O(hosts×k)
    moves through the combine, never the distinct values."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: pa.table({
            "host": pa.array(
                b["doc_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % 50),
            "text": b["text"]}),
        batch_format="pyarrow", batch_size=8192)
    return text.kmv_distinct_by(ds, "host", k=16)


SQL_KMV_BY_HOST = """
WITH w AS (SELECT doc_id % 50 AS host,
                  UNNEST(string_split(text, ' ')) AS word
           FROM documents),
h0 AS (SELECT DISTINCT host,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
        [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
        (acc, x) -> (acc * 1099511628211 + x)
                    % CAST('18446744073709551616' AS HUGEINT)) AS th0
      FROM w),
h AS (SELECT host, ((((th0 // 4294967296)
                * CAST('11400714819323198485' AS HUGEINT)) % 4294967296)
               * 4294967296
              + (th0 % 4294967296)
                * CAST('11400714819323198485' AS HUGEINT))
             % CAST('18446744073709551616' AS HUGEINT) AS th FROM h0),
hd AS (SELECT DISTINCT host, th FROM h),
ord AS (SELECT host, th,
               ROW_NUMBER() OVER (PARTITION BY host ORDER BY th) AS rn
        FROM hd),
agg AS (SELECT host, MAX(th) AS kth, COUNT(*) AS n
        FROM ord WHERE rn <= 16 GROUP BY host)
SELECT CAST(host AS BIGINT) AS host,
       CASE WHEN n < 16 THEN CAST(n AS DOUBLE)
            ELSE CAST(15 * CAST('18446744073709551616' AS HUGEINT)
                      AS DOUBLE) / CAST(kth AS DOUBLE) END AS est,
       CASE WHEN n < 16 THEN CAST(-1 AS BIGINT)
            ELSE CAST(kth - CASE WHEN kth >=
                     CAST('9223372036854775808' AS HUGEINT)
                   THEN CAST('18446744073709551616' AS HUGEINT)
                   ELSE 0 END AS BIGINT) END AS kth_hash,
       CAST(n AS BIGINT) AS n_seen
FROM agg
"""


def q_dedup_incremental(sf_dir: str):
    """Incremental crawl dedup: the even-id half of `documents` plays
    the already-accepted corpus, the odd-id half the new snapshot;
    keep new docs with unseen content (min-id representative +
    in-snapshot copy count). One 16-byte/row shuffle — old text never
    moves (text.dedup_incremental)."""
    docs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array(ids % 2 == parity))
        return fn

    old = docs.map_batches(half(0), batch_format="pyarrow", batch_size=8192)
    new = docs.map_batches(half(1), batch_format="pyarrow", batch_size=8192)
    return text.dedup_incremental(new, old)


SQL_DEDUP_INCREMENTAL = """
WITH oldt AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
newt AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM newt WHERE text NOT IN (SELECT text FROM oldt)
GROUP BY text
"""


def q_warc_roundtrip(sf_dir: str):
    """Full Common-Crawl-shaped ingestion loop: synthesize pages →
    write gzipped WARC files (distributed sink) → re-ingest with the
    Content-Length-driven parser → extract text from the re-read html.
    The extract_text oracle hash-matching proves urls, µs timestamps
    AND payload bytes survived the format round trip exactly."""
    import shutil
    import tempfile

    from pythongis_ray import pages, sources

    d = tempfile.mkdtemp(prefix="warc_q_", dir="/tmp")
    try:
        ds = pages.pages_dataset(sf_dir, geocode=False,
                                 columns=["url", "warc_ts", "html"])
        sources.write_warc(ds, d, compress=True)
        back = sources.read_warc(d)
        out = back.map_batches(pages.extract_text, batch_format="pyarrow",
                               batch_size=2048)
        return out.select_columns(["url", "text_extracted"]).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_WARC_ROUNDTRIP = SQL_EXTRACT_TEXT


def q_gpkg_roundtrip(sf_dir: str):
    """Vector interchange loop: customer points → GeoPackage (stdlib
    sqlite3 sink) → read back → decode WKB to exact lattice units.
    A hash match proves keys, GP-binary headers and coordinate
    doubles survived the format byte-exactly (the lattice makes
    lon→units reconstruction exact in float64)."""
    import shutil
    import tempfile

    from pythongis_ray import sources
    from pythongis_ray.geom import wkb as _wkb

    pts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def to_geom(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ck": batch["ck"].to_numpy(np.int64),
            "geometry": list(_wkb.encode_points(
                batch["lon"].to_numpy(np.float64),
                batch["lat"].to_numpy(np.float64)))})

    d = tempfile.mkdtemp(prefix="gpkg_q_", dir="/tmp")
    try:
        g = pts.map_batches(to_geom, batch_format="pandas",
                            batch_size=8192)
        sources.write_geopackage(g, f"{d}/pts.gpkg", layer="pts",
                                 geometry_type="POINT")
        back = sources.read_geopackage(f"{d}/pts.gpkg")

        def decode(batch: pd.DataFrame) -> pa.Table:
            x, y = _wkb.decode_points(batch["geometry"].tolist())
            ix = np.rint((x + 180.0) * 1024.0).astype(np.int64)
            iy = np.rint((y + 90.0) * 1024.0).astype(np.int64)
            return pa.table({
                "ck": pa.array(batch["ck"].to_numpy(np.int64)),
                "ix": pa.array(ix), "iy": pa.array(iy)})

        return back.map_batches(decode, batch_format="pandas",
                                batch_size=8192).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def SQL_GPKG_ROUNDTRIP():
    return f"""
SELECT ck, CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy
FROM ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}) _g
"""


# ----------------------------------------------------- web graph ops

def q_link_graph(sf_dir: str):
    """Outlink edge-list extraction from raw html: pages are
    synthesized WITH deterministic ancestor links (p → p>>1,p>>2,p>>3
    as empty-anchor hrefs), and the engine re-extracts them from the
    html bytes with split+regex kernels (pages.extract_links). The
    oracle regenerates the targets arithmetically — a hash match means
    the regex extraction recovered the exact edge multiset."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    ds = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                        batch_size=4096)
    return ds.select_columns(["src_page", "dst_page"])


SQL_LINK_GRAPH = """
SELECT CAST(doc_id AS BIGINT) AS src_page,
       CAST(doc_id // 2 AS BIGINT) AS dst_page FROM documents
UNION ALL
SELECT CAST(doc_id AS BIGINT), CAST(doc_id // 4 AS BIGINT) FROM documents
UNION ALL
SELECT CAST(doc_id AS BIGINT), CAST(doc_id // 8 AS BIGINT) FROM documents
"""


def q_pagerank(sf_dir: str):
    """Integer PageRank (5 rounds) over the html-extracted link graph:
    end-to-end web-authority pipeline (synthesize → regex-extract edges
    → iterative scatter/gather mass propagation). Bit-exact vs 5
    chained LEFT-JOIN CTEs in DuckDB because all arithmetic is int64
    floor division (see graph.pagerank)."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    pr = graph.pagerank_actors(edges, src="src_page", dst="dst_page",
                               iters=5)
    return pr.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "mass": pc.cast(b["mass"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


_SQL_PAGE_EDGES = """
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST(doc_id // 2 AS BIGINT) AS dst FROM documents
  UNION ALL SELECT doc_id, doc_id // 4 FROM documents
  UNION ALL SELECT doc_id, doc_id // 8 FROM documents"""

_SQL_HOST_EDGES = """
  SELECT CAST(doc_id % 50 AS BIGINT) AS src,
         CAST((doc_id // 2) % 50 AS BIGINT) AS dst FROM documents
  UNION ALL SELECT doc_id % 50, (doc_id // 4) % 50 FROM documents
  UNION ALL SELECT doc_id % 50, (doc_id // 8) % 50 FROM documents"""


def _sql_pagerank(iters: int = 5, edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e AS ({edges_sql}),
od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM e GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes)"""
    step = """,
m{k} AS (
  SELECT n.node,
         CAST(150000 + COALESCE(SUM((85 * m.mass) // (100 * o.od)), 0)
              AS BIGINT) AS mass
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN od o ON o.src = e.src
  LEFT JOIN m{p} m ON m.node = e.src
  GROUP BY n.node)"""
    body = "".join(step.format(k=k, p=k - 1) for k in range(1, iters + 1))
    return head + body + f"\nSELECT node, mass FROM m{iters}"


def _sql_pagerank_ctes(iters: int = 5,
                       edges_sql: str = _SQL_PAGE_EDGES) -> str:
    """The pagerank CTE chain without the final SELECT — for composed
    oracles that join the mass table against other CTEs."""
    full = _sql_pagerank(iters, edges_sql)
    return full[:full.rindex("\nSELECT ")]


LPA_ROUNDS = 3


def q_communities(sf_dir: str):
    """Synchronous label-propagation communities over the undirected
    link graph (3 fixed rounds, majority label with smallest-id
    ties) — deterministic LPA, the standard web community detector.
    Exact DuckDB replay: grouped label counts + ROW_NUMBER per
    round."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.label_propagation(edges, src="src_page",
                                  dst="dst_page", rounds=LPA_ROUNDS)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "community": pc.cast(b["community"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_lpa(rounds: int = LPA_ROUNDS,
             edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
de AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT src AS u, dst AS v FROM e
    UNION ALL SELECT dst, src FROM e)),
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM de)"""
    step = """,
c{k} AS MATERIALIZED (
  SELECT de.u AS node, l.lbl AS lbl, CAST(COUNT(*) AS BIGINT) AS c
  FROM de JOIN l{p} l ON l.node = de.v GROUP BY de.u, l.lbl),
l{k} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl) AS rn
    FROM c{k}) WHERE rn = 1)"""
    body = "".join(step.format(k=r, p=r - 1)
                   for r in range(1, rounds + 1))
    return head + body + f"""
SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community
FROM l{rounds}"""


KCORE_K = 2
KCORE_ROUNDS = 10


def q_kcore(sf_dir: str):
    """2-core of the undirected distinct-edge link graph (iterative
    peeling, 10 simultaneous rounds — enough for this graph's fixed
    point, and the SQL replays the SAME cap so truncation can never
    diverge): surviving pages with their core degree. The classic
    link-farm / fringe-page filter."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.kcore(edges, src="src_page", dst="dst_page",
                      k=KCORE_K, max_rounds=KCORE_ROUNDS)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "deg_core": pc.cast(b["deg_core"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_kcore(k: int = KCORE_K, rounds: int = KCORE_ROUNDS,
               edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
de AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT src AS u, dst AS v FROM e
    UNION ALL SELECT dst, src FROM e)),
a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM de)"""
    step = f""",
a{{k}} AS MATERIALIZED (
  SELECT de.u AS node
  FROM de JOIN a{{p}} s ON s.node = de.u
          JOIN a{{p}} o ON o.node = de.v
  GROUP BY de.u HAVING COUNT(*) >= {k})"""
    body = "".join(step.format(k=r, p=r - 1)
                   for r in range(1, rounds + 1))
    return head + body + f"""
SELECT CAST(de.u AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS deg_core
FROM de JOIN a{rounds} s ON s.node = de.u
        JOIN a{rounds} o ON o.node = de.v
GROUP BY de.u"""


def q_neighbor_agg(sf_dir: str):
    """One-hop neighborhood attribute aggregation (the GNN
    feature-propagation prep stage): for every page with in-links,
    the count of in-neighbors and the exact sum of their n_chars.
    Attribute table joins onto the edge sources via the partitioned
    hash join, then a dst-keyed bucketed combine — two shuffles of
    the (narrow) edge table, the wide doc table never moves."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply, join_large

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    edges = edges.map_batches(
        lambda b: pa.table({
            "src": pc.cast(b["src_page"], pa.int64()),
            "dst": pc.cast(b["dst_page"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)
    attrs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    attrs = attrs.map_batches(
        lambda b: pa.table({
            "src": pc.cast(b["doc_id"], pa.int64()),
            "src_chars": pc.cast(b["n_chars"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)
    joined = join_large(edges, attrs, on="src")

    def per_dst(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("dst", sort=False)["src_chars"].agg(
            ["count", "sum"])
        return pd.DataFrame({
            "page": g.index.to_numpy(np.int64),
            "n_in": g["count"].to_numpy(np.int64),
            "sum_chars": g["sum"].to_numpy(np.int64)})

    out = bucketed_group_apply(joined.select_columns(
        ["dst", "src_chars"]), ["dst"], per_dst)
    return out.map_batches(
        lambda b: pa.table({
            "page": pc.cast(b["page"], pa.int64()),
            "n_in": pc.cast(b["n_in"], pa.int64()),
            "sum_chars": pc.cast(b["sum_chars"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_NEIGHBOR_AGG = f"""
WITH e AS ({_SQL_PAGE_EDGES})
SELECT e.dst AS page, CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM e JOIN documents d ON d.doc_id = e.src
GROUP BY e.dst
"""


HOST_TOPK = 2


def q_host_top_pages(sf_dir: str):
    """Per-group top-k (the windowed-rank shape): the 2 highest-
    PageRank pages of every host, ties by page id. Ranking runs
    inside host-keyed hash buckets — one in-bucket lexsort + head —
    so no global sort and no driver materialization of the rank."""
    from pythongis_ray import graph, pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    pr = graph.pagerank_actors(edges, src="src_page", dst="dst_page",
                               iters=5)

    def add_host(b: pa.Table) -> pa.Table:
        node = pc.cast(b["node"], pa.int64())
        host = node.to_numpy(zero_copy_only=False) % 50
        return pa.table({"host": pa.array(host), "page": node,
                         "mass": pc.cast(b["mass"], pa.int64())})

    keyed = pr.map_batches(add_host, batch_format="pyarrow",
                           batch_size=65536)

    def per_host(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["host", "mass", "page"],
                          ascending=[True, False, True], kind="stable")
        g = b.groupby("host", sort=False)
        out = g.head(HOST_TOPK).copy()
        out["rnk"] = (out.groupby("host", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return out[["host", "page", "mass", "rnk"]]

    return bucketed_group_apply(keyed, ["host"], per_host) \
        .map_batches(lambda b: pa.table({
            "host": pc.cast(b["host"], pa.int64()),
            "page": pc.cast(b["page"], pa.int64()),
            "mass": pc.cast(b["mass"], pa.int64()),
            "rnk": pc.cast(b["rnk"], pa.int64())}),
            batch_format="pyarrow", batch_size=65536)


def _sql_host_top_pages() -> str:
    return _sql_pagerank_ctes() + f""",
ranked AS (
  SELECT node % 50 AS host, node AS page, mass,
         ROW_NUMBER() OVER (PARTITION BY node % 50
                            ORDER BY mass DESC, node) AS rnk
  FROM m5)
SELECT CAST(host AS BIGINT) AS host, CAST(page AS BIGINT) AS page,
       CAST(mass AS BIGINT) AS mass, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {HOST_TOPK}"""


def q_cocitation(sf_dir: str):
    """Co-citation pairs (Small 1973): unordered target pairs
    {a < b} cited by a common source, with the number of co-citing
    sources — the link-structure similarity measure behind
    'related pages'. Distinct edges bucket by src (out-degree-bounded
    groups → triangular pair emission is tiny per group), then a
    (a, b)-keyed combine counts co-citing sources."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)

    def dedup_batch(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": pc.cast(batch["src_page"], pa.int64()),
                      "dst": pc.cast(batch["dst_page"], pa.int64())})
        return t.group_by(["src", "dst"]).aggregate([])

    de = edges.map_batches(dedup_batch, batch_format="pyarrow",
                           batch_size=65536)

    def per_src(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["src", "dst"])
        b = b.sort_values(["src", "dst"], kind="stable")
        src = b["src"].to_numpy(np.int64)
        dst = b["dst"].to_numpy(np.int64)
        outs = []
        # within each src run, emit all (dst_i, dst_j) i<j; out-degree
        # is link-count bounded (3 here), so offsets 1..max_deg-1
        d = 1
        while True:
            m = src[d:] == src[:-d]
            if not m.any():
                break
            outs.append((dst[:-d][m], dst[d:][m]))
            d += 1
        if not outs:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "pcnt": np.empty(0, np.int64)})
        a = np.concatenate([o[0] for o in outs])
        c = np.concatenate([o[1] for o in outs])
        df = pd.DataFrame({"a": a, "b": c})
        return (df.groupby(["a", "b"], sort=False).size()
                .rename("pcnt").reset_index())

    parts = bucketed_group_apply(de, ["src"], per_src)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["a", "b"], sort=False)["pcnt"].sum()
             .reset_index(name="n_cociting"))
        return g

    out = bucketed_group_apply(parts, ["a", "b"], combine)
    return out.map_batches(
        lambda b: pa.table({
            "a": pc.cast(b["a"], pa.int64()),
            "b": pc.cast(b["b"], pa.int64()),
            "n_cociting": pc.cast(b["n_cociting"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_COCITATION = f"""
WITH de AS (SELECT DISTINCT src, dst FROM ({_SQL_PAGE_EDGES}))
SELECT x.dst AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_cociting
FROM de x JOIN de y ON x.src = y.src AND x.dst < y.dst
GROUP BY x.dst, y.dst
"""


TR_SEED_MOD = 97


def q_trustrank(sf_dir: str):
    """TrustRank (Gyöngyi et al. 2004): personalized PageRank whose
    teleport mass lands ONLY on the trusted seed set
    {page_id % 97 == 0} — the classic link-spam demotion score. Same
    integer mass-propagation engine as pagerank with per-node
    base/init vectors."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    pr = graph.pagerank_actors(edges, src="src_page", dst="dst_page",
                               iters=5, seed_mod=TR_SEED_MOD)
    return pr.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "mass": pc.cast(b["mass"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_trustrank(iters: int = 5, seed_mod: int = TR_SEED_MOD,
                   edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e AS ({edges_sql}),
od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM e GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
m0 AS (SELECT node,
       CAST(CASE WHEN node % {seed_mod} = 0 THEN 1000000 ELSE 0 END
            AS BIGINT) AS mass FROM nodes)"""
    step = f""",
m{{k}} AS (
  SELECT n.node,
         CAST(CASE WHEN n.node % {seed_mod} = 0 THEN 150000 ELSE 0 END
              + COALESCE(SUM((85 * m.mass) // (100 * o.od)), 0)
              AS BIGINT) AS mass
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN od o ON o.src = e.src
  LEFT JOIN m{{p}} m ON m.node = e.src
  GROUP BY n.node)"""
    body = "".join(step.format(k=k, p=k - 1)
                   for k in range(1, iters + 1))
    return head + body + f"\nSELECT node, mass FROM m{iters}"


HITS_ITERS = 4
HITS_SCALE = 1_000_000


def q_hits(sf_dir: str):
    """Integer HITS hubs & authorities (4 rounds) over the
    html-extracted link graph, on the resident-shard engine: per
    round, authority = sum of in-neighbor hub scores, hub = sum of
    out-neighbor NEW authority scores, each normalized by the global
    integer divisor max(1, max_raw // scale). Bit-exact vs chained
    LEFT-JOIN CTEs + MAX subqueries in DuckDB."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.hits_actors(edges, src="src_page", dst="dst_page",
                            iters=HITS_ITERS, scale=HITS_SCALE)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "hub": pc.cast(b["hub"], pa.int64()),
            "auth": pc.cast(b["auth"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_hits(iters: int = HITS_ITERS, scale: int = HITS_SCALE,
              edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
s0 AS (SELECT node, CAST({scale} AS BIGINT) AS h,
             CAST({scale} AS BIGINT) AS a FROM nodes)"""
    step = """,
ar{k} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(SUM(s.h), 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN e ON e.dst = n.node
  LEFT JOIN s{p} s ON s.node = e.src GROUP BY n.node),
a{k} AS MATERIALIZED (
  SELECT node, CAST(v // GREATEST(1, (SELECT MAX(v) FROM ar{k})
                                     // {scale}) AS BIGINT) AS a
  FROM ar{k}),
hr{k} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(SUM(a.a), 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN e ON e.src = n.node
  LEFT JOIN a{k} a ON a.node = e.dst GROUP BY n.node),
s{k} AS MATERIALIZED (
  SELECT h.node,
         CAST(h.v // GREATEST(1, (SELECT MAX(v) FROM hr{k})
                                 // {scale}) AS BIGINT) AS h, a.a
  FROM hr{k} h JOIN a{k} a ON a.node = h.node)"""
    body = "".join(step.format(k=k, p=k - 1, scale=scale)
                   for k in range(1, iters + 1))
    return (head + body
            + f"\nSELECT node, h AS hub, a AS auth FROM s{iters}")


BFS_SEED_MOD = 97
BFS_ITERS = 8


def q_link_distance(sf_dir: str):
    """Directed hop distance from the seed pages {page_id % 97 == 0}
    along the extracted link graph, capped at 8 rounds (unreachable /
    deeper nodes keep the 2^40 sentinel) — crawl-frontier depth
    analysis on the resident-shard min-plus engine. Exact replay of
    a chained min-plus LEFT-JOIN CTE in DuckDB."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.bfs_actors(edges, src="src_page", dst="dst_page",
                           seed_mod=BFS_SEED_MOD, iters=BFS_ITERS)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "dist": pc.cast(b["dist"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_bfs(iters: int = BFS_ITERS, seed_mod: int = BFS_SEED_MOD,
             edges_sql: str = _SQL_PAGE_EDGES) -> str:
    inf = 1 << 40
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
d0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN node % {seed_mod} = 0 THEN 0
                         ELSE {inf} END AS BIGINT) AS dist
  FROM nodes)"""
    step = f""",
d{{k}} AS MATERIALIZED (
  SELECT n.node,
         CAST(LEAST(MIN(dn.dist),
                    COALESCE(MIN(ds.dist + 1), {inf})) AS BIGINT)
           AS dist
  FROM nodes n JOIN d{{p}} dn ON dn.node = n.node
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN d{{p}} ds ON ds.node = e.src
  GROUP BY n.node)"""
    body = "".join(step.format(k=k, p=k - 1)
                   for k in range(1, iters + 1))
    return head + body + f"\nSELECT node, dist FROM d{iters}"


WALK_LEN = 4


def q_random_walks(sf_dir: str):
    """DeepWalk-style sampling corpus over the extracted link graph:
    one deterministic 4-step walk per node, next hop = the
    h(cur, k)-th distinct out-neighbor sorted by id (dead ends stay
    put). Bit-reproducible for any sharding; exact DuckDB replay via
    ROW_NUMBER adjacency + chained LEFT-JOIN CTEs."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.random_walks(edges, src="src_page", dst="dst_page",
                             length=WALK_LEN)
    return out.map_batches(
        lambda b: pa.table({
            "start": pc.cast(b["start"], pa.int64()),
            "step": pc.cast(b["step"], pa.int64()),
            "node": pc.cast(b["node"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_random_walks(length: int = WALK_LEN,
                      edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
adj AS MATERIALIZED (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS pos,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM (SELECT DISTINCT src, dst FROM e)),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
w0 AS MATERIALIZED (SELECT node AS start, node AS cur FROM nodes)"""
    step = """,
w{k} AS MATERIALIZED (
  SELECT w.start, COALESCE(a.dst, w.cur) AS cur
  FROM w{p} w LEFT JOIN adj a
    ON a.src = w.cur
   AND a.pos = ((w.cur % 2147483648) * 2654435761
                + {k} * 40503) % 2147483647 % a.deg)"""
    body = "".join(step.format(k=k, p=k - 1)
                   for k in range(1, length + 1))
    tail = "\nUNION ALL ".join(
        f"SELECT CAST(start AS BIGINT) AS start, "
        f"CAST({k} AS BIGINT) AS step, CAST(cur AS BIGINT) AS node "
        f"FROM w{k}" for k in range(length + 1))
    return head + body + "\n" + tail


REDIR_HOPS = 8
_SQL_REDIRECT_EDGES = """
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST(doc_id // 2 AS BIGINT) AS dst
  FROM documents WHERE doc_id % 7 = 0"""


def q_resolve_redirects(sf_dir: str):
    """Canonical-URL redirect resolution: pages {id % 7 == 0}
    redirect to id//2; every page IN THE REDIRECT GRAPH (a source or
    a target) chases its chain up to 8 hops
    (non-redirecting pages stay put — including chains that EXIT the
    redirect set early, and the 0→0 self-loop). A functional graph
    is a walk graph with out-degree ≤ 1, so this IS the resident-
    shard walk engine (hop choice h mod 1 = the single target);
    step 8 of each walk is the resolved target."""
    from pythongis_ray import graph

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def redirects(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = d % 7 == 0
        return pa.table({"src": pa.array(d[m]),
                         "dst": pa.array(d[m] // 2)})

    edges = ds.map_batches(redirects, batch_format="pyarrow",
                           batch_size=65536)
    walks = graph.random_walks(edges, length=REDIR_HOPS)
    return walks.map_batches(
        lambda b: pa.table({
            "page": pc.cast(pc.filter(
                b["start"], pc.equal(b["step"], REDIR_HOPS)),
                pa.int64()),
            "final": pc.cast(pc.filter(
                b["node"], pc.equal(b["step"], REDIR_HOPS)),
                pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_resolve_redirects() -> str:
    sql = _sql_random_walks(length=REDIR_HOPS,
                            edges_sql=_SQL_REDIRECT_EDGES)
    return (f"WITH walks AS MATERIALIZED ({sql})\n"
            f"SELECT start AS page, node AS final FROM walks "
            f"WHERE step = {REDIR_HOPS}")


SKIPGRAM_WINDOW = 2


def q_walk_skipgrams(sf_dir: str):
    """Skip-gram (center, context) pair counts with window 2 over the
    deterministic walk corpus — the training-pair generation stage of
    a DeepWalk/node2vec embedding pipeline. Pairs are built inside
    start-keyed hash buckets (each walk is length+1 rows, so groups
    are tiny and the pairing is one shifted-compare per offset), then
    combined by (center, context)."""
    from pythongis_ray import graph, pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    walks = graph.random_walks(edges, src="src_page", dst="dst_page",
                               length=WALK_LEN)

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["start", "step"], kind="stable")
        start = b["start"].to_numpy(np.int64)
        node = b["node"].to_numpy(np.int64)
        cs, xs = [], []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            m = start[d:] == start[:-d]
            a, c = node[:-d][m], node[d:][m]
            cs.append(a); xs.append(c)       # forward context
            cs.append(c); xs.append(a)       # backward context
        if not cs:
            return pd.DataFrame({"center": [], "context": [],
                                 "pcnt": []}).astype(np.int64)
        df = pd.DataFrame({"center": np.concatenate(cs),
                           "context": np.concatenate(xs)})
        return (df.groupby(["center", "context"], sort=False)
                .size().rename("pcnt").reset_index())

    parts = bucketed_group_apply(walks, ["start"], pair_bucket)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["center", "context"], sort=False)["pcnt"].sum()
             .reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    out = bucketed_group_apply(parts, ["center", "context"], combine)
    return out.map_batches(
        lambda b: pa.table({
            "center": pc.cast(b["center"], pa.int64()),
            "context": pc.cast(b["context"], pa.int64()),
            "cnt": pc.cast(b["cnt"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_walk_skipgrams() -> str:
    return f"""
WITH walks AS MATERIALIZED ({_sql_random_walks()})
SELECT a.node AS center, b.node AS context,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM walks a JOIN walks b
  ON a.start = b.start AND a.step <> b.step
 AND abs(a.step - b.step) <= {SKIPGRAM_WINDOW}
GROUP BY a.node, b.node
"""


def q_pagerank_hosts(sf_dir: str):
    """Host-level PageRank: collapse the page link graph to a host
    graph (site(u) → site(v), multiplicity preserved — the standard
    domain-authority rollup) and run the same integer mass
    propagation. Exercises graph-op composition: extraction → edge
    projection → iterative scatter/gather, all streaming."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    pr = graph.pagerank_actors(pages.host_edges(edges), iters=5)
    return pr.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "mass": pc.cast(b["mass"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def q_triangle_count(sf_dir: str):
    """Directed-path triangle count over the html-extracted link graph
    (two bucketed equi-joins; the 3-way-join SQL mirror counts the
    identical multiset)."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    return graph.triangle_count(edges, src="src_page", dst="dst_page")


SQL_TRIANGLE_COUNT = f"""
WITH e AS ({_SQL_PAGE_EDGES})
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e a JOIN e b ON b.src = a.dst
         JOIN e c ON c.src = a.src AND c.dst = b.dst
"""


def q_host_report(sf_dir: str):
    """Composed per-host corpus analytics — the "domain report" a
    curation team reads: page count, exact token/stopword sums, a
    ratio-of-sums quality signal (ONE division of exact integers, so
    it hash-matches), and the host's integer PageRank authority. Joins
    three independently-computed distributed tables (URL-parsed host
    aggregate ⋈ link-graph PageRank) on the 50-row host key."""
    from pythongis_ray import graph, pages, urltools

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url", "text"])
    ds = ds.map_batches(
        lambda b: urltools.add_url_parts(b, parts=("host",)),
        batch_format="pyarrow", batch_size=8192)

    def score_and_key(b: pa.Table) -> pa.Table:
        b = text.quality_score(b)
        site = pc.struct_field(
            pc.extract_regex(b["url_host"], r"^site(?P<s>[0-9]+)\."), "s")
        return pa.table({
            "host": pc.cast(site, pa.int64()),
            "page_id": b["page_id"],
            "n_tokens": b["n_tokens"],
            "n_stop": b["n_stop"]})

    scored = ds.map_batches(score_and_key, batch_format="pyarrow",
                            batch_size=8192)
    agg = rel.groupby_aggregate(scored, "host", [
        ("n_pages", "page_id", "count"),
        ("sum_tokens", "n_tokens", "sum"),
        ("sum_stop", "n_stop", "sum")])

    link_pages = pages.pages_dataset(sf_dir, geocode=False, links=True,
                                     columns=["page_id", "html"])
    edges = link_pages.map_batches(pages.extract_links,
                                   batch_format="pyarrow", batch_size=4096)
    pr = graph.pagerank_actors(pages.host_edges(edges), iters=5)
    pr_df = pr.to_pandas().rename(columns={"node": "host"})  # 50 rows
    joined = rel.hash_join(agg, pr_df, on="host")

    def finish(b: pa.Table) -> pa.Table:
        st = b["sum_stop"].to_numpy(zero_copy_only=False).astype(np.float64)
        tk = b["sum_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "host": pc.cast(b["host"], pa.int64()),
            "n_pages": pc.cast(b["n_pages"], pa.int64()),
            "sum_tokens": pc.cast(b["sum_tokens"], pa.int64()),
            "sum_stop": pc.cast(b["sum_stop"], pa.int64()),
            "stop_ratio": pa.array(st / tk),
            "mass": pc.cast(b["mass"], pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow",
                              batch_size=8192)


def _sql_host_report() -> str:
    stops = tuple(text.STOPWORDS)
    return _sql_pagerank_ctes(edges_sql=_SQL_HOST_EDGES) + f""",
qual AS (
  SELECT doc_id % 50 AS host,
         CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
              AS BIGINT) AS sum_tokens,
         CAST(SUM(len(list_filter(string_split(text, ' '),
              w -> w IN {stops!r}))) AS BIGINT) AS sum_stop
  FROM documents GROUP BY 1)
SELECT CAST(q.host AS BIGINT) AS host, q.n_pages, q.sum_tokens,
       q.sum_stop,
       CAST(q.sum_stop AS DOUBLE) / q.sum_tokens AS stop_ratio,
       m.mass
FROM qual q JOIN m5 m ON m.node = q.host
"""


def q_host_cap(sf_dir: str, cap: int = 5):
    """Per-host document cap (MassiveText-style max-docs-per-domain):
    parse the host out of each url, keep the `cap` earliest pages per
    host by (warc_ts, page_id). One bucketed shuffle on host; within a
    bucket the head-per-group is a vectorized sorted groupby."""
    from pythongis_ray import pages, urltools

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url", "warc_ts"])
    ds = ds.map_batches(
        lambda b: urltools.add_url_parts(b, parts=("host",)),
        batch_format="pyarrow", batch_size=8192)

    def head_per_host(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url_host", "warc_ts", "page_id"], kind="stable")
        kept = g.groupby("url_host", sort=False).head(cap)
        return kept[["page_id", "url_host"]]

    return rel.bucketed_group_apply(ds, ["url_host"], head_per_host)


SQL_HOST_CAP = """
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS page_id,
         'site' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS url_host,
         doc_id * 37000000 AS ts_us
  FROM documents),
r AS (SELECT page_id, url_host,
             ROW_NUMBER() OVER (PARTITION BY url_host
                                ORDER BY ts_us, page_id) AS rn
      FROM p)
SELECT page_id, url_host FROM r WHERE rn <= 5
"""


def q_sample_stratified(sf_dir: str, k: int = 20):
    """Deterministic stratified sampling: rank every page within its
    language stratum by the 64-bit polynomial hash of its URL
    (content-addressed, reproducible on any cluster size) and keep the
    k smallest per stratum — the quota-sampling step of a multilingual
    corpus build. The oracle replays the byte-level hash in HUGEINT
    SQL and the same signed ordering."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url", "lang"])
    ds = ds.map_batches(
        lambda b: text.fingerprint(b, text_col="url", out_col="h"),
        batch_format="pyarrow", batch_size=8192)

    def top_per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "h", "page_id"], kind="stable")
        kept = g.groupby("lang", sort=False).head(k)
        return kept[["lang", "page_id", "h"]]

    return rel.bucketed_group_apply(ds, ["lang"], top_per_lang)


SQL_SAMPLE_STRATIFIED = """
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS page_id, lang,
         'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
h0 AS (
  SELECT page_id, lang,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(url, '')]),
            (acc, x) -> (acc * 1099511628211 + x)
                        % CAST('18446744073709551616' AS HUGEINT)) AS uh
  FROM p),
hs AS (
  SELECT page_id, lang,
         CAST(uh - CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
                     THEN CAST('18446744073709551616' AS HUGEINT)
                     ELSE 0 END AS BIGINT) AS h
  FROM h0),
r AS (SELECT lang, page_id, h,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY h, page_id) AS rn
      FROM hs)
SELECT lang, page_id, h FROM r WHERE rn <= 20
"""


def _sql_polyhash(expr: str) -> str:
    """HUGEINT replay of text.fingerprint's unsigned 64-bit polynomial
    hash (acc*P + byte mod 2^64) over an ASCII string expression."""
    return f"""list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(c) AS HUGEINT) FOR c IN string_split({expr}, '')]),
            (acc, x) -> (acc * 1099511628211 + x)
                        % CAST('18446744073709551616' AS HUGEINT))"""


SPLIT_TRAIN_PCT, SPLIT_VALID_PCT = 90, 95


def _uhash_col(batch: pa.Table, col: str) -> np.ndarray:
    """Unsigned view of text.fingerprint over a string column."""
    h = text.fingerprint(batch, text_col=col, out_col="_h")["_h"]
    return h.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)


def q_split_holdout(sf_dir: str):
    """Leakage-free train/valid/test split: the split key is the
    HOST's content hash, so every page of a site lands in the same
    split (near-duplicate pages cluster within hosts — a doc-level
    random split would leak them across train/test; cf. C4/The Pile
    dedup-aware eval splits). Deterministic, cluster-size-independent:
    bucket = host_hash mod 100 on the UNSIGNED hash (DuckDB's C-style
    % never sees a negative). No shuffle at all — one map_batches."""
    from pythongis_ray import pages, urltools

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url"])

    def fn(batch: pa.Table) -> pa.Table:
        batch = urltools.add_url_parts(batch, parts=("host",))
        uh = _uhash_col(batch, "url_host")
        bucket = (uh % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < SPLIT_TRAIN_PCT, "train",
                         np.where(bucket < SPLIT_VALID_PCT, "valid",
                                  "test"))
        return pa.table({"page_id": batch["page_id"],
                         "host": batch["url_host"],
                         "bucket": pa.array(bucket),
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=16384)


SQL_SPLIT_HOLDOUT = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS page_id,
         'site' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS host
  FROM documents),
h0 AS (
  SELECT page_id, host, {_sql_polyhash('host')} AS uh FROM p)
SELECT page_id, host, CAST(uh % 100 AS BIGINT) AS bucket,
       CASE WHEN uh % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN uh % 100 < {SPLIT_VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split
FROM h0
"""


MIXTURE_PERMILLE = {"de": 800, "en": 500, "es": 900, "fr": 800,
                    "zh": 1000}


def q_mixture_sample(sf_dir: str):
    """Deterministic mixture (temperature) sampling: each language
    stream keeps a configured per-mille rate of its pages — the
    up/down-weighting step that balances a multilingual training mix.
    Acceptance is content-addressed (url hash mod 1000 < rate), so
    the SAME pages are kept on any cluster size / partitioning, and
    reruns are idempotent. One map_batches, no shuffle."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url", "lang"])
    def fn(batch: pa.Table) -> pa.Table:
        uh = _uhash_col(batch, "url")
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        rates = pd.Series(lang).map(MIXTURE_PERMILLE).fillna(1000) \
            .to_numpy(np.uint64)
        keep = (uh % np.uint64(1000)) < rates
        return pa.table({"page_id": batch["page_id"].filter(pa.array(keep)),
                         "lang": batch["lang"].filter(pa.array(keep))})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=16384)


SHUFFLE_SHARD_ROWS = 128


def q_shuffle_shards(sf_dir: str):
    """Deterministic global training shuffle: order the corpus by the
    64-bit url content hash (a pseudorandom but reproducible
    permutation — same result on any cluster size, unlike
    ``ds.random_shuffle``), then cut the permuted order into
    fixed-size shards: (shard_id, pos) is exactly where each doc
    lands in the tokenizer-ready output. Uses the two-pass
    distributed range ranking (count pass + assign pass, no global
    sort materialization)."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url"])
    ds = ds.map_batches(
        lambda b: text.fingerprint(b, text_col="url", out_col="h"),
        batch_format="pyarrow", batch_size=16384)
    ds = ds.select_columns(["page_id", "h"])
    out = rel.add_global_rank(ds, ["h", "page_id"], out_col="rnk")

    def finish(batch: pa.Table) -> pa.Table:
        r = batch["rnk"].to_numpy(zero_copy_only=False) - 1
        return pa.table({
            "page_id": batch["page_id"], "h": batch["h"],
            "shard_id": pa.array(r // SHUFFLE_SHARD_ROWS),
            "pos": pa.array(r % SHUFFLE_SHARD_ROWS)})

    return out.map_batches(finish, batch_format="pyarrow",
                           batch_size=65536)


SQL_SHUFFLE_SHARDS = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS page_id,
         'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
h0 AS (SELECT page_id, {_sql_polyhash('url')} AS uh FROM p),
hs AS (
  SELECT page_id,
         CAST(uh - CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
                     THEN CAST('18446744073709551616' AS HUGEINT)
                     ELSE 0 END AS BIGINT) AS h
  FROM h0),
r AS (SELECT page_id, h,
             ROW_NUMBER() OVER (ORDER BY h, page_id) - 1 AS rk
      FROM hs)
SELECT page_id, h,
       CAST(rk // {SHUFFLE_SHARD_ROWS} AS BIGINT) AS shard_id,
       CAST(rk % {SHUFFLE_SHARD_ROWS} AS BIGINT) AS pos
FROM r
"""


SQL_MIXTURE_SAMPLE = f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS page_id, lang,
         'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/'
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
h0 AS (SELECT page_id, lang, {_sql_polyhash('url')} AS uh FROM p)
SELECT page_id, lang FROM h0
WHERE uh % 1000 < CASE lang
    {' '.join(f"WHEN '{l}' THEN {r}" for l, r in sorted(MIXTURE_PERMILLE.items()))}
    ELSE 1000 END
"""


# ------------------------------------- sketches / filters (late round 3)


def q_cms_topk(sf_dir: str):
    """Count-Min-sketch heavy hitters: a mergeable depth x width
    integer sketch (text.cms_sketch) built by per-batch partial cell
    counts + one tiny groupby-sum, point-estimated for the exact
    top-40 words. est >= cnt is the CM one-sided guarantee; both
    sides (slot arithmetic AND estimates) replay bit-exact in DuckDB
    HUGEINT (split-multiply mod 2^64, top-10-bit slots)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    cand = text.word_frequency(ds, top_k=40)
    sketch = text.cms_sketch(ds).to_pandas()  # depth*width rows, bounded
    est = text.cms_estimate(sketch, cand["word"].tolist())
    return pd.DataFrame({"word": cand["word"].to_numpy(),
                         "cnt": cand["cnt"].to_numpy(np.int64),
                         "est": est})


def _sql_cms_topk() -> str:
    """Replays the sketch exactly: FNV-1a-style token hash (the
    engine's _poly_hash_segments) in HUGEINT, then slot_d(th) =
    (th * M_d mod 2^64) >> 54 via the 32-bit split-multiply (products
    stay < 2^97 < HUGEINT max)."""
    from pythongis_ray import text as _t

    mults = ",\n    ".join(
        f"({d}, {int(m) >> 32}, {int(m) & 0xFFFFFFFF})"
        for d, m in enumerate(_t.CMS_MULTS.tolist()))
    slot = ("CAST(((th * mlo + ((th * mhi) % 4294967296) * 4294967296)"
            " % CAST('18446744073709551616' AS HUGEINT))"
            " // CAST('18014398509481984' AS HUGEINT) AS BIGINT)")
    return f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
cnt AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
h AS (SELECT word, c,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(ch) AS HUGEINT) FOR ch IN string_split(word, '')]),
            (acc, x) -> (acc * 1099511628211 + x)
                        % CAST('18446744073709551616' AS HUGEINT)) AS th
      FROM cnt),
mults(d, mhi, mlo) AS (VALUES
    {mults}),
cells AS (SELECT m.d, {slot} AS slot, SUM(h.c) AS v
          FROM h CROSS JOIN mults m GROUP BY 1, 2),
cand AS (SELECT word, c, th FROM h ORDER BY c DESC, word LIMIT 40),
cs AS (SELECT cand.word, cand.c, m.d, {slot} AS slot
       FROM cand CROSS JOIN mults m),
est AS (SELECT cs.word, cs.c, MIN(cells.v) AS e
        FROM cs JOIN cells ON cells.d = cs.d AND cells.slot = cs.slot
        GROUP BY cs.word, cs.c)
SELECT word, CAST(c AS BIGINT) AS cnt, CAST(e AS BIGINT) AS est
FROM est ORDER BY cnt DESC, word
"""


def q_quality_lr(sf_dir: str):
    """Linear quality-classifier filter (the fastText-scorer slot of a
    web-corpus pipeline): integer milli-weight score per doc, keep
    score >= threshold. One pyarrow kernel per feature."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ds = ds.map_batches(text.quality_lr, batch_format="pyarrow",
                        batch_size=8192)
    ds = ds.filter(expr=f"score >= {text.QLR_THRESHOLD}")
    return ds.select_columns(["doc_id", "score"])


def _sql_quality_lr() -> str:
    from pythongis_ray import text as _t

    w = _t.QLR_WEIGHTS
    stop = tuple(_t.STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
    len(list_filter(string_split(text, ' '), x -> x IN {stop!r})) AS n_stop,
    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
      AS n_punct,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
      AS n_digit,
    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
      AS n_upper
  FROM documents)
SELECT doc_id,
       CAST({w['bias']} + {w['n_tokens']} * n_tokens
            + {w['n_stop']} * n_stop + {w['n_punct']} * n_punct
            + {w['n_digit']} * n_digit + {w['n_upper']} * n_upper
         AS BIGINT) AS score
FROM f
WHERE {w['bias']} + {w['n_tokens']} * n_tokens + {w['n_stop']} * n_stop
      + {w['n_punct']} * n_punct + {w['n_digit']} * n_digit
      + {w['n_upper']} * n_upper >= {_t.QLR_THRESHOLD}
"""


KMEANS_K = 8
KMEANS_ITERS = 4
SEMDEDUP_THRESHOLD = 400_000


def q_embed_clusters(sf_dir: str):
    """Distributed full-corpus k-means (semantic clustering, the
    SemDeDup/cluster-balancing slot). Integer-LATTICE Lloyd: rounds
    quantize centroids back to int64 (round-half-away), so training is
    bit-reproducible for any partitioning AND the whole iterative
    fit replays in DuckDB as chained CTEs (assign window + per-dim
    ROUND(SUM/COUNT) update per round — the pagerank-oracle trick
    applied to k-means). Assignment is one exact matmul per batch
    against broadcast centroids."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    C = embed.kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    out = embed.kmeans_assign(emb, C)
    return out.select_columns(["vec_id", "cluster"])


def _sql_kmeans_ctes(k: int, iters: int, dim: int = 64,
                     scale: int = 1000, suffix: str = "",
                     span: tuple[int, int] | None = None) -> str:
    """CTE chain replaying embed.kmeans_fit + kmeans_assign exactly:
    c0 = quantized embeddings of vec_id < k; round r assigns by
    integer distance (list_dot_product of integer-valued doubles is
    exact below 2^53; ties -> lowest centroid id via ORDER BY d2, i)
    and updates c{r+1} = per-dim ROUND(SUM/COUNT) — identical to the
    engine's _round_half_away(s/n) because both divide the same exact
    integers once; empty clusters carry their centroid forward. The
    final CTE ``af`` holds (vec_id, e, cluster) under c{iters}.

    ``suffix`` renames every CTE (eq{suffix}, c{r}{suffix}, …) and
    ``span=(lo, hi)`` trains on the sub-vector embedding[lo:hi)
    (DuckDB 1-based inclusive slice) — together they replay one
    subspace of embed.pq_fit, and m chains side by side replay the
    whole product-quantizer fit."""
    if span is None:
        emb, sdim = "embedding", dim
    else:
        lo, hi = span
        emb, sdim = f"embedding[{lo + 1}:{hi}]", hi - lo
    upd = ", ".join(f"ROUND(SUM(e[{j + 1}]) / COUNT(*))"
                    for j in range(sdim))
    s = suffix
    parts = [f"""eq{s} AS (
  SELECT vec_id,
         list_transform({emb},
                        x -> round(CAST(x AS DOUBLE) * {scale})) AS e
  FROM embeddings),
c0{s} AS (SELECT vec_id AS i, e AS c FROM eq{s} WHERE vec_id < {k})"""]
    for r in range(iters + 1):
        parts.append(f"""a{r}{s} AS (
  SELECT vec_id, e, i AS cluster FROM (
    SELECT eq{s}.vec_id, eq{s}.e, c.i,
           ROW_NUMBER() OVER (PARTITION BY eq{s}.vec_id ORDER BY
             list_dot_product(eq{s}.e, eq{s}.e)
             - 2 * list_dot_product(eq{s}.e, c.c)
             + list_dot_product(c.c, c.c), c.i) AS rn
    FROM eq{s} CROSS JOIN c{r}{s} c) WHERE rn = 1)""")
        if r < iters:
            parts.append(f"""c{r + 1}{s} AS (
  SELECT cluster AS i, [{upd}] AS c FROM a{r}{s} GROUP BY cluster
  UNION ALL
  SELECT c.i, c.c FROM c{r}{s} c
  WHERE c.i NOT IN (SELECT cluster FROM a{r}{s}))""")
    parts.append(f"af{s} AS (SELECT * FROM a{iters}{s})")
    return ",\n".join(parts)


SQL_EMBED_CLUSTERS = f"""
WITH {_sql_kmeans_ctes(KMEANS_K, KMEANS_ITERS)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM af
"""


def q_semdedup(sf_dir: str):
    """SemDeDup (k-means blocking + exact within-cluster near-dup,
    keep-first): the flagship semantic-dedup slot. Fully
    oracle-paired: the SQL replays the integer-lattice k-means fit,
    the final assignment, and the EXISTS(lower-id neighbor with
    quantized dot >= t) drop rule."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    C = embed.kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    return embed.semdedup(emb, C, threshold=SEMDEDUP_THRESHOLD)


SQL_SEMDEDUP = f"""
WITH {_sql_kmeans_ctes(KMEANS_K, KMEANS_ITERS)}
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN EXISTS (
                SELECT 1 FROM af b
                WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
                  AND list_dot_product(a.e, b.e) >= {SEMDEDUP_THRESHOLD})
            THEN 0 ELSE 1 END AS BIGINT) AS kept
FROM af a
"""


PACK_BUDGET = 2048


def q_pack_shards(sf_dir: str):
    """Sequence packing for training (GPT-style, docs split across
    context windows): within each lang stream, docs in doc_id order
    get an exclusive running token offset; shard_id = offset //
    budget, offset_in_shard = offset % budget. The running sum is the
    distributed bucketed-cumsum (groups co-locate once); packing per
    lang-shard is how a real pipeline writes tokenizer-ready
    partitioned output."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "text"])
    ds = ds.map_batches(text.token_count, batch_format="pyarrow",
                        batch_size=8192)
    ds = ds.drop_columns(["text"])
    out = rel.running_sum(ds, "lang", ["doc_id"], "n_tokens",
                          out_col="run_tokens")

    def finish(batch: pa.Table) -> pa.Table:
        run = batch["run_tokens"].to_numpy(zero_copy_only=False)
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False)
        off = run - nt
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "shard_id": pa.array(off // PACK_BUDGET),
            "offset_in_shard": pa.array(off % PACK_BUDGET),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           batch_size=65536)


SQL_PACK_SHARDS = f"""
WITH t AS (
  SELECT doc_id, lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS nt
  FROM documents),
r AS (
  SELECT doc_id, lang,
         SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - nt AS off
  FROM t)
SELECT doc_id, lang,
       CAST(off // {PACK_BUDGET} AS BIGINT) AS shard_id,
       CAST(off % {PACK_BUDGET} AS BIGINT) AS offset_in_shard
FROM r
"""


def q_cdc_shared(sf_dir: str):
    """Content-defined-chunking dedup stats: rolling-hash chunk
    boundaries (FastCDC/LBFS style) catch PARTIALLY overlapping docs
    that whole-doc fingerprints miss. Per doc: total chunks and
    chunks shared with >= 1 other doc."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.cdc_shared_stats(ds)


def _sql_cdc_shared() -> str:
    """Replays the chunker: the boundary test H(q) % 64 == 0 only
    needs mod-64 arithmetic (64 divides 2^64, so P^j mod 64 suffices —
    plain BIGINTs); chunk hashes group via the full HUGEINT poly
    hash."""
    P = 1099511628211
    m = [pow(P, j, 64) for j in range(8)]   # P^j mod 64
    bexpr = " + ".join(f"bm[q-{7 - j}]*{m[7 - j]}" if m[7 - j] != 1
                       else f"bm[q-{7 - j}]" for j in range(8)) \
        .replace("bm[q-0]", "bm[q]")
    return f"""
WITH c0 AS (
  SELECT doc_id, text, length(text) AS L,
         [ascii(ch) % 64 FOR ch IN string_split(text, '')] AS bm
  FROM documents),
bd AS (
  SELECT doc_id, text, L,
         list_filter(range(8, L), q -> ({bexpr}) % 64 = 0) AS qs
  FROM c0),
cuts AS (
  SELECT doc_id, text,
         list_concat(list_concat([CAST(0 AS BIGINT)], qs),
                     [CAST(L AS BIGINT)]) AS cs
  FROM bd),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(cs)),
                i -> substring(text, CAST(cs[i] + 1 AS INT),
                               CAST(cs[i + 1] - cs[i] AS INT)))) AS chunk
  FROM cuts),
h AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             [CAST(ascii(ch) AS HUGEINT) FOR ch IN string_split(chunk, '')]),
             (acc, x) -> (acc * 1099511628211 + x)
                         % CAST('18446744073709551616' AS HUGEINT)) AS ch
  FROM chunks),
nd AS (SELECT ch, COUNT(DISTINCT doc_id) AS ndocs FROM h GROUP BY ch)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (nd.ndocs >= 2) AS BIGINT) AS n_shared
FROM h JOIN nd ON nd.ch = h.ch
GROUP BY h.doc_id
"""


URL_BLOCKLIST = ("adsnet", "site13.example", "sub1.site5.shop")


def q_url_filter(sf_dir: str):
    """Domain-blocklist URL filter (the UT1-blocklist slot of a
    web-corpus pipeline): synthesize deterministic varied hosts, parse
    them back with the vectorized URL parser, drop any host equal to a
    blocklist entry or ending in '.' + entry (registrable-domain
    suffix semantics). The blocklist is a tiny broadcast side — the
    filter is a per-batch mask, no shuffle."""
    from pythongis_ray import urltools

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tld = np.array(["example", "test", "adsnet", "shop"])[did % 4]
        host = pc.binary_join_element_wise(
            pc.cast(pa.array(np.char.add("sub", (did % 3).astype(str))),
                    pa.string()),
            pc.cast(pa.array(np.char.add("site", (did % 50).astype(str))),
                    pa.string()),
            pa.array(tld), ".")
        url = pc.binary_join_element_wise(
            pa.array(np.full(len(did), "https:/", dtype=object)),
            host,
            pc.cast(pa.array(np.char.add("p", did.astype(str))), pa.string()),
            "/")
        return batch.append_column("url", url)

    def flt(batch: pa.Table) -> pa.Table:
        host = urltools.parse_urls(batch["url"])["host"]
        mask = pa.array(np.zeros(len(batch), dtype=bool))
        for entry in URL_BLOCKLIST:
            mask = pc.or_(mask, pc.equal(host, entry))
            mask = pc.or_(mask, pc.ends_with(host, "." + entry))
        batch = batch.append_column("url_host", host)
        return batch.filter(pc.invert(mask))

    ds = ds.map_batches(synth, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(flt, batch_format="pyarrow", batch_size=8192)
    return ds.select_columns(["doc_id", "url_host"])


def _sql_url_filter() -> str:
    conds = " OR ".join(
        f"host = '{e}' OR ends_with(host, '.{e}')" for e in URL_BLOCKLIST)
    return f"""
WITH p AS (
  SELECT doc_id,
    'sub' || CAST(doc_id % 3 AS VARCHAR) || '.site'
      || CAST(doc_id % 50 AS VARCHAR) || '.'
      || (CASE doc_id % 4 WHEN 0 THEN 'example' WHEN 1 THEN 'test'
          WHEN 2 THEN 'adsnet' ELSE 'shop' END) AS host
  FROM documents)
SELECT doc_id, host AS url_host FROM p
WHERE NOT ({conds})
"""


PHRASE = ("part", "filter")  # frequent corpus bigram at every SF


def q_phrase_search(sf_dir: str):
    """Exact consecutive-token phrase retrieval: one vectorized scan
    probing the raw-buffer token-hash stream for the phrase chain
    (text.phrase_search). Positional semantics — the inverted-index
    probe a search engine would run, expressed as a streaming batch
    transform."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.phrase_search(ds, list(PHRASE))


SQL_PHRASE_SEARCH = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
p AS (SELECT doc_id, tk,
             unnest(generate_series(1, len(tk) - {len(PHRASE) - 1})) AS i
      FROM t WHERE len(tk) >= {len(PHRASE)})
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(i) - 1 AS BIGINT) AS first_pos
FROM p
WHERE {' AND '.join(f"tk[i+{j}] = '{w}'" for j, w in enumerate(PHRASE))}
GROUP BY doc_id
"""


def q_bloom_semijoin(sf_dir: str):
    """Bloom-prefiltered exact semi-join: orders placed by
    BUILDING-segment customers. The customer key set becomes a
    128 KiB broadcast bitmap; only probe-side survivors (matches +
    ~fp-rate false positives) enter the verify shuffle — the pattern
    that makes a 100-TB-side semi-join affordable when the raw build
    keys are too wide to broadcast."""
    orders = _rd().read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        total = np.rint(np.asarray(tp, np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "total_cents": pa.array(total),
        })

    big = orders.map_batches(cents, batch_format="pyarrow",
                             batch_size=65536)
    cust = _rd().read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]).filter(
            expr="c_mktsegment == 'BUILDING'")
    return rel.bloom_semi_join(big, cust, key="o_custkey",
                               small_key="c_custkey")


SQL_BLOOM_SEMIJOIN = """
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
"""


def q_windowed_distinct(sf_dir: str):
    """Hopping-window COUNT DISTINCT: unique users per event_type per
    2-minute window hopping by 1 minute — the streaming-analytics
    staple (batch-local Arrow dedup combiner, ONE bucketed shuffle on
    (group, window), vectorized unique count per bucket)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "user_id": pc.cast(batch["user_id"], pa.int64()),
                         "ts_us": pa.array(us)})

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return rel.windowed_distinct(ds, "event_type", "ts_us",
                                 size=120_000_000, hop=60_000_000,
                                 user_col="user_id", out_col="n_users")


SQL_WINDOWED_DISTINCT = """
SELECT event_type, (epoch_us(ts) // 60000000 - k) * 60000000 AS win_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) _k
GROUP BY event_type, (epoch_us(ts) // 60000000 - k) * 60000000
"""


PROX_A, PROX_B, PROX_WINDOW = "hash", "join", 3


def q_proximity(sf_dir: str):
    """Proximity retrieval: docs where PROX_A occurs within 3 token
    positions of PROX_B, with match count and minimum gap — the
    positional-search companion to phrase_search, one vectorized scan
    (nearest-B per A via a single searchsorted)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.proximity_search(ds, PROX_A, PROX_B, PROX_WINDOW)


SQL_PROXIMITY = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
p AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM t),
w AS (SELECT doc_id, i, tk[i] AS tok FROM p),
aa AS (SELECT doc_id, i FROM w WHERE tok = '{PROX_A}'),
bb AS (SELECT doc_id, i FROM w WHERE tok = '{PROX_B}'),
m AS (SELECT aa.doc_id, aa.i, MIN(ABS(aa.i - bb.i)) AS gap
      FROM aa JOIN bb ON aa.doc_id = bb.doc_id GROUP BY aa.doc_id, aa.i)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(gap) AS BIGINT) AS min_gap
FROM m WHERE gap <= {PROX_WINDOW} GROUP BY doc_id
"""


def q_related_pages(sf_dir: str):
    """Related-pages by co-citation Jaccard (the link-structure
    similarity behind 'similar results'): for each co-cited pair
    {a < b}, the overlap n_cociting over the union of their distinct
    citing sets, as exact ppm (single integer division — bit-equal in
    DuckDB). Distinct edges materialize ONCE and feed both branches
    (pair emission bucketed by src; in-degrees bucketed by dst); the
    tiny pair table re-attaches degrees via two partitioned joins."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply, join_large

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)

    def dedup_batch(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": pc.cast(batch["src_page"], pa.int64()),
                      "dst": pc.cast(batch["dst_page"], pa.int64())})
        return t.group_by(["src", "dst"]).aggregate([])

    # consumed by two branches -> materialize once (else each branch
    # re-executes the whole synth+extract lineage; CLAUDE.md gotcha 3)
    de = edges.map_batches(dedup_batch, batch_format="pyarrow",
                           batch_size=65536).materialize()

    def per_src(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["src", "dst"])
        b = b.sort_values(["src", "dst"], kind="stable")
        src = b["src"].to_numpy(np.int64)
        dst = b["dst"].to_numpy(np.int64)
        outs = []
        d = 1
        while True:
            msk = src[d:] == src[:-d]
            if not msk.any():
                break
            outs.append((dst[:-d][msk], dst[d:][msk]))
            d += 1
        if not outs:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "pcnt": np.empty(0, np.int64)})
        df = pd.DataFrame({"a": np.concatenate([o[0] for o in outs]),
                           "b": np.concatenate([o[1] for o in outs])})
        return (df.groupby(["a", "b"], sort=False).size()
                .rename("pcnt").reset_index())

    parts = bucketed_group_apply(de, ["src"], per_src)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["a", "b"], sort=False)["pcnt"].sum()
                .reset_index(name="n_cociting"))

    pairs = bucketed_group_apply(parts, ["a", "b"], combine)

    def per_dst(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.drop_duplicates(["src", "dst"]).groupby("dst", sort=False)
             .size().rename("deg").reset_index())
        g["deg"] = g["deg"].astype(np.int64)
        return g

    deg = bucketed_group_apply(de, ["dst"], per_dst)
    deg_a = deg.map_batches(
        lambda b: b.rename(columns={"dst": "a", "deg": "deg_a"}),
        batch_format="pandas")
    deg_b = deg.map_batches(
        lambda b: b.rename(columns={"dst": "b", "deg": "deg_b"}),
        batch_format="pandas")
    out = join_large(join_large(pairs, deg_a, on="a"), deg_b, on="b")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_cociting"].astype(np.int64)
        da = b["deg_a"].astype(np.int64)
        db_ = b["deg_b"].astype(np.int64)
        return pd.DataFrame({
            "a": b["a"].astype(np.int64), "b": b["b"].astype(np.int64),
            "n_cociting": n, "deg_a": da, "deg_b": db_,
            "jac_ppm": (n * 1_000_000) // (da + db_ - n)})

    return out.map_batches(finish, batch_format="pandas")


SQL_RELATED_PAGES = f"""
WITH de AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({_SQL_PAGE_EDGES})),
co AS (SELECT x.dst AS a, y.dst AS b, COUNT(*) AS n
       FROM de x JOIN de y ON x.src = y.src AND x.dst < y.dst
       GROUP BY x.dst, y.dst),
deg AS (SELECT dst AS node, COUNT(*) AS d FROM de GROUP BY dst)
SELECT co.a, co.b, CAST(co.n AS BIGINT) AS n_cociting,
       CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
       CAST(co.n * 1000000 // (da.d + db.d - co.n) AS BIGINT) AS jac_ppm
FROM co JOIN deg da ON co.a = da.node JOIN deg db ON co.b = db.node
"""


PQ_M, PQ_K, PQ_ITERS, PQ_TOPK, PQ_QID, PQ_DIM = 4, 8, 2, 10, 0, 64


def q_pq_topk(sf_dir: str):
    """Product-quantization ANN (Jegou et al. 2011): m=4 subspace
    codebooks trained in ONE streaming pass per round, corpus scored
    by the asymmetric-distance LUT (query exact, vectors as m codes),
    deterministic partial top-k per block + tiny driver merge. The
    full fit AND search replay bit-exactly in DuckDB (4 k-means CTE
    chains + the same l2 arithmetic)."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    C = embed.pq_fit(emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS)
    qrow = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           filters=[("vec_id", "==", PQ_QID)])
    q = embed.quantize(np.vstack(qrow["embedding"].to_numpy()), 1000)[0]
    return embed.pq_search(emb, C, q, k_top=PQ_TOPK)


def _sql_pq_topk() -> str:
    sub = PQ_DIM // PQ_M
    chains = ",\n".join(
        _sql_kmeans_ctes(PQ_K, PQ_ITERS, dim=PQ_DIM, suffix=f"_s{j}",
                         span=(j * sub, (j + 1) * sub))
        for j in range(PQ_M))
    qq = ",\n".join(
        f"qq{j} AS (SELECT e FROM eq_s{j} WHERE vec_id = {PQ_QID})"
        for j in range(PQ_M))
    dist = "\n         + ".join(
        f"(list_dot_product(qq{j}.e, qq{j}.e)"
        f" - 2 * list_dot_product(qq{j}.e, cf{j}.c)"
        f" + list_dot_product(cf{j}.c, cf{j}.c))"
        for j in range(PQ_M))
    joins = "\n  ".join(
        f"JOIN af_s{j} a{j} ON a{j}.vec_id = a0.vec_id" if j else "af_s0 a0"
        for j in range(PQ_M)) + "\n  " + "\n  ".join(
        f"JOIN c{PQ_ITERS}_s{j} cf{j} ON cf{j}.i = a{j}.cluster"
        for j in range(PQ_M)) + "\n  " + "\n  ".join(
        f"CROSS JOIN qq{j}" for j in range(PQ_M))
    return f"""
WITH {chains},
{qq},
d AS (
  SELECT a0.vec_id, CAST({dist} AS BIGINT) AS d2
  FROM {joins})
SELECT vec_id, d2,
       CAST(ROW_NUMBER() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank
FROM d ORDER BY d2, vec_id LIMIT {PQ_TOPK}
"""


WSP_ITERS, WSP_WMOD = 10, 7


def q_weighted_distance(sf_dir: str):
    """Single-source-set weighted shortest paths (Bellman-Ford rounds
    of min-plus on the resident-shard engine): distance from the seed
    pages along the link graph under the deterministic edge weight
    (src+dst) % 7 + 1, capped at 10 rounds — the SSSP generalization
    of link_distance; crawl-cost / latency modelling over the same
    exchange schedule."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.bfs_actors(edges, src="src_page", dst="dst_page",
                           seed_mod=BFS_SEED_MOD, iters=WSP_ITERS,
                           weight_mod=WSP_WMOD)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "dist": pc.cast(b["dist"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_bfs_weighted(iters: int = WSP_ITERS,
                      seed_mod: int = BFS_SEED_MOD,
                      wmod: int = WSP_WMOD,
                      edges_sql: str = _SQL_PAGE_EDGES) -> str:
    inf = 1 << 40
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
d0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN node % {seed_mod} = 0 THEN 0
                         ELSE {inf} END AS BIGINT) AS dist
  FROM nodes)"""
    step = f""",
d{{k}} AS MATERIALIZED (
  SELECT n.node,
         CAST(LEAST(MIN(dn.dist),
                    COALESCE(MIN(ds.dist + ((e.src + e.dst) % {wmod})
                                 + 1), {inf})) AS BIGINT)
           AS dist
  FROM nodes n JOIN d{{p}} dn ON dn.node = n.node
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN d{{p}} ds ON ds.node = e.src
  GROUP BY n.node)"""
    body = "".join(step.format(k=k, p=k - 1)
                   for k in range(1, iters + 1))
    return head + body + f"\nSELECT node, dist FROM d{iters}"


def q_hll_hosts(sf_dir: str):
    """Per-host HyperLogLog distinct-token estimates: fixed 64-register
    sketches whose merge is elementwise MAX (any combine order), with
    the α·m²/Σ2^(−M) estimate computed as ONE exact integer division —
    the constant-state counterpart to kmv_by_host."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: pa.table({
            "host": pa.array(
                b["doc_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % 50),
            "text": b["text"]}),
        batch_format="pyarrow", batch_size=8192)
    return text.hll_distinct_by(ds, "host")


SQL_HLL_HOSTS = """
WITH w AS (SELECT doc_id % 50 AS host,
                  UNNEST(string_split(text, ' ')) AS word
           FROM documents),
h0 AS (SELECT DISTINCT host,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
        [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
        (acc, x) -> (acc * 1099511628211 + x)
                    % CAST('18446744073709551616' AS HUGEINT)) AS th0
      FROM w),
h AS (SELECT host, ((((th0 // 4294967296)
                * CAST('11400714819323198485' AS HUGEINT)) % 4294967296)
               * 4294967296
              + (th0 % 4294967296)
                * CAST('11400714819323198485' AS HUGEINT))
             % CAST('18446744073709551616' AS HUGEINT) AS th FROM h0),
tb AS (SELECT host,
              CAST(th % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
                AS t FROM h),
rr AS (SELECT host, t % 64 AS reg,
              CASE WHEN t // 64 = 0 THEN 56
                   ELSE LEAST(bit_count(((t // 64) & -(t // 64)) - 1)
                              + 1, 56) END AS rho
       FROM tb),
mx AS (SELECT host, reg, MAX(rho) AS mr FROM rr GROUP BY host, reg),
s AS (SELECT host,
             SUM(CAST(power(2, 56 - mr) AS HUGEINT))
               + (64 - COUNT(*)) * CAST(power(2, 56) AS HUGEINT) AS ss,
             COUNT(*) AS nz
      FROM mx GROUP BY host)
SELECT CAST(host AS BIGINT) AS host,
       CAST((CAST(2904064 AS HUGEINT)
             * CAST(power(2, 56) AS HUGEINT)) // (1000 * ss) AS BIGINT)
         AS est,
       CAST(nz AS BIGINT) AS n_regs
FROM s
"""


def q_mutual_links(sf_dir: str):
    """Reciprocal host links (mutual-citation / link-exchange spam
    signal): host pairs {a < b} linked in BOTH directions on the
    host-projected graph, with per-direction edge multiplicities.
    One bucketed count shuffle, then canonical-pair co-location —
    each pair meets in exactly one bucket with ≤ 2 rows."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    he = pages.host_edges(edges)

    def cnt_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch["src"], pa.int64()),
            "dst": pc.cast(batch["dst"], pa.int64()),
        }).group_by(["src", "dst"]).aggregate([("src", "count")]) \
            .rename_columns(["src", "dst", "n"])

    pre = he.map_batches(cnt_batch, batch_format="pyarrow",
                         batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["src", "dst"], sort=False)["n"].sum()
                .reset_index())

    cnt = bucketed_group_apply(pre, ["src", "dst"], combine)

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["src"] != b["dst"]]
        lo = np.minimum(b["src"].to_numpy(np.int64),
                        b["dst"].to_numpy(np.int64))
        hi = np.maximum(b["src"].to_numpy(np.int64),
                        b["dst"].to_numpy(np.int64))
        return pd.DataFrame({"a": lo, "b": hi,
                             "fwd": (b["src"].to_numpy(np.int64) == lo),
                             "n": b["n"].to_numpy(np.int64)})

    cn = cnt.map_batches(canon, batch_format="pandas")

    def pair(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["a", "b"], sort=False)
        out = []
        for (a, bb), grp in g:
            if grp["fwd"].nunique() == 2:
                n_ab = int(grp.loc[grp["fwd"], "n"].iloc[0])
                n_ba = int(grp.loc[~grp["fwd"], "n"].iloc[0])
                out.append((a, bb, n_ab, n_ba))
        return pd.DataFrame(out, columns=["a", "b", "n_ab", "n_ba"]) \
            .astype(np.int64) if out else \
            pd.DataFrame({"a": np.empty(0, np.int64),
                          "b": np.empty(0, np.int64),
                          "n_ab": np.empty(0, np.int64),
                          "n_ba": np.empty(0, np.int64)})

    return bucketed_group_apply(cn, ["a", "b"], pair)


SQL_MUTUAL_LINKS = f"""
WITH he AS (SELECT src, dst, COUNT(*) AS n FROM ({_SQL_HOST_EDGES})
            GROUP BY src, dst)
SELECT x.src AS a, x.dst AS b, CAST(x.n AS BIGINT) AS n_ab,
       CAST(y.n AS BIGINT) AS n_ba
FROM he x JOIN he y ON x.src = y.dst AND x.dst = y.src
WHERE x.src < x.dst
"""


SCC_OUTER, SCC_INNER = 4, 8


def q_scc_hosts(sf_dir: str):
    """Strongly connected components of the host graph (the web
    bow-tie / spam-ring structure): Orzan-style forward min-coloring
    + backward same-color anchoring on the resident-shard engine,
    4 outer × 8 inner capped rounds. Every emitted group is strongly
    connected by construction; nodes undecided within the caps keep
    scc = -1. Exact chained-CTE replay in DuckDB (the link_distance
    round-cap contract applied to a two-phase iterative algorithm)."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.scc_actors(pages.host_edges(edges),
                           outer=SCC_OUTER, inner=SCC_INNER)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "scc": pc.cast(b["scc"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_scc(outer: int = SCC_OUTER, inner: int = SCC_INNER,
             edges_sql: str = _SQL_HOST_EDGES) -> str:
    """Replay of graph.scc_actors: per outer round, ``inner`` levels
    of forward MIN-color (undecided senders/receivers only), root
    marking (col == node), ``inner`` levels of backward anchoring
    gated on color equality, then decide+reset. Engine early exits
    are at fixpoints, so running every capped level here is
    bit-identical."""
    parts = [f"""e AS MATERIALIZED (SELECT DISTINCT src, dst
                 FROM ({edges_sql})),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
s0 AS MATERIALIZED (
  SELECT node, CAST(0 AS BIGINT) AS dec, CAST(-1 AS BIGINT) AS scc,
         node AS col
  FROM nodes)"""]
    for o in range(outer):
        cur = f"s{o}"
        for k in range(1, inner + 1):
            parts.append(f"""f{o}_{k} AS MATERIALIZED (
  SELECT n.node, n.dec, n.scc,
         CAST(CASE WHEN n.dec = 1 THEN n.col
              ELSE LEAST(n.col, COALESCE(MIN(CASE WHEN p.dec = 0
                   THEN p.col END), n.col)) END AS BIGINT) AS col
  FROM {cur} n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN {cur} p ON p.node = e.src
  GROUP BY n.node, n.dec, n.scc, n.col)""")
            cur = f"f{o}_{k}"
        parts.append(f"""b{o}_0 AS MATERIALIZED (
  SELECT node, dec, scc, col,
         CAST(CASE WHEN dec = 0 AND col = node THEN 1 ELSE 0 END
              AS BIGINT) AS anch
  FROM {cur})""")
        cur = f"b{o}_0"
        for k in range(1, inner + 1):
            parts.append(f"""b{o}_{k} AS MATERIALIZED (
  SELECT n.node, n.dec, n.scc, n.col,
         CAST(CASE WHEN n.anch = 1 THEN 1
              WHEN n.dec = 0 AND COALESCE(MAX(CASE WHEN w.anch = 1
                   AND w.col = n.col THEN 1 ELSE 0 END), 0) = 1 THEN 1
              ELSE 0 END AS BIGINT) AS anch
  FROM {cur} n
  LEFT JOIN e ON e.src = n.node
  LEFT JOIN {cur} w ON w.node = e.dst
  GROUP BY n.node, n.dec, n.scc, n.col, n.anch)""")
            cur = f"b{o}_{k}"
        parts.append(f"""s{o + 1} AS MATERIALIZED (
  SELECT node,
         CAST(CASE WHEN anch = 1 THEN 1 ELSE dec END AS BIGINT) AS dec,
         CAST(CASE WHEN anch = 1 THEN col ELSE scc END AS BIGINT) AS scc,
         CAST(CASE WHEN anch = 1 OR dec = 1 THEN col ELSE node END
              AS BIGINT) AS col
  FROM {cur})""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, scc FROM s{outer}")


def q_quality_gate(sf_dir: str):
    """Per-language quantile quality gate (the CCNet-style 'keep the
    top decile per language' filter): pass 1 reduces the corpus to a
    narrow (doc_id, lang, n_tokens) table; per-lang p90 thresholds
    come from one tiny grouped quantile; the thresholds broadcast as
    a dict and the filter is a vectorized lookup — aggregate →
    broadcast → filter, no second shuffle, page bodies read once."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        t = text.quality_score(batch)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "lang": batch["lang"],
                         "n_tokens": t["n_tokens"]})

    # two consumers (threshold agg + filter) — materialize the NARROW
    # score table, not the corpus
    q = ds.map_batches(score, batch_format="pyarrow",
                       batch_size=8192).materialize()
    thr = rel.groupby_aggregate(
        q, "lang", [("thr", "n_tokens", "quantile:0.9")]).to_pandas()
    tmap = dict(zip(thr["lang"], thr["thr"].astype(np.int64)))

    def gate(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        t = np.array([tmap[x] for x in langs], np.int64)
        keep = batch["n_tokens"].to_numpy(zero_copy_only=False) > t
        out = batch.filter(pa.array(keep))
        return out.append_column("thr", pa.array(t[keep]))

    return q.map_batches(gate, batch_format="pyarrow", batch_size=65536)


SQL_QUALITY_GATE = """
WITH q AS (SELECT doc_id, lang,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
          AS n_tokens FROM documents),
t AS (SELECT lang, CAST(quantile_disc(n_tokens, 0.9) AS BIGINT) AS thr
      FROM q GROUP BY lang)
SELECT q.doc_id, q.lang, q.n_tokens, t.thr
FROM q JOIN t USING (lang) WHERE q.n_tokens > t.thr
"""


def q_crawl_diff(sf_dir: str):
    """Crawl snapshot diff (added / removed / changed pages between
    two crawls): each side reduces to (doc_id, fp) — 16 bytes/page —
    so the classifying full-outer co-location never ships page
    bodies. Snapshots synthesize deterministically from documents
    (old = ids %7≠0; new = ids %11≠0, text‖' v2' when %13=0); the
    oracle compares raw texts — same contract as dedup_docs (fp
    equality ≡ text equality modulo 2^-64 collisions)."""
    from pythongis_ray.relational import bucketed_group_apply

    docs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def sides(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = batch["text"]
        texts = texts.combine_chunks() if isinstance(
            texts, pa.ChunkedArray) else texts
        out_id, out_fp, out_side = [], [], []
        # old snapshot: unmodified text
        m = ids % 7 != 0
        t = text.fingerprint(pa.table({"doc_id": pa.array(ids[m]),
                                       "text": texts.filter(pa.array(m))}))
        out_id.append(t["doc_id"].to_numpy(zero_copy_only=False))
        out_fp.append(t["fp"].to_numpy(zero_copy_only=False))
        out_side.append(np.zeros(len(t), np.int64))
        # new snapshot: ids %13==0 carry edited bodies
        m = ids % 11 != 0
        edited = pc.if_else(
            pa.array(ids % 13 == 0),
            pc.binary_join_element_wise(texts, pa.scalar("v2"), " "),
            texts)
        if isinstance(edited, pa.ChunkedArray):
            edited = edited.combine_chunks()
        t = text.fingerprint(pa.table({"doc_id": pa.array(ids[m]),
                                       "text": edited.filter(pa.array(m))}))
        out_id.append(t["doc_id"].to_numpy(zero_copy_only=False))
        out_fp.append(t["fp"].to_numpy(zero_copy_only=False))
        out_side.append(np.ones(len(t), np.int64))
        return pa.table({"doc_id": pa.array(np.concatenate(out_id)),
                         "fp": pa.array(np.concatenate(out_fp)),
                         "side": pa.array(np.concatenate(out_side))})

    both = docs.map_batches(sides, batch_format="pyarrow",
                            batch_size=8192)

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["doc_id", "side"], kind="stable")
        ids = g["doc_id"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int64)
        fp = g["fp"].to_numpy(np.int64)
        first = np.concatenate(([True], ids[1:] != ids[:-1]))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(ids)])
        uid = ids[starts]
        one = cnt == 1
        added = one & (side[starts] == 1)
        removed = one & (side[starts] == 0)
        pair = starts[cnt == 2]
        changed_ids = ids[pair][fp[pair] != fp[pair + 1]]
        out_id = np.concatenate([uid[added], uid[removed], changed_ids])
        out_st = np.concatenate([
            np.repeat("added", added.sum()),
            np.repeat("removed", removed.sum()),
            np.repeat("changed", len(changed_ids))])
        return pd.DataFrame({"doc_id": out_id, "status": out_st})

    return bucketed_group_apply(both, ["doc_id"], classify)


SQL_CRAWL_DIFF = """
WITH oldc AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
newc AS (SELECT doc_id,
                CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                     ELSE text END AS text
         FROM documents WHERE doc_id % 11 <> 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
"""


def _events_us(sf_dir: str, cols=("user_id", "ts", "event_type")):
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=list(cols))

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        out = {c: batch[c] for c in cols if c != "ts"}
        out["ts_us"] = pa.array(us)
        return pa.table(out)

    return ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)


def q_transitions(sf_dir: str):
    """Clickstream transition matrix: per user (ordered by event
    time), counts of each (event_type → next event_type) pair — the
    navigation-graph building block of web analytics. One bucketed
    shuffle co-locates each user's log; pairs fold to per-bucket
    partials so the final (a, b) combine moves ≤ 25 rows per bucket.
    (user_id, ts) is unique in the fixture, so the order is total."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
        return (df.groupby(["a", "b"], sort=False).size()
                .rename("n").reset_index())

    parts = bucketed_group_apply(ds, ["user_id"], per_bucket)
    out = rel.groupby_aggregate(parts, ["a", "b"], [("n", "n", "sum")])
    return out.map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"],
                            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_TRANSITIONS = """
WITH t AS (SELECT user_id, event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts) AS nxt
           FROM events)
SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS n
FROM t WHERE nxt IS NOT NULL GROUP BY event_type, nxt
"""


FUNNEL = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered funnel (view → click → purchase): users reaching each
    stage, where stage k requires an event strictly AFTER the user's
    earliest stage-(k-1) completion time — the classic event-sequence
    analytic. One shuffle co-locates each user's log; the stage walk
    is a per-user searchsorted chain; per-bucket partial counts sum
    to a single row."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        counts = np.zeros(len(FUNNEL), np.int64)
        for _, grp in g.groupby("user_id", sort=False):
            ts = grp["ts_us"].to_numpy(np.int64)
            et = grp["event_type"].to_numpy()
            t = -np.int64(1) << 62
            for k, stage in enumerate(FUNNEL):
                st = ts[et == stage]
                nxt = st[st > t]
                if len(nxt) == 0:
                    break
                t = nxt[0]
                counts[k] += 1
        return pd.DataFrame({"stage": np.arange(len(FUNNEL), dtype=np.int64),
                             "n": counts})

    parts = bucketed_group_apply(ds, ["user_id"], per_bucket)
    out = rel.groupby_aggregate(parts, "stage", [("n_users", "n", "sum")])
    return out.map_batches(
        lambda b: pa.table({"stage": pc.cast(b["stage"], pa.int64()),
                            "n_users": pc.cast(b["n_users"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_FUNNEL = f"""
WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id),
s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN s0 ON s0.user_id = e.user_id
       WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > s0.t
       GROUP BY e.user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > s1.t
       GROUP BY e.user_id)
SELECT 0 AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
UNION ALL SELECT 1, CAST(COUNT(*) AS BIGINT) FROM s1
UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT) FROM s2
"""


def q_retention(sf_dir: str):
    """Cohort retention: users grouped by first-seen week, counted in
    each later activity week (offset from cohort) — the canonical
    retention triangle. ONE shuffle co-locates each user's log; the
    per-user (cohort, offset) rows are already distinct, so the final
    count is a plain sum combine."""
    from pythongis_ray.relational import bucketed_group_apply

    DAY = 86_400_000_000
    ds = _events_us(sf_dir, cols=("user_id", "ts"))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        day = g["ts_us"].to_numpy(np.int64) // DAY
        first = np.concatenate(([True], u[1:] != u[:-1]))
        cohort = np.repeat(day[first] // 7,
                           np.diff(np.r_[np.flatnonzero(first), len(u)]))
        wk = day // 7 - cohort
        df = pd.DataFrame({"cohort_week": cohort, "week_offset": wk,
                           "u": u}).drop_duplicates()
        return (df.groupby(["cohort_week", "week_offset"], sort=False)
                .size().rename("n").reset_index())

    parts = bucketed_group_apply(ds, ["user_id"], per_bucket)
    out = rel.groupby_aggregate(parts, ["cohort_week", "week_offset"],
                                [("n_users", "n", "sum")])
    return out.map_batches(
        lambda b: pa.table({
            "cohort_week": pc.cast(b["cohort_week"], pa.int64()),
            "week_offset": pc.cast(b["week_offset"], pa.int64()),
            "n_users": pc.cast(b["n_users"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_RETENTION = """
WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, MIN(day) // 7 AS cohort FROM d GROUP BY user_id),
a AS (SELECT DISTINCT d.user_id, f.cohort, d.day // 7 - f.cohort AS wk
      FROM d JOIN f USING (user_id))
SELECT cohort AS cohort_week, wk AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort, wk
"""


# ------------------------------------------------------------- registry

# ----------------------------------------------- analytics batch (late r3)


def q_rollup_cube(sf_dir: str):
    """OLAP grouping-sets rollup from ONE corpus pass: the finest
    (lang, source) cell table is the only corpus-sized work; every
    coarser set — (lang), (source), () — re-aggregates that tiny
    cell-bounded table, never the input. '*' marks a rolled-up
    dimension. Reference analogue: sql.aggreg run once per key set
    (reference pythongis/vector/sql.py:96-127) re-scans the data per
    set; here one scan + three cell-bounded combines cover all four."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "source": b["source"].to_pandas(),
            "n_chars": b["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = (df.groupby(["lang", "source"], sort=False)["n_chars"]
             .agg(n_docs="count", sum_chars="sum").reset_index())
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["sum_chars"] = g["sum_chars"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def combine(keys):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            g = (b.groupby(keys, sort=False)[["n_docs", "sum_chars"]]
                 .sum().reset_index())
            g["n_docs"] = g["n_docs"].astype(np.int64)
            g["sum_chars"] = g["sum_chars"].astype(np.int64)
            return g
        return fn

    # finest level feeds three consumers (output + two rollups) and the
    # lang level feeds two -> materialize the tiny cell tables
    finest = rel.bucketed_group_apply(parts, ["lang", "source"],
                                      combine(["lang", "source"])) \
        .materialize()
    by_lang = rel.bucketed_group_apply(finest, ["lang"], combine(["lang"])) \
        .materialize()
    by_source = rel.bucketed_group_apply(finest, ["source"],
                                         combine(["source"]))
    tot_in = by_lang.map_batches(lambda b: b.assign(_all=np.int64(0)),
                                 batch_format="pandas")
    total = rel.bucketed_group_apply(tot_in, ["_all"], combine(["_all"]))

    def pad(dsx, drop=(), lang_all=False, source_all=False):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b.drop(columns=list(drop), errors="ignore")
            if lang_all:
                b = b.assign(lang="*")
            if source_all:
                b = b.assign(source="*")
            return b[["lang", "source", "n_docs", "sum_chars"]]
        return dsx.map_batches(f, batch_format="pandas")

    return pad(finest).union(
        pad(by_lang, source_all=True),
        pad(by_source, lang_all=True),
        pad(total, drop=("_all",), lang_all=True, source_all=True))


SQL_ROLLUP_CUBE = """
SELECT COALESCE(lang, '*') AS lang, COALESCE(source, '*') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""


def q_regress_hour(sf_dir: str):
    """Grouped EXACT linear regression (cents-value vs hour-of-day per
    event_type): one streamed pass emits per-batch integer moment
    partials (n, Σx, Σy, Σx², Σxy); a key-bucketed combine reduces
    them; the slope ships as an exact integer numerator/denominator
    pair (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) so the oracle hash-matches
    without any float division. int64 is ample here (x ≤ 23, cents
    ≤ ~5·10⁴); a 100-TB run would widen the moment partials to
    int128 / two-limb accumulation."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        x = (us // 3_600_000_000) % 24
        y = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "n": np.ones(len(x), np.int64), "sx": x,
                           "sy": y, "sxx": x * x, "sxy": x * y})
        return df.groupby("event_type", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("event_type", sort=False)[
            ["n", "sx", "sy", "sxx", "sxy"]].sum().reset_index())
        out = pd.DataFrame({
            "event_type": g["event_type"],
            "n": g["n"].astype(np.int64),
            "sx": g["sx"].astype(np.int64),
            "sy": g["sy"].astype(np.int64),
            "slope_num": (g["n"] * g["sxy"] - g["sx"] * g["sy"])
            .astype(np.int64),
            "slope_den": (g["n"] * g["sxx"] - g["sx"] * g["sx"])
            .astype(np.int64)})
        return out

    return rel.bucketed_group_apply(parts, ["event_type"], combine)


SQL_REGRESS_HOUR = """
WITH p AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS x,
                  CAST(round(value * 100) AS BIGINT) AS y
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
         AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
         AS slope_den
FROM p GROUP BY event_type
"""


def q_skyline(sf_dir: str):
    """Skyline (Pareto frontier) of users on (n_events, sum_cents),
    maximize both: per-user integer aggregates stream through a
    key-bucketed combine; per-block local frontiers prune everything
    a single block can already dominate; one final single-group refine
    over the tiny candidate antichain. Oracle = the classic NOT EXISTS
    dominance anti-join."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        y = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64),
            "n_events": np.ones(len(y), np.int64), "sum_cents": y})
        return df.groupby("user_id", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("user_id", sort=False)[["n_events", "sum_cents"]]
             .sum().reset_index())
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_cents"] = g["sum_cents"].astype(np.int64)
        return g

    users = rel.bucketed_group_apply(parts, ["user_id"], combine)
    return rel.skyline(users, "n_events", "sum_cents")


SQL_SKYLINE = """
WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS sum_cents
           FROM events GROUP BY user_id)
SELECT user_id, n_events, sum_cents FROM u a
WHERE NOT EXISTS (
  SELECT 1 FROM u b
  WHERE b.n_events >= a.n_events AND b.sum_cents >= a.sum_cents
    AND (b.n_events > a.n_events OR b.sum_cents > a.sum_cents))
"""


BM25_SCALE, BM25_K = 1000, 10


def q_bm25_topk(sf_dir: str):
    """BM25 retrieval (k1=6/5, b=3/4) in EXACT integer arithmetic:
    with rational idf = ⌊SCALE·N/df⌋ and avgdl = T/N kept as the exact
    ratio of two corpus sums, the per-term score
    idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) clears denominators to
    ⌊idf·tf·22·T / (10·tf·T + 3·T + 9·dl·N)⌋ — one floor division per
    (doc, term), summed per doc; bit-equal in DuckDB HUGEINT. Same
    scan discipline as q_search_topk: tf+dl in one tokenize pass over
    a materialized NARROW table, block-bounded df/N/T reduction,
    distributed sort-limit top-k. Magnitudes: idf ≤ SCALE·N, so the
    numerator stays < 2^63 at every test sf (documented bound)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def tf_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        flat = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        offs = np.asarray(flat.offsets)
        vals = flat.values
        cols = {"doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "dl": pa.array((offs[1:] - offs[:-1]).astype(np.int64))}
        for t in SEARCH_TERMS:
            eq = pc.equal(vals, t).to_numpy(zero_copy_only=False)
            c = np.concatenate([[0], np.cumsum(eq.astype(np.int64))])
            cols[f"tf_{t}"] = pa.array(c[offs[1:]] - c[offs[:-1]])
        return pa.table(cols)

    tfs = ds.map_batches(tf_batch, batch_format="pyarrow",
                         batch_size=8192).materialize()

    def reduce_stats(batch: pa.Table) -> pa.Table:
        row = {"n": [len(batch)],
               "t": [int(pc.sum(batch["dl"]).as_py() or 0)]}
        for t in SEARCH_TERMS:
            row[f"df_{t}"] = [int(pc.sum(pc.greater(
                batch[f"tf_{t}"], 0)).as_py() or 0)]
        return pa.table(row)

    tot = tfs.map_batches(reduce_stats, batch_format="pyarrow",
                          batch_size=8192).to_pandas().sum()
    n_docs, t_tokens = int(tot["n"]), int(tot["t"])
    idf = {t: (BM25_SCALE * n_docs) // int(tot[f"df_{t}"])
           for t in SEARCH_TERMS if int(tot[f"df_{t}"]) > 0}

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False)
        s = np.zeros(len(batch), np.int64)
        hit = np.zeros(len(batch), bool)
        den_base = 3 * t_tokens + 9 * dl * n_docs
        for t, w in idf.items():
            tf = batch[f"tf_{t}"].to_numpy(zero_copy_only=False)
            den = 10 * tf * t_tokens + den_base
            s += np.where(tf > 0, (w * tf * 22 * t_tokens) // den, 0)
            hit |= tf > 0
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64())
            .filter(pa.array(hit)),
            "score": pa.array(s[hit])})

    out = tfs.map_batches(score, batch_format="pyarrow", batch_size=65536)
    return out.sort([("score"), ("doc_id")],
                    descending=[True, False]).limit(BM25_K)


SQL_BM25_TOPK = f"""
WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM p
       GROUP BY doc_id),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM p
       WHERE w IN {SEARCH_TERMS!r} GROUP BY doc_id, w),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
g AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS t),
idf AS (SELECT w, ({BM25_SCALE} * (SELECT n FROM g)) // df AS idf
        FROM df),
s AS (SELECT tf.doc_id,
             SUM(CAST(i.idf AS HUGEINT) * tf.tf * 22 * (SELECT t FROM g)
                 // (10 * tf.tf * (SELECT t FROM g)
                     + 3 * (SELECT t FROM g)
                     + 9 * dl.dl * (SELECT n FROM g))) AS score
      FROM tf JOIN idf i USING (w) JOIN dl USING (doc_id)
      GROUP BY tf.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(score AS BIGINT) AS score
FROM s ORDER BY score DESC, doc_id LIMIT {BM25_K}
"""


AA_SCALE = 1_000_000


def q_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction over the citation graph: for each
    co-cited pair {a<b}, Σ over common citing pages z of
    ⌊SCALE / bitlen(outdeg(z))⌋ — the integer-log2 surrogate for
    1/log deg (bitlen via frexp, no float log; the same surrogate the
    lm_surprisal oracle uses as LENGTH(bin(x))). The citing page's
    out-degree is its src-group size, so the weight rides the existing
    per-src pair emission — no extra degree join or shuffle beyond
    related_pages' plan."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)

    def dedup_batch(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": pc.cast(batch["src_page"], pa.int64()),
                      "dst": pc.cast(batch["dst_page"], pa.int64())})
        return t.group_by(["src", "dst"]).aggregate([])

    de = edges.map_batches(dedup_batch, batch_format="pyarrow",
                           batch_size=65536)

    def per_src(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["src", "dst"])
        b = b.sort_values(["src", "dst"], kind="stable")
        src = b["src"].to_numpy(np.int64)
        dst = b["dst"].to_numpy(np.int64)
        od = b.groupby("src", sort=False)["dst"].transform("size") \
            .to_numpy(np.int64)
        # bit length via frexp: exact for any int64 magnitude
        _, exp = np.frexp(od.astype(np.float64))
        w = AA_SCALE // exp.astype(np.int64)
        outs = []
        d = 1
        while True:
            msk = src[d:] == src[:-d]
            if not msk.any():
                break
            outs.append((dst[:-d][msk], dst[d:][msk], w[:-d][msk]))
            d += 1
        if not outs:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "aa": np.empty(0, np.int64)})
        df = pd.DataFrame({"a": np.concatenate([o[0] for o in outs]),
                           "b": np.concatenate([o[1] for o in outs]),
                           "aa": np.concatenate([o[2] for o in outs])})
        return (df.groupby(["a", "b"], sort=False)["aa"].sum()
                .reset_index())

    parts = bucketed_group_apply(de, ["src"], per_src)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["a", "b"], sort=False)["aa"].sum()
             .reset_index(name="aa_score"))
        g["aa_score"] = g["aa_score"].astype(np.int64)
        return g

    return bucketed_group_apply(parts, ["a", "b"], combine)


SQL_ADAMIC_ADAR = f"""
WITH de AS MATERIALIZED (SELECT DISTINCT src, dst
                         FROM ({_SQL_PAGE_EDGES})),
od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM de GROUP BY src)
SELECT x.dst AS a, y.dst AS b,
       CAST(SUM({AA_SCALE} // LENGTH(bin(od.d))) AS BIGINT) AS aa_score
FROM de x JOIN de y ON x.src = y.src AND x.dst < y.dst
JOIN od ON od.src = x.src
GROUP BY x.dst, y.dst
"""


ZORDER_BITS, ZORDER_SHARD = 19, 4096


def q_zorder_shards(sf_dir: str):
    """Z-order (Morton) locality sharding — the space-filling-curve
    repartitioner that keeps spatially-near features in the same
    output shard (the scale story for re-using ONE partitioning across
    chained spatial stages): interleave the 19-bit lattice unit
    coordinates, exact global rank by (morton, pk) via the two-pass
    range ranking, fixed-size shard = rank // {ZORDER_SHARD}. All
    integer — the oracle replays the interleave as 38 mask-shift terms
    and the rank as ROW_NUMBER."""
    pts = points_lineitem(sf_dir)

    def morton(b: pa.Table) -> pa.Table:
        ix = b["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = b["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.zeros(len(ix), np.int64)
        for bit in range(ZORDER_BITS):
            m |= ((ix >> bit) & 1) << (2 * bit)
            m |= ((iy >> bit) & 1) << (2 * bit + 1)
        return pa.table({"pk": b["pk"], "morton": pa.array(m)})

    ranked = rel.add_global_rank(
        pts.map_batches(morton, batch_format="pyarrow", batch_size=65536),
        ["morton", "pk"], out_col="rank")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pk": b["pk"].astype(np.int64),
            "morton": b["morton"].astype(np.int64),
            "shard": ((b["rank"].astype(np.int64) - 1)
                      // ZORDER_SHARD).astype(np.int64)})

    return ranked.map_batches(finish, batch_format="pandas")


def _sql_zorder_shards() -> str:
    terms = " + ".join(
        f"((ix // {1 << b}) % 2) * {1 << (2 * b)}"
        f" + ((iy // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(ZORDER_BITS))
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
m AS (SELECT pk, CAST({terms} AS BIGINT) AS morton FROM pts)
SELECT pk, morton,
       CAST((ROW_NUMBER() OVER (ORDER BY morton, pk) - 1)
            // {ZORDER_SHARD} AS BIGINT) AS shard
FROM m
"""


def q_mad_events(sf_dir: str):
    """Median absolute deviation per group (robust dispersion — the
    outlier-tolerant cousin of stdev): pass 1 reduces the exact
    discrete per-group median (group-bounded table to the driver, the
    idf pattern); pass 2 re-streams deviations |v − med| through the
    same holistic quantile. Both medians use the ceil(q·n)−1 discrete
    convention, bit-equal to DuckDB quantile_disc."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "cents": pa.array(c)})

    # two passes over a CORPUS-sized (if narrow) table: re-execute the
    # cheap cents lineage per pass rather than materializing it — at
    # 10^12 rows a pinned intermediate spills, a re-read doesn't
    dsc = ds.map_batches(cents, batch_format="pyarrow",
                         batch_size=65536)
    med = rel.groupby_aggregate(
        dsc, "event_type", [("med", "cents", "quantile:0.5")]).to_pandas()
    mdict = dict(zip(med["event_type"], med["med"].astype(np.int64)))

    def dev(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pandas()
        m = et.map(mdict).to_numpy(np.int64)
        c = batch["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "med_cents": pa.array(m),
                         "adev": pa.array(np.abs(c - m))})

    devs = dsc.map_batches(dev, batch_format="pyarrow", batch_size=65536)
    out = rel.groupby_aggregate(devs, "event_type",
                                [("med_cents", "med_cents", "first"),
                                 ("mad_cents", "adev", "quantile:0.5")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["med_cents"] = b["med_cents"].astype(np.int64)
        b["mad_cents"] = b["mad_cents"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_MAD_EVENTS = """
WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type, quantile_disc(c, 0.5) AS med FROM v
      GROUP BY event_type)
SELECT v.event_type, CAST(ANY_VALUE(m.med) AS BIGINT) AS med_cents,
       CAST(quantile_disc(abs(v.c - m.med), 0.5) AS BIGINT) AS mad_cents
FROM v JOIN m USING (event_type) GROUP BY v.event_type
"""


def q_typo_pairs(sf_dir: str):
    """Edit-distance-<=1 URL self-join (typo-squat / near-URL
    detection): SymSpell deletion-key candidates (complete for
    lev<=1 by the deletion-neighborhood argument, text.edit1_keys) +
    the exact vectorized verify — no all-pairs stage anywhere; work is
    bounded by Σ per-key-bucket sizes. The oracle IS the all-pairs
    levenshtein join, so candidate completeness is hash-checked, not
    assumed."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, columns=["url"])
    out = text.edit1_pairs(ds, "url")
    return rel.driver_safe(out.map_batches(
        lambda b: pa.table({"url_a": b["a"], "url_b": b["b"]}),
        batch_format="pyarrow", batch_size=65536),
        pa.schema([("url_a", pa.string()), ("url_b", pa.string())]))


SQL_TYPO_PAIRS = """
WITH u AS (SELECT DISTINCT 'https://site' || CAST(doc_id % 50 AS VARCHAR)
                  || '.example/' || CAST(doc_id AS VARCHAR) AS url
           FROM documents)
SELECT a.url AS url_a, b.url AS url_b
FROM u a JOIN u b ON a.url < b.url
WHERE abs(length(a.url) - length(b.url)) <= 1
  AND levenshtein(a.url, b.url) <= 1
"""


def q_delta_encode(sf_dir: str):
    """Per-user event-time delta encoding (the LAG window op /
    inter-arrival-time feature): one user-keyed co-location, in-bucket
    lexsort + shift. Each user's FIRST event has no predecessor and is
    dropped (null-free output keeps the driver's value-hash stable;
    the oracle filters LAG IS NOT NULL identically)."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("event_id", "user_id", "ts"))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        delta = np.empty(len(g), np.int64)
        delta[0] = 0
        delta[1:] = ts[1:] - ts[:-1]
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[~first],
            "user_id": u[~first],
            "delta_us": delta[~first]})

    return bucketed_group_apply(ds, ["user_id"], per_bucket)


SQL_DELTA_ENCODE = """
SELECT event_id, user_id, delta_us FROM (
  SELECT event_id, user_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
  FROM events)
WHERE delta_us IS NOT NULL
"""


def q_percentile_rank(sf_dir: str):
    """Exact per-group percentile rank in ppm: (RANK−1)·10⁶ //
    max(n−1, 1), RANK = count of strictly-smaller + 1 (tie-sharing).
    Groups co-locate in one bucketed shuffle; within a group the rank
    is one sort + one one-sided searchsorted — no per-row Python. At
    group cardinalities beyond a worker's heap this becomes the
    two-pass range ranking (rel.add_global_rank) per group."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_id": pc.cast(batch["event_id"], pa.int64()),
                         "event_type": batch["event_type"],
                         "c": pa.array(c)})

    dsc = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in b.groupby("event_type", sort=False):
            c = g["c"].to_numpy(np.int64)
            sc = np.sort(c)
            rank = np.searchsorted(sc, c, side="left").astype(np.int64) + 1
            den = max(len(c) - 1, 1)
            outs.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(np.int64),
                "event_type": et,
                "pr_ppm": (rank - 1) * 1_000_000 // den}))
        if not outs:
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "event_type": np.empty(0, object),
                                 "pr_ppm": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(dsc, ["event_type"], per_bucket)


SQL_PERCENTILE_RANK = """
WITH v AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events)
SELECT event_id, event_type,
       CAST((RANK() OVER (PARTITION BY event_type ORDER BY c) - 1)
            * 1000000
            // GREATEST(COUNT(*) OVER (PARTITION BY event_type) - 1, 1)
            AS BIGINT) AS pr_ppm
FROM v
"""


_IVL_TILE_US = 86_400_000_000          # 1-day tiles
_IVL_ORDER_SPAN = 3 * 86_400_000_000   # order window: 3 days
_IVL_EVENT_SPAN = 3_600_000_000        # event window: 1 hour
# orders live in 1995-2001 but events in 2024 — fold each order date
# onto the events' month by integer arithmetic (exact in both engines)
_IVL_EPOCH_2024 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs


def q_interval_overlap(sf_dir: str):
    """Interval-×-interval overlap join (both sides are RANGES — the
    1-D analogue of the polygon×polygon spatial join, and the same
    plan: cover explosion + canonical-cell exactly-once emission):
    each interval replicates to the day tiles it covers, pairs meet
    per (user, tile) in ONE bucketed shuffle, overlap is verified
    exactly, and a pair is emitted only in the tile containing
    max(starts) — the overlap's first instant — so no dedup pass is
    needed. Reports the exact overlap duration in µs."""
    from pythongis_ray.relational import bucketed_group_apply

    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
    od = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_orderdate"])

    def cover(ids, users, starts, spans, side):
        ends = starts + spans
        t0 = starts // _IVL_TILE_US
        t1 = (ends - 1) // _IVL_TILE_US
        reps = (t1 - t0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        k = np.arange(int(reps.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        return pd.DataFrame({
            "user": users[idx], "tile": t0[idx] + k,
            "side": np.full(len(idx), side, np.int64),
            "id": ids[idx], "s": starts[idx], "e": ends[idx]})

    def ev_cover(b: pa.Table) -> pd.DataFrame:
        ts = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return cover(b["event_id"].to_numpy(zero_copy_only=False)
                     .astype(np.int64),
                     b["user_id"].to_numpy(zero_copy_only=False)
                     .astype(np.int64),
                     ts, _IVL_EVENT_SPAN, 0)

    def od_cover(b: pa.Table) -> pd.DataFrame:
        ts = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ts = _IVL_EPOCH_2024 + ts % (30 * _IVL_TILE_US)
        return cover(b["o_orderkey"].to_numpy(zero_copy_only=False)
                     .astype(np.int64),
                     b["o_custkey"].to_numpy(zero_copy_only=False)
                     .astype(np.int64),
                     ts, _IVL_ORDER_SPAN, 1)

    both = ev.map_batches(ev_cover, batch_format="pyarrow",
                          batch_size=65536).union(
        od.map_batches(od_cover, batch_format="pyarrow",
                       batch_size=65536))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        a = b[b["side"] == 0]
        o = b[b["side"] == 1]
        m = a.merge(o, on=["user", "tile"], suffixes=("_a", "_b"))
        if not len(m):
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "o_orderkey": np.empty(0, np.int64),
                                 "overlap_us": np.empty(0, np.int64)})
        sa = m["s_a"].to_numpy(np.int64)
        ea = m["e_a"].to_numpy(np.int64)
        sb = m["s_b"].to_numpy(np.int64)
        eb = m["e_b"].to_numpy(np.int64)
        lo = np.maximum(sa, sb)
        hi = np.minimum(ea, eb)
        keep = (lo < hi) & (lo // _IVL_TILE_US
                            == m["tile"].to_numpy(np.int64))
        return pd.DataFrame({
            "event_id": m["id_a"].to_numpy(np.int64)[keep],
            "o_orderkey": m["id_b"].to_numpy(np.int64)[keep],
            "overlap_us": (hi - lo)[keep]})

    return bucketed_group_apply(both, ["user", "tile"], per_bucket)


SQL_INTERVAL_OVERLAP = f"""
WITH o2 AS (SELECT o_orderkey, o_custkey,
                   {_IVL_EPOCH_2024} + epoch_us(o_orderdate)
                     % {30 * _IVL_TILE_US} AS os
            FROM orders)
SELECT e.event_id, o.o_orderkey,
       least(epoch_us(e.ts) + {_IVL_EVENT_SPAN},
             o.os + {_IVL_ORDER_SPAN})
       - greatest(epoch_us(e.ts), o.os) AS overlap_us
FROM events e JOIN o2 o ON e.user_id = o.o_custkey
WHERE epoch_us(e.ts) < o.os + {_IVL_ORDER_SPAN}
  AND o.os < epoch_us(e.ts) + {_IVL_EVENT_SPAN}
"""


def q_twap(sf_dir: str):
    """Per-user time-weighted average value (the TWAP shape): each
    event's cents weight is its holding time until the user's next
    event; ships as the exact integer pair (Σ cents·Δus, Σ Δus) —
    ratio-of-sums, no float. One user-keyed co-location; users with a
    single event carry (0, 0)."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                         "ts_us": pa.array(us), "cents": pa.array(c)})

    dsp = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        c = g["cents"].to_numpy(np.int64)
        same = np.empty(len(g), bool)
        same[:-1] = u[1:] == u[:-1]
        same[-1] = False
        dt = np.zeros(len(g), np.int64)
        dt[:-1] = ts[1:] - ts[:-1]
        dt[~same] = 0
        df = pd.DataFrame({"user_id": u, "twap_num": c * dt,
                           "twap_den": dt})
        out = df.groupby("user_id", sort=False).sum().reset_index()
        out["twap_num"] = out["twap_num"].astype(np.int64)
        out["twap_den"] = out["twap_den"].astype(np.int64)
        return out

    return bucketed_group_apply(dsp, ["user_id"], per_bucket)


SQL_TWAP = """
WITH t AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
                  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts) - epoch_us(ts)
                    AS dt
           FROM events)
SELECT user_id,
       CAST(COALESCE(SUM(c * dt), 0) AS BIGINT) AS twap_num,
       CAST(COALESCE(SUM(dt), 0) AS BIGINT) AS twap_den
FROM t GROUP BY user_id
"""


KMV_HOST_K = 16


def q_host_overlap(sf_dir: str):
    """Pairwise host-vocabulary overlap from mergeable KMV sketches
    (audience-overlap / shared-vocabulary estimation WITHOUT moving
    corpora): per-host k-minima sketch rows (text.kmv_sketch_by,
    O(hosts×k) through the one shuffle), then every host pair's
    Jaccard estimate = |both ∩ union-k-minima| / |union-k-minima| as
    exact integer ppm. The pair stage touches only the tiny sketch
    table; SQL replays the sketches with the same hash chain as
    kmv_by_host and the pair algebra relationally."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def add_host(b: pa.Table) -> pa.Table:
        h = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 50
        return pa.table({"host": pa.array(h), "text": b["text"]})

    dsh = ds.map_batches(add_host, batch_format="pyarrow", batch_size=8192)
    sk = text.kmv_sketch_by(dsh, "host", k=KMV_HOST_K)

    def pair_stage(g: pd.DataFrame) -> pd.DataFrame:
        sketches = {int(h): np.sort(grp["h"].to_numpy(np.int64)
                                    .view(np.uint64))
                    for h, grp in g.groupby("host", sort=False)}
        hosts = sorted(sketches)
        rows = []
        for i, ha in enumerate(hosts):
            for hb in hosts[i + 1:]:
                sa, sb = sketches[ha], sketches[hb]
                uni = np.union1d(sa, sb)
                r = min(KMV_HOST_K, len(uni))
                merged = uni[:r]
                common = np.intersect1d(sa, sb)
                c = int(np.isin(merged, common).sum())
                rows.append((ha, hb, c, r, c * 1_000_000 // r))
        return pd.DataFrame(rows, columns=["host_a", "host_b",
                                           "n_common", "r", "jac_ppm"])

    tagged = sk.map_batches(lambda b: b.assign(_one=np.int64(0)),
                            batch_format="pandas")
    return tagged.groupby("_one").map_groups(
        lambda g: pair_stage(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_HOST_OVERLAP = f"""
WITH w AS (SELECT doc_id % 50 AS host,
                  UNNEST(string_split(text, ' ')) AS word
           FROM documents),
h0 AS (SELECT DISTINCT host,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
        [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
        (acc, x) -> (acc * 1099511628211 + x)
                    % CAST('18446744073709551616' AS HUGEINT)) AS th0
      FROM w),
h AS (SELECT host, ((((th0 // 4294967296)
                * CAST('11400714819323198485' AS HUGEINT)) % 4294967296)
               * 4294967296
              + (th0 % 4294967296)
                * CAST('11400714819323198485' AS HUGEINT))
             % CAST('18446744073709551616' AS HUGEINT) AS th FROM h0),
hd AS (SELECT DISTINCT host, th FROM h),
ord AS (SELECT host, th,
               ROW_NUMBER() OVER (PARTITION BY host ORDER BY th) AS rn
        FROM hd),
sk AS (SELECT host, th FROM ord WHERE rn <= {KMV_HOST_K}),
hosts AS (SELECT DISTINCT host FROM sk),
pairs AS (SELECT a.host AS ha, b.host AS hb
          FROM hosts a JOIN hosts b ON a.host < b.host),
bo AS (SELECT p.ha, p.hb, s.th FROM pairs p JOIN sk s ON s.host = p.ha
       UNION
       SELECT p.ha, p.hb, s.th FROM pairs p JOIN sk s ON s.host = p.hb),
uni AS (SELECT ha, hb, th,
               ROW_NUMBER() OVER (PARTITION BY ha, hb ORDER BY th) AS rn
        FROM bo),
m AS (SELECT ha, hb, th FROM uni WHERE rn <= {KMV_HOST_K}),
rr AS (SELECT ha, hb, COUNT(*) AS r FROM m GROUP BY ha, hb),
cc AS (SELECT m.ha, m.hb, COUNT(*) AS n_common
       FROM m JOIN sk sa ON sa.host = m.ha AND sa.th = m.th
              JOIN sk sb ON sb.host = m.hb AND sb.th = m.th
       GROUP BY m.ha, m.hb)
SELECT CAST(rr.ha AS BIGINT) AS host_a, CAST(rr.hb AS BIGINT) AS host_b,
       CAST(COALESCE(cc.n_common, 0) AS BIGINT) AS n_common,
       CAST(rr.r AS BIGINT) AS r,
       CAST(COALESCE(cc.n_common, 0) * 1000000 // rr.r AS BIGINT)
         AS jac_ppm
FROM rr LEFT JOIN cc ON cc.ha = rr.ha AND cc.hb = rr.hb
"""


# D8 neighbor order (direction index is the deterministic tie-break:
# E, W, N(y+1), S(y-1), then the four diagonals)
_D8 = ((1, 0), (-1, 0), (0, 1), (0, -1),
       (1, 1), (1, -1), (-1, 1), (-1, -1))
FLOW_ROUNDS = 4


def q_flow_acc(sf_dir: str):
    """D8 flow accumulation over the terrain grid (realizes the
    hydrology op downstream of the reference's empty `slope` stub,
    /root/reference/pythongis/raster/analyzer.py:655): each cell
    drains to its strictly-lowest D8 neighbor (elevation = point
    density; ties broken by the fixed direction order), and
    acc_R(v) = cells within R={FLOW_ROUNDS} steps upstream of v,
    incl. itself — the bounded-rounds contract every iterative oracle
    here uses (pagerank/BFS). The corpus-sized work (density grid) is
    one streamed pass + one cell-bucketed stencil combine; the flow
    graph and the R accumulation rounds act on the CELL-BOUNDED table
    (≤ #cells rows, set by resolution, not corpus), so the final
    single-group pass is bounded exactly like the kmv driver merge.
    SQL replays flow choice (ROW_NUMBER over (elev, dir)) and each
    round as a chained LEFT-JOIN CTE."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    # tag d in 0..7: "my neighbor at +_D8[d] has value v"; tag 8: own
    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        txs, tys, tags = [cx], [cy], [np.full(len(b), 8, np.int64)]
        for d, (dx, dy) in enumerate(_D8):
            txs.append(cx - dx)
            tys.append(cy - dy)
            tags.append(np.full(len(b), d, np.int64))
        return pd.DataFrame({"cx": np.concatenate(txs),
                             "cy": np.concatenate(tys),
                             "tag": np.concatenate(tags),
                             "v": np.tile(v, 9)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(9))
        p = p[p[8].notna()]          # real cells only
        own = p[8].to_numpy(np.int64)
        big = np.int64(1) << 62
        keys = np.full((len(p), 8), big, np.int64)
        for d in range(8):
            bn = p[d].to_numpy(np.float64)
            has = ~np.isnan(bn)
            lower = has & (bn < own)
            keys[lower, d] = bn[lower].astype(np.int64) * 8 + d
        best = keys.min(axis=1)
        has_flow = best < big
        d_star = keys.argmin(axis=1)
        cx = p.index.get_level_values(0).to_numpy(np.int64)
        cy = p.index.get_level_values(1).to_numpy(np.int64)
        dx = np.array([d[0] for d in _D8], np.int64)[d_star]
        dy = np.array([d[1] for d in _D8], np.int64)[d_star]
        return pd.DataFrame({
            "cx": cx, "cy": cy, "has_flow": has_flow,
            "tx": np.where(has_flow, cx + dx, cx),
            "ty": np.where(has_flow, cy + dy, cy)})

    cells = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)

    def rounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cx", "cy"], kind="stable") \
            .reset_index(drop=True)
        key = g["cx"].to_numpy(np.int64) * (np.int64(1) << 32) \
            + g["cy"].to_numpy(np.int64)
        tkey = g["tx"].to_numpy(np.int64) * (np.int64(1) << 32) \
            + g["ty"].to_numpy(np.int64)
        tidx = np.searchsorted(key, tkey)
        hf = g["has_flow"].to_numpy(bool)
        a = np.ones(len(g), np.int64)
        for _ in range(FLOW_ROUNDS):
            new = np.ones(len(g), np.int64)
            np.add.at(new, tidx[hf], a[hf])
            a = new
        return pd.DataFrame({"cx": g["cx"].to_numpy(np.int64),
                             "cy": g["cy"].to_numpy(np.int64),
                             "acc": a})

    one = cells.map_batches(lambda b: b.assign(_one=np.int64(0)),
                            batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: rounds(g.drop(columns=["_one"])),
        batch_format="pandas")


def _sql_flow_acc() -> str:
    dirs = ", ".join(f"({d}, {dx}, {dy})"
                     for d, (dx, dy) in enumerate(_D8))
    rounds = []
    prev = "a0"
    for r in range(1, FLOW_ROUNDS + 1):
        rounds.append(f"""
a{r} AS MATERIALIZED (
  SELECT c.cx, c.cy, 1 + COALESCE(SUM(p.a), 0) AS a
  FROM cells c LEFT JOIN
    (SELECT f.tx, f.ty, {prev}.a FROM {prev}
     JOIN flow f ON f.cx = {prev}.cx AND f.cy = {prev}.cy) p
    ON p.tx = c.cx AND p.ty = c.cy
  GROUP BY c.cx, c.cy)""")
        prev = f"a{r}"
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
cells AS MATERIALIZED (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
cand AS (SELECT a.cx, a.cy, b.n AS bn, d.d AS d,
                a.cx + d.dx AS tx, a.cy + d.dy AS ty
         FROM cells a
         CROSS JOIN (VALUES {dirs}) d(d, dx, dy)
         JOIN cells b ON b.cx = a.cx + d.dx AND b.cy = a.cy + d.dy
         WHERE b.n < a.n),
flow AS MATERIALIZED (SELECT cx, cy, tx, ty FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY cx, cy
                                      ORDER BY bn, d) AS rn
         FROM cand) WHERE rn = 1),
a0 AS MATERIALIZED (SELECT cx, cy, CAST(1 AS BIGINT) AS a FROM cells),
{",".join(rounds)[1:]}
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(a AS BIGINT) AS acc FROM a{FLOW_ROUNDS}
"""


HIST_BIN_CENTS = 5000


def q_histogram(sf_dir: str):
    """Per-group equal-width histogram (reference summarystats
    histogram shape, raster/data.py:689 / vector describe): fixed
    origin-0 width-{HIST_BIN_CENTS} cents bins, counts folded
    per-batch so the shuffle moves one row per (batch, group, bin)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "bin": c // HIST_BIN_CENTS})
        g = (df.groupby(["event_type", "bin"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["event_type", "bin"], sort=False)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    return rel.bucketed_group_apply(parts, ["event_type", "bin"], combine)


SQL_HISTOGRAM = f"""
SELECT event_type,
       CAST(round(value * 100) AS BIGINT) // {HIST_BIN_CENTS} AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q_describe_stats(sf_dir: str):
    """summarystats / describe with EXACT dispersion (reference
    vector describe + Band.summarystats): per group n, min, max, sum
    and the sample variance as the exact integer pair
    (n·Σx² − (Σx)², n·(n−1)) — no float accumulation anywhere, so the
    oracle hash-matches; var = num/den is one division away."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"flag": b["l_returnflag"].to_pandas(),
                           "n": np.ones(len(x), np.int64),
                           "sx": x, "sxx": x * x, "mn": x, "mx": x})
        return (df.groupby("flag", sort=False)
                .agg(n=("n", "sum"), sx=("sx", "sum"),
                     sxx=("sxx", "sum"), mn=("mn", "min"),
                     mx=("mx", "max")).reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("flag", sort=False)
             .agg(n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"),
                  mn=("mn", "min"), mx=("mx", "max")).reset_index())
        out = pd.DataFrame({
            "flag": g["flag"],
            "n": g["n"].astype(np.int64),
            "min_qty": g["mn"].astype(np.int64),
            "max_qty": g["mx"].astype(np.int64),
            "sum_qty": g["sx"].astype(np.int64),
            "var_num": (g["n"] * g["sxx"] - g["sx"] * g["sx"])
            .astype(np.int64),
            "var_den": (g["n"] * (g["n"] - 1)).astype(np.int64)})
        return out

    return rel.bucketed_group_apply(parts, ["flag"], combine)


SQL_DESCRIBE_STATS = """
WITH x AS (SELECT l_returnflag AS flag,
                  CAST(l_quantity AS BIGINT) AS v FROM lineitem)
SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v) AS BIGINT) AS min_qty,
       CAST(MAX(v) AS BIGINT) AS max_qty,
       CAST(SUM(v) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) * SUM(v * v) - SUM(v) * SUM(v) AS BIGINT)
         AS var_num,
       CAST(COUNT(*) * (COUNT(*) - 1) AS BIGINT) AS var_den
FROM x GROUP BY flag
"""


def q_mosaic(sf_dir: str):
    """Mosaic paste with the 'last' priority rule (reference mosaic,
    /root/reference/pythongis/raster/manager.py:23-63): two per-cell
    density layers — lineitem points under, customer points over —
    resolved per cell by the raster.mosaic machinery (union-all +
    per-cell pick; a cell-bounded groupby, never the inputs). Oracle
    = FULL OUTER JOIN with priority COALESCE."""
    from pythongis_ray import raster

    def layer(pts):
        def cellify(batch: pa.Table) -> pa.Table:
            ix = batch["ix"].to_numpy(zero_copy_only=False)
            iy = batch["iy"].to_numpy(zero_copy_only=False)
            return pa.table({"cx": pa.array(ix // 1024),
                             "cy": pa.array(iy // 1024)})

        cells = pts.map_batches(cellify, batch_format="pyarrow",
                                batch_size=65536)
        g = rel.groupby_aggregate(cells, ["cx", "cy"],
                                  [("n", "cx", "count")])

        def key(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["cell_id"] = b["cx"].astype(np.int64) * (1 << 32) \
                + b["cy"].astype(np.int64)
            b["band"] = np.int64(0)
            b["n"] = b["n"].astype(np.int64)
            return b

        return g.map_batches(key, batch_format="pandas")

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def add_units(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        ix = np.rint((lon + 180.0) * 1024).astype(np.int64)
        iy = np.rint((lat + 90.0) * 1024).astype(np.int64)
        return pa.table({"ix": pa.array(ix), "iy": pa.array(iy)})

    under = layer(points_lineitem(sf_dir))
    over = layer(cpts.map_batches(add_units, batch_format="pyarrow",
                                  batch_size=65536))
    out = raster.mosaic([under, over], rule="last")
    return out.map_batches(
        lambda b: pa.table({"cx": pc.cast(b["cx"], pa.int64()),
                            "cy": pc.cast(b["cy"], pa.int64()),
                            "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_mosaic() -> str:
    return f"""
WITH la AS (SELECT ix // 1024 AS cx, iy // 1024 AS cy,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ({SQL_PTS_LINEITEM()}) GROUP BY 1, 2),
lb AS (SELECT ix // 1024 AS cx, iy // 1024 AS cy,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")})
       GROUP BY 1, 2)
SELECT COALESCE(b.cx, a.cx) AS cx, COALESCE(b.cy, a.cy) AS cy,
       COALESCE(b.n, a.n) AS n
FROM la a FULL OUTER JOIN lb b ON a.cx = b.cx AND a.cy = b.cy
"""


def q_concat_events(sf_dir: str):
    """Ordered per-group string aggregation (reference fieldmapping
    'concat', vector/sql.py stat vocabulary): each user's event types
    concatenated in (ts, event_id) order — the order-dependent holistic
    the reference supports and Ray Data lacks natively. One user-keyed
    co-location; in-bucket lexsort + one join per group run."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("event_id", "user_id", "ts",
                                  "event_type"))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable")
        out = (g.groupby("user_id", sort=False)["event_type"]
               .agg(",".join).rename("seq").reset_index())
        out["user_id"] = out["user_id"].astype(np.int64)
        return out

    return bucketed_group_apply(ds, ["user_id"], per_bucket)


SQL_CONCAT_EVENTS = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
FROM events GROUP BY user_id
"""


def q_anti_join(sf_dir: str):
    """Keyed anti-join (reference spatial 'disjoint' relational
    analogue / NOT EXISTS): customers with NO events. Right side
    pre-deduped per batch so only distinct keys move; one bucketed
    co-location emits left keys with no right rows."""
    from pythongis_ray.relational import bucketed_group_apply

    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def left(b: pa.Table) -> pa.Table:
        k = pc.cast(b["c_custkey"], pa.int64())
        return pa.table({"key": k,
                         "side": pa.array(np.zeros(len(b), np.int64))})

    def right(b: pa.Table) -> pa.Table:
        t = pa.table({"key": pc.cast(b["user_id"], pa.int64())})
        t = t.group_by(["key"]).aggregate([])
        return t.append_column(
            "side", pa.array(np.ones(len(t), np.int64)))

    u = cust.map_batches(left, batch_format="pyarrow",
                         batch_size=65536).union(
        ev.map_batches(right, batch_format="pyarrow", batch_size=65536))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        has_right = set(b.loc[b["side"] == 1, "key"])
        lk = b.loc[b["side"] == 0, "key"]
        keep = lk[~lk.isin(has_right)]
        return pd.DataFrame({"c_custkey": keep.to_numpy(np.int64)})

    return bucketed_group_apply(u, ["key"], per_bucket)


SQL_ANTI_JOIN = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
"""


def q_upsert_merge(sf_dir: str):
    """CDC upsert / MERGE INTO: a base snapshot (even-id docs) absorbs
    a change stream (odd-id docs mapped onto even keys; op = delete
    when n_chars % 7 == 0, else upsert; seq = doc_id orders changes
    per key). One key-bucketed co-location resolves each key to its
    final state — base rows only move once, the winner per key is a
    vectorized keyed drop-last after lexsort. Oracle replays with
    ROW_NUMBER OVER (key ORDER BY seq DESC)."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])

    def split(b: pa.Table) -> pd.DataFrame:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        even = did % 2 == 0
        base = pd.DataFrame({"key": did[even], "val": nch[even],
                             "seq": np.full(int(even.sum()), -1,
                                            np.int64),
                             "op": np.zeros(int(even.sum()), np.int64)})
        odd = ~even
        ch = pd.DataFrame({"key": did[odd] - 1, "val": nch[odd] * 1000,
                           "seq": did[odd],
                           "op": np.where(nch[odd] % 7 == 0, 2, 1)
                           .astype(np.int64)})
        return pd.concat([base, ch], ignore_index=True)

    u = ds.map_batches(split, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["key", "seq"], kind="stable")
        last = g.drop_duplicates(subset=["key"], keep="last")
        live = last[last["op"] != 2]
        return pd.DataFrame({"key": live["key"].to_numpy(np.int64),
                             "val": live["val"].to_numpy(np.int64)})

    return bucketed_group_apply(u, ["key"], per_bucket)


SQL_UPSERT_MERGE = """
WITH base AS (SELECT doc_id AS key, CAST(n_chars AS BIGINT) AS val,
                     CAST(-1 AS BIGINT) AS seq, 0 AS op
              FROM documents WHERE doc_id % 2 = 0),
ch AS (SELECT doc_id - 1 AS key, CAST(n_chars * 1000 AS BIGINT) AS val,
              CAST(doc_id AS BIGINT) AS seq,
              CASE WHEN n_chars % 7 = 0 THEN 2 ELSE 1 END AS op
       FROM documents WHERE doc_id % 2 = 1),
u AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                   ORDER BY seq DESC) AS rn FROM u)
SELECT key, val FROM w WHERE rn = 1 AND op != 2
"""


BASKET_K = 20


def q_basket_pairs(sf_dir: str):
    """Market-basket pair mining (frequent itemset pairs): co-purchase
    counts of part pairs within an order, top-{BASKET_K}. Pair
    emission is bounded by basket size² inside the order-keyed bucket
    (baskets are ≤7 lineitems); the (a,b) combine and a distributed
    sort-limit finish. Same plan family as cocitation — the retail
    shape of it."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def dedup_batch(b: pa.Table) -> pa.Table:
        t = pa.table({"ok": pc.cast(b["l_orderkey"], pa.int64()),
                      "pk": pc.cast(b["l_partkey"], pa.int64())})
        return t.group_by(["ok", "pk"]).aggregate([])

    de = ds.map_batches(dedup_batch, batch_format="pyarrow",
                        batch_size=65536)

    def per_order(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["ok", "pk"])
        b = b.sort_values(["ok", "pk"], kind="stable")
        ok = b["ok"].to_numpy(np.int64)
        pk = b["pk"].to_numpy(np.int64)
        outs = []
        d = 1
        while True:
            msk = ok[d:] == ok[:-d]
            if not msk.any():
                break
            outs.append((pk[:-d][msk], pk[d:][msk]))
            d += 1
        if not outs:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64)})
        df = pd.DataFrame({"a": np.concatenate([o[0] for o in outs]),
                           "b": np.concatenate([o[1] for o in outs])})
        g = df.groupby(["a", "b"], sort=False).size().rename("n") \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = bucketed_group_apply(de, ["ok"], per_order)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["a", "b"], sort=False)["n"].sum().reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    pairs = bucketed_group_apply(parts, ["a", "b"], combine)
    return pairs.sort([("n"), ("a"), ("b")],
                      descending=[True, False, False]).limit(BASKET_K)


SQL_BASKET_PAIRS = f"""
WITH de AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem)
SELECT x.pk AS a, y.pk AS b, CAST(COUNT(*) AS BIGINT) AS n
FROM de x JOIN de y ON x.ok = y.ok AND x.pk < y.pk
GROUP BY x.pk, y.pk
ORDER BY n DESC, a, b LIMIT {BASKET_K}
"""


def q_areal_interp(sf_dir: str):
    """Dasymetric areal interpolation (the reference's mass-preserving
    `disperse`, raster/manager.py, as a distributed pipeline): each
    zone's value redistributes to its 1° cells proportional to point
    density — alloc = value·n_cell // n_zone, exact floor division.
    Corpus-sized work is the existing broadcast PIP join + one
    (zone, cell) combine; zone totals derive from the tiny cell table
    (the rollup pattern), and the allocation re-attaches them via a
    broadcast dict (zone-bounded)."""
    pts = points_lineitem(sf_dir)
    zones = pipelines.load_zones(sf_dir)
    joined = spatial.spatial_join(pts, zones[["zone_id", "geometry"]],
                                  predicate="within")

    def cellify(b: pa.Table) -> pa.Table:
        ix = b["ix"].to_numpy(zero_copy_only=False)
        iy = b["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"zone_id": pc.cast(b["zone_id"], pa.int64()),
                         "cx": pa.array(ix // 1024),
                         "cy": pa.array(iy // 1024)})

    cells = joined.map_batches(cellify, batch_format="pyarrow",
                               batch_size=65536)
    cc = rel.groupby_aggregate(cells, ["zone_id", "cx", "cy"],
                               [("n", "zone_id", "count")]).materialize()
    zt = cc.groupby("zone_id").sum("n").to_pandas()
    tot = dict(zip(zt["zone_id"].astype(np.int64),
                   zt["sum(n)"].astype(np.int64)))

    def alloc(b: pd.DataFrame) -> pd.DataFrame:
        z = b["zone_id"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        t = pd.Series(z).map(tot).to_numpy(np.int64)
        return pd.DataFrame({
            "zone_id": z, "cx": b["cx"].to_numpy(np.int64),
            "cy": b["cy"].to_numpy(np.int64), "n": n,
            "alloc": (z + 1) * 1_000_000 * n // t})

    return cc.map_batches(alloc, batch_format="pandas")


def SQL_AREAL_INTERP():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}), z AS ({fixtures.SQL_ZONES_FROM_NATION}),
j AS (SELECT ix, iy, zone_id FROM pts JOIN z
      ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1),
cc AS (SELECT zone_id, ix // 1024 AS cx, iy // 1024 AS cy,
              CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY 1, 2, 3),
zt AS (SELECT zone_id, SUM(n) AS t FROM cc GROUP BY 1)
SELECT cc.zone_id, cc.cx, cc.cy, cc.n,
       CAST((cc.zone_id + 1) * 1000000 * cc.n // zt.t AS BIGINT)
         AS alloc
FROM cc JOIN zt USING (zone_id)
"""


def q_smooth_grid(sf_dir: str):
    """3×3 box smoothing over the sparse density grid (reference
    analyzer.smooth, raster/analyzer.py:269-434, radius-1 kernel on
    the sparse-cell representation): every cell emits its count to its
    9-neighborhood, ONE cell-bucketed combine sums contributions, and
    only real cells (center marker present) survive — the same
    emit/stencil plan as slope/flow, so no dense array and no sort."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 1024),
                         "cy": pa.array(iy // 1024)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        txs, tys, ctr = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                txs.append(cx + dx)
                tys.append(cy + dy)
                ctr.append(np.full(len(b), int(dx == 0 and dy == 0),
                                   np.int64))
        return pd.DataFrame({"cx": np.concatenate(txs),
                             "cy": np.concatenate(tys),
                             "is_center": np.concatenate(ctr),
                             "v": np.tile(v, 9)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["cx", "cy"], sort=False)
             .agg(box_sum=("v", "sum"), ctr=("is_center", "max"))
             .reset_index())
        g = g[g["ctr"] == 1]
        return pd.DataFrame({"cx": g["cx"].to_numpy(np.int64),
                             "cy": g["cy"].to_numpy(np.int64),
                             "box_sum": g["box_sum"]
                             .to_numpy(np.int64)})

    return rel.bucketed_group_apply(tagged, ["cx", "cy"], combine)


SQL_SMOOTH_GRID = f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
cells AS MATERIALIZED (SELECT ix // 1024 AS cx, iy // 1024 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2)
SELECT a.cx, a.cy, CAST(SUM(b.n) AS BIGINT) AS box_sum
FROM cells a JOIN cells b
  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
GROUP BY a.cx, a.cy
"""


def q_dist_cells(sf_dir: str):
    """Distance transform on the sparse grid (reference
    analyzer.distance, raster/analyzer.py:485-607): per occupied 1°
    cell, the exact MIN SQUARED lattice distance from the cell center
    to any of 25 broadcast facility points — integer arithmetic end to
    end (cell center = cx·1024+512 units), so unlike the float tile
    variant this replays bit-exactly. Facilities broadcast once
    (ray.put + worker cache); one vectorized min per batch."""
    import ray as _ray

    from pythongis_ray import state as _state

    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 1024),
                         "cy": pa.array(iy // 1024)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    fac = pd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey"])
    fac = fac[fac["c_custkey"] < 100]
    fk = fac["c_custkey"].to_numpy(np.int64) * 4 + 1
    fix_, fiy = fixtures.geocode_units(fk)
    ref = _ray.put({"ix": fix_, "iy": fiy})

    def dist(b: pd.DataFrame) -> pd.DataFrame:
        p = _state.get_broadcast(ref, key_extra=("distcells",))
        ccx = b["cx"].to_numpy(np.int64) * 1024 + 512
        ccy = b["cy"].to_numpy(np.int64) * 1024 + 512
        dx = ccx[:, None] - p["ix"][None, :]
        dy = ccy[:, None] - p["iy"][None, :]
        d2 = (dx * dx + dy * dy).min(axis=1)
        return pd.DataFrame({"cx": b["cx"].to_numpy(np.int64),
                             "cy": b["cy"].to_numpy(np.int64),
                             "d2_min": d2})

    return grid_ds.map_batches(dist, batch_format="pandas",
                               batch_size=65536)


def SQL_DIST_CELLS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
cells AS (SELECT ix // 1024 AS cx, iy // 1024 AS cy FROM pts
          GROUP BY 1, 2),
fac AS (SELECT ix AS fx, iy AS fy
        FROM ({_sql_keyed_points("customer", "c_custkey", 4, 1, "fk")})
        WHERE fk < 401)
SELECT c.cx, c.cy,
       MIN((c.cx * 1024 + 512 - f.fx) * (c.cx * 1024 + 512 - f.fx)
           + (c.cy * 1024 + 512 - f.fy) * (c.cy * 1024 + 512 - f.fy))
         AS d2_min
FROM cells c CROSS JOIN fac f GROUP BY c.cx, c.cy
"""


IDX_PARTS = 16


def q_indexed_search(sf_dir: str):
    """Build-once / query-many retrieval: materialize a PARTITIONED
    on-disk inverted index (postings (word, doc_id, tf) routed by
    word-hash through the resumable checkpoint sink), then answer the
    query from the INDEX with partition-PRUNED reads — only the
    partitions owning the query terms' hashes are opened, the web-
    scale search serving shape. Scoring contract identical to
    search_topk, so the corpus-side SQL oracles the entire index
    round trip (build → prune → read → score)."""
    import shutil
    import tempfile

    from pythongis_ray import checkpoint as ckpt
    from pythongis_ray.relational import bucketed_group_apply
    from pythongis_ray.text import _poly_hash_segments, _string_buffer

    out = tempfile.mkdtemp(prefix="pgr_idx_")
    try:
        docs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])

        def explode(batch: pa.Table) -> pd.DataFrame:
            toks = pc.split_pattern(batch["text"], " ")
            flat = (toks.combine_chunks()
                    if isinstance(toks, pa.ChunkedArray) else toks)
            offs = np.asarray(flat.offsets)
            did = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            lens = offs[1:] - offs[:-1]
            df = pd.DataFrame({
                "doc_id": np.repeat(did, lens),
                "word": flat.values.to_pandas()})
            g = (df.groupby(["doc_id", "word"], sort=False).size()
                 .rename("tf").reset_index())
            warr = pa.array(g["word"], pa.string())
            buf, woffs = _string_buffer(warr)
            wh = _poly_hash_segments(buf, woffs[:-1], woffs[1:])
            g["whash"] = wh.view(np.int64)
            g["tf"] = g["tf"].astype(np.int64)
            return g

        postings = docs.map_batches(explode, batch_format="pyarrow",
                                    batch_size=4096)
        ckpt.write_partitioned(postings, out, key_col="whash",
                               num_partitions=IDX_PARTS, resume=False)

        # ---- query side: partition-pruned read of the term postings
        n_docs = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["doc_id"]).count()
        th = {}
        for t in SEARCH_TERMS:
            b = np.frombuffer(t.encode(), np.uint8)
            th[t] = int(_poly_hash_segments(
                b, np.array([0]), np.array([len(b)]))[0].view(np.int64))
        need = sorted({int(ckpt.partition_of(
            np.array([h], np.int64), IDX_PARTS)[0])
            for h in th.values()})
        import glob as _glob
        files = [f for p in need
                 for f in sorted(_glob.glob(f"{out}/part={p}/*.parquet"))]
        idx = _rd().read_parquet(files)

        def keep_terms(b: pa.Table) -> pa.Table:
            m = pc.is_in(b["word"],
                         value_set=pa.array(list(SEARCH_TERMS)))
            return pa.table({
                "word": b["word"].filter(m),
                "doc_id": pc.cast(b["doc_id"], pa.int64()).filter(m),
                "tf": pc.cast(b["tf"], pa.int64()).filter(m)})

        rel_rows = idx.map_batches(keep_terms, batch_format="pyarrow",
                                   batch_size=65536).materialize()

        def dfp(b: pa.Table) -> pd.DataFrame:
            g = (b.to_pandas().groupby("word", sort=False)["doc_id"]
                 .size().rename("df").reset_index())
            g["df"] = g["df"].astype(np.int64)
            return g

        dfs = rel_rows.map_batches(dfp, batch_format="pyarrow",
                                   batch_size=65536).to_pandas() \
            .groupby("word")["df"].sum()
        idf = {t: (SEARCH_SCALE * n_docs) // int(dfs[t])
               for t in SEARCH_TERMS if t in dfs.index and dfs[t] > 0}

        def score(b: pd.DataFrame) -> pd.DataFrame:
            w = b["word"].map(idf).to_numpy(np.int64)
            s = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                              "score": b["tf"].to_numpy(np.int64) * w})
            g = s.groupby("doc_id", sort=False)["score"].sum() \
                .reset_index()
            g["score"] = g["score"].astype(np.int64)
            return g

        parts = rel_rows.map_batches(score, batch_format="pandas",
                                     batch_size=65536)

        def combine(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby("doc_id", sort=False)["score"].sum() \
                .reset_index()
            g["score"] = g["score"].astype(np.int64)
            return g

        scored = bucketed_group_apply(parts, ["doc_id"], combine)
        return scored.sort([("score"), ("doc_id")],
                           descending=[True, False]) \
            .limit(SEARCH_K).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_ohlc_bars(sf_dir: str):
    """Time-bar downsampling (OHLC candles, the financial resample
    shape): per (event_type, hour) the opening / highest / lowest /
    closing cents value, open/close ordered by (ts, event_id) so ties
    are total. One (type, bar)-bucketed co-location; open/close are a
    lexsort + keyed first/last, high/low vectorized min/max."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "ts",
                                     "value"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "bar": pa.array(us // 3_600_000_000),
                         "ts_us": pa.array(us),
                         "event_id": pc.cast(b["event_id"], pa.int64()),
                         "c": pa.array(c)})

    dsp = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["event_type", "bar", "ts_us", "event_id"],
                          kind="stable")
        gb = g.groupby(["event_type", "bar"], sort=False)["c"]
        out = gb.agg(open="first", high="max", low="min",
                     close="last").reset_index()
        for col in ("bar", "open", "high", "low", "close"):
            out[col] = out[col].astype(np.int64)
        return out

    return bucketed_group_apply(dsp, ["event_type", "bar"], per_bucket)


SQL_OHLC_BARS = """
WITH v AS (SELECT event_type, epoch_us(ts) // 3600000000 AS bar,
                  epoch_us(ts) AS ts_us, event_id,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events)
SELECT event_type, bar,
       CAST(arg_min(c, ts_us) AS BIGINT) AS "open",
       CAST(MAX(c) AS BIGINT) AS high, CAST(MIN(c) AS BIGINT) AS low,
       CAST(arg_max(c, ts_us) AS BIGINT) AS "close"
FROM v GROUP BY event_type, bar
"""


def q_global_median(sf_dir: str):
    """EXACT global order statistics WITHOUT a global sort — the
    distributed selection algorithm: cents values live on a bounded
    integer domain, so per-batch bincount partials reduce to ONE
    value-frequency table (domain-bounded, not corpus-bounded), and
    the k-th elements come from a cumulative scan of that table.
    Sorting 10^12 rows for one quantile is the anti-pattern; counting
    ships O(|domain|) state instead. Returns the discrete p25/p50/p75
    over ALL events (quantile_disc convention, ceil(q·n)−1)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        u, cnt = np.unique(c, return_counts=True)
        return pd.DataFrame({"c": u, "n": cnt.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("c", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    freq = rel.bucketed_group_apply(parts, ["c"], combine).to_pandas()
    freq = freq.sort_values("c").reset_index(drop=True)
    cum = freq["n"].cumsum().to_numpy(np.int64)
    n = int(cum[-1])
    vals = freq["c"].to_numpy(np.int64)

    def kth(q_: float) -> int:
        k = max(0, int(np.ceil(q_ * n)) - 1)
        return int(vals[int(np.searchsorted(cum, k + 1))])

    return pd.DataFrame({"p25": [kth(0.25)], "p50": [kth(0.5)],
                         "p75": [kth(0.75)]}).astype(np.int64)


SQL_GLOBAL_MEDIAN = """
SELECT quantile_disc(CAST(round(value * 100) AS BIGINT), 0.25) AS p25,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.75) AS p75
FROM events
"""


def q_gini(sf_dir: str):
    """Per-group Gini inequality coefficient as an EXACT integer
    ratio: with values sorted ascending, G = Σ(2i−n−1)·x₍ᵢ₎ /
    (n·Σx) — the numerator is one weighted sum over the in-bucket
    sort, no |xᵢ−xⱼ| pair space. Ships (gini_num, gini_den); the
    oracle replays with ROW_NUMBER."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "c": pa.array(c)})

    dsc = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in b.groupby("event_type", sort=False):
            x = np.sort(g["c"].to_numpy(np.int64))
            n = len(x)
            i = np.arange(1, n + 1, dtype=np.int64)
            num = int(((2 * i - n - 1) * x).sum())
            outs.append((et, num, n * int(x.sum())))
        return pd.DataFrame(outs, columns=["event_type", "gini_num",
                                           "gini_den"])

    return bucketed_group_apply(dsc, ["event_type"], per_bucket)


SQL_GINI = """
WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
r AS (SELECT event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c)
               AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v)
SELECT event_type,
       CAST(SUM((2 * i - n - 1) * c) AS BIGINT) AS gini_num,
       CAST(ANY_VALUE(n) * SUM(c) AS BIGINT) AS gini_den
FROM r GROUP BY event_type
"""


def q_host_entropy(sf_dir: str):
    """Vocabulary-diversity score per host — the integer entropy
    surrogate the lm_surprisal oracle established: per host,
    Σ_w c_w · bitlen(n_host // c_w) (word-frequency surprisal in whole
    bits, exact integers; diverse vocabularies score high, a
    one-word host scores n·1). One explode pass with per-batch (host,
    word) combine, one bucketed shuffle."""
    from pythongis_ray.relational import bucketed_group_apply
    from pythongis_ray.text import _bit_length_i64

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(b: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(b["text"], " ")
        flat = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        offs = np.asarray(flat.offsets)
        host = (b["doc_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64) % 50)
        df = pd.DataFrame({"host": np.repeat(host, offs[1:] - offs[:-1]),
                           "word": flat.values.to_pandas()})
        g = (df.groupby(["host", "word"], sort=False).size()
             .rename("c").reset_index())
        g["c"] = g["c"].astype(np.int64)
        return g

    parts = ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=8192)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["host", "word"], sort=False)["c"].sum()
             .reset_index())
        outs = []
        for h, grp in g.groupby("host", sort=False):
            c = grp["c"].to_numpy(np.int64)
            n = int(c.sum())
            bits = _bit_length_i64(n // c)
            outs.append((h, n, int((c * bits).sum())))
        return pd.DataFrame(outs, columns=["host", "n_tokens",
                                           "surprisal_bits"])

    return bucketed_group_apply(parts, ["host"], per_bucket)


SQL_HOST_ENTROPY = """
WITH w AS (SELECT doc_id % 50 AS host,
                  unnest(string_split(text, ' ')) AS word
           FROM documents),
cnt AS (SELECT host, word, CAST(COUNT(*) AS BIGINT) AS c FROM w
        GROUP BY host, word),
tot AS (SELECT host, CAST(SUM(c) AS BIGINT) AS n FROM cnt
        GROUP BY host)
SELECT cnt.host, CAST(ANY_VALUE(tot.n) AS BIGINT) AS n_tokens,
       CAST(SUM(c * LENGTH(bin(tot.n // c))) AS BIGINT)
         AS surprisal_bits
FROM cnt JOIN tot USING (host) GROUP BY cnt.host
"""


def q_ab_test(sf_dir: str):
    """A/B contingency analysis: users split by hash parity
    (variant = user_id % 2), conversion = did the user ever purchase.
    Emits the 2×2 table plus the exact odds-ratio integer pair
    (conv_a·nonconv_b, conv_b·nonconv_a) — no float statistics, the
    downstream test does the one division. One user-keyed combine."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pd.DataFrame:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        conv = pc.equal(b["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"user_id": u, "conv": conv})
        return (df.groupby("user_id", sort=False)["conv"].max()
                .reset_index())

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", sort=False)["conv"].max().reset_index()
        g["variant"] = (g["user_id"] % 2).astype(np.int64)
        out = (g.groupby("variant")["conv"]
               .agg(n_users="count", n_conv="sum").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        out["n_conv"] = out["n_conv"].astype(np.int64)
        return out

    tiny = bucketed_group_apply(parts, ["user_id"], per_user)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("variant")[["n_users", "n_conv"]].sum()
             .reset_index().sort_values("variant"))
        a_conv = int(g.loc[g["variant"] == 0, "n_conv"].sum())
        a_non = int(g.loc[g["variant"] == 0, "n_users"].sum()) - a_conv
        b_conv = int(g.loc[g["variant"] == 1, "n_conv"].sum())
        b_non = int(g.loc[g["variant"] == 1, "n_users"].sum()) - b_conv
        g["or_num"] = np.int64(a_conv * b_non)
        g["or_den"] = np.int64(b_conv * a_non)
        for c in ("variant", "n_users", "n_conv"):
            g[c] = g[c].astype(np.int64)
        return g

    one = tiny.map_batches(lambda b: b.assign(_one=np.int64(0)),
                           batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda gg: finish(gg.drop(columns=["_one"])),
        batch_format="pandas")


SQL_AB_TEST = """
WITH u AS (SELECT user_id, user_id % 2 AS variant,
                  CAST(MAX(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
           FROM events GROUP BY user_id),
t AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(conv) AS BIGINT) AS n_conv
      FROM u GROUP BY variant),
o AS (SELECT
        (SELECT n_conv FROM t WHERE variant = 0)
          * (SELECT n_users - n_conv FROM t WHERE variant = 1) AS or_num,
        (SELECT n_conv FROM t WHERE variant = 1)
          * (SELECT n_users - n_conv FROM t WHERE variant = 0) AS or_den)
SELECT variant, n_users, n_conv,
       CAST((SELECT or_num FROM o) AS BIGINT) AS or_num,
       CAST((SELECT or_den FROM o) AS BIGINT) AS or_den
FROM t
"""


def q_profile_events(sf_dir: str):
    """Data-profiling audit (the pipeline-health table every ingest
    needs): one streamed pass reduces row/null/domain stats — n_rows,
    nulls per column, distinct event types, ts range, value-cents
    range — to a single row of block-bounded partials."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet")

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        ets = pc.unique(b["event_type"]).to_pylist()
        return pd.DataFrame({
            "n_rows": [len(b)],
            "n_null_props": [int(b["props"].null_count)],
            "n_null_value": [int(b["value"].null_count)],
            "ts_min": [int(us.min())], "ts_max": [int(us.max())],
            "c_min": [int(c.min())], "c_max": [int(c.max())],
            "ets": [",".join(sorted(ets))]})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    ets = sorted({e for row in parts["ets"] for e in row.split(",")})
    return pd.DataFrame({
        "n_rows": [np.int64(parts["n_rows"].sum())],
        "n_null_props": [np.int64(parts["n_null_props"].sum())],
        "n_null_value": [np.int64(parts["n_null_value"].sum())],
        "n_event_types": [np.int64(len(ets))],
        "ts_min": [np.int64(parts["ts_min"].min())],
        "ts_max": [np.int64(parts["ts_max"].max())],
        "c_min": [np.int64(parts["c_min"].min())],
        "c_max": [np.int64(parts["c_max"].max())]})


SQL_PROFILE_EVENTS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(props) AS BIGINT) AS n_null_props,
       CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_null_value,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS ts_min,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS ts_max,
       CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c_min,
       CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c_max
FROM events
"""


_Q3_CUT = np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64)


def q_q3_revenue(sf_dir: str):
    """TPC-H Q3 shape (the canonical 3-way analytic join): BUILDING-
    segment customers ⋈ pre-cut orders ⋈ post-cut lineitems, top-10
    orders by revenue. Dimensions broadcast (customer keys never
    shuffle); lineitem revenue folds to per-order partials BEFORE the
    one big×big partitioned join; revenue is exact integer
    cents·percent (price_c · (100 − disc_pct)) so the oracle
    hash-matches."""
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    ck = cust[cust["c_mktsegment"] == "BUILDING"][["c_custkey"]] \
        .rename(columns={"c_custkey": "o_custkey"})

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate",
                                         "o_orderpriority"])

    def ofilter(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = pa.array(us < _Q3_CUT)
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64())
            .filter(keep),
            "o_custkey": pc.cast(b["o_custkey"], pa.int64())
            .filter(keep),
            "odate_us": pa.array(us[us < _Q3_CUT]),
            "o_orderpriority": b["o_orderpriority"].filter(keep)})

    o2 = rel.hash_join(orders.map_batches(ofilter, batch_format="pyarrow",
                                          batch_size=65536), ck,
                       on="o_custkey")

    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice",
                                     "l_discount", "l_shipdate"])

    def lrev(b: pa.Table) -> pd.DataFrame:
        us = b["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = us > _Q3_CUT
        pc_ = np.rint(b["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)[keep]
        dp = np.rint(b["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)[keep]
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        df = pd.DataFrame({"o_orderkey": ok,
                           "rev": pc_ * (100 - dp)})
        return df.groupby("o_orderkey", sort=False)["rev"].sum() \
            .reset_index()

    lp = li.map_batches(lrev, batch_format="pyarrow", batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderkey", sort=False)["rev"].sum().reset_index()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    lc = rel.bucketed_group_apply(lp, ["o_orderkey"], combine)
    joined = rel.join_large(lc, o2.select_columns(
        ["o_orderkey", "odate_us", "o_orderpriority"]), on="o_orderkey")

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype(np.int64),
            "revenue_cp": b["rev"].astype(np.int64),
            "odate_us": b["odate_us"].astype(np.int64),
            "o_orderpriority": b["o_orderpriority"]})

    out = joined.map_batches(fix, batch_format="pandas")
    return out.sort([("revenue_cp"), ("odate_us"), ("o_orderkey")],
                    descending=[True, False, False]).limit(10)


SQL_Q3_REVENUE = """
WITH li AS (SELECT l_orderkey AS o_orderkey,
                   SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS revenue_cp
            FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey),
o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS odate_us,
             o_orderpriority
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT o.o_orderkey, CAST(li.revenue_cp AS BIGINT) AS revenue_cp,
       CAST(o.odate_us AS BIGINT) AS odate_us, o.o_orderpriority
FROM o JOIN li USING (o_orderkey)
ORDER BY revenue_cp DESC, odate_us, o_orderkey LIMIT 10
"""


_Q5_LO = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
_Q5_HI = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)


def q_q5_region(sf_dir: str):
    """TPC-H Q5 shape (the 6-table star join): revenue per ASIA nation
    where customer AND supplier share the nation, 1996 orders. Every
    dimension (region→nation→customer, supplier) broadcasts; the ONE
    all-to-all is orders⋈lineitem, keyed once on the order key.
    Revenue in exact cents·percent."""
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    n2 = nat.merge(reg[reg["r_name"] == "ASIA"], left_on="n_regionkey",
                   right_on="r_regionkey")[["n_nationkey", "n_name"]]
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.merge(n2, left_on="c_nationkey",
                      right_on="n_nationkey")[
        ["c_custkey", "c_nationkey", "n_name"]] \
        .rename(columns={"c_custkey": "o_custkey"})
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]) \
        .rename(columns={"s_suppkey": "l_suppkey"})

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])

    def ofilter(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = pa.array((us >= _Q5_LO) & (us < _Q5_HI))
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64())
            .filter(keep),
            "o_custkey": pc.cast(b["o_custkey"], pa.int64())
            .filter(keep)})

    o2 = rel.hash_join(orders.map_batches(ofilter, batch_format="pyarrow",
                                          batch_size=65536),
                       cust, on="o_custkey")

    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice", "l_discount"])

    def lprep(b: pa.Table) -> pa.Table:
        pc_ = np.rint(b["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        dp = np.rint(b["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "o_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
            "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
            "rev": pa.array(pc_ * (100 - dp))})

    lp = li.map_batches(lprep, batch_format="pyarrow", batch_size=65536)
    lp = rel.hash_join(lp, supp, on="l_suppkey")
    joined = rel.join_large(lp, o2, on="o_orderkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["s_nationkey"] == b["c_nationkey"]]
        g = b.groupby("n_name", sort=False)["rev"].sum().reset_index()
        return g

    parts = joined.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("n_name", sort=False)["rev"].sum() \
            .reset_index(name="revenue_cp")
        g["revenue_cp"] = g["revenue_cp"].astype(np.int64)
        return g

    return rel.bucketed_group_apply(parts, ["n_name"], combine)


SQL_Q5_REGION = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cp
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_drawdown(sf_dir: str):
    """Maximum drawdown per user (the order-dependent running-extreme
    window: largest peak-to-trough drop of the cents sequence in time
    order). In-bucket lexsort + one np.maximum.accumulate — the
    running max the reference's moving_window cannot express (its
    windows are fixed-width). Exact integers; SQL replays with a
    ROWS UNBOUNDED PRECEDING running MAX."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                         "ts_us": pa.array(us),
                         "event_id": pc.cast(b["event_id"], pa.int64()),
                         "c": pa.array(c)})

    dsp = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        # per-user running max via a reset trick: offset each user's
        # values by k*OFF so accumulate never crosses users
        grp = np.cumsum(first) - 1
        OFF = np.int64(1) << 40
        runmax = np.maximum.accumulate(c + grp * OFF) - grp * OFF
        dd = runmax - c
        out = pd.DataFrame({"user_id": u, "dd": dd})
        res = out.groupby("user_id", sort=False)["dd"].max() \
            .reset_index(name="max_drawdown")
        res["max_drawdown"] = res["max_drawdown"].astype(np.int64)
        return res

    return bucketed_group_apply(dsp, ["user_id"], per_bucket)


SQL_DRAWDOWN = """
WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
r AS (SELECT user_id,
             MAX(c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) - c AS dd
      FROM v)
SELECT user_id, CAST(MAX(dd) AS BIGINT) AS max_drawdown
FROM r GROUP BY user_id
"""


def q_bounce_rate(sf_dir: str):
    """Composed streaming pipeline: gap-sessionize the event log (the
    oracle replays the full sessionize CTE) then report per event-free
    global counts — sessions, single-event 'bounce' sessions, and the
    exact bounce ratio in ppm. Session sizes fold inside the
    sessionize output's user buckets; the final combine is one row."""

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "session_id": b["session_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = (df.groupby(["user_id", "session_id"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    # sessionize co-locates users, so a (user, session)'s rows land in
    # one output bucket — batch partials then a keyed combine are exact
    parts = q_sessionize(sf_dir).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["user_id", "session_id"], sort=False)["n"].sum()
             .reset_index())
        return pd.DataFrame({
            "n_sessions": [np.int64(len(g))],
            "n_bounce": [np.int64((g["n"] == 1).sum())]})

    tiny = rel.bucketed_group_apply(parts, ["user_id"], combine)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ns = int(b["n_sessions"].sum())
        nb = int(b["n_bounce"].sum())
        return pd.DataFrame({"n_sessions": [np.int64(ns)],
                             "n_bounce": [np.int64(nb)],
                             "bounce_ppm": [np.int64(
                                 nb * 1_000_000 // max(ns, 1))]})

    one = tiny.map_batches(lambda b: b.assign(_one=np.int64(0)),
                           batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: finish(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_BOUNCE_RATE = f"""
WITH s AS ({SQL_SESSIONIZE}),
g AS (SELECT user_id, session_id, COUNT(*) AS n FROM s
      GROUP BY user_id, session_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounce,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000
            // GREATEST(COUNT(*), 1) AS BIGINT) AS bounce_ppm
FROM g
"""


def q_ntile10(sf_dir: str):
    """NTILE(10) decile assignment per group (equi-count binning for
    calibration curves / decile reports): DuckDB NTILE semantics —
    the first n mod 10 tiles get ⌈n/10⌉ rows over the (c, event_id)
    total order. In-bucket lexsort position arithmetic, no per-row
    Python."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_id": pc.cast(b["event_id"], pa.int64()),
                         "event_type": b["event_type"],
                         "c": pa.array(c)})

    dsc = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, g in b.groupby("event_type", sort=False):
            g = g.sort_values(["c", "event_id"], kind="stable")
            n = len(g)
            big, rem = n // 10, n % 10
            pos = np.arange(n, dtype=np.int64)
            cut = rem * (big + 1)
            tile = np.where(pos < cut, pos // max(big + 1, 1),
                            rem + (pos - cut) // max(big, 1)) + 1
            outs.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(np.int64),
                "event_type": et, "decile": tile.astype(np.int64)}))
        if not outs:
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "event_type": np.empty(0, object),
                                 "decile": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(dsc, ["event_type"], per_bucket)


SQL_NTILE10 = """
WITH v AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events)
SELECT event_id, event_type,
       CAST(NTILE(10) OVER (PARTITION BY event_type
                            ORDER BY c, event_id) AS BIGINT) AS decile
FROM v
"""


def q_pivot_hours(sf_dir: str):
    """Pivot (long → wide): hour-of-day × event-type count matrix as
    one wide row per hour — the reporting reshape. Counts fold
    per-batch; the pivot happens on the tiny (hour, type) table."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
    ets = ("view", "click", "purchase", "signup", "error")

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"hour": (us // 3_600_000_000) % 24,
                           "event_type": b["event_type"].to_pandas()})
        g = (df.groupby(["hour", "event_type"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def per_hour(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["hour", "event_type"], sort=False)["n"].sum()
             .reset_index())
        rows = []
        for h, grp in g.groupby("hour", sort=False):
            d = dict(zip(grp["event_type"], grp["n"]))
            rows.append([np.int64(h)] + [np.int64(d.get(e, 0))
                                         for e in ets])
        return pd.DataFrame(rows, columns=["hour"]
                            + [f"n_{e}" for e in ets])

    return bucketed_group_apply(parts, ["hour"], per_hour)


SQL_PIVOT_HOURS = """
WITH v AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
                  event_type FROM events)
SELECT hour,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error
FROM v GROUP BY hour
"""


def q_daily_growth(sf_dir: str):
    """Daily unique visitors + day-over-day delta: exact distinct
    users per day (one (day, user) dedup shuffle), then the LAG delta
    computed on the tiny day-bounded series — the dashboard staple."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"day": pa.array(us // 86_400_000_000),
                      "user_id": pc.cast(b["user_id"], pa.int64())})
        return t.group_by(["day", "user_id"]).aggregate([])

    pairs = ds.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)

    def per_day(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.drop_duplicates(["day", "user_id"])
             .groupby("day", sort=False).size()
             .rename("n_users").reset_index())
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    daily = bucketed_group_apply(pairs, ["day"], per_day)

    def growth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day", kind="stable").reset_index(drop=True)
        d = g["n_users"].to_numpy(np.int64)
        delta = np.zeros(len(g), np.int64)
        delta[1:] = d[1:] - d[:-1]
        keep = np.ones(len(g), bool)
        keep[0] = False
        return pd.DataFrame({"day": g["day"].to_numpy(np.int64)[keep],
                             "n_users": d[keep],
                             "delta": delta[keep]})

    one = daily.map_batches(lambda b: b.assign(_one=np.int64(0)),
                            batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: growth(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_DAILY_GROWTH = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           FROM events GROUP BY 1),
g AS (SELECT day, n_users,
             n_users - LAG(n_users) OVER (ORDER BY day) AS delta
      FROM d)
SELECT CAST(day AS BIGINT) AS day, n_users,
       CAST(delta AS BIGINT) AS delta
FROM g WHERE delta IS NOT NULL
"""


def q_top_hours(sf_dir: str):
    """Top-with-ties (DENSE_RANK <= 3): busiest hours of day by event
    count, ties all included — the ranking contract LIMIT cannot
    express. Counts fold per batch; the rank runs on the 24-row
    table."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        h = (us // 3_600_000_000) % 24
        u, c = np.unique(h, return_counts=True)
        return pd.DataFrame({"hour": u, "n": c.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("hour", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    hourly = bucketed_group_apply(parts, ["hour"], combine)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "hour"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
        uniq = g["n"].drop_duplicates().to_numpy()
        dr = {int(v): i + 1 for i, v in enumerate(uniq)}
        g["rnk"] = g["n"].map(dr).astype(np.int64)
        g = g[g["rnk"] <= 3]
        return pd.DataFrame({"hour": g["hour"].to_numpy(np.int64),
                             "n": g["n"].to_numpy(np.int64),
                             "rnk": g["rnk"].to_numpy(np.int64)})

    one = hourly.map_batches(lambda b: b.assign(_one=np.int64(0)),
                             batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: rank(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_TOP_HOURS = """
WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
r AS (SELECT hour, n,
             CAST(DENSE_RANK() OVER (ORDER BY n DESC) AS BIGINT) AS rnk
      FROM h)
SELECT CAST(hour AS BIGINT) AS hour, n, rnk FROM r WHERE rnk <= 3
"""


def q_streaks(sf_dir: str):
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days (the classic streak analytic). Distinct (user, day) pairs
    co-locate once; inside the bucket the island id is day − rank
    (pure integer arithmetic over the sorted distinct days), and the
    streak is the max island size. SQL replays with ROW_NUMBER."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                      "day": pa.array(us // 86_400_000_000)})
        return t.group_by(["user_id", "day"]).aggregate([])

    pairs = ds.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates(["user_id", "day"]) \
            .sort_values(["user_id", "day"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        grp = np.cumsum(first) - 1
        # rank within user over sorted distinct days
        pos = np.arange(len(g), dtype=np.int64)
        start = np.zeros(len(g), np.int64)
        start[first] = pos[first]
        start = np.maximum.accumulate(start)
        rank = pos - start
        island = d - rank
        df = pd.DataFrame({"user_id": u, "island": island})
        sz = (df.groupby(["user_id", "island"], sort=False).size()
              .rename("n").reset_index())
        out = sz.groupby("user_id", sort=False)["n"].max() \
            .reset_index(name="max_streak")
        out["max_streak"] = out["max_streak"].astype(np.int64)
        return out

    return bucketed_group_apply(pairs, ["user_id"], per_bucket)


SQL_STREAKS = """
WITH d AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
r AS (SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day) AS island
      FROM d),
s AS (SELECT user_id, island, COUNT(*) AS n FROM r
      GROUP BY user_id, island)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS max_streak
FROM s GROUP BY user_id
"""


def q_above_mean(sf_dir: str):
    """Correlated-aggregate comparison WITHOUT division: per user,
    how many events exceed that user's mean value — the predicate is
    cross-multiplied to c·n > Σc (exact integers), so no float mean
    ever exists. One co-location computes the group sums and the
    comparison in the same pass."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"user_id": pc.cast(b["user_id"], pa.int64()),
                         "c": pa.array(c)})

    dsc = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", sort=False)["c"]
        n = g.transform("size").to_numpy(np.int64)
        s = g.transform("sum").to_numpy(np.int64)
        above = (b["c"].to_numpy(np.int64) * n > s)
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy(np.int64),
                           "above": above.astype(np.int64)})
        out = (df.groupby("user_id", sort=False)["above"]
               .agg(n_events="count", n_above="sum").reset_index())
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_above"] = out["n_above"].astype(np.int64)
        return out

    return bucketed_group_apply(dsc, ["user_id"], per_bucket)


SQL_ABOVE_MEAN = """
WITH v AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s FROM v GROUP BY user_id)
SELECT v.user_id, CAST(ANY_VALUE(g.n) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN v.c * g.n > g.s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above
FROM v JOIN g USING (user_id) GROUP BY v.user_id
"""


_Q4_LO = np.datetime64("1996-07-01T00:00:00", "us").astype(np.int64)
_Q4_HI = np.datetime64("1996-10-01T00:00:00", "us").astype(np.int64)


def q_q4_priority(sf_dir: str):
    """TPC-H Q4 shape (the EXISTS semi-join): count Q3-1996 orders per
    priority that have at least one lineitem shipped AFTER the order
    date. The correlated EXISTS folds to a per-order MAX(l_shipdate)
    partial computed inside map_batches BEFORE the one shuffle — the
    probe side ships one int64 per order, not one row per lineitem
    (reference join semantics: /root/reference/pythongis/vector/
    sql.py:26-76, re-expressed as pre-aggregated semi-join)."""
    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])

    def lmax(b: pa.Table) -> pd.DataFrame:
        us = b["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"o_orderkey": ok, "max_ship_us": us})
        return df.groupby("o_orderkey", sort=False)["max_ship_us"] \
            .max().reset_index()

    lp = li.map_batches(lmax, batch_format="pyarrow", batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderkey", sort=False)["max_ship_us"].max() \
            .reset_index()
        g["max_ship_us"] = g["max_ship_us"].astype(np.int64)
        return g

    lc = rel.bucketed_group_apply(lp, ["o_orderkey"], combine)

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate",
                                         "o_orderpriority"])

    def ofilter(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = (us >= _Q4_LO) & (us < _Q4_HI)
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64())
            .filter(pa.array(keep)),
            "odate_us": pa.array(us[keep]),
            "o_orderpriority": b["o_orderpriority"]
            .filter(pa.array(keep))})

    o2 = orders.map_batches(ofilter, batch_format="pyarrow",
                            batch_size=65536)
    joined = rel.join_large(lc, o2, on="o_orderkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["max_ship_us"] > b["odate_us"]]
        return b.groupby("o_orderpriority", sort=False).size() \
            .reset_index(name="n")

    parts = joined.map_batches(partial, batch_format="pandas",
                               batch_size=65536)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderpriority", sort=False)["n"].sum() \
            .reset_index(name="order_count")
        g["order_count"] = g["order_count"].astype(np.int64)
        return g

    return rel.bucketed_group_apply(parts, ["o_orderpriority"], fin)


SQL_Q4_PRIORITY = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


_Q10_LO = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
_Q10_HI = np.datetime64("1996-04-01T00:00:00", "us").astype(np.int64)


def q_q10_returns(sf_dir: str):
    """TPC-H Q10 shape (returned-item revenue): top-20 customers by
    exact cents·percent revenue over 'R'-flagged lineitems of Q1-1996
    orders, nation name attached. Lineitem revenue folds to per-order
    partials before the single big×big join; customer→nation is a
    broadcast attach on the tiny post-aggregate result."""
    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])

    def ofilter(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = pa.array((us >= _Q10_LO) & (us < _Q10_HI))
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64())
            .filter(keep),
            "o_custkey": pc.cast(b["o_custkey"], pa.int64())
            .filter(keep)})

    o2 = orders.map_batches(ofilter, batch_format="pyarrow",
                            batch_size=65536)

    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_returnflag",
                                     "l_extendedprice", "l_discount"])

    def lrev(b: pa.Table) -> pd.DataFrame:
        keep = pc.equal(b["l_returnflag"], "R").to_numpy(
            zero_copy_only=False)
        cents = np.rint(b["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)[keep]
        dp = np.rint(b["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)[keep]
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        df = pd.DataFrame({"o_orderkey": ok,
                           "rev": cents * (100 - dp)})
        return df.groupby("o_orderkey", sort=False)["rev"].sum() \
            .reset_index()

    lp = li.map_batches(lrev, batch_format="pyarrow", batch_size=65536)

    def lcomb(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderkey", sort=False)["rev"].sum().reset_index()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    lc = rel.bucketed_group_apply(lp, ["o_orderkey"], lcomb)
    joined = rel.join_large(lc, o2, on="o_orderkey")

    def cpart(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_custkey", sort=False)["rev"].sum() \
            .reset_index()

    parts = joined.map_batches(cpart, batch_format="pandas",
                               batch_size=65536)

    def ccomb(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", sort=False)["rev"].sum() \
            .reset_index(name="revenue_cp")
        g["revenue_cp"] = g["revenue_cp"].astype(np.int64)
        return g

    percust = rel.bucketed_group_apply(parts, ["o_custkey"], ccomb)

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    cn = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    cn = cn[["c_custkey", "n_name"]] \
        .rename(columns={"c_custkey": "o_custkey"})
    out = rel.hash_join(percust, cn, on="o_custkey")
    return out.sort([("revenue_cp"), ("o_custkey")],
                    descending=[True, False]).limit(20)


SQL_Q10_RETURNS = """
SELECT c_custkey AS o_custkey,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_cp,
       ANY_VALUE(n_name) AS n_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey
ORDER BY revenue_cp DESC, o_custkey LIMIT 20
"""


def q_q18_large(sf_dir: str):
    """TPC-H Q18 shape (HAVING on a join-side aggregate): orders whose
    total lineitem quantity exceeds 150, with customer key, order date
    and exact total-price cents, largest first. The HAVING filter runs
    where the quantity sum is produced — only qualifying order keys
    (a tiny fraction) ever reach the orders join."""
    li = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])

    def lq(b: pa.Table) -> pd.DataFrame:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"o_orderkey": ok, "qty": q})
        return df.groupby("o_orderkey", sort=False)["qty"].sum() \
            .reset_index()

    lp = li.map_batches(lq, batch_format="pyarrow", batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_orderkey", sort=False)["qty"].sum().reset_index()
        g = g[g["qty"] > 150]
        g["qty"] = g["qty"].astype(np.int64)
        return g.rename(columns={"qty": "total_qty"})

    lc = rel.bucketed_group_apply(lp, ["o_orderkey"], combine)

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate", "o_totalprice"])

    def oprep(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(b["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
            "odate_us": pa.array(us),
            "totalprice_c": pa.array(cents)})

    o2 = orders.map_batches(oprep, batch_format="pyarrow",
                            batch_size=65536)
    joined = rel.join_large(lc, o2, on="o_orderkey")

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype(np.int64),
            "o_custkey": b["o_custkey"].astype(np.int64),
            "odate_us": b["odate_us"].astype(np.int64),
            "totalprice_c": b["totalprice_c"].astype(np.int64),
            "total_qty": b["total_qty"].astype(np.int64)})

    out = joined.map_batches(fix, batch_format="pandas")
    return out.sort([("totalprice_c"), ("odate_us"), ("o_orderkey")],
                    descending=[True, False, False]).limit(100)


SQL_Q18_LARGE = """
WITH lq AS (SELECT l_orderkey AS o_orderkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                     AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS odate_us,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
       lq.total_qty
FROM orders JOIN lq USING (o_orderkey)
ORDER BY totalprice_c DESC, odate_us, o_orderkey LIMIT 100
"""


def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights for target-distribution data
    selection (Xie et al. 2023): hashed token-bucket frequency-ratio
    score per document against the English subset as the target.
    Two streaming passes (256-row bucket partials folded driver-side,
    then a broadcast integer weight table scored with one reduceat per
    batch) — see text.dsir_importance. All-integer (add-one smoothed
    ratio with cleared denominators), so the DuckDB replay of the
    64-bit polynomial token hash is bit-exact."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    return text.dsir_importance(ds, target_langs=("en",))


# the `h` CTE replays text._poly_hash_segments (fold h*P + byte mod
# 2^64) exactly as in _SQL_SIMHASH_CTE; bucket = th % 256; weight
# w[b] = 16384*(ct+1)*Nr // ((cr+1)*Nt) in HUGEINT (floor division of
# positive exact integers == Python int // used engine-side).
SQL_DSIR_WEIGHTS = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS l
              FROM documents),
w AS (SELECT doc_id, lang, UNNEST(l) AS word FROM toks),
h AS (SELECT doc_id, lang,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
          [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
          (acc, x) -> (acc * 1099511628211 + x)
                      % CAST('18446744073709551616' AS HUGEINT))
        % 256 AS b
      FROM w),
bc AS (SELECT b, SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
              COUNT(*) AS cr
       FROM h GROUP BY b),
allb AS (SELECT g.range AS b, COALESCE(bc.ct, 0) AS ct,
                COALESCE(bc.cr, 0) AS cr
         FROM range(0, 256) g LEFT JOIN bc ON bc.b = g.range),
tot AS (SELECT SUM(ct) + 256 AS nt, SUM(cr) + 256 AS nr FROM allb),
wt AS (SELECT b, CAST(16384 AS HUGEINT) * (ct + 1)
                 * CAST(t.nr AS HUGEINT)
                 // ((cr + 1) * CAST(t.nt AS HUGEINT)) AS wv
       FROM allb, tot t)
SELECT h.doc_id, CAST(SUM(wt.wv) AS BIGINT) AS dsir_score,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM h JOIN wt ON wt.b = h.b
GROUP BY h.doc_id
"""


def q_nb_lang(sf_dir: str):
    """Hashed linear language classifier (the fastText-style lang-ID /
    quality-filter slot): train per-class token-bucket frequency-ratio
    weights on the corpus's own labels, score every doc against every
    class, argmax with ties to the smallest label — see
    text.nb_classify. All-integer, so the DuckDB replay (per-class
    DSIR-style weights + ROW_NUMBER argmax) is bit-exact."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    return text.nb_classify(ds, label_col="lang")


SQL_NB_LANG = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS l
              FROM documents),
w AS (SELECT doc_id, lang, UNNEST(l) AS word FROM toks),
h AS (SELECT doc_id, lang,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
          [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
          (acc, x) -> (acc * 1099511628211 + x)
                      % CAST('18446744073709551616' AS HUGEINT))
        % 256 AS b
      FROM w),
bc AS (SELECT b, COUNT(*) AS cr FROM h GROUP BY b),
cls AS (SELECT lang AS cand, COUNT(*) + 256 AS ntl FROM h GROUP BY lang),
bcl AS (SELECT lang AS cand, b, COUNT(*) AS cl FROM h GROUP BY lang, b),
tot AS (SELECT SUM(cr) + 256 AS nr FROM bc),
combos AS (SELECT c.cand, g.range AS b, c.ntl,
                  COALESCE(bcl.cl, 0) AS cl, COALESCE(bc.cr, 0) AS cr
           FROM cls c CROSS JOIN range(0, 256) g
           LEFT JOIN bcl ON bcl.cand = c.cand AND bcl.b = g.range
           LEFT JOIN bc ON bc.b = g.range),
wt AS (SELECT cand, b, CAST(16384 AS HUGEINT) * (cl + 1)
                       * CAST(t.nr AS HUGEINT)
                       // ((cr + 1) * CAST(ntl AS HUGEINT)) AS wv
       FROM combos, tot t),
sc AS (SELECT h.doc_id, w.cand, SUM(w.wv) AS s
       FROM h JOIN wt w ON w.b = h.b GROUP BY h.doc_id, w.cand),
pick AS (SELECT doc_id, cand,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY s DESC, cand ASC) AS rn
         FROM sc)
SELECT d.doc_id, d.lang, p.cand AS pred_lang
FROM documents d JOIN pick p ON p.doc_id = d.doc_id AND p.rn = 1
"""


def q_dup_shingles(sf_dir: str):
    """Exact duplicated-substring contamination (Lee et al. 2022
    measure): per doc, total 5-token shingle positions and how many
    carry a shingle shared with another document — see
    text.dup_shingle_stats. Oracle: full shingle-hash replay in
    DuckDB (token-hash fold then shingle fold with P=1000003, both
    mod 2^64 in HUGEINT) + the same two group-bys."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.dup_shingle_stats(ds, k=5)


SQL_DUP_SHINGLES = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
hw AS (SELECT doc_id,
         [list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(w, '')]),
            (a, x) -> (a * 1099511628211 + x)
                      % CAST('18446744073709551616' AS HUGEINT))
          FOR w IN toks] AS thl,
         len(toks) AS n
       FROM d),
sh AS (SELECT doc_id,
         [list_reduce(list_prepend(CAST(0 AS HUGEINT),
             thl[i + 1 : i + least(n, 5)]),
             (a, x) -> (a * 1000003 + x)
                       % CAST('18446744073709551616' AS HUGEINT))
          FOR i IN range(greatest(n - 4, 1))] AS shs
       FROM hw),
ps AS (SELECT doc_id, UNNEST(shs) AS s FROM sh),
pm AS (SELECT doc_id, s, COUNT(*) AS m FROM ps GROUP BY doc_id, s),
dup AS (SELECT s FROM pm GROUP BY s HAVING COUNT(*) >= 2),
nd AS (SELECT pm.doc_id, SUM(pm.m) AS n_dup
       FROM pm JOIN dup USING (s) GROUP BY pm.doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ps GROUP BY doc_id)
SELECT t.doc_id, CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup
FROM tot t LEFT JOIN nd ON nd.doc_id = t.doc_id
"""


def q_moran(sf_dir: str):
    """Global Moran's I spatial autocorrelation of the point-density
    grid (queen 8-adjacency, binary weights). Reported as the exact
    integer quadruple (n_cells, w_sum, num, den) with deviations
    cleared of the mean division: d_i = N*n_i - S, so
    I = N*num / (w_sum*den) and num = sum over ordered adjacent
    observed pairs of d_i*d_j, den = sum d_i^2.

    Distributed as the same sparse 8-neighbor stencil as tri_grid:
    each observed cell emits its deviation to its neighbors, one
    (cx,cy)-bucketed combine pairs incoming deviations with the
    resident cell's own, and the driver folds one tiny partial row
    per bucket. int64 holds num to ~9e18 (fine through sf0.1; a
    100TB run would move the partials to object/int128)."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()

    tp = grid.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    _OFF = [(1, 0), (-1, 0), (0, 1), (0, -1),
            (1, 1), (1, -1), (-1, 1), (-1, -1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        d = nc * b["n"].to_numpy(np.int64) - s
        tx = np.concatenate([cx] + [cx + dx for dx, _ in _OFF])
        ty = np.concatenate([cy] + [cy + dy for _, dy in _OFF])
        tag = np.repeat(np.arange(9, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(d, 9)})

    tagged = grid.map_batches(emit, batch_format="pandas",
                              batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        own = b[b["tag"] == 0].set_index(["cx", "cy"])["v"]
        inc = b[b["tag"] != 0].groupby(["cx", "cy"])["v"]
        insum = inc.sum().reindex(own.index, fill_value=0)
        k = inc.size().reindex(own.index, fill_value=0)
        d = own.to_numpy(np.int64)
        return pd.DataFrame({
            "num_p": [int((d * insum.to_numpy(np.int64)).sum())],
            "w_p": [int(k.to_numpy(np.int64).sum())],
            "den_p": [int((d * d).sum())]})

    parts = rel.bucketed_group_apply(tagged, ["cx", "cy"],
                                     combine).to_pandas()
    return pa.table({
        "n_cells": pa.array([nc], pa.int64()),
        "w_sum": pa.array([int(parts["w_p"].sum())], pa.int64()),
        "num": pa.array([int(parts["num_p"].sum())], pa.int64()),
        "den": pa.array([int(parts["den_p"].sum())], pa.int64())})


def SQL_MORAN():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
t AS (SELECT COUNT(*) AS nc, SUM(n) AS s FROM g),
d AS (SELECT cx, cy,
             CAST(t.nc AS HUGEINT) * n - CAST(t.s AS HUGEINT) AS d
      FROM g, t),
pr AS (SELECT a.d AS da, b.d AS db FROM d a JOIN d b
       ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
          AND NOT (a.cx = b.cx AND a.cy = b.cy)),
ag AS (SELECT COUNT(*) AS w_sum, SUM(da * db) AS num FROM pr),
dd AS (SELECT SUM(d * d) AS den FROM d)
SELECT CAST(t.nc AS BIGINT) AS n_cells,
       CAST(ag.w_sum AS BIGINT) AS w_sum,
       CAST(ag.num AS BIGINT) AS num,
       CAST(dd.den AS BIGINT) AS den
FROM t, ag, dd
"""


def q_convex_hull(sf_dir: str):
    """Per-zone convex hull of supplier points (zones = s_suppkey%5,
    a scale-independent synthetic partition so every test scale has
    multi-point zones), emitted as the set
    of DIRECTED hull edges in CCW orientation (x1,y1)->(x2,y2) —
    a canonical, order-free encoding the driver can hash. Monotone
    chain per zone (geom/algo.convex_hull_ccw: exact int64 cross
    products on the lattice, strict turns so every edge is maximal;
    2-point and all-collinear zones degenerate to the two directed
    extreme edges). Zones are small by construction, so the hull runs
    inside one bucketed group per nation; the oracle is the O(n^3)
    edge characterization: (a,b) is a CCW hull edge iff every other
    zone point is strictly left or collinear-strictly-between."""
    from pythongis_ray.geom import algo

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def to_pts(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 3)
        return pa.table({"nk": pa.array(k % 5), "x": pa.array(ix),
                         "y": pa.array(iy)})

    pts = ds.map_batches(to_pts, batch_format="pyarrow",
                         batch_size=65536)

    def hulls(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, gg in g.groupby("nk", sort=False):
            h = algo.convex_hull_ccw(
                np.column_stack([gg["x"].to_numpy(np.int64),
                                 gg["y"].to_numpy(np.int64)]))
            m = len(h)
            if m < 2:
                continue
            nxt = np.roll(np.arange(m), -1)
            rows.append(pd.DataFrame({
                "nk": np.full(m, nk, np.int64),
                "x1": h[:, 0], "y1": h[:, 1],
                "x2": h[nxt, 0], "y2": h[nxt, 1]}))
        if not rows:
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in ("nk", "x1", "y1", "x2", "y2")})
        return pd.concat(rows, ignore_index=True)

    out = rel.bucketed_group_apply(pts, ["nk"], hulls)
    return rel.with_empty_schema(out, pa.schema(
        [(c, pa.int64()) for c in ("nk", "x1", "y1", "x2", "y2")]))


def SQL_CONVEX_HULL():
    src = "(SELECT s_suppkey*4+3 AS sup_id, s_suppkey % 5 AS nk FROM supplier)"
    g = fixtures.sql_geocode("sup_id").replace("__SRC__", src)
    return f"""
WITH gp AS ({g}),
p AS (SELECT DISTINCT CAST(nk AS BIGINT) AS nk, ix AS x, iy AS y FROM gp),
e AS (SELECT a.nk, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM p a JOIN p b
        ON a.nk = b.nk AND NOT (a.x = b.x AND a.y = b.y))
SELECT nk, x1, y1, x2, y2 FROM e
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.nk = e.nk
    AND NOT (q.x = e.x1 AND q.y = e.y1)
    AND NOT (q.x = e.x2 AND q.y = e.y2)
    AND NOT (
      (e.x2 - e.x1) * (q.y - e.y1) - (e.y2 - e.y1) * (q.x - e.x1) > 0
      OR ((e.x2 - e.x1) * (q.y - e.y1)
            - (e.y2 - e.y1) * (q.x - e.x1) = 0
          AND (q.x - e.x1) * (e.x2 - e.x1)
                + (q.y - e.y1) * (e.y2 - e.y1) > 0
          AND (q.x - e.x1) * (e.x2 - e.x1)
                + (q.y - e.y1) * (e.y2 - e.y1)
              < (e.x2 - e.x1) * (e.x2 - e.x1)
                + (e.y2 - e.y1) * (e.y2 - e.y1))))
"""


def q_tree_rollup(sf_dir: str):
    """Hierarchy rollup: subtree sum/count for EVERY node of the
    implicit binary tree over customers (node = c_custkey+1, parent =
    node>>1), value = acctbal cents. Instead of depth-many bottom-up
    rounds, each leaf explodes its ≤log2(N) ancestor chain map-side
    (node>>j — the same shift-ancestor trick as the synthesized page
    links) and ONE bucketed hash groupby sums per node; a per-batch
    partial combine collapses the shared high ancestors before the
    shuffle, so shuffle volume stays ~2 rows per input row."""
    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_acctbal"])

    def explode(batch: pa.Table) -> pd.DataFrame:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) + 1
        cents = np.rint(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        nodes, vals = [], []
        j = 0
        cur = k
        while True:
            m = cur >= 1
            if not m.any():
                break
            nodes.append(cur[m])
            vals.append(cents[m])
            cur = k >> (j + 1)
            j += 1
        df = pd.DataFrame({"node": np.concatenate(nodes),
                           "cents": np.concatenate(vals)})
        part = df.groupby("node", sort=False)["cents"] \
            .agg(["sum", "size"]).reset_index()
        return pd.DataFrame({"node": part["node"].to_numpy(np.int64),
                             "cents": part["sum"].to_numpy(np.int64),
                             "n": part["size"].to_numpy(np.int64)})

    tagged = ds.map_batches(explode, batch_format="pyarrow",
                            batch_size=16384)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False).agg(
            subtree_cents=("cents", "sum"),
            subtree_n=("n", "sum")).reset_index()
        return out.astype(np.int64)

    return rel.bucketed_group_apply(tagged, ["node"], combine)


SQL_TREE_ROLLUP = """
WITH c AS (SELECT c_custkey + 1 AS k,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
anc AS (SELECT k >> CAST(j.range AS INTEGER) AS node, cents
        FROM c CROSS JOIN range(0, 40) j
        WHERE (k >> CAST(j.range AS INTEGER)) >= 1)
SELECT node, CAST(SUM(cents) AS BIGINT) AS subtree_cents,
       CAST(COUNT(*) AS BIGINT) AS subtree_n
FROM anc GROUP BY node
"""


def q_autocorr(sf_dir: str):
    """Lag-1 serial autocorrelation of the value series per
    event_type, time-ordered by (ts, event_id), as EXACT integer
    moments with the mean divisions cleared: over the m = n-1
    consecutive pairs (h=head, t=tail), num = m*Σht − Σh·Σt and
    den_h/den_t the matching centered second moments, so
    r = num/sqrt(den_h*den_t). Per-key series are grouped and sorted
    inside one bucketed shuffle (the sessionize partitioning
    assumption: one key's series fits a worker)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id",
                                     "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values(["ts", "event_id"], kind="stable")
            x = np.rint(gg["value"].to_numpy() * 100.0).astype(np.int64)
            n = len(x)
            if n < 2:
                continue
            h, t = x[:-1], x[1:]
            m = n - 1
            sh, st = int(h.sum()), int(t.sum())
            rows.append({
                "event_type": et, "n": n,
                "num": m * int((h * t).sum()) - sh * st,
                "den_h": m * int((h * h).sum()) - sh * sh,
                "den_t": m * int((t * t).sum()) - st * st})
        cols = ("event_type", "n", "num", "den_h", "den_t")
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object if c ==
                                              "event_type" else np.int64)
                                 for c in cols})
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(ds, ["event_type"], per_type)


SQL_AUTOCORR = """
WITH x AS (SELECT event_type, ts, event_id,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
lagd AS (SELECT event_type,
                LAG(c) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS h,
                c AS t
         FROM x),
pr AS (SELECT * FROM lagd WHERE h IS NOT NULL),
ag AS (SELECT event_type, COUNT(*) AS m,
              SUM(h) AS sh, SUM(t) AS st,
              SUM(h * t) AS sht, SUM(h * h) AS shh, SUM(t * t) AS stt
       FROM pr GROUP BY event_type)
SELECT event_type, CAST(m + 1 AS BIGINT) AS n,
       CAST(m * sht - sh * st AS BIGINT) AS num,
       CAST(m * shh - sh * sh AS BIGINT) AS den_h,
       CAST(m * stt - st * st AS BIGINT) AS den_t
FROM ag
"""


def q_label_centroids(sf_dir: str):
    """Exact per-label centroid accumulators of the quantized
    embedding matrix in long format (label, dim, vsum, n): the
    training-side of a nearest-centroid classifier, kept as integer
    sums (centroid = vsum/n deferred). Per-batch partials fold 10×64
    rows, then one tiny groupby — shuffle volume is
    O(labels × dim × batches), never O(rows)."""
    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        lab = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = embed.quantize(embed._as_matrix(batch["embedding"]), 1000)
        codes, uniq = pd.factorize(lab)
        acc = np.zeros((len(uniq), mat.shape[1]), np.int64)
        np.add.at(acc, codes, mat)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        L, D = len(uniq), mat.shape[1]
        return pd.DataFrame({
            "label": np.repeat(np.asarray(uniq, np.int64), D),
            "dim": np.tile(np.arange(D, dtype=np.int64), L),
            "vsum": acc.reshape(-1),
            "n": np.repeat(cnt, D)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096)
    return rel.groupby_aggregate(parts, ["label", "dim"],
                                 [("vsum", "vsum", "sum"),
                                  ("n", "n", "sum")])


SQL_LABEL_CENTROIDS = """
WITH e AS (SELECT CAST(label AS BIGINT) AS label,
                  UNNEST(embedding) AS x,
                  generate_subscripts(embedding, 1) - 1 AS dim
           FROM embeddings)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
            AS BIGINT) AS vsum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY label, dim
"""


LATE_W_US = 300_000_000


def q_late_events(sf_dir: str):
    """Streaming watermark / allowed-lateness accounting: events
    arrive in a deterministic hash-shuffled order (arrival key =
    (event_id mod p)*1103515245 mod p, p=2^31-1, a bijection simulating out-of-order
    delivery), the watermark per event_type is the running max event
    time over arrival order, and an event is LATE when it trails the
    watermark by more than 300s. Reports (event_type, n, n_late,
    max_late_us). Per-key arrival replay inside one bucketed
    shuffle."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            eid = gg["event_id"].to_numpy(np.int64)
            ts = gg["ts"].to_numpy("datetime64[us]").astype(np.int64)
            order = np.argsort((eid % 2147483647) * 1103515245 % 2147483647,
                               kind="stable")
            ts = ts[order]
            wm = np.maximum.accumulate(ts)
            # first arrival has no watermark (SQL wm IS NULL): seed
            # with its own ts so delay=0 and it can never be late
            prev_wm = np.concatenate(([ts[0]], wm[:-1]))
            delay = prev_wm - ts
            late = delay > LATE_W_US
            rows.append({
                "event_type": et, "n": len(ts),
                "n_late": int(late.sum()),
                "max_late_us": int(delay[late].max()) if late.any()
                else 0})
        cols = ("event_type", "n", "n_late", "max_late_us")
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(ds, ["event_type"], per_type)


SQL_LATE_EVENTS = """
WITH a AS (SELECT event_type, epoch_us(ts) AS tus,
                  ((event_id % 2147483647) * 1103515245) % 2147483647 AS ak
           FROM events),
w AS (SELECT event_type, tus,
             MAX(tus) OVER (PARTITION BY event_type ORDER BY ak
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS wm
      FROM a),
f AS (SELECT event_type, tus, wm,
             (wm IS NOT NULL AND wm - tus > 300000000) AS late
      FROM w)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (late) AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN late THEN wm - tus END), 0)
            AS BIGINT) AS max_late_us
FROM f GROUP BY event_type
"""


def q_mec(sf_dir: str):
    """Per-zone minimum enclosing circle of supplier points (zones =
    suppkey%5 as in convex_hull), reported exactly: center as the
    reduced fraction (cxn/cd, cyn/cd) and floor(r^2) — see
    geom/algo.min_enclosing_circle. Candidates live on hull vertices;
    a pair (diameter) candidate is the MEC iff feasible, a triple
    circumcircle iff feasible with its center in the closed triangle
    (optimality: center in conv(touching points)); all valid
    candidates are the same unique circle and both sides pick the
    lexicographically first."""
    from pythongis_ray.geom import algo

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def to_pts(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 3)
        return pa.table({"nk": pa.array(k % 5), "x": pa.array(ix),
                         "y": pa.array(iy)})

    pts = ds.map_batches(to_pts, batch_format="pyarrow",
                         batch_size=65536)

    def mecs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, gg in g.groupby("nk", sort=False):
            cxn, cyn, cd, r2f = algo.min_enclosing_circle(
                np.column_stack([gg["x"].to_numpy(np.int64),
                                 gg["y"].to_numpy(np.int64)]))
            rows.append({"nk": int(nk), "cxn": cxn, "cyn": cyn,
                         "cd": cd, "r2_floor": r2f})
        cols = ("nk", "cxn", "cyn", "cd", "r2_floor")
        return pd.DataFrame(rows, columns=list(cols)).astype(np.int64)

    return rel.bucketed_group_apply(pts, ["nk"], mecs)


def SQL_MEC():
    src = "(SELECT s_suppkey*4+3 AS sup_id, s_suppkey % 5 AS nk FROM supplier)"
    g = fixtures.sql_geocode("sup_id").replace("__SRC__", src)
    return f"""
WITH gp AS ({g}),
p AS (SELECT DISTINCT CAST(nk AS BIGINT) AS nk, ix AS x, iy AS y FROM gp),
he AS (
  SELECT a.nk, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM p a JOIN p b ON a.nk = b.nk AND NOT (a.x = b.x AND a.y = b.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM p q
    WHERE q.nk = a.nk
      AND NOT (q.x = a.x AND q.y = a.y)
      AND NOT (q.x = b.x AND q.y = b.y)
      AND NOT (
        (b.x - a.x) * (q.y - a.y) - (b.y - a.y) * (q.x - a.x) > 0
        OR ((b.x - a.x) * (q.y - a.y) - (b.y - a.y) * (q.x - a.x) = 0
            AND (q.x - a.x) * (b.x - a.x)
                  + (q.y - a.y) * (b.y - a.y) > 0
            AND (q.x - a.x) * (b.x - a.x)
                  + (q.y - a.y) * (b.y - a.y)
                < (b.x - a.x) * (b.x - a.x)
                  + (b.y - a.y) * (b.y - a.y))))),
hv AS (SELECT DISTINCT nk, x1 AS x, y1 AS y FROM he),
pr AS (SELECT a.nk, 0 AS kind,
              a.x AS ax, a.y AS ay, b.x AS bx, b.y AS byy,
              CAST(0 AS BIGINT) AS cpx, CAST(0 AS BIGINT) AS cpy,
              CAST(a.x + b.x AS HUGEINT) AS cxn,
              CAST(a.y + b.y AS HUGEINT) AS cyn,
              CAST(2 AS HUGEINT) AS cd,
              CAST((a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS HUGEINT) AS r2n,
              CAST(4 AS HUGEINT) AS r2d
       FROM hv a JOIN hv b ON a.nk = b.nk
            AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
tr0 AS (SELECT a.nk, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS byy,
               c.x AS cpx, c.y AS cpy,
               CAST(2 * ((b.x - a.x) * (c.y - a.y)
                         - (b.y - a.y) * (c.x - a.x)) AS HUGEINT) AS d0,
               CAST((b.x - a.x) * (b.x - a.x)
                    + (b.y - a.y) * (b.y - a.y) AS HUGEINT) AS b2,
               CAST((c.x - a.x) * (c.x - a.x)
                    + (c.y - a.y) * (c.y - a.y) AS HUGEINT) AS c2
        FROM hv a
        JOIN hv b ON a.nk = b.nk
             AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
        JOIN hv c ON b.nk = c.nk
             AND (b.x < c.x OR (b.x = c.x AND b.y < c.y))),
tr1 AS (SELECT nk, ax, ay, bx, byy, cpx, cpy,
               abs(d0) AS dd,
               CASE WHEN d0 < 0 THEN -1 ELSE 1 END
                 * ((cpy - ay) * b2 - (byy - ay) * c2) AS uxn,
               CASE WHEN d0 < 0 THEN -1 ELSE 1 END
                 * ((bx - ax) * c2 - (cpx - ax) * b2) AS uyn
        FROM tr0 WHERE d0 <> 0),
tr2 AS (SELECT nk, 1 AS kind, ax, ay, bx, byy, cpx, cpy,
               ax * dd + uxn AS cxn, ay * dd + uyn AS cyn, dd AS cd,
               uxn * uxn + uyn * uyn AS r2n, dd * dd AS r2d
        FROM tr1),
tr3 AS (SELECT * FROM tr2
        WHERE ((bx - ax) * (cyn - ay * cd)
                 - (byy - ay) * (cxn - ax * cd) >= 0
               AND (cpx - bx) * (cyn - byy * cd)
                 - (cpy - byy) * (cxn - bx * cd) >= 0
               AND (ax - cpx) * (cyn - cpy * cd)
                 - (ay - cpy) * (cxn - cpx * cd) >= 0)
           OR ((bx - ax) * (cyn - ay * cd)
                 - (byy - ay) * (cxn - ax * cd) <= 0
               AND (cpx - bx) * (cyn - byy * cd)
                 - (cpy - byy) * (cxn - bx * cd) <= 0
               AND (ax - cpx) * (cyn - cpy * cd)
                 - (ay - cpy) * (cxn - cpx * cd) <= 0)),
cand AS (SELECT * FROM pr UNION ALL SELECT * FROM tr3),
feas AS (SELECT * FROM cand WHERE NOT EXISTS (
           SELECT 1 FROM hv q WHERE q.nk = cand.nk
             AND (q.x * cand.cd - cand.cxn) * (q.x * cand.cd - cand.cxn)
               + (q.y * cand.cd - cand.cyn) * (q.y * cand.cd - cand.cyn)
               > cand.r2n)),
pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY nk
           ORDER BY kind, ax, ay, bx, byy, cpx, cpy) AS rn FROM feas)
SELECT nk,
       CAST(cxn AS BIGINT)
         // gcd(gcd(CAST(cxn AS BIGINT), CAST(cyn AS BIGINT)),
               CAST(cd AS BIGINT)) AS cxn,
       CAST(cyn AS BIGINT)
         // gcd(gcd(CAST(cxn AS BIGINT), CAST(cyn AS BIGINT)),
               CAST(cd AS BIGINT)) AS cyn,
       CAST(cd AS BIGINT)
         // gcd(gcd(CAST(cxn AS BIGINT), CAST(cyn AS BIGINT)),
               CAST(cd AS BIGINT)) AS cd,
       CAST(r2n // r2d AS BIGINT) AS r2_floor
FROM pick WHERE rn = 1
"""


# marching-squares segment table: config (4 bits, b0=BL b1=BR b2=TR
# b3=TL, bit set = corner above level) -> crossed-edge pairs, edges
# 0=bottom 1=right 2=top 3=left, e1<e2; saddles 5/10 resolved
# deterministically as two separating segments.
MS_SEGS = {1: [(0, 3)], 2: [(0, 1)], 3: [(1, 3)], 4: [(1, 2)],
           5: [(0, 3), (1, 2)], 6: [(0, 2)], 7: [(2, 3)],
           8: [(2, 3)], 9: [(0, 2)], 10: [(0, 1), (2, 3)],
           11: [(1, 2)], 12: [(1, 3)], 13: [(0, 1)], 14: [(0, 3)]}


def q_contours(sf_dir: str):
    """Marching-squares contour of the point-density grid at level
    L = 2*mean = 2S/N (S = total points, N = observed cells; "above"
    is the strict integer test z*N > 2S, missing cells are 0).
    Crossing points are EXACT rationals t = (2S - z_lo*N)/((z_hi -
    z_lo)*N), emitted as reduced fractions in global grid
    coordinates: one row per segment (qx, qy, e1, e2, x1n, x1d, y1n,
    y1d, x2n, x2d, y2n, y2d). Same sparse stencil as tri_grid: each
    observed cell posts itself to its 4 incident squares, one
    bucketed combine assembles corners and runs the vectorized
    16-config table."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()
    tp = grid.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    _CORNERS = [(0, 0), (1, 0), (1, 1), (0, 1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        qx = np.concatenate([cx - ox for ox, _ in _CORNERS])
        qy = np.concatenate([cy - oy for _, oy in _CORNERS])
        tag = np.repeat(np.arange(4, dtype=np.int64), len(b))
        return pd.DataFrame({"qx": qx, "qy": qy, "tag": tag,
                             "v": np.tile(v, 4)})

    tagged = grid.map_batches(emit, batch_format="pandas",
                              batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["qx", "qy"], columns="tag",
                          values="v", aggfunc="sum") \
            .reindex(columns=range(4)).fillna(0)
        idx = p.index.to_frame(index=False)
        qx = idx["qx"].to_numpy(np.int64)
        qy = idx["qy"].to_numpy(np.int64)
        z = [p[t].to_numpy(np.int64) for t in range(4)]
        above = [zi * nc > 2 * s for zi in z]
        cfg = (above[0] * 1 + above[1] * 2 + above[2] * 4
               + above[3] * 8)

        # per-edge crossing fraction num/den (sign-canonical, den>0)
        def frac(z_lo, z_hi):
            num = 2 * s - z_lo * nc
            den = (z_hi - z_lo) * nc
            neg = den < 0
            num = np.where(neg, -num, num)
            den = np.where(neg, -den, den)
            return num, den

        ef = [frac(z[0], z[1]), frac(z[1], z[2]),
              frac(z[3], z[2]), frac(z[0], z[3])]

        def edge_pt(e):
            num, den = ef[e]
            den = np.where(den == 0, 1, den)  # only read on crossings
            if e == 0:
                xn, xd = qx * den + num, den
                yn, yd = qy, np.ones_like(qy)
            elif e == 1:
                xn, xd = qx + 1, np.ones_like(qx)
                yn, yd = qy * den + num, den
            elif e == 2:
                xn, xd = qx * den + num, den
                yn, yd = qy + 1, np.ones_like(qy)
            else:
                xn, xd = qx, np.ones_like(qx)
                yn, yd = qy * den + num, den
            gx = np.gcd(np.abs(xn), xd)
            gy = np.gcd(np.abs(yn), yd)
            return xn // gx, xd // gx, yn // gy, yd // gy

        ep = [edge_pt(e) for e in range(4)]
        cols = ("qx", "qy", "e1", "e2", "x1n", "x1d", "y1n", "y1d",
                "x2n", "x2d", "y2n", "y2d")
        rows = []
        for c, segs in MS_SEGS.items():
            m = cfg == c
            if not m.any():
                continue
            for e1, e2 in segs:
                a, bb = ep[e1], ep[e2]
                rows.append(pd.DataFrame({
                    "qx": qx[m], "qy": qy[m],
                    "e1": np.full(m.sum(), e1, np.int64),
                    "e2": np.full(m.sum(), e2, np.int64),
                    "x1n": a[0][m], "x1d": a[1][m],
                    "y1n": a[2][m], "y1d": a[3][m],
                    "x2n": bb[0][m], "x2d": bb[1][m],
                    "y2n": bb[2][m], "y2d": bb[3][m]}))
        if not rows:
            return pd.DataFrame({c_: np.array([], np.int64)
                                 for c_ in cols})
        return pd.concat(rows, ignore_index=True)[list(cols)]

    out = rel.bucketed_group_apply(tagged, ["qx", "qy"], combine)
    return rel.with_empty_schema(out, pa.schema(
        [(c, pa.int64()) for c in
         ("qx", "qy", "e1", "e2", "x1n", "x1d", "y1n", "y1d",
          "x2n", "x2d", "y2n", "y2d")]))


def SQL_CONTOURS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
t AS (SELECT COUNT(*) AS nc, SUM(n) AS s FROM g),
sqs AS (SELECT DISTINCT g.cx - o.ox AS qx, g.cy - o.oy AS qy
        FROM g CROSS JOIN (VALUES (0, 0), (1, 0), (1, 1), (0, 1))
                          o(ox, oy)),
sq AS (SELECT sqs.qx, sqs.qy,
              COALESCE(g00.n, 0) AS z0, COALESCE(g10.n, 0) AS z1,
              COALESCE(g11.n, 0) AS z2, COALESCE(g01.n, 0) AS z3,
              t.nc, t.s
       FROM sqs
       LEFT JOIN g g00 ON g00.cx = sqs.qx AND g00.cy = sqs.qy
       LEFT JOIN g g10 ON g10.cx = sqs.qx + 1 AND g10.cy = sqs.qy
       LEFT JOIN g g11 ON g11.cx = sqs.qx + 1 AND g11.cy = sqs.qy + 1
       LEFT JOIN g g01 ON g01.cx = sqs.qx AND g01.cy = sqs.qy + 1
       CROSS JOIN t),
cf AS (SELECT *,
         CASE WHEN z0 * nc > 2 * s THEN 1 ELSE 0 END
         + CASE WHEN z1 * nc > 2 * s THEN 2 ELSE 0 END
         + CASE WHEN z2 * nc > 2 * s THEN 4 ELSE 0 END
         + CASE WHEN z3 * nc > 2 * s THEN 8 ELSE 0 END AS cfg
       FROM sq),
ed AS (SELECT *,
         CAST(CASE WHEN (z1 - z0) < 0 THEN -(2 * s - z0 * nc)
              ELSE 2 * s - z0 * nc END AS BIGINT) AS n0,
         CAST(abs((z1 - z0) * nc) AS BIGINT) AS d0,
         CAST(CASE WHEN (z2 - z1) < 0 THEN -(2 * s - z1 * nc)
              ELSE 2 * s - z1 * nc END AS BIGINT) AS n1,
         CAST(abs((z2 - z1) * nc) AS BIGINT) AS d1,
         CAST(CASE WHEN (z2 - z3) < 0 THEN -(2 * s - z3 * nc)
              ELSE 2 * s - z3 * nc END AS BIGINT) AS n2,
         CAST(abs((z2 - z3) * nc) AS BIGINT) AS d2,
         CAST(CASE WHEN (z3 - z0) < 0 THEN -(2 * s - z0 * nc)
              ELSE 2 * s - z0 * nc END AS BIGINT) AS n3,
         CAST(abs((z3 - z0) * nc) AS BIGINT) AS d3
       FROM cf),
segt(cfg, e1, e2) AS (VALUES
  (1,0,3),(2,0,1),(3,1,3),(4,1,2),(5,0,3),(5,1,2),(6,0,2),(7,2,3),
  (8,2,3),(9,0,2),(10,0,1),(10,2,3),(11,1,2),(12,1,3),(13,0,1),
  (14,0,3)),
segs AS (SELECT ed.*, segt.e1, segt.e2
         FROM ed JOIN segt ON segt.cfg = ed.cfg),
pts2 AS (SELECT qx, qy, e1, e2,
  CASE e1 WHEN 0 THEN qx * d0 + n0 WHEN 1 THEN qx + 1
          WHEN 2 THEN qx * d2 + n2 ELSE qx END AS x1n0,
  CASE e1 WHEN 0 THEN d0 WHEN 2 THEN d2 ELSE 1 END AS x1d0,
  CASE e1 WHEN 0 THEN qy WHEN 1 THEN qy * d1 + n1
          WHEN 2 THEN qy + 1 ELSE qy * d3 + n3 END AS y1n0,
  CASE e1 WHEN 1 THEN d1 WHEN 3 THEN d3 ELSE 1 END AS y1d0,
  CASE e2 WHEN 0 THEN qx * d0 + n0 WHEN 1 THEN qx + 1
          WHEN 2 THEN qx * d2 + n2 ELSE qx END AS x2n0,
  CASE e2 WHEN 0 THEN d0 WHEN 2 THEN d2 ELSE 1 END AS x2d0,
  CASE e2 WHEN 0 THEN qy WHEN 1 THEN qy * d1 + n1
          WHEN 2 THEN qy + 1 ELSE qy * d3 + n3 END AS y2n0,
  CASE e2 WHEN 1 THEN d1 WHEN 3 THEN d3 ELSE 1 END AS y2d0
  FROM segs)
SELECT qx, qy, CAST(e1 AS BIGINT) AS e1, CAST(e2 AS BIGINT) AS e2,
       x1n0 // gcd(abs(x1n0), x1d0) AS x1n,
       x1d0 // gcd(abs(x1n0), x1d0) AS x1d,
       y1n0 // gcd(abs(y1n0), y1d0) AS y1n,
       y1d0 // gcd(abs(y1n0), y1d0) AS y1d,
       x2n0 // gcd(abs(x2n0), x2d0) AS x2n,
       x2d0 // gcd(abs(x2n0), x2d0) AS x2d,
       y2n0 // gcd(abs(y2n0), y2d0) AS y2n,
       y2d0 // gcd(abs(y2n0), y2d0) AS y2d
FROM pts2
"""


GR_ROUNDS = 12


def q_grid_regions(sf_dir: str):
    """Raster region labeling (polygonize step 1): 4-connected
    components of ABOVE-MEAN density cells (the contours level test,
    z*N > 2S), label = minimum cell key (k = cx*1024+cy) in the
    component. Adjacency is assembled with the sparse stencil (above
    cells post their key to 4 neighbor positions, one bucketed
    combine keeps pairs where the resident is also above, self-loops
    keep isolated cells); components run on the resident-shard
    Pregel engine (graph.connected_components, converged fixed
    point). The SQL replay is hash-min WITH pointer jumping —
    lab <- least(min neighbor lab, lab[lab]) — for GR_ROUNDS chained
    materialized rounds, which reaches the same fixed point (verified
    with margin at every test scale)."""
    from pythongis_ray import graph

    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()
    tp = grid.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    def above_only(b: pd.DataFrame) -> pd.DataFrame:
        m = b["n"].to_numpy(np.int64) * nc > 2 * s
        cx = b["cx"].to_numpy(np.int64)[m]
        cy = b["cy"].to_numpy(np.int64)[m]
        return pd.DataFrame({"cx": cx, "cy": cy,
                             "k": cx * 1024 + cy})

    ab = grid.map_batches(above_only, batch_format="pandas",
                          batch_size=65536)

    _OFF4 = [(1, 0), (-1, 0), (0, 1), (0, -1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        k = b["k"].to_numpy(np.int64)
        tx = np.concatenate([cx] + [cx + dx for dx, _ in _OFF4])
        ty = np.concatenate([cy] + [cy + dy for _, dy in _OFF4])
        tag = np.repeat(np.arange(5, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(k, 5)})

    tagged = ab.map_batches(emit, batch_format="pandas",
                            batch_size=65536)

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        own = b[b["tag"] == 0].set_index(["cx", "cy"])["v"]
        inc = b[b["tag"] != 0].set_index(["cx", "cy"])["v"]
        # resident above-cells: self-loop + incoming above neighbors
        res = own.reset_index()
        out = [pd.DataFrame({"id_a": res["v"].to_numpy(np.int64),
                             "id_b": res["v"].to_numpy(np.int64)})]
        j = inc.to_frame("nb").join(own.to_frame("me"), how="inner")
        if len(j):
            out.append(pd.DataFrame({
                "id_a": j["me"].to_numpy(np.int64),
                "id_b": j["nb"].to_numpy(np.int64)}))
        return pd.concat(out, ignore_index=True)

    e = rel.bucketed_group_apply(tagged, ["cx", "cy"], edges)
    cc = graph.connected_components(e)

    def unpack(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(node // 1024),
                         "cy": pa.array(node % 1024),
                         "region": pc.cast(batch["component"],
                                           pa.int64())})

    return cc.map_batches(unpack, batch_format="pyarrow")


def _sql_gr_ctes():
    """Shared CTE chain: above-mean cells `a`, adjacency `e`, and the
    hash-min + pointer-jump label rounds; returns (cte_text,
    final_label_cte_name)."""
    rounds = []
    prev = "l0"
    for r in range(1, GR_ROUNDS + 1):
        rounds.append(f"""
l{r} AS MATERIALIZED (
  SELECT n.k, LEAST(n.m, j.lab2) AS lab FROM
    (SELECT e.k1 AS k, MIN(lp.lab) AS m
     FROM e JOIN {prev} lp ON lp.k = e.k2 GROUP BY e.k1) n
  JOIN
    (SELECT l1.k, l2.lab AS lab2
     FROM {prev} l1 JOIN {prev} l2 ON l2.k = l1.lab) j
  ON j.k = n.k)""")
        prev = f"l{r}"
    ctes = f"""pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
t AS (SELECT COUNT(*) AS nc, SUM(n) AS s FROM g),
a AS (SELECT cx, cy, cx * 1024 + cy AS k FROM g, t
      WHERE n * nc > 2 * s),
e AS (SELECT a1.k AS k1, a2.k AS k2
      FROM a a1 JOIN a a2
        ON abs(a1.cx - a2.cx) + abs(a1.cy - a2.cy) <= 1),
l0 AS MATERIALIZED (SELECT k, k AS lab FROM a),
{",".join(rounds)}"""
    return ctes, prev


def SQL_GRID_REGIONS():
    ctes, prev = _sql_gr_ctes()
    return f"""
WITH {ctes}
SELECT a.cx, a.cy, CAST({prev}.lab AS BIGINT) AS region
FROM a JOIN {prev} ON {prev}.k = a.k
"""


def q_region_stats(sf_dir: str):
    """Polygonize step 2: per labeled region (grid_regions), the
    exact cell count and boundary perimeter — each above cell
    contributes 4 minus its above-neighbor degree. Degrees fall out
    of the same edge assembly (self-loop included, so degree =
    partners - 1); one final groupby on the region label."""
    labels = q_grid_regions(sf_dir)

    def tag_l(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cx": b["cx"].to_numpy(np.int64),
                             "cy": b["cy"].to_numpy(np.int64),
                             "region": b["region"].to_numpy(np.int64),
                             "deg": np.full(len(b), -1, np.int64)})

    lab_t = labels.map_batches(tag_l, batch_format="pandas",
                               batch_size=65536)

    # recompute the above mask + neighbor degree with the stencil
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()
    tp = grid.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    def above_only(b: pd.DataFrame) -> pd.DataFrame:
        m = b["n"].to_numpy(np.int64) * nc > 2 * s
        cx = b["cx"].to_numpy(np.int64)[m]
        cy = b["cy"].to_numpy(np.int64)[m]
        return pd.DataFrame({"cx": cx, "cy": cy})

    ab = grid.map_batches(above_only, batch_format="pandas",
                          batch_size=65536)

    _OFF4 = [(1, 0), (-1, 0), (0, 1), (0, -1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        tx = np.concatenate([cx] + [cx + dx for dx, _ in _OFF4])
        ty = np.concatenate([cy] + [cy + dy for _, dy in _OFF4])
        tag = np.repeat(np.arange(5, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag})

    tagged = ab.map_batches(emit, batch_format="pandas",
                            batch_size=65536)

    def degree(b: pd.DataFrame) -> pd.DataFrame:
        own = b[b["tag"] == 0].groupby(["cx", "cy"]).size()
        inc = b[b["tag"] != 0].groupby(["cx", "cy"]).size() \
            .reindex(own.index, fill_value=0)
        idx = own.index.to_frame(index=False)
        return pd.DataFrame({"cx": idx["cx"].to_numpy(np.int64),
                             "cy": idx["cy"].to_numpy(np.int64),
                             "region": np.full(len(own), -1, np.int64),
                             "deg": inc.to_numpy(np.int64)})

    deg_t = rel.bucketed_group_apply(tagged, ["cx", "cy"], degree)

    both = lab_t.union(deg_t)

    def pair(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["cx", "cy"]).agg(
            region=("region", "max"), deg=("deg", "max")).reset_index()
        return pd.DataFrame({"region": g["region"].to_numpy(np.int64),
                             "perim": 4 - g["deg"].to_numpy(np.int64)})

    cellrows = rel.bucketed_group_apply(both, ["cx", "cy"], pair)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("region", sort=False).agg(
            n_cells=("perim", "size"),
            perimeter=("perim", "sum")).reset_index()
        return out.astype(np.int64)

    return rel.bucketed_group_apply(cellrows, ["region"], final)


def SQL_REGION_STATS():
    ctes, prev = _sql_gr_ctes()
    return f"""
WITH {ctes},
deg AS (SELECT k1 AS k, COUNT(*) - 1 AS d FROM e GROUP BY k1)
SELECT CAST({prev}.lab AS BIGINT) AS region,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(4 - deg.d) AS BIGINT) AS perimeter
FROM a JOIN {prev} ON {prev}.k = a.k JOIN deg ON deg.k = a.k
GROUP BY {prev}.lab
"""


def q_zone_diameter(sf_dir: str):
    """Farthest point pair (diameter) per supplier zone: exact max
    squared distance with the pair reported, ties broken by the
    lexicographically smallest ordered pair. The engine only scans
    HULL vertex pairs (the diameter's endpoints are hull vertices);
    the oracle ranks all distinct point pairs — same answer."""
    from pythongis_ray.geom import algo

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def to_pts(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 3)
        return pa.table({"nk": pa.array(k % 5), "x": pa.array(ix),
                         "y": pa.array(iy)})

    pts = ds.map_batches(to_pts, batch_format="pyarrow",
                         batch_size=65536)

    def diam(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, gg in g.groupby("nk", sort=False):
            H = algo.convex_hull_ccw(
                np.column_stack([gg["x"].to_numpy(np.int64),
                                 gg["y"].to_numpy(np.int64)]))
            if len(H) < 2:
                continue
            hv = sorted((int(x), int(y)) for x, y in H)
            best = None
            for i in range(len(hv)):
                for j in range(i + 1, len(hv)):
                    a, b = hv[i], hv[j]
                    d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                    key = (-d2, a[0], a[1], b[0], b[1])
                    if best is None or key < best:
                        best = key
            rows.append({"nk": int(nk), "d2": -best[0],
                         "ax": best[1], "ay": best[2],
                         "bx": best[3], "by_": best[4]})
        cols = ("nk", "d2", "ax", "ay", "bx", "by_")
        return pd.DataFrame(rows, columns=list(cols)).astype(np.int64)

    return rel.bucketed_group_apply(pts, ["nk"], diam)


def SQL_ZONE_DIAMETER():
    src = "(SELECT s_suppkey*4+3 AS sup_id, s_suppkey % 5 AS nk FROM supplier)"
    g = fixtures.sql_geocode("sup_id").replace("__SRC__", src)
    return f"""
WITH gp AS ({g}),
p AS (SELECT DISTINCT CAST(nk AS BIGINT) AS nk, ix AS x, iy AS y FROM gp),
pr AS (SELECT a.nk, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_,
              (a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS d2
       FROM p a JOIN p b ON a.nk = b.nk
            AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY nk
           ORDER BY d2 DESC, ax, ay, bx, by_) AS rn FROM pr)
SELECT nk, d2, ax, ay, bx, by_ FROM pick WHERE rn = 1
"""


def q_zone_width(sf_dir: str):
    """Minimum width per supplier zone (rotating-calipers result):
    min over hull edges of the max point distance to the edge line,
    compared EXACTLY as fractions cross^2/len^2 via
    cross-multiplication. Output is the argmin directed hull edge
    (lex tie-break) plus floor(width^2). Engine scans hull edges ×
    hull vertices; the oracle maxes cross^2 over all zone points
    (same value — cross is linear, extremes at hull vertices)."""
    from pythongis_ray.geom import algo

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def to_pts(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 3)
        return pa.table({"nk": pa.array(k % 5), "x": pa.array(ix),
                         "y": pa.array(iy)})

    pts = ds.map_batches(to_pts, batch_format="pyarrow",
                         batch_size=65536)

    def width(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, gg in g.groupby("nk", sort=False):
            H = algo.convex_hull_ccw(
                np.column_stack([gg["x"].to_numpy(np.int64),
                                 gg["y"].to_numpy(np.int64)]))
            m = len(H)
            if m < 2:
                continue
            hv = [(int(x), int(y)) for x, y in H]
            best = None
            for i in range(m):
                a, b = hv[i], hv[(i + 1) % m]
                len2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                mc2 = max(((b[0] - a[0]) * (qy - a[1])
                           - (b[1] - a[1]) * (qx - a[0])) ** 2
                          for qx, qy in hv)
                cand = (mc2, len2, a[0], a[1], b[0], b[1])
                if best is None:
                    best = cand
                    continue
                lhs = cand[0] * best[1]
                rhs = best[0] * cand[1]
                if lhs < rhs or (lhs == rhs
                                 and cand[2:] < best[2:]):
                    best = cand
            rows.append({"nk": int(nk), "ax": best[2], "ay": best[3],
                         "bx": best[4], "by_": best[5],
                         "w2_floor": best[0] // best[1]})
        cols = ("nk", "ax", "ay", "bx", "by_", "w2_floor")
        return pd.DataFrame(rows, columns=list(cols)).astype(np.int64)

    return rel.bucketed_group_apply(pts, ["nk"], width)


def SQL_ZONE_WIDTH():
    src = "(SELECT s_suppkey*4+3 AS sup_id, s_suppkey % 5 AS nk FROM supplier)"
    g = fixtures.sql_geocode("sup_id").replace("__SRC__", src)
    return f"""
WITH gp AS ({g}),
p AS (SELECT DISTINCT CAST(nk AS BIGINT) AS nk, ix AS x, iy AS y FROM gp),
he AS (
  SELECT a.nk, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_
  FROM p a JOIN p b ON a.nk = b.nk AND NOT (a.x = b.x AND a.y = b.y)
  WHERE NOT EXISTS (
    SELECT 1 FROM p q
    WHERE q.nk = a.nk
      AND NOT (q.x = a.x AND q.y = a.y)
      AND NOT (q.x = b.x AND q.y = b.y)
      AND NOT (
        (b.x - a.x) * (q.y - a.y) - (b.y - a.y) * (q.x - a.x) > 0
        OR ((b.x - a.x) * (q.y - a.y) - (b.y - a.y) * (q.x - a.x) = 0
            AND (q.x - a.x) * (b.x - a.x)
                  + (q.y - a.y) * (b.y - a.y) > 0
            AND (q.x - a.x) * (b.x - a.x)
                  + (q.y - a.y) * (b.y - a.y)
                < (b.x - a.x) * (b.x - a.x)
                  + (b.y - a.y) * (b.y - a.y))))),
ew AS (SELECT he.nk, he.ax, he.ay, he.bx, he.by_,
              CAST((he.bx - he.ax) * (he.bx - he.ax)
                   + (he.by_ - he.ay) * (he.by_ - he.ay)
                   AS HUGEINT) AS len2,
              (SELECT MAX(CAST((he.bx - he.ax) * (q.y - he.ay)
                               - (he.by_ - he.ay) * (q.x - he.ax)
                               AS HUGEINT)
                          * CAST((he.bx - he.ax) * (q.y - he.ay)
                                 - (he.by_ - he.ay) * (q.x - he.ax)
                                 AS HUGEINT))
               FROM p q WHERE q.nk = he.nk) AS mc2
       FROM he)
SELECT e1.nk, e1.ax, e1.ay, e1.bx, e1.by_,
       CAST(e1.mc2 // e1.len2 AS BIGINT) AS w2_floor
FROM ew e1
WHERE NOT EXISTS (
  SELECT 1 FROM ew e2
  WHERE e2.nk = e1.nk
    AND (e2.mc2 * e1.len2 < e1.mc2 * e2.len2
         OR (e2.mc2 * e1.len2 = e1.mc2 * e2.len2
             AND (e2.ax, e2.ay, e2.bx, e2.by_)
                 < (e1.ax, e1.ay, e1.bx, e1.by_))))
"""


SC_ROUNDS = 5


def q_set_cover(sf_dir: str):
    """Greedy max-coverage corpus selection (the data-curation pick:
    which K sources together cover the most distinct vocabulary).
    K=5 greedy rounds: each picks the not-yet-picked source with the
    most still-uncovered distinct token hashes (ties to the smallest
    source string) and marks its vocabulary covered. Pairs (source,
    token-hash) are distinct-reduced in one bucketed shuffle and kept
    distributed; each round is a bucketed anti-join (uncovered
    filter) + a ≤n_sources-row gains fold on the driver. Token
    identity is the 64-bit polynomial hash replayed by the oracle, so
    grouping is bit-identical."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        th, tok_offs = text._batch_token_hashes(arr)
        src = batch["source"].to_pandas().to_numpy(object)
        d = pd.DataFrame({"source": np.repeat(src, np.diff(tok_offs)),
                          "wh": th.view(np.int64)})
        return d.drop_duplicates(ignore_index=True)

    raw = ds.map_batches(explode, batch_format="pyarrow",
                         batch_size=4096)

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(ignore_index=True)

    pairs = rel.bucketed_group_apply(raw, ["source", "wh"],
                                     distinct).materialize()
    srcs = sorted(pairs.groupby("source").count()
                  .to_pandas()["source"].tolist())

    covered = None
    picked: list[str] = []
    out = []
    for rnd in range(1, SC_ROUNDS + 1):
        if covered is None:
            unc = pairs
        else:
            def tag_p(b: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"wh": b["wh"].to_numpy(np.int64),
                                     "source": b["source"]})

            def tag_c(b: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "wh": b["wh"].to_numpy(np.int64),
                    "source": pd.Series([None] * len(b),
                                        dtype=object)})

            both = pairs.map_batches(tag_p, batch_format="pandas") \
                .union(covered.map_batches(tag_c,
                                           batch_format="pandas"))

            def anti(g: pd.DataFrame) -> pd.DataFrame:
                cov = g.loc[g["source"].isna(), "wh"].unique()
                keep = g[g["source"].notna()
                         & ~g["wh"].isin(cov).to_numpy()]
                return pd.DataFrame({
                    "source": keep["source"].to_numpy(object),
                    "wh": keep["wh"].to_numpy(np.int64)})

            unc = rel.bucketed_group_apply(both, ["wh"], anti)
        gdf = unc.groupby("source").count().to_pandas()
        gains = gdf.set_index("source")["count()"] \
            if "source" in gdf.columns else pd.Series(dtype=np.int64)
        cand = [(int(-gains.get(s, 0)), s) for s in srcs
                if s not in picked]
        gneg, pick = min(cand)
        picked.append(pick)
        out.append((rnd, pick, -gneg))
        def only_pick(b: pd.DataFrame, _p=pick) -> pd.DataFrame:
            return b.loc[b["source"] == _p, ["wh"]]

        newcov = pairs.map_batches(only_pick, batch_format="pandas")
        covered = newcov if covered is None \
            else covered.union(newcov)

        def dedup_wh(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop_duplicates(ignore_index=True)

        covered = rel.bucketed_group_apply(covered, ["wh"],
                                           dedup_wh).materialize()
    return pa.table({
        "rnd": pa.array([r for r, _, _ in out], pa.int64()),
        "source": pa.array([s for _, s, _ in out], pa.string()),
        "gain": pa.array([g for _, _, g in out], pa.int64())})


def SQL_SET_COVER():
    hdr = """
WITH toks AS (SELECT source, string_split(text, ' ') AS l
              FROM documents),
w AS (SELECT source, UNNEST(l) AS word FROM toks),
h AS (SELECT DISTINCT source,
        list_reduce(list_prepend(CAST(0 AS HUGEINT),
          [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
          (acc, x) -> (acc * 1099511628211 + x)
                      % CAST('18446744073709551616' AS HUGEINT)) AS wh
      FROM w),
srcs AS (SELECT DISTINCT source FROM documents)"""
    parts = [hdr]
    picked_union = None
    prev_cov = None
    picks = []
    for r in range(1, SC_ROUNDS + 1):
        unc = "h" if prev_cov is None else \
            f"(SELECT * FROM h WHERE wh NOT IN (SELECT wh FROM {prev_cov}))"
        notpicked = "" if picked_union is None else \
            f"WHERE s.source NOT IN ({picked_union})"
        parts.append(f"""
g{r} AS MATERIALIZED (
  SELECT s.source, COALESCE(c.g, 0) AS g
  FROM srcs s LEFT JOIN
    (SELECT source, COUNT(*) AS g FROM {unc} GROUP BY source) c
    ON c.source = s.source
  {notpicked}),
k{r} AS MATERIALIZED (
  SELECT source, g FROM g{r} ORDER BY g DESC, source LIMIT 1),
c{r} AS MATERIALIZED (
  SELECT DISTINCT wh FROM h WHERE source IN (SELECT source FROM k{r})
  {"UNION SELECT wh FROM " + prev_cov if prev_cov else ""})""")
        picks.append(f"SELECT CAST({r} AS BIGINT) AS rnd, source, CAST(g AS BIGINT) "
                     f"AS gain FROM k{r}")
        pk = f"SELECT source FROM k{r}"
        picked_union = pk if picked_union is None \
            else f"{picked_union} UNION {pk}"
        prev_cov = f"c{r}"
    return ",".join(parts) + "\n" + " UNION ALL ".join(picks)


def q_od_matrix(sf_dir: str):
    """Origin-destination flow matrix (movement analytics): events
    are geocoded (event_id*4+1 on the shared lattice), coarsened to
    64x64-unit zones, and each user's time-ordered consecutive event
    pair contributes one (zone_from, zone_to) flow. Per-user
    sequences sort inside one bucketed shuffle (sessionize
    assumption); pair counts pre-aggregate map-side before the final
    small groupby."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, gg in g.groupby("user_id", sort=False):
            gg = gg.sort_values(["ts", "event_id"], kind="stable")
            eid = gg["event_id"].to_numpy(np.int64)
            ix, iy = fixtures.geocode_units(eid * 4 + 1)
            z = (ix // 65536) * 64 + iy // 65536
            if len(z) < 2:
                continue
            out.append(pd.DataFrame({"zf": z[:-1], "zt": z[1:]}))
        if not out:
            return pd.DataFrame({"zf": np.array([], np.int64),
                                 "zt": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        d = pd.concat(out, ignore_index=True)
        part = d.groupby(["zf", "zt"], sort=False).size() \
            .reset_index(name="n")
        return part.astype(np.int64)

    parts = rel.bucketed_group_apply(ds, ["user_id"], per_user)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["zf", "zt"], sort=False)["n"].sum() \
            .reset_index().astype(np.int64)

    return rel.bucketed_group_apply(parts, ["zf", "zt"], fold)


def SQL_OD_MATRIX():
    src = "(SELECT user_id, ts, event_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
z AS (SELECT user_id, ts, event_id,
             (ix // 65536) * 64 + iy // 65536 AS zone
      FROM ge),
tr AS (SELECT user_id,
              LAG(zone) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS zf,
              zone AS zt
       FROM z)
SELECT zf, zt, CAST(COUNT(*) AS BIGINT) AS n
FROM tr WHERE zf IS NOT NULL GROUP BY zf, zt
"""


QT_CAP = 64      # split a node while it holds more than this
QT_DEPTH = 10    # hard depth cap


def q_quadtree_leaves(sf_dir: str):
    """Adaptive quadtree decomposition of the point set: a node
    splits while it holds more than QT_CAP points, down to QT_DEPTH.
    Output is the leaf set (d, kx, ky, n) where (kx, ky) = (ix >>
    (19-d), iy >> (19-d)). Leaf test needs only the PARENT count
    (counts are monotone along the chain): leaf iff d=0 and n<=cap,
    or parent>cap and (n<=cap or d=depth_cap). Two shuffles total:
    per-batch partial counts over the 11-level ancestor explode, then
    a parent-to-child count broadcast stencil — never a per-level
    round."""
    pts = points_lineitem(sf_dir)

    def explode(batch: pa.Table) -> pd.DataFrame:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        frames = []
        for d in range(QT_DEPTH + 1):
            kx = ix >> (19 - d)
            ky = iy >> (19 - d)
            part = pd.DataFrame({"kx": kx, "ky": ky}) \
                .groupby(["kx", "ky"], sort=False).size() \
                .reset_index(name="n")
            part.insert(0, "d", d)
            frames.append(part)
        return pd.concat(frames, ignore_index=True).astype(np.int64)

    parts = pts.map_batches(explode, batch_format="pyarrow",
                            batch_size=65536)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["d", "kx", "ky"], sort=False)["n"].sum() \
            .reset_index().astype(np.int64)

    cnt = rel.bucketed_group_apply(parts, ["d", "kx", "ky"], fold) \
        .materialize()

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        d = b["d"].to_numpy(np.int64)
        kx = b["kx"].to_numpy(np.int64)
        ky = b["ky"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        rows = [pd.DataFrame({"d": d, "kx": kx, "ky": ky,
                              "tag": 0, "v": n})]
        m = d < QT_DEPTH
        for cx in (0, 1):
            for cy in (0, 1):
                rows.append(pd.DataFrame({
                    "d": d[m] + 1, "kx": 2 * kx[m] + cx,
                    "ky": 2 * ky[m] + cy, "tag": 1, "v": n[m]}))
        return pd.concat(rows, ignore_index=True)

    tagged = cnt.map_batches(stencil, batch_format="pandas",
                             batch_size=65536)

    def leaves(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["tag"] == 0].set_index(["d", "kx", "ky"])["v"]
        par = g[g["tag"] == 1].groupby(["d", "kx", "ky"])["v"].max() \
            .reindex(own.index, fill_value=0)
        idx = own.index.to_frame(index=False)
        d = idx["d"].to_numpy(np.int64)
        n = own.to_numpy(np.int64)
        pn = par.to_numpy(np.int64)
        keep = ((d == 0) & (n <= QT_CAP)) | \
            ((pn > QT_CAP) & ((n <= QT_CAP) | (d == QT_DEPTH)))
        return pd.DataFrame({"d": d[keep],
                             "kx": idx["kx"].to_numpy(np.int64)[keep],
                             "ky": idx["ky"].to_numpy(np.int64)[keep],
                             "n": n[keep]})

    return rel.bucketed_group_apply(tagged, ["d", "kx", "ky"], leaves)


def SQL_QUADTREE():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
lv AS (SELECT dd.range AS d, ix >> CAST(19 - dd.range AS INTEGER) AS kx,
              iy >> CAST(19 - dd.range AS INTEGER) AS ky
       FROM pts CROSS JOIN range(0, {QT_DEPTH + 1}) dd),
cnt AS (SELECT d, kx, ky, COUNT(*) AS n FROM lv GROUP BY 1, 2, 3),
j AS (SELECT c.d, c.kx, c.ky, c.n, p.n AS pn
      FROM cnt c LEFT JOIN cnt p
        ON p.d = c.d - 1 AND p.kx = c.kx // 2 AND p.ky = c.ky // 2)
SELECT d, kx, ky, CAST(n AS BIGINT) AS n FROM j
WHERE (d = 0 AND n <= {QT_CAP})
   OR (pn > {QT_CAP} AND (n <= {QT_CAP} OR d = {QT_DEPTH}))
"""


def q_st_trend(sf_dir: str):
    """Space-time trend (emerging-hotspot step): per geocoded event
    zone, the exact integer least-squares slope of DAILY event counts
    over the global day range (absent days count 0, so sparse zones
    are not biased). Reported like regress_hour: (zone, n_days, sx,
    sy, slope_num = n*Sxy - Sx*Sy, slope_den = n*Sxx - Sx^2) with
    x = day index from the global min day. Counts shuffle once with
    map-side partials; the day range is two driver scalars."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])

    def zday(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        z = (ix // 65536) * 64 + iy // 65536
        day = ts // 86_400_000_000
        part = pd.DataFrame({"zone": z, "day": day}) \
            .groupby(["zone", "day"], sort=False).size() \
            .reset_index(name="n")
        return part.astype(np.int64)

    parts = ds.map_batches(zday, batch_format="pyarrow",
                           batch_size=65536)
    cnt = rel.bucketed_group_apply(
        parts, ["zone", "day"],
        lambda g: g.groupby(["zone", "day"], sort=False)["n"].sum()
        .reset_index().astype(np.int64)).materialize()

    dd = cnt.map_batches(
        lambda b: pa.table({"lo": pa.array([int(pc.min(b["day"]).as_py())],
                                           pa.int64()),
                            "hi": pa.array([int(pc.max(b["day"]).as_py())],
                                           pa.int64())}),
        batch_format="pyarrow").to_pandas()
    dmin, dmax = int(dd["lo"].min()), int(dd["hi"].max())
    nd = dmax - dmin + 1

    def trend(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for zone, gg in g.groupby("zone", sort=False):
            y = np.zeros(nd, np.int64)
            y[gg["day"].to_numpy(np.int64) - dmin] = \
                gg["n"].to_numpy(np.int64)
            x = np.arange(nd, dtype=np.int64)
            sx, sy = int(x.sum()), int(y.sum())
            sxx, sxy = int((x * x).sum()), int((x * y).sum())
            rows.append({"zone": int(zone), "n_days": nd,
                         "sx": sx, "sy": sy,
                         "slope_num": nd * sxy - sx * sy,
                         "slope_den": nd * sxx - sx * sx})
        cols = ("zone", "n_days", "sx", "sy", "slope_num", "slope_den")
        return pd.DataFrame(rows, columns=list(cols)).astype(np.int64)

    return rel.bucketed_group_apply(cnt, ["zone"], trend)


def SQL_ST_TREND():
    src = "(SELECT event_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
zd AS (SELECT (ix // 65536) * 64 + iy // 65536 AS zone,
              epoch_us(ts) // 86400000000 AS day
       FROM ge),
cnt AS (SELECT zone, day, COUNT(*) AS n FROM zd GROUP BY 1, 2),
dd AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM cnt),
zs AS (SELECT DISTINCT zone FROM cnt),
fl AS (SELECT zs.zone, dr.range AS x,
                COALESCE(cnt.n, 0) AS y
         FROM zs CROSS JOIN dd
         CROSS JOIN range(0, 4096) dr
         LEFT JOIN cnt ON cnt.zone = zs.zone
                      AND cnt.day = dd.dmin + dr.range
         WHERE dr.range <= dd.dmax - dd.dmin)
SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
         AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
         AS slope_den
FROM fl GROUP BY zone
"""


def q_gi_star(sf_dir: str):
    """Getis-Ord-style local hotspot flags on the density grid: per
    observed cell, the 3x3 local sum (observed cells only), the
    neighborhood size k, and an exact hot flag local_sum * N > 2 * k
    * S (local mean more than twice the global). Same stencil as
    tri_grid; the division never happens."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()
    tp = grid.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    _OFF9 = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
             (1, 1), (1, -1), (-1, 1), (-1, -1)]

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx + dx for dx, _ in _OFF9])
        ty = np.concatenate([cy + dy for _, dy in _OFF9])
        tag = np.repeat(np.arange(9, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 9)})

    tagged = grid.map_batches(emit, batch_format="pandas",
                              batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        own = b[b["tag"] == 0].set_index(["cx", "cy"])["v"]
        allv = b.groupby(["cx", "cy"])["v"]
        ls = allv.sum().reindex(own.index)
        k = allv.size().reindex(own.index)
        idx = own.index.to_frame(index=False)
        lsum = ls.to_numpy(np.int64)
        kk = k.to_numpy(np.int64)
        hot = (lsum * nc > 2 * kk * s).astype(np.int64)
        return pd.DataFrame({"cx": idx["cx"].to_numpy(np.int64),
                             "cy": idx["cy"].to_numpy(np.int64),
                             "local_sum": lsum, "k": kk, "hot": hot})

    return rel.bucketed_group_apply(tagged, ["cx", "cy"], combine)


def SQL_GI_STAR():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
t AS (SELECT COUNT(*) AS nc, SUM(n) AS s FROM g),
nb AS (SELECT a.cx, a.cy, SUM(b.n) AS local_sum, COUNT(*) AS k
       FROM g a JOIN g b
         ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       GROUP BY a.cx, a.cy)
SELECT nb.cx, nb.cy, CAST(nb.local_sum AS BIGINT) AS local_sum,
       CAST(nb.k AS BIGINT) AS k,
       CAST(CASE WHEN nb.local_sum * t.nc > 2 * nb.k * t.s
                 THEN 1 ELSE 0 END AS BIGINT) AS hot
FROM nb, t
"""


def q_haar_pyramid(sf_dir: str):
    """Unnormalized 2-D Haar wavelet pyramid of the density grid
    (virtual 64x64, absent cells are 0 and contribute nothing):
    for each level d=0..5 and block (px,py) = (cx>>(6-d), cy>>(6-d)),
    the four integer coefficients a=Σn, h=Σn·sx, v=Σn·sy, dd=Σn·sx·sy
    with sx = 1-2*((cx>>(5-d))&1). ONE shuffle: every cell emits its
    6 signed level contributions map-side (pre-aggregated per batch),
    a bucketed combine folds per block."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        frames = []
        for d in range(6):
            sx = 1 - 2 * ((cx >> (5 - d)) & 1)
            sy = 1 - 2 * ((cy >> (5 - d)) & 1)
            part = pd.DataFrame({
                "d": d, "px": cx >> (6 - d), "py": cy >> (6 - d),
                "a": n, "h": n * sx, "v": n * sy, "dd": n * sx * sy})
            frames.append(part.groupby(["d", "px", "py"], sort=False)
                          .sum().reset_index())
        return pd.concat(frames, ignore_index=True).astype(np.int64)

    tagged = grid.map_batches(emit, batch_format="pandas",
                              batch_size=65536)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["d", "px", "py"], sort=False)[
            ["a", "h", "v", "dd"]].sum().reset_index().astype(np.int64)

    return rel.bucketed_group_apply(tagged, ["d", "px", "py"], fold)


def SQL_HAAR():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
lv AS (SELECT dd.range AS d,
              cx >> CAST(6 - dd.range AS INTEGER) AS px,
              cy >> CAST(6 - dd.range AS INTEGER) AS py,
              n,
              1 - 2 * ((cx >> CAST(5 - dd.range AS INTEGER)) & 1) AS sx,
              1 - 2 * ((cy >> CAST(5 - dd.range AS INTEGER)) & 1) AS sy
       FROM g CROSS JOIN range(0, 6) dd)
SELECT d, px, py,
       CAST(SUM(n) AS BIGINT) AS a,
       CAST(SUM(n * sx) AS BIGINT) AS h,
       CAST(SUM(n * sy) AS BIGINT) AS v,
       CAST(SUM(n * sx * sy) AS BIGINT) AS dd
FROM lv GROUP BY d, px, py
"""


TRIPLE_K = 50


def q_basket_triples(sf_dir: str):
    """Frequent 3-itemsets (A-priori level 3 of basket_pairs): sorted
    part triples co-purchased within an order, global top-{TRIPLE_K}
    by (n DESC, a, b, c). Triple emission stays vectorized — the pair
    gap trick extended to gap pairs (d1 < d2 over the sorted basket
    run, unbounded like basket_pairs), no per-row Python; a (a,b,c)
    bucketed combine and
    a distributed sort-limit finish."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def dedup_batch(b: pa.Table) -> pa.Table:
        t = pa.table({"ok": pc.cast(b["l_orderkey"], pa.int64()),
                      "pk": pc.cast(b["l_partkey"], pa.int64())})
        return t.group_by(["ok", "pk"]).aggregate([])

    de = ds.map_batches(dedup_batch, batch_format="pyarrow",
                        batch_size=65536)

    def per_order(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["ok", "pk"])
        b = b.sort_values(["ok", "pk"], kind="stable")
        ok = b["ok"].to_numpy(np.int64)
        pk = b["pk"].to_numpy(np.int64)
        outs = []
        d2 = 2
        while len(ok) > d2:
            same = ok[d2:] == ok[:-d2]
            if not same.any():
                break
            for d1 in range(1, d2):
                m = same
                outs.append((pk[:-d2][m], pk[d1:len(pk) - d2 + d1][m],
                             pk[d2:][m]))
            d2 += 1
        cols = ("a", "b", "c")
        if not outs:
            return pd.DataFrame({k: np.empty(0, np.int64)
                                 for k in cols + ("n",)})
        df = pd.DataFrame({"a": np.concatenate([o[0] for o in outs]),
                           "b": np.concatenate([o[1] for o in outs]),
                           "c": np.concatenate([o[2] for o in outs])})
        g = df.groupby(["a", "b", "c"], sort=False).size() \
            .rename("n").reset_index()
        return g.astype(np.int64)

    parts = bucketed_group_apply(de, ["ok"], per_order)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["a", "b", "c"], sort=False)["n"].sum() \
            .reset_index().astype(np.int64)

    trips = bucketed_group_apply(parts, ["a", "b", "c"], combine)
    return trips.sort([("n"), ("a"), ("b"), ("c")],
                      descending=[True, False, False, False]) \
        .limit(TRIPLE_K)


SQL_BASKET_TRIPLES = f"""
WITH de AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem)
SELECT x.pk AS a, y.pk AS b, z.pk AS c, CAST(COUNT(*) AS BIGINT) AS n
FROM de x JOIN de y ON x.ok = y.ok AND x.pk < y.pk
          JOIN de z ON y.ok = z.ok AND y.pk < z.pk
GROUP BY x.pk, y.pk, z.pk
ORDER BY n DESC, a, b, c LIMIT {TRIPLE_K}
"""


def q_outliers(sf_dir: str):
    """Exact 3-sigma outlier detection per event_type: event i is an
    outlier iff n*(n*x_i - S)^2 > 9 * n * (n*SS - S^2), i.e.
    (x_i - mean)^2 > 9*variance with every division cleared (x in
    integer cents). Two passes: a tiny per-type moment fold, then a
    broadcast-scalar flag pass. Returns per-type totals plus the
    outlier event ids (deterministic complete set, not a sample)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "event_id",
                                     "value"])

    def moments(b: pa.Table) -> pd.DataFrame:
        et = b["event_type"].to_pandas().to_numpy(object)
        c = np.rint(b["value"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        d = pd.DataFrame({"event_type": et, "c": c})
        g = d.groupby("event_type", sort=False)["c"] \
            .agg(n="size", s="sum", ss=lambda v: int((v.to_numpy()
                                                      ** 2).sum()))
        return g.reset_index()

    parts = ds.map_batches(moments, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    tot = parts.groupby("event_type")[["n", "s", "ss"]].sum()
    stats = {et: (int(r["n"]), int(r["s"]), int(r["ss"]))
             for et, r in tot.iterrows()}
    import ray

    from pythongis_ray import state
    sref = ray.put(stats)

    def flag(b: pa.Table) -> pd.DataFrame:
        st = state.get_broadcast(sref, key_extra=("outl",))
        et = b["event_type"].to_pandas().to_numpy(object)
        eid = b["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = np.rint(b["value"].to_numpy(zero_copy_only=False)
                    * 100.0).astype(np.int64)
        n = np.array([st[e][0] for e in et], np.int64)
        s = np.array([st[e][1] for e in et], np.int64)
        ss = np.array([st[e][2] for e in et], np.int64)
        dev = n * c - s
        # object dtype: dev^2*n can exceed int64 at large n
        lhs = dev.astype(object) ** 2 * n.astype(object)
        rhs = 9 * n.astype(object) * (n.astype(object) * ss
                                      - s.astype(object) ** 2)
        keep = np.array([a > b_ for a, b_ in zip(lhs, rhs)], bool)
        return pd.DataFrame({"event_type": et[keep],
                             "event_id": eid[keep]})

    return ds.map_batches(flag, batch_format="pyarrow",
                          batch_size=65536)


SQL_OUTLIERS = """
WITH x AS (SELECT event_type, event_id,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s,
             SUM(c * c) AS ss
      FROM x GROUP BY event_type)
SELECT x.event_type, x.event_id
FROM x JOIN m USING (event_type)
WHERE CAST(m.n AS HUGEINT) * (m.n * x.c - m.s) * (m.n * x.c - m.s)
      > 9 * CAST(m.n AS HUGEINT) * (m.n * m.ss - m.s * m.s)
"""


def q_changepoint(sf_dir: str):
    """CUSUM change-point per event_type over the daily count series
    (global day range, zeros included): dev_k = nd*P_k - k*S for the
    prefix of the first k days; report the k maximizing |dev| (ties
    to the smallest k) with the signed dev — all exact integers.
    Shares the st_trend layout: one counts shuffle + two day-range
    scalars."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def tday(b: pa.Table) -> pd.DataFrame:
        et = b["event_type"].to_pandas().to_numpy(object)
        day = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        part = pd.DataFrame({"event_type": et, "day": day}) \
            .groupby(["event_type", "day"], sort=False).size() \
            .reset_index(name="n")
        return part

    parts = ds.map_batches(tday, batch_format="pyarrow",
                           batch_size=65536)
    cnt = rel.bucketed_group_apply(
        parts, ["event_type", "day"],
        lambda g: g.groupby(["event_type", "day"], sort=False)["n"]
        .sum().reset_index()).materialize()

    dd = cnt.map_batches(
        lambda b: pa.table({"lo": pa.array([int(pc.min(b["day"]).as_py())],
                                           pa.int64()),
                            "hi": pa.array([int(pc.max(b["day"]).as_py())],
                                           pa.int64())}),
        batch_format="pyarrow").to_pandas()
    dmin, dmax = int(dd["lo"].min()), int(dd["hi"].max())
    nd = dmax - dmin + 1

    def cusum(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            y = np.zeros(nd, np.int64)
            y[gg["day"].to_numpy(np.int64) - dmin] = \
                gg["n"].to_numpy(np.int64)
            s = int(y.sum())
            pk = np.cumsum(y)[:-1]          # prefixes k=1..nd-1
            k = np.arange(1, nd, dtype=np.int64)
            dev = nd * pk - k * s
            i = int(np.lexsort((k, -np.abs(dev)))[0])
            rows.append({"event_type": et, "k_star": int(k[i]),
                         "dev": int(dev[i]), "n_days": nd})
        cols = ("event_type", "k_star", "dev", "n_days")
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(cnt, ["event_type"], cusum)


def SQL_CHANGEPOINT():
    return """
WITH zd AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
            FROM events),
cnt AS (SELECT event_type, day, COUNT(*) AS n FROM zd GROUP BY 1, 2),
dd AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM cnt),
et AS (SELECT DISTINCT event_type FROM cnt),
fl AS (SELECT et.event_type, dr.range AS x, COALESCE(cnt.n, 0) AS y,
              dd.dmax - dd.dmin + 1 AS nd
       FROM et CROSS JOIN dd
       CROSS JOIN range(0, 4096) dr
       LEFT JOIN cnt ON cnt.event_type = et.event_type
                    AND cnt.day = dd.dmin + dr.range
       WHERE dr.range <= dd.dmax - dd.dmin),
pr AS (SELECT event_type, x + 1 AS k, nd,
              SUM(y) OVER (PARTITION BY event_type ORDER BY x) AS pk,
              SUM(y) OVER (PARTITION BY event_type) AS s
       FROM fl),
dev AS (SELECT event_type, k, nd, nd * pk - k * s AS dev
        FROM pr WHERE k < nd),
pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY abs(dev) DESC, k) AS rn FROM dev)
SELECT event_type, CAST(k AS BIGINT) AS k_star,
       CAST(dev AS BIGINT) AS dev, CAST(nd AS BIGINT) AS n_days
FROM pick WHERE rn = 1
"""


def q_chunk_docs(sf_dir: str):
    """RAG-prep chunking of documents: 64-token windows at stride 48
    with replayable rolling chunk hashes — see text.chunk_tokens.
    Chunk hash is the shingle fold (acc*1000003 + token_hash mod
    2^64) replayed over list slices in DuckDB."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.chunk_tokens(ds)


SQL_CHUNK_DOCS = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
hw AS (SELECT doc_id,
         [list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(w, '')]),
            (a, x) -> (a * 1099511628211 + x)
                      % CAST('18446744073709551616' AS HUGEINT))
          FOR w IN toks] AS thl,
         len(toks) AS n
       FROM d),
ch AS (SELECT doc_id, ci.range AS chunk_id,
              ci.range * {text.CHUNK_T} AS start_tok,
              least(n - ci.range * {text.CHUNK_T}, {text.CHUNK_W})
                AS n_tokens,
              thl, n
       FROM hw CROSS JOIN range(0, 4096) ci
       WHERE ci.range * {text.CHUNK_T} < n),
hh AS (SELECT doc_id, chunk_id, start_tok, n_tokens,
         list_reduce(list_prepend(CAST(0 AS HUGEINT),
             thl[start_tok + 1 : start_tok + n_tokens]),
             (a, x) -> (a * 1000003 + x)
                       % CAST('18446744073709551616' AS HUGEINT)) AS h
       FROM ch)
SELECT doc_id, chunk_id, start_tok, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
                 THEN h - CAST('18446744073709551616' AS HUGEINT)
                 ELSE h END AS BIGINT) AS chunk_hash
FROM hh
"""


def q_common_span(sf_dir: str):
    """Longest common consecutive token run per SimHash near-dup
    candidate pair (the plagiarism-span measure) — see
    text.common_span_pairs. Oracle: the simhash candidate CTEs plus
    a token-position match grid and diagonal gaps-and-islands."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.common_span_pairs(ds, max_hamming=8)


SQL_COMMON_SPAN = """
WITH RECURSIVE
""" + _SQL_SIMHASH_CTE + """,
sv AS (SELECT doc_id, u,
         CAST(u - CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS s
       FROM sh),
bands AS (SELECT doc_id, bp.bb AS band_id,
                 CAST((u // CAST(bp.p AS HUGEINT)) % 65536 AS BIGINT)
                   AS band_val, s
          FROM sv CROSS JOIN (VALUES (0, 1), (1, 65536),
                                     (2, 4294967296),
                                     (3, 281474976710656)) bp(bb, p)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                a.s AS sa, b.s AS sb
         FROM bands a JOIN bands b
           ON a.band_id = b.band_id AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id),
cp AS (SELECT id_a, id_b FROM cand
       WHERE bit_count(xor(sa, sb)) <= 8),
tp AS (SELECT doc_id, generate_subscripts(l, 1) AS i,
              UNNEST(l) AS word
       FROM toks),
tph AS (SELECT doc_id, i,
          list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(word, '')]),
            (acc, x) -> (acc * 1099511628211 + x)
                        % CAST('18446744073709551616' AS HUGEINT)) AS th
        FROM tp),
mm AS (SELECT c.id_a, c.id_b, a.i AS pa, b.i AS pb
       FROM cp c JOIN tph a ON a.doc_id = c.id_a
                 JOIN tph b ON b.doc_id = c.id_b AND b.th = a.th),
isl AS (SELECT id_a, id_b, pa - pb AS dg, pa,
               pa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, pa - pb
                                       ORDER BY pa) AS grp
        FROM mm),
runs AS (SELECT id_a, id_b, COUNT(*) AS rl
         FROM isl GROUP BY id_a, id_b, dg, grp)
SELECT id_a, id_b, CAST(MAX(rl) AS BIGINT) AS lcs_run
FROM runs GROUP BY id_a, id_b
"""


def q_morph_open(sf_dir: str):
    """Binary morphological OPENING of the occupancy footprint (cells
    with at least one point; 3x3 square element): erosion keeps a
    cell iff its full 3x3 neighborhood is occupied, dilation then
    unions the 3x3 neighborhoods of the eroded cells — two sparse
    stencil passes, each one bucketed shuffle. Opening is
    anti-extensive (result ⊆ footprint), so the output is every
    footprint cell with an in_opened flag — 0 marks the thin
    structures and boundary spurs the opening removed."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")])

    def footprint(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cx": b["cx"].to_numpy(np.int64),
                             "cy": b["cy"].to_numpy(np.int64)})

    mask = grid.map_batches(footprint, batch_format="pandas",
                            batch_size=65536).materialize()

    _OFF9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def emit9(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        tx = np.concatenate([cx + dx for dx, _ in _OFF9])
        ty = np.concatenate([cy + dy for _, dy in _OFF9])
        own = np.concatenate([np.full(len(b), int(dx == 0 and dy == 0),
                                      np.int64)
                              for dx, dy in _OFF9])
        return pd.DataFrame({"cx": tx, "cy": ty, "own": own})

    t1 = mask.map_batches(emit9, batch_format="pandas",
                          batch_size=65536)

    def erode(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["cx", "cy"])["own"].agg(["size", "max"])
        keep = agg[(agg["size"] == 9) & (agg["max"] == 1)]
        idx = keep.index.to_frame(index=False)
        return pd.DataFrame({"cx": idx["cx"].to_numpy(np.int64),
                             "cy": idx["cy"].to_numpy(np.int64)})

    eroded = rel.bucketed_group_apply(t1, ["cx", "cy"], erode)
    t2 = eroded.map_batches(emit9, batch_format="pandas",
                            batch_size=65536)

    def dilate(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["cx", "cy"])
        return pd.DataFrame({"cx": u["cx"].to_numpy(np.int64),
                             "cy": u["cy"].to_numpy(np.int64),
                             "tag": np.ones(len(u), np.int64)})

    opened = rel.bucketed_group_apply(t2, ["cx", "cy"], dilate)

    def tag_m(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cx": b["cx"].to_numpy(np.int64),
                             "cy": b["cy"].to_numpy(np.int64),
                             "tag": np.zeros(len(b), np.int64)})

    both = opened.union(mask.map_batches(tag_m, batch_format="pandas"))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["cx", "cy"])["tag"].agg(["max", "min"])
        keep = agg[agg["min"] == 0]      # footprint cells only
        idx = keep.index.to_frame(index=False)
        return pd.DataFrame({
            "cx": idx["cx"].to_numpy(np.int64),
            "cy": idx["cy"].to_numpy(np.int64),
            "in_opened": (keep["max"] == 1).to_numpy(np.int64)})

    return rel.bucketed_group_apply(both, ["cx", "cy"], finish)


def SQL_MORPH_OPEN():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
a AS (SELECT DISTINCT ix // 8192 AS cx, iy // 8192 AS cy FROM pts),
er AS (SELECT a1.cx, a1.cy FROM a a1
       WHERE 9 = (SELECT COUNT(*) FROM a a2
                  WHERE abs(a2.cx - a1.cx) <= 1
                    AND abs(a2.cy - a1.cy) <= 1)),
op AS (SELECT DISTINCT er.cx + o.dx AS cx, er.cy + o.dy AS cy
       FROM er CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                  (0,1),(1,-1),(1,0),(1,1)) o(dx, dy))
SELECT a.cx, a.cy,
       CAST(CASE WHEN op.cx IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS in_opened
FROM a LEFT JOIN op ON a.cx = op.cx AND a.cy = op.cy
"""


def q_line_of_sight(sf_dir: str):
    """Inter-city line-of-sight over the density DEM: for every pair
    of the 6 densest cells (ties lex), the sight line between cell
    centers is blocked by any WALL cell (density n*N > 4*S, endpoint
    cells excluded) whose closed square intersects the segment. The
    intersection predicate is the exact integer SAT test on doubled
    coordinates (bbox overlap + all-four-corners-on-one-side line
    test) — identical in the oracle. Wall cells stream through one
    map_batches against the 15 broadcast pairs; the driver folds
    per-pair blocker counts."""
    import ray

    from pythongis_ray import state

    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()
    tp = grid.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    top = grid.sort([("n"), ("cx"), ("cy")],
                    descending=[True, False, False]).limit(6) \
        .to_pandas()
    cities = sorted((int(r.cx), int(r.cy)) for r in top.itertuples())
    pairs = [(a, b) for i, a in enumerate(cities)
             for b in cities[i + 1:]]
    pref = ray.put(pairs)

    def blockers(b: pd.DataFrame) -> pd.DataFrame:
        prs = state.get_broadcast(pref, key_extra=("los",))
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        wall = n * nc > 4 * s
        wx, wy = cx[wall], cy[wall]
        rows = []
        for pi, (a, c) in enumerate(prs):
            p0x, p0y = 2 * a[0] + 1, 2 * a[1] + 1
            p1x, p1y = 2 * c[0] + 1, 2 * c[1] + 1
            m = ~(((wx == a[0]) & (wy == a[1]))
                  | ((wx == c[0]) & (wy == c[1])))
            bx0, by0 = 2 * wx[m], 2 * wy[m]
            bx1, by1 = bx0 + 2, by0 + 2
            bb = ~((max(p0x, p1x) < bx0) | (min(p0x, p1x) > bx1)
                   | (max(p0y, p1y) < by0) | (min(p0y, p1y) > by1))
            dx, dy = p1x - p0x, p1y - p0y

            def f(qx, qy):
                return dx * (qy - p0y) - dy * (qx - p0x)

            f1 = f(bx0, by0)
            f2 = f(bx1, by0)
            f3 = f(bx0, by1)
            f4 = f(bx1, by1)
            allpos = (f1 > 0) & (f2 > 0) & (f3 > 0) & (f4 > 0)
            allneg = (f1 < 0) & (f2 < 0) & (f3 < 0) & (f4 < 0)
            hit = bb & ~allpos & ~allneg
            rows.append({"pi": pi, "nb": int(hit.sum())})
        return pd.DataFrame(rows, columns=["pi", "nb"])

    parts = grid.map_batches(blockers, batch_format="pandas",
                             batch_size=65536).to_pandas()
    nb = parts.groupby("pi")["nb"].sum()
    return pa.table({
        "ax": pa.array([a[0] for a, _ in pairs], pa.int64()),
        "ay": pa.array([a[1] for a, _ in pairs], pa.int64()),
        "bx": pa.array([c[0] for _, c in pairs], pa.int64()),
        "by_": pa.array([c[1] for _, c in pairs], pa.int64()),
        "n_blockers": pa.array([int(nb.get(i, 0))
                                for i in range(len(pairs))], pa.int64()),
        "blocked": pa.array([int(nb.get(i, 0) > 0)
                             for i in range(len(pairs))], pa.int64())})


def SQL_LINE_OF_SIGHT():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
t AS (SELECT COUNT(*) AS nc, SUM(n) AS s FROM g),
top6 AS (SELECT cx, cy FROM g ORDER BY n DESC, cx, cy LIMIT 6),
prs AS (SELECT a.cx AS acx, a.cy AS acy, b.cx AS bcx, b.cy AS bcy
        FROM top6 a JOIN top6 b
          ON a.cx < b.cx OR (a.cx = b.cx AND a.cy < b.cy)),
walls AS (SELECT cx, cy FROM g, t WHERE n * nc > 4 * s),
hits AS (SELECT p.acx, p.acy, p.bcx, p.bcy, COUNT(w.cx) AS nb
         FROM prs p LEFT JOIN walls w
           ON NOT (w.cx = p.acx AND w.cy = p.acy)
          AND NOT (w.cx = p.bcx AND w.cy = p.bcy)
          AND NOT (greatest(2*p.acx+1, 2*p.bcx+1) < 2*w.cx
                   OR least(2*p.acx+1, 2*p.bcx+1) > 2*w.cx + 2
                   OR greatest(2*p.acy+1, 2*p.bcy+1) < 2*w.cy
                   OR least(2*p.acy+1, 2*p.bcy+1) > 2*w.cy + 2)
          AND NOT (
            ((2*p.bcx - 2*p.acx) * (2*w.cy - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx - 2*p.acx - 1) > 0
             AND (2*p.bcx - 2*p.acx) * (2*w.cy - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx + 2 - 2*p.acx - 1) > 0
             AND (2*p.bcx - 2*p.acx) * (2*w.cy + 2 - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx - 2*p.acx - 1) > 0
             AND (2*p.bcx - 2*p.acx) * (2*w.cy + 2 - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx + 2 - 2*p.acx - 1) > 0)
            OR
            ((2*p.bcx - 2*p.acx) * (2*w.cy - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx - 2*p.acx - 1) < 0
             AND (2*p.bcx - 2*p.acx) * (2*w.cy - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx + 2 - 2*p.acx - 1) < 0
             AND (2*p.bcx - 2*p.acx) * (2*w.cy + 2 - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx - 2*p.acx - 1) < 0
             AND (2*p.bcx - 2*p.acx) * (2*w.cy + 2 - 2*p.acy - 1)
             - (2*p.bcy - 2*p.acy) * (2*w.cx + 2 - 2*p.acx - 1) < 0))
         GROUP BY p.acx, p.acy, p.bcx, p.bcy)
SELECT acx AS ax, acy AS ay, bcx AS bx, bcy AS by_,
       CAST(nb AS BIGINT) AS n_blockers,
       CAST(CASE WHEN nb > 0 THEN 1 ELSE 0 END AS BIGINT) AS blocked
FROM hits
"""


def q_winsor_mean(sf_dir: str):
    """Winsorized robust mean per event_type: clamp value cents to
    the discrete P10/P90 (the mad_events quantile convention,
    sv[max(0, ceil(p*n)-1)]) and report the exact clamped integer sum
    — the mean stays a deferred single division. One bucketed
    per-type sort."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            c = np.rint(gg["value"].to_numpy() * 100.0) \
                .astype(np.int64)
            sv = np.sort(c)
            n = len(sv)
            p10 = int(sv[max(0, -(-n // 10) - 1)])
            p90 = int(sv[max(0, -(-(9 * n) // 10) - 1)])
            w = np.clip(c, p10, p90)
            rows.append({"event_type": et, "n": n,
                         "p10_cents": p10, "p90_cents": p90,
                         "wsum_cents": int(w.sum())})
        cols = ("event_type", "n", "p10_cents", "p90_cents",
                "wsum_cents")
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(ds, ["event_type"], per_type)


SQL_WINSOR_MEAN = """
WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type, quantile_disc(c, 0.1) AS p10,
             quantile_disc(c, 0.9) AS p90
      FROM v GROUP BY event_type)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ANY_VALUE(m.p10) AS BIGINT) AS p10_cents,
       CAST(ANY_VALUE(m.p90) AS BIGINT) AS p90_cents,
       CAST(SUM(least(greatest(v.c, m.p10), m.p90)) AS BIGINT)
         AS wsum_cents
FROM v JOIN m USING (event_type) GROUP BY v.event_type
"""


def q_capacity_assign(sf_dir: str):
    """Capacitated facility allocation: customers go to their nearest
    of the 6 densest cells (squared lattice distance, ties to the
    lower city index), each city capped at C = n_customers // 6; the
    overflow (per-city rank by (d2, custkey) beyond C) retries its
    SECOND-nearest city against the capacity left from round 1;
    still-unassigned get city -1. Two bucketed rank shuffles plus a
    6-number capacity fold — the global greedy is replaced by this
    deterministic 2-round spec so both engines replay it exactly.
    Returns (ck, city, rnd)."""
    import ray

    from pythongis_ray import state

    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    grid = rel.groupby_aggregate(
        pts.map_batches(cellify, batch_format="pyarrow",
                        batch_size=65536),
        ["cx", "cy"], [("n", "cx", "count")])
    top = grid.sort([("n"), ("cx"), ("cy")],
                    descending=[True, False, False]).limit(6) \
        .to_pandas()
    cities = sorted((int(r.cx), int(r.cy)) for r in top.itertuples())
    # city reference point = center of the cell in lattice units
    cpts = np.array([[cx * 8192 + 4096, cy * 8192 + 4096]
                     for cx, cy in cities], np.int64)
    cref = ray.put(cpts)

    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    ncust = cust.count()
    cap = ncust // 6

    def dists(batch: pa.Table) -> pd.DataFrame:
        cp = state.get_broadcast(cref, key_extra=("capassign",))
        k = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 1)
        d2 = (ix[:, None] - cp[None, :, 0]) ** 2 \
            + (iy[:, None] - cp[None, :, 1]) ** 2
        order = np.argsort(d2, axis=1, kind="stable")
        i1, i2 = order[:, 0], order[:, 1]
        r = np.arange(len(k))
        return pd.DataFrame({"ck": k * 4 + 1,
                             "ci1": i1.astype(np.int64),
                             "d1": d2[r, i1], "ci2": i2.astype(np.int64),
                             "d2_": d2[r, i2]})

    dd = cust.map_batches(dists, batch_format="pyarrow",
                          batch_size=65536)

    def rank1(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ci, gg in g.groupby("ci1", sort=False):
            gg = gg.sort_values(["d1", "ck"], kind="stable")
            pos = np.arange(1, len(gg) + 1, dtype=np.int64)
            out.append(gg.assign(pos=pos))
        return pd.concat(out, ignore_index=True)

    r1 = rel.bucketed_group_apply(dd, ["ci1"], rank1).materialize()

    acounts = r1.map_batches(
        lambda b: b.loc[b["pos"] <= cap].groupby("ci1").size()
        .reset_index(name="m"),
        batch_format="pandas").to_pandas()
    used = acounts.groupby("ci1")["m"].sum() if len(acounts) else {}
    rem = {ci: cap - int(used.get(ci, 0)) for ci in range(6)}
    rref = ray.put(rem)

    def emit1(b: pd.DataFrame) -> pd.DataFrame:
        a = b[b["pos"] <= cap]
        return pd.DataFrame({"ck": a["ck"].to_numpy(np.int64),
                             "city": a["ci1"].to_numpy(np.int64),
                             "rnd": np.ones(len(a), np.int64)})

    part1 = r1.map_batches(emit1, batch_format="pandas")

    def spill(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["pos"] > cap][["ck", "ci2", "d2_"]]

    sp = r1.map_batches(spill, batch_format="pandas")

    def rank2(g: pd.DataFrame) -> pd.DataFrame:
        rm = state.get_broadcast(rref, key_extra=("caprem",))
        out = []
        for ci, gg in g.groupby("ci2", sort=False):
            gg = gg.sort_values(["d2_", "ck"], kind="stable")
            pos2 = np.arange(1, len(gg) + 1, dtype=np.int64)
            ok = pos2 <= rm[int(ci)]
            out.append(pd.DataFrame({
                "ck": gg["ck"].to_numpy(np.int64),
                "city": np.where(ok, int(ci), -1).astype(np.int64),
                "rnd": np.where(ok, 2, 0).astype(np.int64)}))
        if not out:
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in ("ck", "city", "rnd")})
        return pd.concat(out, ignore_index=True)

    part2 = rel.bucketed_group_apply(sp, ["ci2"], rank2)
    return part1.union(part2)


def SQL_CAPACITY_ASSIGN():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS gx, iy // 8192 AS gy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
top6 AS (SELECT gx, gy FROM g ORDER BY n DESC, gx, gy LIMIT 6),
cities AS (SELECT gx * 8192 + 4096 AS px, gy * 8192 + 4096 AS py,
                  ROW_NUMBER() OVER (ORDER BY gx, gy) - 1 AS ci
           FROM top6),
cap AS (SELECT COUNT(*) // 6 AS c FROM customer),
cp AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
d AS (SELECT cp.ck, c.ci,
             (cp.ix - c.px) * (cp.ix - c.px)
               + (cp.iy - c.py) * (cp.iy - c.py) AS d2,
             ROW_NUMBER() OVER (PARTITION BY cp.ck
                                ORDER BY (cp.ix - c.px) * (cp.ix - c.px)
                                       + (cp.iy - c.py) * (cp.iy - c.py),
                                         c.ci) AS rnk
      FROM cp CROSS JOIN cities c),
r1 AS (SELECT ck, ci, d2,
              ROW_NUMBER() OVER (PARTITION BY ci ORDER BY d2, ck)
                AS pos
       FROM d WHERE rnk = 1),
a1 AS (SELECT ck, ci AS city, 1 AS rnd FROM r1, cap
       WHERE pos <= cap.c),
rem AS (SELECT c.ci, cap.c - COUNT(r1.ck) AS r
        FROM cities c CROSS JOIN cap
        LEFT JOIN r1 ON r1.ci = c.ci AND r1.pos <= cap.c
        GROUP BY c.ci, cap.c),
sp AS (SELECT r1.ck, d.ci AS ci2, d.d2 AS d22
       FROM r1 CROSS JOIN cap
       JOIN d ON d.ck = r1.ck AND d.rnk = 2
       WHERE r1.pos > cap.c),
r2 AS (SELECT sp.*, rem.r,
              ROW_NUMBER() OVER (PARTITION BY sp.ci2
                                 ORDER BY sp.d22, sp.ck) AS pos2
       FROM sp JOIN rem ON rem.ci = sp.ci2),
a2 AS (SELECT ck, CASE WHEN pos2 <= r THEN ci2 ELSE -1 END AS city,
              CASE WHEN pos2 <= r THEN 2 ELSE 0 END AS rnd
       FROM r2)
SELECT ck, CAST(city AS BIGINT) AS city, CAST(rnd AS BIGINT) AS rnd
FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
"""


def q_flow_raster(sf_dir: str):
    """Flow-map rasterization: the top-10 OD flows (od_matrix zones,
    ties lex) are burned onto the 64x64-unit zone grid — every zone
    cell whose closed square intersects the center-to-center segment
    (the line_of_sight SAT predicate on doubled coords) accumulates
    that flow's count. Output (zx, zy, flow). Candidate cells come
    from each pair's bbox (vectorized meshgrid per pair — bounded by
    extent, not data)."""
    od = q_od_matrix(sf_dir).to_pandas()
    od = od[od["zf"] != od["zt"]]
    od = od.sort_values(["n", "zf", "zt"],
                        ascending=[False, True, True]).head(10)

    acc: dict = {}
    for r in od.itertuples():
        za = (int(r.zf) // 64, int(r.zf) % 64)
        zb = (int(r.zt) // 64, int(r.zt) % 64)
        n = int(r.n)
        p0 = (2 * za[0] + 1, 2 * za[1] + 1)
        p1 = (2 * zb[0] + 1, 2 * zb[1] + 1)
        x0, x1 = sorted((za[0], zb[0]))
        y0, y1 = sorted((za[1], zb[1]))
        gx, gy = np.meshgrid(np.arange(x0, x1 + 1),
                             np.arange(y0, y1 + 1), indexing="ij")
        gx, gy = gx.ravel(), gy.ravel()
        bx0, by0 = 2 * gx, 2 * gy
        bx1, by1 = bx0 + 2, by0 + 2
        bb = ~((max(p0[0], p1[0]) < bx0) | (min(p0[0], p1[0]) > bx1)
               | (max(p0[1], p1[1]) < by0) | (min(p0[1], p1[1]) > by1))
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]

        def f(qx, qy):
            return dx * (qy - p0[1]) - dy * (qx - p0[0])

        f1, f2 = f(bx0, by0), f(bx1, by0)
        f3, f4 = f(bx0, by1), f(bx1, by1)
        allpos = (f1 > 0) & (f2 > 0) & (f3 > 0) & (f4 > 0)
        allneg = (f1 < 0) & (f2 < 0) & (f3 < 0) & (f4 < 0)
        hit = bb & ~allpos & ~allneg
        for x, y in zip(gx[hit], gy[hit]):
            acc[(int(x), int(y))] = acc.get((int(x), int(y)), 0) + n
    ks = sorted(acc)
    return pa.table({"zx": pa.array([k[0] for k in ks], pa.int64()),
                     "zy": pa.array([k[1] for k in ks], pa.int64()),
                     "flow": pa.array([acc[k] for k in ks],
                                      pa.int64())})


def SQL_FLOW_RASTER():
    od = SQL_OD_MATRIX().strip()
    return f"""
WITH od AS ({od}),
top10 AS (SELECT zf, zt, n FROM od WHERE zf <> zt
          ORDER BY n DESC, zf, zt LIMIT 10),
seg AS (SELECT zf // 64 AS ax, zf % 64 AS ay,
               zt // 64 AS bx, zt % 64 AS by_, n
        FROM top10),
cand AS (SELECT s.*, gx.range AS zx, gy.range AS zy
         FROM seg s
         CROSS JOIN range(0, 64) gx CROSS JOIN range(0, 64) gy
         WHERE gx.range BETWEEN least(s.ax, s.bx)
                            AND greatest(s.ax, s.bx)
           AND gy.range BETWEEN least(s.ay, s.by_)
                            AND greatest(s.ay, s.by_)),
hit AS (SELECT zx, zy, n FROM cand
        WHERE NOT (greatest(2*ax+1, 2*bx+1) < 2*zx
                   OR least(2*ax+1, 2*bx+1) > 2*zx + 2
                   OR greatest(2*ay+1, 2*by_+1) < 2*zy
                   OR least(2*ay+1, 2*by_+1) > 2*zy + 2)
          AND NOT (
            ((2*bx-2*ax) * (2*zy-2*ay-1) - (2*by_-2*ay) * (2*zx-2*ax-1) > 0
             AND (2*bx-2*ax) * (2*zy-2*ay-1)
                 - (2*by_-2*ay) * (2*zx+2-2*ax-1) > 0
             AND (2*bx-2*ax) * (2*zy+2-2*ay-1)
                 - (2*by_-2*ay) * (2*zx-2*ax-1) > 0
             AND (2*bx-2*ax) * (2*zy+2-2*ay-1)
                 - (2*by_-2*ay) * (2*zx+2-2*ax-1) > 0)
            OR
            ((2*bx-2*ax) * (2*zy-2*ay-1) - (2*by_-2*ay) * (2*zx-2*ax-1) < 0
             AND (2*bx-2*ax) * (2*zy-2*ay-1)
                 - (2*by_-2*ay) * (2*zx+2-2*ax-1) < 0
             AND (2*bx-2*ax) * (2*zy+2-2*ay-1)
                 - (2*by_-2*ay) * (2*zx-2*ax-1) < 0
             AND (2*bx-2*ax) * (2*zy+2-2*ay-1)
                 - (2*by_-2*ay) * (2*zx+2-2*ax-1) < 0)))
SELECT zx, zy, CAST(SUM(n) AS BIGINT) AS flow
FROM hit GROUP BY zx, zy
"""


def q_kd_partition(sf_dir: str):
    """Balanced kd-tree partitioning of customer points (the spatial
    load-balancing shard assignment): three alternating median splits
    (x, then y per half, then x per quarter; discrete median =
    sorted[ceil(n/2)-1], point goes left iff coord <= median) give
    every point a leaf id 0..7. Each round is ONE histogram fold —
    per-leaf coordinate bincounts are extent-bounded (2^19), so the
    medians come from a driver-side cumulative scan of partials,
    never a per-leaf sort. Returns (ck, leaf)."""
    import ray

    from pythongis_ray import state

    cust = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])

    def to_pts(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 1)
        return pa.table({"ck": pa.array(k * 4 + 1),
                         "x": pa.array(ix), "y": pa.array(iy)})

    pts = cust.map_batches(to_pts, batch_format="pyarrow",
                           batch_size=65536).materialize()

    LX2 = 1 << 19
    splits: dict = {}     # (depth, leaf-prefix) -> median

    for d in range(3):
        sref = ray.put(dict(splits))

        def hist(batch: pa.Table, _d=d, _s=sref) -> pd.DataFrame:
            sp = state.get_broadcast(_s, key_extra=("kd", _d))
            x = batch["x"].to_numpy(zero_copy_only=False)
            y = batch["y"].to_numpy(zero_copy_only=False)
            lab = np.zeros(len(x), np.int64)
            for dd in range(_d):
                coord = x if dd % 2 == 0 else y
                med = np.array([sp[(dd, int(p))]
                                for p in range(1 << dd)], np.int64)
                b = (coord > med[lab]).astype(np.int64)
                lab = lab * 2 + b
            coord = x if _d % 2 == 0 else y
            c = np.bincount(lab * LX2 + coord,
                            minlength=(1 << _d) * LX2)
            nz = np.flatnonzero(c)
            return pd.DataFrame({"k": nz.astype(np.int64),
                                 "c": c[nz].astype(np.int64)})

        parts = pts.map_batches(hist, batch_format="pyarrow",
                                batch_size=65536).to_pandas()
        agg = parts.groupby("k")["c"].sum()
        for p in range(1 << d):
            sel = agg[(agg.index >= p * LX2)
                      & (agg.index < (p + 1) * LX2)]
            n = int(sel.sum())
            target = -(-n // 2)          # ceil(n/2)
            cum = sel.cumsum()
            med_key = int(cum.index[np.searchsorted(
                cum.to_numpy(), target)])
            splits[(d, p)] = med_key - p * LX2

    fref = ray.put(dict(splits))

    def assign(batch: pa.Table) -> pa.Table:
        sp = state.get_broadcast(fref, key_extra=("kdf",))
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        lab = np.zeros(len(x), np.int64)
        for dd in range(3):
            coord = x if dd % 2 == 0 else y
            med = np.array([sp[(dd, int(p))] for p in range(1 << dd)],
                           np.int64)
            b = (coord > med[lab]).astype(np.int64)
            lab = lab * 2 + b
        return pa.table({"ck": batch["ck"],
                         "leaf": pa.array(lab)})

    return pts.map_batches(assign, batch_format="pyarrow",
                           batch_size=65536)


def SQL_KD_PARTITION():
    return f"""
WITH cp AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
p AS (SELECT ck, ix AS x, iy AS y FROM cp),
m1 AS (SELECT quantile_disc(x, 0.5) AS mx FROM p),
l1 AS (SELECT p.*, CASE WHEN p.x <= m1.mx THEN 0 ELSE 1 END AS b1
       FROM p, m1),
m2 AS (SELECT b1, quantile_disc(y, 0.5) AS my FROM l1 GROUP BY b1),
l2 AS (SELECT l1.*, CASE WHEN l1.y <= m2.my THEN 0 ELSE 1 END AS b2
       FROM l1 JOIN m2 USING (b1)),
m3 AS (SELECT b1, b2, quantile_disc(x, 0.5) AS mx2 FROM l2
       GROUP BY b1, b2),
l3 AS (SELECT l2.*, CASE WHEN l2.x <= m3.mx2 THEN 0 ELSE 1 END AS b3
       FROM l2 JOIN m3 USING (b1, b2))
SELECT ck, CAST(b1 * 4 + b2 * 2 + b3 AS BIGINT) AS leaf FROM l3
"""


RRF_C = 60
RRF_SCALE = 1_000_000


def q_rrf_fuse(sf_dir: str):
    """Reciprocal-rank fusion of the two retrieval pipelines (integer
    BM25 top-k and the inverted-index tf-idf top-k): each list is
    ranked by (score DESC, doc_id) and a doc's fused score is
    sum over lists of RRF_SCALE // (RRF_C + rank) — the classic RRF
    with the division floored so everything stays integer. Top-10 by
    (fused DESC, doc_id)."""
    b = q_bm25_topk(sf_dir).to_pandas() \
        .sort_values(["score", "doc_id"], ascending=[False, True])
    s = q_search_topk(sf_dir)
    s = (s.to_pandas() if hasattr(s, "to_pandas") else s) \
        .sort_values(["score", "doc_id"], ascending=[False, True])
    fused: dict = {}
    for lst in (b, s):
        for rank, did in enumerate(lst["doc_id"].astype(int), 1):
            fused[did] = fused.get(did, 0) + RRF_SCALE // (RRF_C + rank)
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf": pa.array([v for _, v in top], pa.int64())})


def SQL_RRF_FUSE():
    b = get_oracle_sql_one("bm25_topk")
    s = get_oracle_sql_one("indexed_search")
    return f"""
WITH bl AS ({b}),
sl AS ({s}),
br AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
         AS rnk FROM bl),
sr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
         AS rnk FROM sl),
u AS (SELECT * FROM br UNION ALL SELECT * FROM sr),
f AS (SELECT doc_id, SUM({RRF_SCALE} // ({RRF_C} + rnk)) AS rrf
      FROM u GROUP BY doc_id)
SELECT doc_id, CAST(rrf AS BIGINT) AS rrf
FROM f ORDER BY rrf DESC, doc_id LIMIT 10
"""


def get_oracle_sql_one(name: str) -> str:
    fn, sql = REGISTRY[name]
    return (sql() if callable(sql) else sql).strip().rstrip(";")


RING_VNODES = 64


def q_hash_ring(sf_dir: str):
    """Consistent-hash ring assignment (the distributed-systems
    placement op): {RING_VNODES} virtual nodes hash the literal
    strings 'node<i>' with the corpus token hash followed by one
    Knuth multiplicative mixing step (the raw fold keeps suffix
    digits in the low bits and clusters the ring); every distinct
    event_type||'-'||user_id key routes to the successor vnode
    (smallest vnode hash >= key hash, wrapping to the global min).
    Returns per key: (key, vnode). Vnode table is broadcast; keys
    stream."""
    import ray

    from pythongis_ray import state

    def _h(sx: str) -> int:
        h = 0
        for ch in sx.encode():
            h = (h * 1099511628211 + ch) % (1 << 64)
        return (h * 2862933555777941757) % (1 << 64)

    vn = sorted((_h(f"node{i}"), i) for i in range(RING_VNODES))
    vh = np.array([h for h, _ in vn], np.uint64)
    vi = np.array([i for _, i in vn], np.int64)
    vref = ray.put((vh, vi))

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def keys(b: pa.Table) -> pd.DataFrame:
        et = b["event_type"].to_pandas().to_numpy(object)
        uid = b["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = np.array([f"{e}-{u}" for e, u in zip(et, uid)], object)
        return pd.DataFrame({"key": k}).drop_duplicates()

    raw = ds.map_batches(keys, batch_format="pyarrow",
                         batch_size=65536)
    uniq = rel.bucketed_group_apply(
        raw, ["key"], lambda g: g.drop_duplicates(ignore_index=True))

    def route(b: pd.DataFrame) -> pd.DataFrame:
        vhh, vii = state.get_broadcast(vref, key_extra=("ring",))
        ks = b["key"].to_numpy(object)
        hs = np.array([_h(s) for s in ks], np.uint64)
        pos = np.searchsorted(vhh, hs, "left")
        pos[pos == len(vhh)] = 0
        return pd.DataFrame({"key": ks,
                             "vnode": vii[pos].astype(np.int64)})

    return uniq.map_batches(route, batch_format="pandas",
                            batch_size=65536)


def SQL_HASH_RING():
    return f"""
WITH vn AS (SELECT v.range AS i,
              (list_reduce(list_prepend(CAST(0 AS HUGEINT),
                [CAST(ascii(c) AS HUGEINT)
                 FOR c IN string_split('node' || CAST(v.range AS VARCHAR),
                                       '')]),
                (a, x) -> (a * 1099511628211 + x)
                          % CAST('18446744073709551616' AS HUGEINT))
               * 2862933555777941757)
              % CAST('18446744073709551616' AS HUGEINT) AS h
            FROM range(0, {RING_VNODES}) v),
k AS (SELECT DISTINCT event_type || '-' || CAST(user_id AS VARCHAR)
        AS key FROM events),
kh AS (SELECT key,
         (list_reduce(list_prepend(CAST(0 AS HUGEINT),
           [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(key, '')]),
           (a, x) -> (a * 1099511628211 + x)
                     % CAST('18446744073709551616' AS HUGEINT))
          * 2862933555777941757)
         % CAST('18446744073709551616' AS HUGEINT) AS h
       FROM k),
succ AS (SELECT kh.key,
           COALESCE((SELECT MIN(vn.h) FROM vn WHERE vn.h >= kh.h),
                    (SELECT MIN(h) FROM vn)) AS vh
         FROM kh)
SELECT succ.key, CAST(vn.i AS BIGINT) AS vnode
FROM succ JOIN vn ON vn.h = succ.vh
"""


def q_skyline_depth(sf_dir: str):
    """Onion peeling (Pareto depth): the first three skyline layers
    of users on (n_events, sum_cents), maximizing both — layer 1 is
    the skyline, layer 2 the skyline of the rest, etc. Each peel
    reuses the distributed block-local-frontier skyline; the removed
    frontier is an antichain (tiny), so the between-layer filter is a
    broadcast id set, never a shuffle. Returns (user_id, n_events,
    sum_cents, layer)."""
    import ray

    from pythongis_ray import state

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        y = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64),
            "n_events": np.ones(len(y), np.int64), "sum_cents": y})
        return df.groupby("user_id", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    cur = rel.bucketed_group_apply(
        parts, ["user_id"],
        lambda g: g.groupby("user_id", sort=False).sum()
        .reset_index().astype(np.int64)).materialize()

    outs = []
    for layer in (1, 2, 3):
        front = rel.skyline(cur, "n_events", "sum_cents").materialize()
        fp = front.to_pandas()

        def tag(b: pd.DataFrame, _l=layer) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": b["user_id"].to_numpy(np.int64),
                "n_events": b["n_events"].to_numpy(np.int64),
                "sum_cents": b["sum_cents"].to_numpy(np.int64),
                "layer": np.full(len(b), _l, np.int64)})

        outs.append(front.map_batches(tag, batch_format="pandas"))
        if layer == 3:
            break
        fref = ray.put(fp["user_id"].to_numpy(np.int64))

        def drop(b: pd.DataFrame, _r=fref, _l=layer) -> pd.DataFrame:
            gone = state.get_broadcast(_r, key_extra=("peel", _l))
            return b[~b["user_id"].isin(gone).to_numpy()]

        cur = cur.map_batches(drop, batch_format="pandas") \
            .materialize()
    out = outs[0].union(outs[1]).union(outs[2])
    return out


SQL_SKYLINE_DEPTH = """
WITH x AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS sum_cents
           FROM events GROUP BY user_id),
l1 AS (SELECT * FROM x a WHERE NOT EXISTS (
         SELECT 1 FROM x b
         WHERE b.n_events >= a.n_events AND b.sum_cents >= a.sum_cents
           AND (b.n_events > a.n_events OR b.sum_cents > a.sum_cents))),
r1 AS (SELECT x.* FROM x
       WHERE NOT EXISTS (SELECT 1 FROM l1
                         WHERE l1.user_id = x.user_id)),
l2 AS (SELECT * FROM r1 a WHERE NOT EXISTS (
         SELECT 1 FROM r1 b
         WHERE b.n_events >= a.n_events AND b.sum_cents >= a.sum_cents
           AND (b.n_events > a.n_events OR b.sum_cents > a.sum_cents))),
r2 AS (SELECT r1.* FROM r1
       WHERE NOT EXISTS (SELECT 1 FROM l2
                         WHERE l2.user_id = r1.user_id)),
l3 AS (SELECT * FROM r2 a WHERE NOT EXISTS (
         SELECT 1 FROM r2 b
         WHERE b.n_events >= a.n_events AND b.sum_cents >= a.sum_cents
           AND (b.n_events > a.n_events OR b.sum_cents > a.sum_cents)))
SELECT user_id, n_events, sum_cents, CAST(1 AS BIGINT) AS layer FROM l1
UNION ALL
SELECT user_id, n_events, sum_cents, CAST(2 AS BIGINT) FROM l2
UNION ALL
SELECT user_id, n_events, sum_cents, CAST(3 AS BIGINT) FROM l3
"""


def q_flow_direction(sf_dir: str):
    """Net flow direction per origin zone (directional statistics of
    the OD matrix): integer vector sums sdx = Σ n*(bx-ax),
    sdy = Σ n*(by-ay) over outgoing flows (self-flows excluded) plus
    the outgoing total — the mean direction stays a deferred
    division/atan2."""
    od = q_od_matrix(sf_dir)

    def direct(b: pd.DataFrame) -> pd.DataFrame:
        zf = b["zf"].to_numpy(np.int64)
        zt = b["zt"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        m = zf != zt
        zf, zt, n = zf[m], zt[m], n[m]
        dx = (zt // 64) - (zf // 64)
        dy = (zt % 64) - (zf % 64)
        d = pd.DataFrame({"zf": zf, "n": n, "sdx": n * dx,
                          "sdy": n * dy})
        return d.groupby("zf", sort=False).sum().reset_index() \
            .astype(np.int64)

    parts = od.map_batches(direct, batch_format="pandas",
                           batch_size=65536)
    return rel.bucketed_group_apply(
        parts, ["zf"],
        lambda g: g.groupby("zf", sort=False).sum().reset_index()
        .astype(np.int64))


def SQL_FLOW_DIRECTION():
    return f"""
WITH od AS ({SQL_OD_MATRIX().strip()})
SELECT zf, CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(n * ((zt // 64) - (zf // 64))) AS BIGINT) AS sdx,
       CAST(SUM(n * ((zt % 64) - (zf % 64))) AS BIGINT) AS sdy
FROM od WHERE zf <> zt GROUP BY zf
"""


def q_ppjoin(sf_dir: str):
    """Prefix-filtered set-similarity self-join (AllPairs/PPJoin,
    Bayardo WWW'07) over 5-token shingle sets at Jaccard >= 0.4 —
    the sparse-index alternative beside ngram_jaccard's full inverted
    index and minhash's LSH: each doc indexes only its n-ceil(t*n)+1
    rarest shingles (global df-ascending order), buckets apply the
    min>=t*max length filter, exact verify on the tiny candidate set.
    Reference near-dup analogue: duplicates-by-geometry grouping
    (/root/reference/pythongis/vector/data.py:990)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return rel.driver_safe(
        text.ppjoin_pairs(ds, threshold=0.4),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("jaccard", pa.float64())]))


SQL_PPJOIN = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.4
"""


SNM_WINDOW = 5


def q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995):
    ONE exact global rank by the blocking key (n_chars, doc_id), then
    candidate pairs are rows within rank distance w=5. Distribution:
    the two-pass range ranking (rel.add_global_rank) → rows bucketed
    by rank block; each block's first w rows are REPLICATED into the
    previous block as halo (ghost) rows so boundary pairs are emitted
    exactly once, by the earlier row's home block — ranks are dense,
    so in-block matching is pure position arithmetic, no search."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    ranked = rel.add_global_rank(ds, ["n_chars", "doc_id"], out_col="rn")
    W, BLK = SNM_WINDOW, 512

    def route(b: pd.DataFrame) -> pd.DataFrame:
        rn = b["rn"].to_numpy(np.int64)
        home = (rn - 1) // BLK
        halo = ((rn - 1) % BLK < W) & (home > 0)
        out = pd.DataFrame({
            "doc_id": np.concatenate([b["doc_id"].to_numpy(np.int64),
                                      b["doc_id"].to_numpy(np.int64)[halo]]),
            "n_chars": np.concatenate([b["n_chars"].to_numpy(np.int64),
                                       b["n_chars"].to_numpy(np.int64)[halo]]),
            "rn": np.concatenate([rn, rn[halo]]),
            "_blk": np.concatenate([home, home[halo] - 1]),
            "_home": np.concatenate([np.ones(len(rn), bool),
                                     np.zeros(int(halo.sum()), bool)]),
        })
        return out

    routed = ranked.map_batches(route, batch_format="pandas",
                                batch_size=65536)

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        # one hash bucket may hold SEVERAL rank blocks (and a row's
        # home + halo copies live in adjacent blocks) — pair strictly
        # within each block so every pair is emitted exactly once
        outs = []
        for _, g in bucket.groupby("_blk", sort=False):
            g = g.sort_values("rn", kind="stable").reset_index(drop=True)
            rn = g["rn"].to_numpy(np.int64)
            ids = g["doc_id"].to_numpy(np.int64)
            nc = g["n_chars"].to_numpy(np.int64)
            home = g["_home"].to_numpy(bool)
            for gap in range(1, W + 1):
                if gap >= len(rn):
                    break
                a = np.arange(len(rn) - gap)
                b = a + gap
                keep = home[a] & (rn[b] == rn[a] + gap)
                outs.append(pd.DataFrame({
                    "id_a": ids[a][keep], "id_b": ids[b][keep],
                    "gap": np.full(int(keep.sum()), gap, np.int64),
                    "cdiff": np.abs(nc[b][keep] - nc[a][keep]),
                }))
        if not outs:
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "gap": np.empty(0, np.int64),
                                 "cdiff": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    out = rel.bucketed_group_apply(routed, ["_blk"], pairs)
    snm_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("gap", pa.int64()), ("cdiff", pa.int64())])
    return rel.driver_safe(
        rel.with_empty_schema(out, snm_schema), snm_schema)


SQL_SNM_PAIRS = f"""
WITH r AS (SELECT doc_id, n_chars,
                  ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
           FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(b.rn - a.rn AS BIGINT) AS gap,
       CAST(ABS(b.n_chars - a.n_chars) AS BIGINT) AS cdiff
FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNM_WINDOW}
"""


def q_weighted_sample(sf_dir: str, k: int = 25):
    """Bottom-k weighted priority sampling (Cohen & Kaplan 2007,
    integer variant): priority = (uhash(doc_id)//2) // weight with
    weight = n_chars, global k smallest win — long documents are
    proportionally more likely to be drawn, yet the draw is
    deterministic, mergeable and cluster-size-independent (each
    block keeps its local k smallest; the driver merges B×k rows).
    The oracle replays the byte-level hash and the same floor
    divisions in HUGEINT SQL."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])

    def pri(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        b2 = pa.table({"s": pc.cast(batch["doc_id"], pa.string())})
        uh = _uhash_col(b2, "s")
        prio = ((uh >> np.uint64(1)).astype(np.int64) // w)
        t = pa.table({"doc_id": ids, "n_chars": w, "priority": prio})
        # local partial top-k: only each block's k smallest survive
        df = t.to_pandas().sort_values(["priority", "doc_id"]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(pri, batch_format="pyarrow", batch_size=8192)
    return parts.sort(["priority", "doc_id"]).limit(k)


def SQL_WEIGHTED_SAMPLE():
    uh = _sql_polyhash("CAST(doc_id AS VARCHAR)")
    return f"""
WITH h AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(n_chars AS BIGINT) AS n_chars,
                  {uh} AS uh
           FROM documents)
SELECT doc_id, n_chars,
       CAST((uh // 2) // n_chars AS BIGINT) AS priority
FROM h ORDER BY priority, doc_id LIMIT 25
"""


KTRUSS_K, KTRUSS_ROUNDS = 4, 3


def q_ktruss(sf_dir: str):
    """4-truss of the undirected page link graph (Cohen 2008):
    iteratively drop edges in fewer than 2 triangles, 3 simultaneous
    rounds (the SQL replays the SAME cap, so truncation can never
    diverge); surviving edges with their final support. The stricter
    sibling of q_kcore for mining cohesive communities / link
    farms."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    return rel.driver_safe(
        graph.ktruss(edges, src="src_page", dst="dst_page",
                     k=KTRUSS_K, max_rounds=KTRUSS_ROUNDS),
        pa.schema([("u", pa.int64()), ("v", pa.int64()),
                   ("support", pa.int64())]))


def _sql_ktruss(k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS,
                edges_sql: str = _SQL_PAGE_EDGES) -> str:
    head = f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({edges_sql}) WHERE src <> dst)"""
    step = """,
t{r} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e{p} e1 JOIN e{p} e2 ON e2.u = e1.v
       JOIN e{p} e3 ON e3.u = e1.u AND e3.v = e2.v),
e{r} AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT a AS u, b AS v FROM t{r}
    UNION ALL SELECT b, c FROM t{r}
    UNION ALL SELECT a, c FROM t{r})
  GROUP BY u, v HAVING COUNT(*) >= {t})"""
    body = "".join(step.format(r=r, p=r - 1, t=k - 2)
                   for r in range(1, rounds + 1))
    return head + body + f""",
tf AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e{rounds} e1 JOIN e{rounds} e2 ON e2.u = e1.v
       JOIN e{rounds} e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(COUNT(*) AS BIGINT) AS support
FROM (SELECT a AS u, b AS v FROM tf
      UNION ALL SELECT b, c FROM tf
      UNION ALL SELECT a, c FROM tf)
GROUP BY u, v"""


def q_clustering_coeff(sf_dir: str):
    """Local clustering coefficient per page (exact integer ppm of
    2·tri/(deg·(deg-1)), deg >= 2) over the undirected link graph —
    the classic cohesion feature beside PageRank/HITS for spam and
    community analysis. Triangles enumerated once via the wedge join
    + closing-edge probe; node triangle counts are HALF the sum of
    incident-edge supports (each triangle covers two incident edges),
    so the per-node reduce needs no third join."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    return graph.clustering_coefficient(edges, src="src_page",
                                        dst="dst_page")


def _sql_clustering_coeff(edges_sql: str = _SQL_PAGE_EDGES) -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM ({edges_sql}) WHERE src <> dst),
deg AS (SELECT node, COUNT(*) AS deg FROM (
          SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY node),
t AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
tc AS (SELECT node, COUNT(*) AS tri FROM (
         SELECT a AS node FROM t
         UNION ALL SELECT b FROM t
         UNION ALL SELECT c FROM t)
       GROUP BY node)
SELECT CAST(d.node AS BIGINT) AS node,
       CAST(COALESCE(tc.tri, 0) AS BIGINT) AS tri,
       CAST(d.deg AS BIGINT) AS deg,
       CAST(2 * COALESCE(tc.tri, 0) * 1000000
            // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tc ON tc.node = d.node
WHERE d.deg >= 2"""


VORONOI_SITES = 6


def q_voronoi_cells(sf_dir: str):
    """Voronoi allocation over the terrain grid (the service-area /
    nearest-facility raster op the reference's `distance` surface
    gestures at, /root/reference/pythongis/raster/analyzer.py): the
    {VORONOI_SITES} densest cells (ties lex) are sites; every
    occupied grid cell is assigned to the site with the smallest
    squared center distance (ties → best-ranked site), then one
    per-site combine reports cell count and population. Sites are a
    driver-side top-6 (tiny by construction) broadcast into a
    vectorized argmin map — the grid itself never co-locates."""
    import ray

    from pythongis_ray import state

    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()

    top = grid.to_pandas().sort_values(
        ["n", "cx", "cy"], ascending=[False, True, True],
        kind="stable").head(VORONOI_SITES).reset_index(drop=True)
    sx = top["cx"].to_numpy(np.int64)
    sy = top["cy"].to_numpy(np.int64)
    sites_ref = ray.put((sx, sy))

    def assign(batch: pa.Table) -> pd.DataFrame:
        ssx, ssy = state.get_broadcast(sites_ref, key_extra=("voronoi",))
        cx = batch["cx"].to_numpy(zero_copy_only=False)
        cy = batch["cy"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        dx = cx[:, None] - ssx[None, :]
        dy = cy[:, None] - ssy[None, :]
        d2 = dx * dx + dy * dy
        site = np.argmin(d2, axis=1) + 1     # argmin takes FIRST min: tie → best rank
        df = pd.DataFrame({"site": site.astype(np.int64), "n": n})
        return df.groupby("site", sort=False).agg(
            n_cells=("n", "size"), sum_n=("n", "sum")).reset_index() \
            .astype(np.int64)

    parts = grid.map_batches(assign, batch_format="pyarrow",
                             batch_size=65536)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("site", sort=False)[["n_cells", "sum_n"]].sum() \
            .reset_index().astype(np.int64)
        out["sx"] = sx[out["site"].to_numpy() - 1]
        out["sy"] = sy[out["site"].to_numpy() - 1]
        return out[["site", "sx", "sy", "n_cells", "sum_n"]]

    return rel.bucketed_group_apply(parts, ["site"], combine)


def SQL_VORONOI_CELLS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY ix // 8192, iy // 8192),
sites AS (SELECT cx AS sx, cy AS sy,
                 ROW_NUMBER() OVER (ORDER BY n DESC, cx, cy) AS rk
          FROM g ORDER BY n DESC, cx, cy LIMIT {VORONOI_SITES}),
d AS (SELECT g.cx, g.cy, g.n, s.rk,
             (g.cx - s.sx) * (g.cx - s.sx)
             + (g.cy - s.sy) * (g.cy - s.sy) AS d2
      FROM g CROSS JOIN sites s),
a AS (SELECT cx, cy, n, rk,
             ROW_NUMBER() OVER (PARTITION BY cx, cy ORDER BY d2, rk) AS rn
      FROM d)
SELECT CAST(s.rk AS BIGINT) AS site, CAST(s.sx AS BIGINT) AS sx,
       CAST(s.sy AS BIGINT) AS sy,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(a.n) AS BIGINT) AS sum_n
FROM a JOIN sites s ON s.rk = a.rk
WHERE a.rn = 1 GROUP BY s.rk, s.sx, s.sy"""


ITEM_COS_K, ITEM_COS_MIN_CO = 20, 2


def q_item_cosine(sf_dir: str):
    """Item-item cosine similarity from co-purchase baskets (the
    neighborhood-model recommender prep): for part pairs co-bought in
    >= {ITEM_COS_MIN_CO} orders, exact squared cosine of the binary
    order-incidence vectors as integer ppm — cos² = co²/(na·nb), so
    floor(co²·10⁶/(na·nb)) needs no square root. Pair emission is
    bounded by basket size² inside the order-keyed bucket; supports
    (na) are a part-vocabulary-bounded table broadcast into the
    scoring map; top-{ITEM_COS_K} by (cos² desc, a, b) via a
    distributed sort-limit."""
    import ray

    from pythongis_ray import state
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def dedup_batch(b: pa.Table) -> pa.Table:
        t = pa.table({"ok": pc.cast(b["l_orderkey"], pa.int64()),
                      "pk": pc.cast(b["l_partkey"], pa.int64())})
        return t.group_by(["ok", "pk"]).aggregate([])

    de = ds.map_batches(dedup_batch, batch_format="pyarrow",
                        batch_size=65536)

    # GLOBAL (ok, pk) dedup: batch-level dedup_batch misses duplicates
    # that straddle block boundaries, which would inflate the supports
    # (na, nb) vs the oracle's SELECT DISTINCT. Bucketing by ok
    # co-locates every copy of an (ok, pk) pair, so one in-bucket
    # drop_duplicates is exact; the same table then feeds both the
    # support count and the pair emission (one shuffle each).
    de = bucketed_group_apply(
        de, ["ok"],
        lambda g: g.drop_duplicates(["ok", "pk"])).materialize()

    sup = rel.groupby_aggregate(de, ["pk"], [("n", "ok", "count")]) \
        .to_pandas()                       # part vocabulary: bounded
    sup_arr = np.zeros(int(sup["pk"].max()) + 1, np.int64)
    sup_arr[sup["pk"].to_numpy(np.int64)] = sup["n"].to_numpy(np.int64)
    sup_ref = ray.put(sup_arr)

    def per_order(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["ok", "pk"])
        b = b.sort_values(["ok", "pk"], kind="stable")
        ok = b["ok"].to_numpy(np.int64)
        pk = b["pk"].to_numpy(np.int64)
        outs = []
        d = 1
        while True:
            msk = ok[d:] == ok[:-d]
            if not msk.any():
                break
            outs.append((pk[:-d][msk], pk[d:][msk]))
            d += 1
        if not outs:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "co": np.empty(0, np.int64)})
        df = pd.DataFrame({"a": np.concatenate([o[0] for o in outs]),
                           "b": np.concatenate([o[1] for o in outs])})
        return df.groupby(["a", "b"], sort=False).size().rename("co") \
            .reset_index().astype(np.int64)

    pair_parts = bucketed_group_apply(de, ["ok"], per_order)

    def combine_score(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["a", "b"], sort=False)["co"].sum().reset_index()
        c = c[c["co"] >= ITEM_COS_MIN_CO]
        if len(c) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "co": np.empty(0, np.int64),
                                 "cos2_ppm": np.empty(0, np.int64)})
        s = state.get_broadcast(sup_ref, key_extra=("itemcos",))
        a = c["a"].to_numpy(np.int64)
        b = c["b"].to_numpy(np.int64)
        co = c["co"].to_numpy(np.int64)
        c["cos2_ppm"] = co * co * 1_000_000 // (s[a] * s[b])
        return c.astype(np.int64)

    scored = bucketed_group_apply(pair_parts, ["a", "b"], combine_score)
    scored = rel.with_empty_schema(scored, pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("co", pa.int64()),
         ("cos2_ppm", pa.int64())]))
    return scored.sort(["cos2_ppm", "a", "b"],
                       descending=[True, False, False]).limit(ITEM_COS_K)


SQL_ITEM_COSINE = f"""
WITH de AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
co AS (SELECT a.pk AS a, b.pk AS b, COUNT(*) AS co
       FROM de a JOIN de b ON a.ok = b.ok AND a.pk < b.pk
       GROUP BY a.pk, b.pk),
sup AS (SELECT pk, COUNT(*) AS n FROM de GROUP BY pk)
SELECT CAST(co.a AS BIGINT) AS a, CAST(co.b AS BIGINT) AS b,
       CAST(co.co AS BIGINT) AS co,
       CAST(co.co * co.co * 1000000 // (sa.n * sb.n) AS BIGINT) AS cos2_ppm
FROM co JOIN sup sa ON sa.pk = co.a JOIN sup sb ON sb.pk = co.b
WHERE co.co >= {ITEM_COS_MIN_CO}
ORDER BY cos2_ppm DESC, a, b LIMIT {ITEM_COS_K}
"""


def q_containment(sf_dir: str):
    """Asymmetric shingle containment pairs (|Sa∩Sb| >= 0.8·|Sa|) —
    subset-duplicate detection (wrapper/boilerplate-superset pages)
    that symmetric Jaccard misses; Broder's containment measure.
    Exact integer ppm; ordered output (a contained in b)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return rel.driver_safe(
        text.containment_pairs(ds, threshold_ppm=800_000),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("cont_ppm", pa.int64())]))


SQL_CONTAINMENT = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                    i -> array_to_string(toks[i:i+4], ' ')))
        END AS sh
      FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) * 1000000
            // len(a.sh) AS BIGINT) AS cont_ppm
FROM s a JOIN s b ON a.doc_id <> b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 1000000 >= 800000 * len(a.sh)
"""


CRAWL_BUDGET_K = 1000


def q_crawl_budget(sf_dir: str):
    """Proportional crawl-budget apportionment across hosts by the
    largest-remainder (Hamilton) method: {CRAWL_BUDGET_K} crawl slots
    split over hosts proportional to page counts — quota = floor(K·n/T)
    plus one extra for the K - Σfloor largest remainders (K·n mod T,
    ties → smaller host). The politeness-scheduler front half of a
    crawler. Page counts reduce distributed (host-bounded partials);
    the apportionment itself runs on the tiny host table."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def cnt(batch: pa.Table) -> pd.DataFrame:
        h = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) % 50
        u, c = np.unique(h, return_counts=True)
        return pd.DataFrame({"host": u, "n": c.astype(np.int64)})

    parts = ds.map_batches(cnt, batch_format="pyarrow", batch_size=65536)
    hosts = rel.bucketed_group_apply(
        parts, ["host"],
        lambda g: g.groupby("host", sort=False)["n"].sum().reset_index()) \
        .to_pandas()                      # host-bounded (50 rows)
    K = CRAWL_BUDGET_K
    n = hosts["n"].to_numpy(np.int64)
    T = int(n.sum())
    fl = K * n // T
    rem = K * n % T
    extra = K - int(fl.sum())
    order = np.lexsort((hosts["host"].to_numpy(np.int64), -rem))
    quota = fl.copy()
    quota[order[:extra]] += 1
    out = pd.DataFrame({"host": hosts["host"].to_numpy(np.int64),
                        "n": n, "quota": quota})
    return out.sort_values("host").reset_index(drop=True)


SQL_CRAWL_BUDGET = f"""
WITH c AS (SELECT CAST(doc_id % 50 AS BIGINT) AS host,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY doc_id % 50),
t AS (SELECT c.*, SUM(n) OVER () AS tot,
             {CRAWL_BUDGET_K} * n // SUM(n) OVER () AS fl,
             {CRAWL_BUDGET_K} * n % SUM(n) OVER () AS rem
      FROM c),
r AS (SELECT t.*, ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk,
             SUM(fl) OVER () AS sumfl
      FROM t)
SELECT host, n,
       CAST(fl + CASE WHEN rk <= {CRAWL_BUDGET_K} - sumfl
                 THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
"""


LANDMARK_S, LANDMARK_ITERS = 3, 8


def q_landmark_dist(sf_dir: str):
    """Landmark distance features + harmonic centrality surrogate
    (the sketch-based centrality/embedding prep): hop distances from
    {LANDMARK_S} landmark seed sets (page_id % 97 == l) computed in
    ONE resident-shard run — the vector-state Pregel pattern: edges
    route once, all frontiers advance together. harmonic =
    Σ_l 10⁶ // d_l over reached landmarks at positive distance
    (exact integer). Unreached distances report the 2^40 sentinel."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.multi_bfs_actors(edges, src="src_page", dst="dst_page",
                                 seed_mod=BFS_SEED_MOD,
                                 n_landmarks=LANDMARK_S,
                                 iters=LANDMARK_ITERS)

    def score(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        ds_ = [b[f"d{l}"].to_numpy(zero_copy_only=False).astype(np.int64)
               for l in range(LANDMARK_S)]
        harm = np.zeros(len(node), np.int64)
        for d in ds_:
            ok = (d > 0) & (d < graph.BFS_INF)
            harm[ok] += 1_000_000 // d[ok]
        cols = {"node": pa.array(node)}
        for l, d in enumerate(ds_):
            cols[f"d{l}"] = pa.array(d)
        cols["harmonic"] = pa.array(harm)
        return pa.table(cols)

    return out.map_batches(score, batch_format="pyarrow",
                           batch_size=65536)


def _sql_landmark_dist(iters: int = LANDMARK_ITERS,
                       seed_mod: int = BFS_SEED_MOD,
                       n_land: int = LANDMARK_S,
                       edges_sql: str = _SQL_PAGE_EDGES) -> str:
    inf = 1 << 40
    head = f"""
WITH e AS MATERIALIZED ({edges_sql}),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e)"""
    chains = []
    for l in range(n_land):
        chains.append(f""",
l{l}d0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN node % {seed_mod} = {l} THEN 0
                         ELSE {inf} END AS BIGINT) AS dist
  FROM nodes)""")
        for k in range(1, iters + 1):
            chains.append(f""",
l{l}d{k} AS MATERIALIZED (
  SELECT n.node,
         CAST(LEAST(MIN(dn.dist),
                    COALESCE(MIN(ds.dist + 1), {inf})) AS BIGINT)
           AS dist
  FROM nodes n JOIN l{l}d{k - 1} dn ON dn.node = n.node
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN l{l}d{k - 1} ds ON ds.node = e.src
  GROUP BY n.node)""")
    sel_d = ", ".join(f"l{l}.dist AS d{l}" for l in range(n_land))
    harm = " + ".join(
        f"CASE WHEN l{l}.dist > 0 AND l{l}.dist < {inf} "
        f"THEN 1000000 // l{l}.dist ELSE 0 END"
        for l in range(n_land))
    joins = " ".join(f"JOIN l{l}d{iters} l{l} ON l{l}.node = n.node"
                     for l in range(n_land))
    return head + "".join(chains) + f"""
SELECT n.node, {sel_d}, CAST({harm} AS BIGINT) AS harmonic
FROM nodes n {joins}"""


def q_ann_recall(sf_dir: str):
    """ANN quality evaluation as a first-class pipeline: recall@5 of
    the LSH-bucketed search against the exact quantized top-5, per
    query (recall_pct = 20·|approx ∩ exact|). Both sides are
    deterministic integer pipelines, so even the EVALUATION is
    oracle-replayable — the harness pattern for tuning n_planes /
    nprobe at corpus scale."""
    emb_e = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    emb_l = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 8)])
    ex = embed.ann_topk(emb_e, qdf, k=5)[["query_id", "neighbor_id"]]
    ap = embed.ann_lsh(emb_l, qdf, k=5)[["query_id", "neighbor_id"]]
    hit = ex.merge(ap, on=["query_id", "neighbor_id"], how="inner") \
        .groupby("query_id").size().rename("n_hit")
    out = pd.DataFrame({"query_id": np.sort(qdf["vec_id"]
                                            .to_numpy(np.int64))})
    out["n_hit"] = out["query_id"].map(hit).fillna(0).astype(np.int64)
    out["recall_pct"] = out["n_hit"] * 20
    return out


def _sql_ann_recall(k: int = 5, n_planes: int = 16, dim: int = 64) -> str:
    from pythongis_ray import embed as _embed

    planes = _embed.lsh_planes(n_planes, dim)
    rows = ",\n    ".join(
        f"({j}, [{', '.join(map(str, planes[j].tolist()))}])"
        for j in range(n_planes))
    return f"""
WITH planes(j, p) AS (VALUES
    {rows}),
eq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(CAST(x AS DOUBLE) * 1000)) AS e
  FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM eq WHERE vec_id < 8),
ex_scored AS (
  SELECT q.query_id, eq.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe, eq.e) AS BIGINT) AS score
  FROM q CROSS JOIN eq WHERE eq.vec_id != q.query_id),
ex_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS rank
    FROM ex_scored) WHERE rank <= {k}),
buck AS (
  SELECT eq.vec_id,
         CAST(SUM(CASE WHEN list_dot_product(eq.e, p.p) > 0
                  THEN 1 << p.j ELSE 0 END) AS BIGINT) AS b
  FROM eq CROSS JOIN planes p GROUP BY eq.vec_id),
qb AS (SELECT DISTINCT b FROM buck WHERE vec_id < 8),
cand AS (
  SELECT eq.vec_id, eq.e FROM eq
  JOIN buck ON buck.vec_id = eq.vec_id
  JOIN qb ON qb.b = buck.b),
ap_scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe, c.e) AS BIGINT) AS score
  FROM q CROSS JOIN cand c WHERE c.vec_id != q.query_id),
ap_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS rank
    FROM ap_scored) WHERE rank <= {k})
SELECT q.query_id,
       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hit,
       CAST(COUNT(ap.neighbor_id) * 20 AS BIGINT) AS recall_pct
FROM q
LEFT JOIN ex_top ex ON ex.query_id = q.query_id
LEFT JOIN ap_top ap ON ap.query_id = ex.query_id
                   AND ap.neighbor_id = ex.neighbor_id
GROUP BY q.query_id"""


def q_two_hop(sf_dir: str):
    """Distinct two-hop reachability size per page (the
    friend-of-friend / crawl-frontier fan-out feature): |{w : u→v→w}|
    over the distinct link graph. One partitioned join builds the
    2-paths, a keyed dedup collapses parallel mid-nodes, one bucketed
    count finishes — no state beyond the narrow pair stream."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply, join_large

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)

    def as_uv(batch: pa.Table) -> pa.Table:
        t = pa.table({"u": pc.cast(batch["src_page"], pa.int64()),
                      "v": pc.cast(batch["dst_page"], pa.int64())})
        return t.group_by(["u", "v"]).aggregate([])

    def as_vw(batch: pa.Table) -> pa.Table:
        t = pa.table({"v": pc.cast(batch["src_page"], pa.int64()),
                      "w": pc.cast(batch["dst_page"], pa.int64())})
        return t.group_by(["v", "w"]).aggregate([])

    e1 = rel.dedup(edges.map_batches(as_uv, batch_format="pyarrow",
                                     batch_size=65536), ["u", "v"])
    e2 = rel.dedup(edges.map_batches(as_vw, batch_format="pyarrow",
                                     batch_size=65536), ["v", "w"])
    paths = join_large(e1, e2, on="v", num_buckets=16)
    uw = rel.dedup(paths.map_batches(
        lambda b: b.select(["u", "w"]), batch_format="pyarrow",
        batch_size=65536), ["u", "w"])

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("u", sort=False).size()
        return pd.DataFrame({"node": c.index.to_numpy(np.int64),
                             "two_hop": c.to_numpy(np.int64)})

    return rel.bucketed_group_apply(uw, ["u"], cnt)


def _sql_two_hop(edges_sql: str = _SQL_PAGE_EDGES) -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ({edges_sql}))
SELECT CAST(e1.src AS BIGINT) AS node,
       CAST(COUNT(DISTINCT e2.dst) AS BIGINT) AS two_hop
FROM e e1 JOIN e e2 ON e2.src = e1.dst
GROUP BY e1.src"""


COST_DIST_ROUNDS, COST_DIST_SEEDS = 12, 3
_COST_INF = 1 << 40


def q_cost_distance(sf_dir: str):
    """Accumulated-cost surface (the GIS cost-distance op the
    reference's distance/spread analyses build toward,
    /root/reference/pythongis/raster/analyzer.py): from the
    {COST_DIST_SEEDS} densest cells (cost 0), spread over 8-neighbor
    moves where entering a cell costs its point count; min-plus,
    {COST_DIST_ROUNDS} simultaneous rounds (SQL replays the same
    cap; unreached cells keep the 2^40 sentinel). The grid is
    cell-bounded, so the rounds run vectorized on the materialized
    cell table (searchsorted neighbor index built once) — the same
    honest pattern as q_flow_acc; at continental raster scale the
    resident-shard min-plus engine (graph.bfs_actors) takes over."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grid = rel.groupby_aggregate(cells, ["cx", "cy"],
                                 [("n", "cx", "count")]).materialize()

    def rounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cx", "cy"], kind="stable") \
            .reset_index(drop=True)
        cx = g["cx"].to_numpy(np.int64)
        cy = g["cy"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        key = cx * (np.int64(1) << 32) + cy
        # top seeds by (n desc, cx, cy)
        order = np.lexsort((cy, cx, -n))
        seed_idx = order[:COST_DIST_SEEDS]
        cost = np.full(len(g), np.int64(_COST_INF))
        cost[seed_idx] = 0
        # neighbor index: for each cell, positions of its 8 neighbors
        nbrs = np.full((len(g), 8), -1, np.int64)
        for d, (dx, dy) in enumerate([(-1, -1), (-1, 0), (-1, 1),
                                      (0, -1), (0, 1),
                                      (1, -1), (1, 0), (1, 1)]):
            tkey = (cx + dx) * (np.int64(1) << 32) + (cy + dy)
            pos = np.searchsorted(key, tkey)
            pos = np.clip(pos, 0, len(key) - 1)
            ok = key[pos] == tkey
            nbrs[ok, d] = pos[ok]
        for _ in range(COST_DIST_ROUNDS):
            best = cost.copy()
            for d in range(8):
                has = nbrs[:, d] >= 0
                cand = cost[nbrs[has, d]]
                reach = cand < _COST_INF
                upd = np.where(reach, cand + n[has], np.int64(_COST_INF))
                np.minimum.at(best, np.flatnonzero(has), upd)
            if (best == cost).all():
                break
            cost = best
        return pd.DataFrame({"cx": cx, "cy": cy, "n": n, "cost": cost})

    return grid.repartition(1).map_batches(
        rounds, batch_format="pandas", batch_size=1 << 30)


def SQL_COST_DISTANCE():
    inf = _COST_INF
    head = f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS MATERIALIZED (
  SELECT ix // 8192 AS cx, iy // 8192 AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY ix // 8192, iy // 8192),
seeds AS (SELECT cx, cy FROM g
          ORDER BY n DESC, cx, cy LIMIT {COST_DIST_SEEDS}),
nb AS MATERIALIZED (
  SELECT a.cx, a.cy, b.cx AS nx, b.cy AS ny
  FROM g a JOIN g b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
   AND NOT (a.cx = b.cx AND a.cy = b.cy)),
c0 AS MATERIALIZED (
  SELECT g.cx, g.cy,
         CAST(CASE WHEN s.cx IS NOT NULL THEN 0
                   ELSE {inf} END AS BIGINT) AS cost
  FROM g LEFT JOIN seeds s ON s.cx = g.cx AND s.cy = g.cy)"""
    step = f""",
c{{k}} AS MATERIALIZED (
  SELECT g.cx, g.cy,
         CAST(LEAST(MIN(p.cost),
              COALESCE(MIN(CASE WHEN pn.cost < {inf}
                           THEN pn.cost + g.n END), {inf}))
           AS BIGINT) AS cost
  FROM g JOIN c{{p}} p ON p.cx = g.cx AND p.cy = g.cy
  LEFT JOIN nb ON nb.cx = g.cx AND nb.cy = g.cy
  LEFT JOIN c{{p}} pn ON pn.cx = nb.nx AND pn.cy = nb.ny
  GROUP BY g.cx, g.cy)"""
    body = "".join(step.format(k=k, p=k - 1)
                   for k in range(1, COST_DIST_ROUNDS + 1))
    return head + body + f"""
SELECT g.cx, g.cy, g.n, c.cost
FROM g JOIN c{COST_DIST_ROUNDS} c ON c.cx = g.cx AND c.cy = g.cy"""


UPTIME_W_US = 600_000_000


def q_interval_union(sf_dir: str):
    """Per-user interval-UNION length (the uptime / active-time op —
    the measure counterpart of the interval-overlap join): each event
    opens a 10-minute activity window; overlapping windows must not
    double-count. Fixed width means start-sorted windows are also
    end-sorted, so the union telescopes: covered += end - max(start,
    prev_end) — ONE user-keyed co-location, one in-bucket shift, no
    sweep structure."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("user_id", "ts"))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        s = g["ts_us"].to_numpy(np.int64)
        e = s + UPTIME_W_US
        pe = np.empty(len(g), np.int64)
        pe[0] = s[0]
        pe[1:] = e[:-1]
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        pe[first] = s[first]
        inc = e - np.maximum(s, pe)
        out = pd.DataFrame({"user_id": u, "inc": inc})
        c = out.groupby("user_id", sort=False)["inc"].sum()
        return pd.DataFrame({"user_id": c.index.to_numpy(np.int64),
                             "uptime_us": c.to_numpy(np.int64)})

    return bucketed_group_apply(ds, ["user_id"], per_bucket)


SQL_INTERVAL_UNION = f"""
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {UPTIME_W_US} AS e
            FROM events),
o AS (SELECT user_id, s, e,
             LAG(e) OVER (PARTITION BY user_id ORDER BY s, e) AS pe
      FROM iv)
SELECT user_id,
       CAST(SUM(e - GREATEST(s, COALESCE(pe, s))) AS BIGINT) AS uptime_us
FROM o GROUP BY user_id
"""


def q_decay_score(sf_dir: str):
    """Recency-weighted engagement score with EXACT exponential decay:
    half-life = 1 day via integer bit shift — score = Σ cents(value)
    // 2^age_days, age anchored at the corpus max day (one tiny
    global-max reduce broadcast into the scoring pass). The
    recommender/feed-ranking freshness op, with none of the float
    drift decay scores usually carry."""
    ds = _events_us(sf_dir, cols=("user_id", "ts", "value"))

    day_ds = ds.map_batches(
        lambda b: pa.table({"d": pa.array([
            int(b["ts_us"].to_numpy(zero_copy_only=False).max()
                // 86_400_000_000) if len(b) else -1], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)
    max_day = int(day_ds.to_pandas()["d"].max())

    def score(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy(np.int64)
        day = b["ts_us"].to_numpy(np.int64) // 86_400_000_000
        age = np.minimum(max_day - day, 62)
        cents = np.round(b["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        dec = cents // (np.int64(1) << age)
        out = pd.DataFrame({"user_id": u, "s": dec})
        c = out.groupby("user_id", sort=False)["s"].sum()
        return pd.DataFrame({"user_id": c.index.to_numpy(np.int64),
                             "decay_score": c.to_numpy(np.int64)})

    parts = ds.map_batches(score, batch_format="pandas",
                           batch_size=65536)
    return rel.bucketed_group_apply(
        parts, ["user_id"],
        lambda g: g.groupby("user_id", sort=False)["decay_score"]
        .sum().reset_index())


SQL_DECAY_SCORE = """
WITH mx AS (SELECT MAX(epoch_us(ts)) // 86400000000 AS max_day
            FROM events)
SELECT user_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)
            // (CAST(1 AS BIGINT) << LEAST(
                 mx.max_day - epoch_us(ts) // 86400000000, 62)))
         AS BIGINT) AS decay_score
FROM events CROSS JOIN mx
GROUP BY user_id
"""


def q_quad_fit(sf_dir: str):
    """EXACT degree-2 least squares per event type (y = a + b·x +
    c·x², x = hour of day, y = value cents): the normal-equation
    solution as four integer determinants via Cramer's rule —
    coefficients are the exact rationals Da/D, Db/D, Dc/D with no
    float matrix solve anywhere. Moments (Σx^k, Σx^k·y, k ≤ 4) are
    int64-safe distributed partials; the 3×3 determinants exceed
    int64 (~10^29) so the per-group finalize computes them in
    arbitrary-precision Python ints and reports DECIMAL STRINGS,
    mirrored by HUGEINT arithmetic + CAST(… AS VARCHAR) in the
    oracle."""
    ds = _events_us(sf_dir, cols=("ts", "event_type", "value"))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        x = (b["ts_us"].to_numpy(np.int64) // 3_600_000_000) % 24
        y = np.round(b["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        d = pd.DataFrame({
            "event_type": b["event_type"], "n": 1,
            "s1": x, "s2": x * x, "s3": x ** 3, "s4": x ** 4,
            "t0": y, "t1": x * y, "t2": x * x * y})
        return d.groupby("event_type", sort=False).sum().reset_index()

    parts = ds.map_batches(moments, batch_format="pandas",
                           batch_size=65536)

    def det3(a, b, c, d, e, f, g, h, i):
        return a * (e * i - f * h) - b * (d * i - f * g) \
            + c * (d * h - e * g)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("event_type", sort=False).sum().reset_index()
        rows = []
        for r in m.itertuples():
            n, s1, s2, s3, s4 = (int(r.n), int(r.s1), int(r.s2),
                                 int(r.s3), int(r.s4))
            t0, t1, t2 = int(r.t0), int(r.t1), int(r.t2)
            D = det3(n, s1, s2, s1, s2, s3, s2, s3, s4)
            Da = det3(t0, s1, s2, t1, s2, s3, t2, s3, s4)
            Db = det3(n, t0, s2, s1, t1, s3, s2, t2, s4)
            Dc = det3(n, s1, t0, s1, s2, t1, s2, s3, t2)
            rows.append((r.event_type, str(D), str(Da), str(Db),
                         str(Dc)))
        return pd.DataFrame(rows, columns=["event_type", "det_d",
                                           "det_a", "det_b", "det_c"])

    return rel.bucketed_group_apply(parts, ["event_type"], finalize)


def SQL_QUAD_FIT():
    def det3(a, b, c, d, e, f, g, h, i):
        return (f"({a}*({e}*{i}-{f}*{h}) - {b}*({d}*{i}-{f}*{g})"
                f" + {c}*({d}*{h}-{e}*{g}))")

    cols = {k: f"h{k}" for k in
            ["n", "s1", "s2", "s3", "s4", "t0", "t1", "t2"]}
    casts = ",\n         ".join(
        f"CAST({k} AS HUGEINT) AS {v}" for k, v in cols.items())
    D = det3("hn", "hs1", "hs2", "hs1", "hs2", "hs3", "hs2", "hs3", "hs4")
    Da = det3("ht0", "hs1", "hs2", "ht1", "hs2", "hs3", "ht2", "hs3", "hs4")
    Db = det3("hn", "ht0", "hs2", "hs1", "ht1", "hs3", "hs2", "ht2", "hs4")
    Dc = det3("hn", "hs1", "ht0", "hs1", "hs2", "ht1", "hs2", "hs3", "ht2")
    return f"""
WITH xy AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x*x) AS BIGINT) AS s2,
         CAST(SUM(x*x*x) AS BIGINT) AS s3,
         CAST(SUM(x*x*x*x) AS BIGINT) AS s4,
         CAST(SUM(y) AS BIGINT) AS t0,
         CAST(SUM(x*y) AS BIGINT) AS t1,
         CAST(SUM(x*x*y) AS BIGINT) AS t2
  FROM xy GROUP BY event_type),
h AS (
  SELECT event_type,
         {casts}
  FROM m)
SELECT event_type,
       CAST({D} AS VARCHAR) AS det_d,
       CAST({Da} AS VARCHAR) AS det_a,
       CAST({Db} AS VARCHAR) AS det_b,
       CAST({Dc} AS VARCHAR) AS det_c
FROM h"""


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve per language (the heavy-tail
    diagnostic behind tokenizer vocab sizing): the number of distinct
    words k90 whose rank-ordered frequencies (count desc, word asc)
    first cover >= 90% of the token mass — integer test 10·cum >=
    9·total, no float thresholds. One (lang, word) bucketed count,
    then a lang-keyed finalize over the vocabulary-bounded frequency
    table."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = b["text"].str.split(" ")
        d = pd.DataFrame({
            "lang": b["lang"].repeat(rows.str.len()).to_numpy(),
            "w": np.concatenate(rows.to_numpy())})
        c = d.groupby(["lang", "w"], sort=False).size().rename("c")
        return c.reset_index()

    freq = ds.map_batches(explode, batch_format="pandas",
                          batch_size=4096)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby(["lang", "w"], sort=False)["c"].sum().reset_index()
        outs = []
        for lang, gg in f.groupby("lang", sort=False):
            gg = gg.sort_values(["c", "w"], ascending=[False, True],
                                kind="stable")
            c = gg["c"].to_numpy(np.int64)
            tot = int(c.sum())
            cum = np.cumsum(c)
            k90 = int(np.argmax(10 * cum >= 9 * tot)) + 1
            outs.append((lang, len(gg), tot, k90))
        return pd.DataFrame(outs, columns=["lang", "vocab", "total",
                                           "k90"])

    out = rel.bucketed_group_apply(freq, ["lang"], combine)
    return out.map_batches(
        lambda b: pa.table({
            "lang": b["lang"],
            "vocab": pc.cast(b["vocab"], pa.int64()),
            "total": pc.cast(b["total"], pa.int64()),
            "k90": pc.cast(b["k90"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


SQL_VOCAB_COVERAGE = """
WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS w
           FROM documents),
f AS (SELECT lang, w, COUNT(*) AS c FROM t GROUP BY lang, w),
o AS (SELECT lang, c,
             SUM(c) OVER (PARTITION BY lang
                          ORDER BY c DESC, w) AS cum,
             SUM(c) OVER (PARTITION BY lang) AS tot,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, w) AS rn
      FROM f)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(MAX(tot) AS BIGINT) AS total,
       CAST(MIN(CASE WHEN 10 * cum >= 9 * tot THEN rn END)
         AS BIGINT) AS k90
FROM o GROUP BY lang
"""


def q_mannwhitney(sf_dir: str):
    """Exact Mann-Whitney U between 'view' and 'click' event values
    (the nonparametric A/B significance statistic beside q_ab_test's
    odds ratio), doubled to stay integer under ties: U2 = Σ 2·[a>b] +
    [a=b] over all cross pairs. Computed WITHOUT the pair space: per-
    cents-value group counts (value-domain bounded) → one prefix-sum
    finalize. Distributed partials are one map_batches + one bucketed
    combine."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(["view", "click"])
        g = b[m]
        val = np.round(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        isa = (g["event_type"] == "view").to_numpy()
        d = pd.DataFrame({"val": val,
                          "na": isa.astype(np.int64),
                          "nb": (~isa).astype(np.int64)})
        return d.groupby("val", sort=False).sum().reset_index()

    parts = ds.map_batches(cnt, batch_format="pandas", batch_size=65536)
    merged = rel.bucketed_group_apply(
        parts, ["val"],
        lambda g: g.groupby("val", sort=False).sum().reset_index())

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("val", kind="stable").reset_index(drop=True)
        na = g["na"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        nb_lt = np.concatenate(([0], np.cumsum(nb)[:-1]))
        u2 = int((2 * na * nb_lt + na * nb).sum())
        return pd.DataFrame({"n_a": [int(na.sum())],
                             "n_b": [int(nb.sum())],
                             "u2": [u2]}).astype(np.int64)

    return merged.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=1 << 30)


SQL_MANNWHITNEY = """
WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS val,
                  SUM(CASE WHEN event_type = 'view' THEN 1
                      ELSE 0 END) AS na,
                  SUM(CASE WHEN event_type = 'click' THEN 1
                      ELSE 0 END) AS nb
           FROM events WHERE event_type IN ('view', 'click')
           GROUP BY 1),
o AS (SELECT val, na, nb,
             COALESCE(SUM(nb) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS nb_lt
      FROM v)
SELECT CAST(SUM(na) AS BIGINT) AS n_a,
       CAST(SUM(nb) AS BIGINT) AS n_b,
       CAST(SUM(2 * na * nb_lt + na * nb) AS BIGINT) AS u2
FROM o
"""


GT_MAX_R = 10


def q_good_turing(sf_dir: str):
    """Good-Turing frequency-of-frequencies smoothing prep (the
    classic LM backoff estimator): for word frequencies r = 1..10,
    the type count N_r and the EXACT smoothed-count numerator
    (r+1)·N_{r+1} (the smoothed count r* = numerator / N_r — kept as
    an integer pair, no division). One (word) bucketed count, one
    count-of-counts combine over the frequency-bounded table."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = b["text"].str.split(" ")
        d = pd.DataFrame({"w": np.concatenate(rows.to_numpy())})
        g = d.groupby("w", sort=False).size().rename("c")
        return g.reset_index()

    parts = ds.map_batches(explode, batch_format="pandas",
                           batch_size=4096)
    freq = rel.bucketed_group_apply(
        parts, ["w"],
        lambda g: g.groupby("w", sort=False)["c"].sum().reset_index())

    def coc(b: pd.DataFrame) -> pd.DataFrame:
        u, n = np.unique(b["c"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"r": u, "n_r": n.astype(np.int64)})

    parts2 = freq.map_batches(coc, batch_format="pandas",
                              batch_size=65536)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("r", sort=False)["n_r"].sum()
        out = []
        for r in range(1, GT_MAX_R + 1):
            n_r = int(t.get(r, 0))
            n_r1 = int(t.get(r + 1, 0))
            out.append((r, n_r, (r + 1) * n_r1))
        return pd.DataFrame(out, columns=["r", "n_r", "gt_num"]) \
            .astype(np.int64)

    return parts2.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=1 << 30)


def SQL_GOOD_TURING():
    return f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
f AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
coc AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM f GROUP BY c),
rr AS (SELECT CAST(r AS BIGINT) AS r
       FROM (SELECT unnest(range(1, {GT_MAX_R + 1})) AS r))
SELECT rr.r, CAST(COALESCE(a.n_r, 0) AS BIGINT) AS n_r,
       CAST((rr.r + 1) * COALESCE(b.n_r, 0) AS BIGINT) AS gt_num
FROM rr LEFT JOIN coc a ON a.r = rr.r
        LEFT JOIN coc b ON b.r = rr.r + 1"""


def q_modularity(sf_dir: str):
    """Modularity audit of the LPA partition (the evaluation half of
    community detection — pairs with q_communities the way ann_recall
    pairs with ann_lsh): per community, intra-edge count e_in, degree
    mass d_sum, and the EXACT integer contribution 4m·e_in − d_sum²
    (modularity Q = Σ contrib / 4m² — one division deferred to the
    reader). Labels come from the same deterministic 3-round LPA; the
    self-loopless canonical edge set supplies m, degrees and
    intra-edge tests via two partitioned label joins."""
    from pythongis_ray import graph, pages
    from pythongis_ray.relational import bucketed_group_apply, join_large

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    labels = graph.label_propagation(edges, src="src_page",
                                     dst="dst_page", rounds=LPA_ROUNDS)
    labels = labels.map_batches(
        lambda b: pa.table({"node": pc.cast(b["node"], pa.int64()),
                            "community": pc.cast(b["community"],
                                                 pa.int64())}),
        batch_format="pyarrow", batch_size=65536).materialize()

    def canon(batch: pa.Table) -> pa.Table:
        u = batch["src_page"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = batch["dst_page"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": np.minimum(u, v), "v": np.maximum(u, v)})

    e = rel.dedup(edges.map_batches(canon, batch_format="pyarrow",
                                    batch_size=65536), ["u", "v"])
    e = rel.with_empty_schema(e, pa.schema(
        [("u", pa.int64()), ("v", pa.int64())])).materialize()
    m = e.count()

    lu = labels.map_batches(
        lambda b: pa.table({"u": b["node"], "cu": b["community"]}),
        batch_format="pyarrow", batch_size=65536)
    lv = labels.map_batches(
        lambda b: pa.table({"v": b["node"], "cv": b["community"]}),
        batch_format="pyarrow", batch_size=65536)
    tagged = join_large(join_large(e, lu, on="u"), lv, on="v")

    def parts_fn(b: pd.DataFrame) -> pd.DataFrame:
        cu = b["cu"].to_numpy(np.int64)
        cv = b["cv"].to_numpy(np.int64)
        intra = cu == cv
        d = pd.DataFrame({
            "community": np.concatenate([cu[intra], cu, cv]),
            "e_in": np.concatenate([np.ones(int(intra.sum()), np.int64),
                                    np.zeros(2 * len(b), np.int64)]),
            "d_sum": np.concatenate([np.zeros(int(intra.sum()), np.int64),
                                     np.ones(2 * len(b), np.int64)]),
            "n_nodes": 0})
        return d.groupby("community", sort=False).sum().reset_index()

    ep = tagged.map_batches(parts_fn, batch_format="pandas",
                            batch_size=65536)
    np_ = labels.map_batches(
        lambda b: pd.DataFrame({
            "community": b["community"].to_numpy(np.int64),
            "e_in": 0, "d_sum": 0, "n_nodes": 1})
        .groupby("community", sort=False).sum().reset_index(),
        batch_format="pandas", batch_size=65536)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("community", sort=False)[
            ["e_in", "d_sum", "n_nodes"]].sum().reset_index()
        c["q_contrib"] = (4 * m * c["e_in"].to_numpy(np.int64)
                          - c["d_sum"].to_numpy(np.int64) ** 2)
        return c.astype(np.int64)

    return bucketed_group_apply(ep.union(np_), ["community"], combine)


def _sql_modularity(rounds: int = None,
                    edges_sql: str = _SQL_PAGE_EDGES) -> str:
    lpa = _sql_lpa(LPA_ROUNDS, edges_sql)
    # reuse the LPA CTE chain: strip its final SELECT, keep the WITH
    body = lpa[:lpa.rindex("\nSELECT")]
    return body + f""",
labels AS MATERIALIZED (
  SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS community
  FROM l{LPA_ROUNDS}),
ce AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e WHERE src <> dst),
mm AS (SELECT COUNT(*) AS m FROM ce),
te AS (SELECT ce.u, ce.v, lu.community AS cu, lv.community AS cv
       FROM ce JOIN labels lu ON lu.node = ce.u
               JOIN labels lv ON lv.node = ce.v),
ein AS (SELECT cu AS community, COUNT(*) AS e_in
        FROM te WHERE cu = cv GROUP BY cu),
dsum AS (SELECT community, COUNT(*) AS d_sum FROM (
           SELECT cu AS community FROM te
           UNION ALL SELECT cv FROM te) GROUP BY community),
nn AS (SELECT community, COUNT(*) AS n_nodes FROM labels
       GROUP BY community)
SELECT nn.community,
       CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
       CAST(COALESCE(dsum.d_sum, 0) AS BIGINT) AS d_sum,
       CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       CAST(4 * mm.m * COALESCE(ein.e_in, 0)
            - COALESCE(dsum.d_sum, 0) * COALESCE(dsum.d_sum, 0)
         AS BIGINT) AS q_contrib
FROM nn CROSS JOIN mm
LEFT JOIN ein ON ein.community = nn.community
LEFT JOIN dsum ON dsum.community = nn.community"""


LC_K = 1 << 20


def q_label_compact(sf_dir: str):
    """Cluster-compactness audit of the labeled embeddings (the
    silhouette-lite evaluation op): per label, how many members'
    NEAREST label centroid (by mean quantized dot, deterministic
    integer score floor(dot·2^20 / n_l), ties → smaller label) is
    their own. Label sums are label-bounded partials broadcast into
    one vectorized scoring map; the floor keeps the score exact in
    int64 (|dot|·2^20 < 2^56) and numpy floor division is mirrored
    by an explicit floor-correction in the C-truncating SQL."""
    import ray

    from pythongis_ray import state

    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")

    def sums(b: pd.DataFrame) -> pd.DataFrame:
        q = np.round(np.stack(b["embedding"].to_numpy()) * 1000) \
            .astype(np.int64)
        lab = b["label"].to_numpy(np.int64)
        d = pd.DataFrame(q, columns=[f"s{i}" for i in range(q.shape[1])])
        d["label"] = lab
        g = d.groupby("label", sort=False).sum()
        g["n"] = d.groupby("label", sort=False).size()
        return g.reset_index()

    lbl_sums = rel.bucketed_group_apply(
        emb.map_batches(sums, batch_format="pandas", batch_size=4096),
        ["label"],
        lambda g: g.groupby("label", sort=False).sum().reset_index()) \
        .to_pandas().sort_values("label").reset_index(drop=True)
    labs = lbl_sums["label"].to_numpy(np.int64)
    S = lbl_sums.drop(columns=["label", "n"]).to_numpy(np.int64)
    n_l = lbl_sums["n"].to_numpy(np.int64)
    ref = ray.put((labs, S, n_l))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        labs_, S_, n_ = state.get_broadcast(ref, key_extra=("lcomp",))
        q = np.round(np.stack(b["embedding"].to_numpy()) * 1000) \
            .astype(np.int64)
        own = b["label"].to_numpy(np.int64)
        dots = q @ S_.T                       # (B, L)
        sc = (dots * LC_K) // n_[None, :]     # numpy floor division
        best = np.argmax(sc == sc.max(axis=1, keepdims=True), axis=1)
        nearest = labs_[best]                 # ties → smallest label
        d = pd.DataFrame({"label": own,
                          "n_members": 1,
                          "n_compact": (nearest == own).astype(np.int64)})
        return d.groupby("label", sort=False).sum().reset_index()

    parts = emb.map_batches(score, batch_format="pandas",
                            batch_size=4096)
    return rel.bucketed_group_apply(
        parts, ["label"],
        lambda g: g.groupby("label", sort=False).sum().reset_index()
        .astype(np.int64))


def SQL_LABEL_COMPACT():
    return f"""
WITH eq AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
                        x -> round(CAST(x AS DOUBLE) * 1000)) AS e
  FROM embeddings),
lc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
       FROM eq GROUP BY label),
ls0 AS (
  SELECT label, d.i AS dim, SUM(e[CAST(d.i AS INTEGER)]) AS s
  FROM eq CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
  GROUP BY label, d.i),
ls AS (
  SELECT ls0.label, lc.n, list(ls0.s ORDER BY ls0.dim) AS s
  FROM ls0 JOIN lc ON lc.label = ls0.label
  GROUP BY ls0.label, lc.n),
sc AS (
  SELECT eq.vec_id, eq.label AS own, ls.label AS cand,
         CAST(list_dot_product(eq.e, ls.s) AS BIGINT) * {LC_K} AS num,
         ls.n
  FROM eq CROSS JOIN ls),
fl AS (
  SELECT vec_id, own, cand,
         (num // n) - CASE WHEN num < 0 AND num % n <> 0
                      THEN 1 ELSE 0 END AS score
  FROM sc),
nearest AS (
  SELECT vec_id, own, cand,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, cand) AS rn
  FROM fl)
SELECT own AS label,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN cand = own THEN 1 ELSE 0 END)
         AS BIGINT) AS n_compact
FROM nearest WHERE rn = 1 GROUP BY own"""


def q_fd_check(sf_dir: str):
    """Functional-dependency profiling (TANE-lite data audit): for
    candidate FDs over events, the key count and the number of keys
    with more than one distinct dependent value (violations; the FD
    holds iff zero). Each pair is one distinct-dedup + one keyed
    combine — schema-discovery as a pipeline, not a driver loop."""
    pairs = [("event_id", "user_id"), ("user_id", "event_type"),
             ("event_type", "user_id"), ("user_id", "event_id")]
    outs = []
    for det, dep in pairs:
        ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                                columns=[det, dep])
        de = rel.dedup(ds.map_batches(
            lambda b, det=det, dep=dep: pa.table({
                "k": pc.cast(b[det], pa.int64())
                if b[det].type != pa.string() else b[det],
                "v": pc.cast(b[dep], pa.int64())
                if b[dep].type != pa.string() else b[dep]}),
            batch_format="pyarrow", batch_size=65536), ["k", "v"])

        def cnt(g: pd.DataFrame, det=det, dep=dep) -> pd.DataFrame:
            c = g.groupby("k", sort=False).size()
            return pd.DataFrame({
                "fd": [f"{det}->{dep}"],
                "n_keys": [len(c)],
                "n_violations": [int((c >= 2).sum())]})

        part = rel.bucketed_group_apply(de, ["k"], cnt)
        outs.append(rel.bucketed_group_apply(
            part, ["fd"],
            lambda g: g.groupby("fd", sort=False).sum().reset_index()))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)

    def fix(b: pa.Table) -> pa.Table:
        return pa.table({
            "fd": b["fd"],
            "n_keys": pc.cast(b["n_keys"], pa.int64()),
            "n_violations": pc.cast(b["n_violations"], pa.int64()),
            "holds": pc.cast(pc.equal(pc.cast(b["n_violations"],
                                              pa.int64()), 0),
                             pa.int64())})

    return out.map_batches(fix, batch_format="pyarrow",
                           batch_size=65536)


SQL_FD_CHECK = """
WITH p1 AS (SELECT 'event_id->user_id' AS fd,
                   CAST(event_id AS VARCHAR) AS k,
                   CAST(user_id AS VARCHAR) AS v FROM events),
p2 AS (SELECT 'user_id->event_type', CAST(user_id AS VARCHAR),
              event_type FROM events),
p3 AS (SELECT 'event_type->user_id', event_type,
              CAST(user_id AS VARCHAR) FROM events),
p4 AS (SELECT 'user_id->event_id', CAST(user_id AS VARCHAR),
              CAST(event_id AS VARCHAR) FROM events),
a AS (SELECT fd, k, COUNT(DISTINCT v) AS c FROM (
        SELECT * FROM p1 UNION ALL SELECT * FROM p2
        UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4)
      GROUP BY fd, k)
SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(CASE WHEN SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM a GROUP BY fd
"""


def q_type_overlap(sf_dir: str):
    """Exact audience overlap between event types (the bitmap-index
    intersection op KMV only approximates — q_host_overlap's exact
    sibling): |users(A) ∩ users(B)| for every type pair, computed
    WITHOUT materializing user sets: one (user, type) dedup, per-user
    pair emission inside the user-keyed bucket (≤ C(5,2) rows per
    user), one (a, b) combine."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    de = rel.dedup(ds.map_batches(
        lambda b: pa.table({"u": pc.cast(b["user_id"], pa.int64()),
                            "t": b["event_type"]}),
        batch_format="pyarrow", batch_size=65536), ["u", "t"])

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["u", "t"]).sort_values(["u", "t"],
                                                      kind="stable")
        u = b["u"].to_numpy(np.int64)
        t = b["t"].to_numpy()
        outs = []
        d = 1
        while True:
            msk = u[d:] == u[:-d]
            if not msk.any():
                break
            outs.append((t[:-d][msk], t[d:][msk]))
            d += 1
        if not outs:
            return pd.DataFrame({"type_a": np.empty(0, object),
                                 "type_b": np.empty(0, object),
                                 "n_both": np.empty(0, np.int64)})
        df = pd.DataFrame({"type_a": np.concatenate([o[0] for o in outs]),
                           "type_b": np.concatenate([o[1] for o in outs])})
        return df.groupby(["type_a", "type_b"], sort=False).size() \
            .rename("n_both").reset_index()

    parts = bucketed_group_apply(de, ["u"], per_user)
    return bucketed_group_apply(
        parts, ["type_a", "type_b"],
        lambda g: g.groupby(["type_a", "type_b"], sort=False)["n_both"]
        .sum().reset_index())


SQL_TYPE_OVERLAP = """
WITH de AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events)
SELECT a.t AS type_a, b.t AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_both
FROM de a JOIN de b ON a.u = b.u AND a.t < b.t
GROUP BY a.t, b.t
"""


def q_mutual_nn(sf_dir: str):
    """Reciprocal best-match pairs over the embedding corpus: (a, b)
    where each is the other's EXACT top-1 by quantized dot (ties →
    smaller id) — the entity-matching / contrastive-positive-mining
    primitive. 1-Bucket-Theta block self-join emitting per-task
    partial bests, per-id combine, one unordered-pair co-location."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    return rel.driver_safe(
        embed.mutual_nn_blocked(emb),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("score", pa.int64())]))


SQL_MUTUAL_NN = """
WITH eq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(CAST(x AS DOUBLE) * 1000)) AS e
  FROM embeddings),
s AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(list_dot_product(a.e, b.e) AS BIGINT) AS sc
  FROM eq a JOIN eq b ON a.vec_id <> b.vec_id),
nn AS (
  SELECT ia, ib, sc FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY ia
              ORDER BY sc DESC, ib) AS rn
    FROM s) WHERE rn = 1)
SELECT n1.ia AS id_a, n1.ib AS id_b, n1.sc AS score
FROM nn n1 JOIN nn n2 ON n2.ia = n1.ib AND n2.ib = n1.ia
WHERE n1.ia < n1.ib
"""


FEISTEL_ROUNDS = 3


def _feistel32(u: np.ndarray) -> np.ndarray:
    """3-round Feistel permutation over 32-bit ids (format-preserving
    pseudonymization): provably a BIJECTION on [0, 2^32) whatever the
    round function, so joinability is preserved while raw ids never
    leave the pipeline. Round math stays < 2^48, replayed verbatim in
    BIGINT SQL."""
    L = (u >> np.int64(16)) & np.int64(0xFFFF)
    R = u & np.int64(0xFFFF)
    for i in range(1, FEISTEL_ROUNDS + 1):
        F = ((R * np.int64(2654435761) + np.int64(i) * np.int64(40503))
             >> np.int64(13)) & np.int64(0xFFFF)
        L, R = R, L ^ F
    return L * np.int64(65536) + R


def q_pseudonymize(sf_dir: str):
    """Privacy-preserving user pseudonymization (the PII-pipeline
    sibling of pii_scrub): per distinct user, a format-preserving
    32-bit Feistel token — deterministic, collision-free by
    construction (Feistel networks are bijections), and reversible
    only with the round constants. One distinct-user dedup, one
    vectorized map; per-user event counts ride along so the output is
    a ready join key table."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def cnt(b: pa.Table) -> pd.DataFrame:
        u, c = np.unique(b["user_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64), return_counts=True)
        return pd.DataFrame({"user_id": u, "n_events": c.astype(np.int64)})

    parts = ds.map_batches(cnt, batch_format="pyarrow", batch_size=65536)
    users = rel.bucketed_group_apply(
        parts, ["user_id"],
        lambda g: g.groupby("user_id", sort=False)["n_events"].sum()
        .reset_index())

    def tok(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy(np.int64)
        b = b.copy()
        b["pseudo_id"] = _feistel32(u)
        return b[["user_id", "pseudo_id", "n_events"]]

    return users.map_batches(tok, batch_format="pandas",
                             batch_size=65536)


def SQL_PSEUDONYMIZE():
    head = """
WITH u AS (SELECT CAST(user_id AS BIGINT) AS user_id,
                  CAST(COUNT(*) AS BIGINT) AS n_events
           FROM events GROUP BY user_id),
f0 AS (SELECT user_id, n_events,
              (user_id // 65536) % 65536 AS L,
              user_id % 65536 AS R
       FROM u)"""
    steps = []
    for i in range(1, FEISTEL_ROUNDS + 1):
        steps.append(f""",
f{i} AS (SELECT user_id, n_events, R AS L,
               xor(L, ((R * 2654435761 + {i} * 40503) // 8192)
                      % 65536) AS R
        FROM f{i - 1})""")
    return head + "".join(steps) + f"""
SELECT user_id, CAST(L * 65536 + R AS BIGINT) AS pseudo_id, n_events
FROM f{FEISTEL_ROUNDS}"""


def q_laplacian(sf_dir: str):
    """Discrete Laplacian (curvature) of the point-density terrain:
    e + w + n + s − 4c per interior cell — the peak/pit detector
    complementing q_slope_grid's gradient. Same sparse-stencil plan:
    each cell emits to its 4 neighbors, one (cx, cy)-bucketed combine
    assembles the stencil; no dense array."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx, cx - 1, cx + 1, cx, cx])
        ty = np.concatenate([cy, cy, cy, cy - 1, cy + 1])
        tag = np.repeat(np.arange(5, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 5)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(5))
        p = p[p.notna().all(axis=1)]
        c = p[0].to_numpy(np.int64)
        nb = (p[1].to_numpy(np.int64) + p[2].to_numpy(np.int64)
              + p[3].to_numpy(np.int64) + p[4].to_numpy(np.int64))
        idx = p.index.to_frame(index=False)
        return pd.DataFrame({"cx": idx["cx"].to_numpy(np.int64),
                             "cy": idx["cy"].to_numpy(np.int64),
                             "lap": nb - 4 * c})

    out = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)
    return rel.with_empty_schema(out, pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()), ("lap", pa.int64())]))


def SQL_LAPLACIAN():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY ix // 8192, iy // 8192)
SELECT c.cx, c.cy,
       CAST(e.n + w.n + s.n + n_.n - 4 * c.n AS BIGINT) AS lap
FROM g c
JOIN g e ON e.cx = c.cx + 1 AND e.cy = c.cy
JOIN g w ON w.cx = c.cx - 1 AND w.cy = c.cy
JOIN g s ON s.cx = c.cx AND s.cy = c.cy + 1
JOIN g n_ ON n_.cx = c.cx AND n_.cy = c.cy - 1"""


def _ntile_from_rank(rn: np.ndarray, N: int, k: int) -> np.ndarray:
    """NTILE(k) from a 1-based dense global rank — SQL's
    big-tiles-first rule (first N%k tiles get one extra row)."""
    big, rem = N // k, N % k
    cut = rem * (big + 1)
    pos = rn - 1
    return np.where(pos < cut, pos // max(big + 1, 1),
                    rem + (pos - cut) // max(big, 1)) + 1


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation (the classic lifecycle-marketing
    composition): per customer, Recency (last order day), Frequency
    (order count), Monetary (exact cents), each cut into exact
    quartiles by THREE chained two-pass global rankings over the
    customer-bounded metric table, then segment = rq·100 + fq·10 +
    mq. NTILE's big-tiles-first rule is replicated bit-for-bit."""
    ds = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])

    def partial(b: pa.Table) -> pd.DataFrame:
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        cents = np.round(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        d = pd.DataFrame({"c": c, "r_day": day, "f": 1, "m_cents": cents})
        return d.groupby("c", sort=False).agg(
            r_day=("r_day", "max"), f=("f", "sum"),
            m_cents=("m_cents", "sum")).reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    metrics = rel.bucketed_group_apply(
        parts, ["c"],
        lambda g: g.groupby("c", sort=False).agg(
            r_day=("r_day", "max"), f=("f", "sum"),
            m_cents=("m_cents", "sum")).reset_index()).materialize()
    N = metrics.count()

    # materialize between rank passes: each two-pass ranking consumes
    # its input three times (sample + count + assign), so a lazy chain
    # re-executes the upstream ranking lineage multiplicatively
    ranked = rel.add_global_rank(metrics, ["r_day", "c"],
                                 out_col="rn_r").materialize()
    ranked = rel.add_global_rank(ranked, ["f", "c"],
                                 out_col="rn_f").materialize()
    ranked = rel.add_global_rank(ranked, ["m_cents", "c"],
                                 out_col="rn_m")

    def tiles(b: pd.DataFrame) -> pd.DataFrame:
        rq = _ntile_from_rank(b["rn_r"].to_numpy(np.int64), N, 4)
        fq = _ntile_from_rank(b["rn_f"].to_numpy(np.int64), N, 4)
        mq = _ntile_from_rank(b["rn_m"].to_numpy(np.int64), N, 4)
        return pd.DataFrame({
            "custkey": b["c"].to_numpy(np.int64),
            "r_day": b["r_day"].to_numpy(np.int64),
            "f": b["f"].to_numpy(np.int64),
            "m_cents": b["m_cents"].to_numpy(np.int64),
            "rq": rq, "fq": fq, "mq": mq,
            "segment": rq * 100 + fq * 10 + mq}).astype(np.int64)

    return ranked.map_batches(tiles, batch_format="pandas",
                              batch_size=65536)


SQL_RFM_SEGMENTS = """
WITH m AS (
  SELECT o_custkey AS c,
         MAX(epoch_us(o_orderdate) // 86400000000) AS r_day,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           AS BIGINT) AS m_cents
  FROM orders GROUP BY o_custkey),
t AS (
  SELECT c, r_day, f, m_cents,
         NTILE(4) OVER (ORDER BY r_day, c) AS rq,
         NTILE(4) OVER (ORDER BY f, c) AS fq,
         NTILE(4) OVER (ORDER BY m_cents, c) AS mq
  FROM m)
SELECT c AS custkey, CAST(r_day AS BIGINT) AS r_day, f, m_cents,
       CAST(rq AS BIGINT) AS rq, CAST(fq AS BIGINT) AS fq,
       CAST(mq AS BIGINT) AS mq,
       CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment
FROM t
"""


def q_weighted_median(sf_dir: str):
    """Exact QUANTITY-weighted median price per return flag: the
    smallest price cents whose cumulative quantity weight reaches
    half the group total (2·cum >= tot — integer test, no halving).
    The holistic weighted-order-statistic the plain median/quantile
    ops don't cover; one flag-keyed co-location, in-bucket sort +
    cumsum. At an unbounded-domain scale the counting-selection plan
    of q_global_median applies per group instead."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_extendedprice",
                                     "l_quantity"])

    def prep(b: pa.Table) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"]
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        q = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pd.DataFrame({"flag": b["l_returnflag"].to_pandas(),
                          "cents": cents, "w": q})
        # pre-combine equal prices inside the batch: the shuffle then
        # moves at most |distinct prices| rows per batch
        return d.groupby(["flag", "cents"], sort=False)["w"].sum() \
            .reset_index()

    parts = ds.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)

    def per_flag(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for flag, gg in g.groupby("flag", sort=False):
            gg = gg.groupby("cents", sort=True)["w"].sum().reset_index()
            w = gg["w"].to_numpy(np.int64)
            cum = np.cumsum(w)
            tot = int(cum[-1])
            i = int(np.argmax(2 * cum >= tot))
            outs.append((flag, int(gg["cents"].iloc[i]), tot))
        return pd.DataFrame(outs, columns=["flag", "median_cents",
                                           "total_qty"])

    return bucketed_group_apply(parts, ["flag"], per_flag)


SQL_WEIGHTED_MEDIAN = """
WITH d AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                  CAST(l_quantity AS BIGINT) AS w
           FROM lineitem),
g AS (SELECT flag, cents, SUM(w) AS w FROM d GROUP BY flag, cents),
o AS (SELECT flag, cents,
             SUM(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM g)
SELECT flag, CAST(MIN(CASE WHEN 2 * cum >= tot THEN cents END)
               AS BIGINT) AS median_cents,
       CAST(MAX(tot) AS BIGINT) AS total_qty
FROM o GROUP BY flag
"""


def q_dau_stickiness(sf_dir: str):
    """DAU/MAU stickiness per day (the product-analytics engagement
    ratio): daily distinct users over that calendar month's distinct
    users, exact integer ppm. Two keyed dedups ((day,user) and
    (month,user)); the month table is date-bounded and broadcasts
    into the per-day scoring — no second shuffle."""
    import ray

    from pythongis_ray import state
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("user_id", "ts"))

    def keys(b: pa.Table) -> pa.Table:
        day = (b["ts_us"].to_numpy(zero_copy_only=False)
               // 86_400_000_000).astype(np.int64)
        # real calendar month (months since 1970-01), exact via the
        # datetime64 civil calendar — matches SQL (year-1970)*12+month-1
        mon = day.astype("datetime64[D]").astype("datetime64[M]") \
            .astype(np.int64)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"day": pa.array(day), "month": pa.array(mon),
                         "u": pa.array(u)})

    keyed = ds.map_batches(keys, batch_format="pyarrow",
                           batch_size=65536).materialize()
    dau = bucketed_group_apply(
        rel.dedup(keyed.select_columns(["day", "u"]), ["day", "u"]),
        ["day"],
        lambda g: g.groupby("day", sort=False).size().rename("dau")
        .reset_index())
    mau_pd = bucketed_group_apply(
        rel.dedup(keyed.select_columns(["month", "u"]), ["month", "u"]),
        ["month"],
        lambda g: g.groupby("month", sort=False).size().rename("mau")
        .reset_index()).to_pandas()            # date-bounded
    mau_map = dict(zip(mau_pd["month"].astype(int),
                       mau_pd["mau"].astype(int)))
    ref = ray.put(mau_map)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        mm = state.get_broadcast(ref, key_extra=("dau",))
        day = b["day"].to_numpy(np.int64)
        dau_ = b["dau"].to_numpy(np.int64)
        mon = day.astype("datetime64[D]").astype("datetime64[M]") \
            .astype(np.int64)
        mau_ = np.array([mm[int(m)] for m in mon], np.int64)
        return pd.DataFrame({
            "day": day, "dau": dau_, "mau": mau_,
            "stick_ppm": dau_ * 1_000_000 // mau_})

    return dau.map_batches(score, batch_format="pandas",
                           batch_size=65536)


SQL_DAU_STICKINESS = """
WITH k AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  (year(ts) - 1970) * 12 + month(ts) - 1 AS month,
                  user_id AS u
           FROM events),
d AS (SELECT day, month, CAST(COUNT(DISTINCT u) AS BIGINT) AS dau
      FROM k GROUP BY day, month),
m AS (SELECT month, CAST(COUNT(DISTINCT u) AS BIGINT) AS mau
      FROM k GROUP BY month)
SELECT CAST(d.day AS BIGINT) AS day, d.dau, m.mau,
       CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stick_ppm
FROM d JOIN m ON m.month = d.month
"""


def q_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value triangle: users cohorted by first-seen
    week; purchase revenue (exact cents) folded per (cohort week,
    week offset), then the cumulative LTV curve via one running sum
    over the date-bounded cohort×offset table. The revenue companion
    of q_retention's activity triangle — cohort + offsets resolved in
    ONE user-keyed pass."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("user_id", "ts", "event_type",
                                  "value"))

    def per_user(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        wk = g["ts_us"].to_numpy(np.int64) // (7 * 86_400_000_000)
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        cohort = wk[np.maximum.accumulate(
            np.where(first, np.arange(len(g)), 0))]
        is_p = (g["event_type"] == "purchase").to_numpy()
        cents = np.round(g["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        d = pd.DataFrame({"cohort": cohort[is_p],
                          "off": (wk - cohort)[is_p],
                          "rev": cents[is_p]})
        return d.groupby(["cohort", "off"], sort=False)["rev"].sum() \
            .reset_index()

    parts = bucketed_group_apply(ds, ["user_id"], per_user)
    cells = bucketed_group_apply(
        parts, ["cohort", "off"],
        lambda g: g.groupby(["cohort", "off"], sort=False)["rev"].sum()
        .reset_index())

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cohort", "off"], kind="stable") \
            .reset_index(drop=True)
        g["cum_rev"] = g.groupby("cohort", sort=False)["rev"].cumsum()
        return g.astype(np.int64)

    return cells.repartition(1).map_batches(
        cum, batch_format="pandas", batch_size=1 << 30)


SQL_COHORT_LTV = """
WITH w AS (SELECT user_id,
                  epoch_us(ts) // 604800000000 AS wk,
                  event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
c AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id),
r AS (SELECT c.cohort, w.wk - c.cohort AS off, SUM(w.cents) AS rev
      FROM w JOIN c ON c.user_id = w.user_id
      WHERE w.event_type = 'purchase'
      GROUP BY c.cohort, w.wk - c.cohort)
SELECT CAST(cohort AS BIGINT) AS cohort, CAST(off AS BIGINT) AS off,
       CAST(rev AS BIGINT) AS rev,
       CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY off)
         AS BIGINT) AS cum_rev
FROM r
"""


def q_seq_pattern(sf_dir: str):
    """Complex-event-processing pattern count (MATCH_RECOGNIZE
    shape): users with a strictly-ordered view → click → purchase
    containing NO error event inside the (view, purchase) span.
    Equivalent segment formulation, vectorized: split each user's
    timeline at errors (segment id = running error count); a match
    exists iff SOME error-free segment contains v < c < p, decided
    greedily (first view, first later click, any later purchase).
    One user-keyed co-location; the oracle states it as the direct
    triple-join + NOT EXISTS."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("user_id", "ts", "event_type"))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        is_err = et == "error"
        # per-user running error count = global cumsum minus the
        # user's prefix at its first row
        cum = np.cumsum(is_err.astype(np.int64))
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        base = np.where(first, cum - is_err.astype(np.int64), 0)
        base = np.maximum.accumulate(np.where(first, base, 0))
        seg = cum - is_err.astype(np.int64) - base
        # Vectorized greedy existence test over CONTIGUOUS (u, seg)
        # runs (rows are (u, ts)-sorted; seg is non-decreasing within
        # a user; (u, ts) has no ties in the fixtures, so "ts strictly
        # later" == "positionally later"): segment-local cummax via
        # cumsum-minus-prefix-at-segment-start — no Python loop over
        # groups.
        keep = ~is_err
        u2, sg = u[keep], seg[keep]
        et2 = et[keep]
        n = len(u2)
        if n == 0:
            return pd.DataFrame({"u": np.empty(0, np.int64)})
        is_view = et2 == "view"
        is_click = et2 == "click"
        is_pur = et2 == "purchase"
        idx = np.arange(n)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (u2[1:] != u2[:-1]) | (sg[1:] != sg[:-1])
        start = np.maximum.accumulate(np.where(new, idx, 0))
        csv = np.cumsum(is_view.astype(np.int64))
        seen_view = (csv - (csv[start] - is_view[start])) > 0
        qc = is_click & seen_view          # click with an earlier view
        csc = np.cumsum(qc.astype(np.int64))
        seen_cav = (csc - (csc[start] - qc[start])) > 0
        conv = np.unique(u2[is_pur & seen_cav])
        return pd.DataFrame({"u": conv.astype(np.int64)})

    conv = bucketed_group_apply(ds, ["user_id"], per_bucket)
    conv = rel.with_empty_schema(conv, pa.schema([("u", pa.int64())]))
    n = conv.count()
    return pd.DataFrame({"n_converted": [n]}).astype(np.int64)


SQL_SEQ_PATTERN = """
SELECT CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_converted
FROM events v
JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
             AND c.ts > v.ts
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
             AND p.ts > c.ts
WHERE v.event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM events x
    WHERE x.user_id = v.user_id AND x.event_type = 'error'
      AND x.ts > v.ts AND x.ts < p.ts)
"""


BAND_DELTA = 5


def q_price_band(sf_dir: str):
    """Attribute-space band self-join (|price_a − price_b| <= 5
    cents): the 1-D analogue of dwithin in VALUE space, via the
    canonical-tile plan — each part replicates to price tiles t and
    t+1 (tile width = the band), ONE tile co-location, and each pair
    is emitted exactly once: by its lexicographically-smaller (cents,
    key) anchor, whose HOME tile is the pair's canonical tile.
    Output volume is band-bounded (sorted-range scan per anchor),
    never the n² pair space."""
    from pythongis_ray.relational import bucketed_group_apply

    W = BAND_DELTA
    ds = _rd().read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice"])

    def route(b: pa.Table) -> pd.DataFrame:
        k = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.round(b["p_retailprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        t = c // W
        # halo goes DOWN: the anchor (lower price) pairs upward, so a
        # row must be visible in the tile below its own
        return pd.DataFrame({
            "tile": np.concatenate([t, t - 1]),
            "k": np.concatenate([k, k]),
            "c": np.concatenate([c, c]),
            "home": np.concatenate([np.ones(len(k), bool),
                                    np.zeros(len(k), bool)])})

    routed = ds.map_batches(route, batch_format="pyarrow",
                            batch_size=65536)

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for tile, g in bucket.groupby("tile", sort=False):
            g = g.sort_values(["c", "k"], kind="stable") \
                .reset_index(drop=True)
            c = g["c"].to_numpy(np.int64)
            k = g["k"].to_numpy(np.int64)
            home = g["home"].to_numpy(bool)
            anchor = home & (c // W == tile)
            ai = np.flatnonzero(anchor)
            if not len(ai):
                continue
            hi = np.searchsorted(c, c[ai] + W, "right")
            cnt = hi - ai - 1
            ok = cnt > 0
            ai, hi, cnt = ai[ok], hi[ok], cnt[ok]
            if not len(ai):
                continue
            src = np.repeat(ai, cnt)
            dst = np.concatenate([np.arange(a + 1, h)
                                  for a, h in zip(ai, hi)])
            ka, kb = k[src], k[dst]
            outs.append(pd.DataFrame({
                "id_a": np.minimum(ka, kb), "id_b": np.maximum(ka, kb),
                "diff": c[dst] - c[src]}))
        if not outs:
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "diff": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    out = bucketed_group_apply(routed, ["tile"], pairs).materialize()
    if out.count() == 0:
        # Dataset.to_pandas drops the schema of an ALL-empty dataset
        # (even a typed empty Arrow block) — hand the driver a typed
        # empty pandas frame instead
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "diff": pd.Series([], dtype=np.int64)})
    return out


SQL_PRICE_BAND = f"""
WITH p AS (SELECT p_partkey AS k,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS c
           FROM part)
SELECT LEAST(a.k, b.k) AS id_a, GREATEST(a.k, b.k) AS id_b,
       CAST(abs(a.c - b.c) AS BIGINT) AS diff
FROM p a JOIN p b
  ON a.k < b.k AND abs(a.c - b.c) <= {BAND_DELTA}
"""


# hex grid: offset-row lattice (W even so W/2 is exact); the Voronoi
# cells of an offset rectangular lattice ARE hexagons, and with
# integer W/H every nearest-center comparison is an exact int64
# squared distance — no sqrt(3) floats anywhere (the repo exactness
# contract, fixtures.py docstring)
HEX_W, HEX_H = 1024, 886


def q_hexbin(sf_dir: str):
    """Hexagonal binning (the density-map workhorse matplotlib calls
    hexbin): customer points snap to the nearest center of an
    offset-row lattice — candidate rows r0-1/r0/r0+1, one rounded
    column each, exact integer squared-distance pick (ties break to
    the lowest row, matching the oracle's ORDER BY d2, r, c) — then
    count + balance-cents sum per hex cell. One bucketed combine."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_acctbal"])

    def partial(b: pa.Table) -> pd.DataFrame:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(b["c_acctbal"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        x, y = fixtures.geocode_units(k * 4 + 1)
        r0 = (2 * y + HEX_H) // (2 * HEX_H)
        best_r = np.zeros_like(x)
        best_c = np.zeros_like(x)
        best_d = np.full_like(x, np.iinfo(np.int64).max)
        for dr in (-1, 0, 1):                      # rows ascending:
            r = r0 + dr                            # first win == min r
            off = (r & 1) * (HEX_W // 2)
            c = (2 * (x - off) + HEX_W) // (2 * HEX_W)
            d2 = (x - (c * HEX_W + off)) ** 2 + (y - r * HEX_H) ** 2
            better = d2 < best_d
            best_r = np.where(better, r, best_r)
            best_c = np.where(better, c, best_c)
            best_d = np.where(better, d2, best_d)
        df = pd.DataFrame({"hr": best_r, "hc": best_c, "cents": cents})
        g = df.groupby(["hr", "hc"], sort=False).agg(
            n=("cents", "size"), bal_cents=("cents", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["hr", "hc"], sort=False).agg(
            n=("n", "sum"), bal_cents=("bal_cents", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["bal_cents"] = g["bal_cents"].astype(np.int64)
        return g

    return bucketed_group_apply(parts, ["hr", "hc"], combine)


def SQL_HEXBIN():
    src = ("(SELECT c_custkey*4+1 AS gk, "
           "CAST(round(c_acctbal*100) AS BIGINT) AS cents FROM customer)")
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
cand AS (
  SELECT gk, cents, ix, iy,
         ((2*iy + {HEX_H}) // (2*{HEX_H})) + dr AS r
  FROM ge CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS dr) _d
), cc AS (
  SELECT gk, cents, ix, iy, r,
         ((2*(ix - (r & 1)*{HEX_W // 2}) + {HEX_W}) // (2*{HEX_W})) AS c
  FROM cand
), scored AS (
  SELECT gk, cents, r, c,
         (ix - (c*{HEX_W} + (r & 1)*{HEX_W // 2}))
           * (ix - (c*{HEX_W} + (r & 1)*{HEX_W // 2}))
         + (iy - r*{HEX_H}) * (iy - r*{HEX_H}) AS d2
  FROM cc
), pick AS (
  SELECT gk, cents, r, c,
         ROW_NUMBER() OVER (PARTITION BY gk ORDER BY d2, r, c) AS rn
  FROM scored
)
SELECT r AS hr, c AS hc, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS bal_cents
FROM pick WHERE rn = 1 GROUP BY r, c
"""


def q_radius_gyration(sf_dir: str):
    """Radius of gyration per user (the mobility-analytics standard:
    mean squared distance of a user's event locations from their own
    centroid). Kept EXACT by clearing denominators:
    rg2_num = n*Σ(x²+y²) − (Σx)² − (Σy)²  (= n² · rg²) in integer
    lattice units. Map-side partial moments fold per batch; one small
    per-user combine."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id"])

    def partial(b: pa.Table) -> pd.DataFrame:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = fixtures.geocode_units(eid * 4 + 1)
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "sx": x, "sy": y, "sq": x * x + y * y})
        g = df.groupby("user_id", sort=False).agg(
            n=("sq", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
            sq=("sq", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", sort=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sq=("sq", "sum")).reset_index()
        out = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "n": g["n"].to_numpy(np.int64),
            "rg2_num": (g["n"].to_numpy(np.int64)
                        * g["sq"].to_numpy(np.int64)
                        - g["sx"].to_numpy(np.int64) ** 2
                        - g["sy"].to_numpy(np.int64) ** 2)})
        return out

    return bucketed_group_apply(parts, ["user_id"], combine)


def q_img_hosts(sf_dir: str):
    """Media discovery over the synthetic web: pages synthesize
    <img src="https://cdn{(p+k)%7}.example/img/{2p+k}.jpg"> tags
    (void tags — text byte-identity preserved), the vectorized
    ``pages.extract_image_refs`` kernel pulls them back OUT of the
    html, and per-CDN stats aggregate (the fetch-planning step of a
    multimodal corpus pipeline). Oracle = deterministic generator
    replay (the pagerank-links pattern): the extraction is verified
    because its output must match the generator bit-for-bit."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, images=True,
                             columns=["page_id", "html"])
    refs = ds.map_batches(pages.extract_image_refs,
                          batch_format="pyarrow", batch_size=4096)

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "cdn": b["cdn"].to_numpy(zero_copy_only=False),
            "img_id": b["img_id"].to_numpy(zero_copy_only=False)})
        g = df.groupby("cdn", sort=False).agg(
            n=("img_id", "size"), min_img=("img_id", "min"),
            max_img=("img_id", "max"),
            sum_img=("img_id", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = refs.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cdn", sort=False).agg(
            n=("n", "sum"), min_img=("min_img", "min"),
            max_img=("max_img", "max"),
            sum_img=("sum_img", "sum")).reset_index()
        for c in ("n", "min_img", "max_img", "sum_img"):
            g[c] = g[c].astype(np.int64)
        return g

    return bucketed_group_apply(parts, ["cdn"], combine)


SQL_IMG_HOSTS = """
WITH refs AS (
  SELECT (doc_id + k) % 7 AS cdn, doc_id * 2 + k AS img_id
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS k) _k)
SELECT cdn, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(img_id) AS BIGINT) AS min_img,
       CAST(MAX(img_id) AS BIGINT) AS max_img,
       CAST(SUM(img_id) AS BIGINT) AS sum_img
FROM refs GROUP BY cdn
"""


def q_media_pixels(sf_dir: str):
    """END-TO-END multimodal pipeline with a bit-exact oracle:
    synthesize pages with <img> tags → vectorized ref extraction →
    "fetch" (each ref becomes a REAL solid-color PNG payload,
    multimodal.fetch_synthetic_images) → REAL PNG decode
    (DecodeImage, no fake path) → per-CDN integer pixel stats. PNG is
    lossless, so the decoded channel values are exactly the color
    formula ((id*37)%256, (id*59)%256, (id*83)%256) and the whole
    encode→decode round trip is SQL-replayable — the only codec
    pipeline in the registry whose bytes the oracle can check."""
    from pythongis_ray import multimodal as mm, pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, images=True,
                             columns=["page_id", "html"])
    refs = ds.map_batches(pages.extract_image_refs,
                          batch_format="pyarrow", batch_size=4096) \
        .select_columns(["cdn", "img_id"])
    media = refs.map_batches(mm.fetch_synthetic_images,
                             batch_format="pyarrow",
                             batch_size=mm.MEDIA_BATCH_ROWS)
    dec = mm.DecodeImage(fake=False)

    def decode_stats(b: pa.Table) -> pd.DataFrame:
        px_rgb = []
        for payload in b["payload"].to_pylist():
            a = dec._decode_one(payload, 0, 0, 0)
            # solid image: every channel is one exact byte value
            px_rgb.append(int(a[:, :, 0].max()) + int(a[:, :, 1].max())
                          + int(a[:, :, 2].max()))
        df = pd.DataFrame({
            "cdn": b["cdn"].to_numpy(zero_copy_only=False),
            "rgb": np.asarray(px_rgb, np.int64)})
        g = df.groupby("cdn", sort=False).agg(
            n=("rgb", "size"), sum_rgb=("rgb", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = media.map_batches(decode_stats, batch_format="pyarrow",
                              batch_size=mm.MEDIA_BATCH_ROWS)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cdn", sort=False).agg(
            n=("n", "sum"), sum_rgb=("sum_rgb", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_rgb"] = g["sum_rgb"].astype(np.int64)
        return g

    return bucketed_group_apply(parts, ["cdn"], combine)


SQL_MEDIA_PIXELS = """
WITH refs AS (
  SELECT (doc_id + k) % 7 AS cdn, doc_id * 2 + k AS img_id
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS k) _k)
SELECT cdn, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((img_id*37) % 256 + (img_id*59) % 256
                + (img_id*83) % 256) AS BIGINT) AS sum_rgb
FROM refs GROUP BY cdn
"""


MEDIA_NSAMP = 64       # WAV samples per synthetic clip
MEDIA_NFRAMES = 4      # Y4M frames per synthetic clip (8x8 gray)


def q_media_audio(sf_dir: str):
    """End-to-end AUDIO pipeline with a bit-exact oracle: image refs
    double as media ids; each becomes a REAL RIFF/WAVE PCM payload
    with samples s_j = (id*31 + j*17) % 4096 − 2048 (PCM is
    lossless), decoded by the real WAV codec, and per-CDN integer
    sample-sum stats are replayed in SQL over the same formula."""
    from pythongis_ray import multimodal as mm, pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, images=True,
                             columns=["page_id", "html"])
    refs = ds.map_batches(pages.extract_image_refs,
                          batch_format="pyarrow", batch_size=4096) \
        .select_columns(["cdn", "img_id"])

    j = np.arange(MEDIA_NSAMP, dtype=np.int64)

    def fetch_decode(b: pa.Table) -> pd.DataFrame:
        ids = b["img_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.empty(len(ids), np.int64)
        for i, aid in enumerate(ids):
            wave = ((aid * 31 + j * 17) % 4096 - 2048).astype(np.int16)
            payload = mm.encode_wav_bytes(wave, 8000)   # the "fetch"
            got, sr = mm.decode_wav_bytes(payload)      # the REAL decode
            sums[i] = int(got.astype(np.int64).sum())
        df = pd.DataFrame({
            "cdn": b["cdn"].to_numpy(zero_copy_only=False),
            "s": sums})
        g = df.groupby("cdn", sort=False).agg(
            n=("s", "size"), sum_samples=("s", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = refs.map_batches(fetch_decode, batch_format="pyarrow",
                             batch_size=4096)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cdn", sort=False).agg(
            n=("n", "sum"), sum_samples=("sum_samples", "sum")) \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_samples"] = g["sum_samples"].astype(np.int64)
        return g

    return bucketed_group_apply(parts, ["cdn"], combine)


SQL_MEDIA_AUDIO = f"""
WITH refs AS (
  SELECT (doc_id + k) % 7 AS cdn, doc_id * 2 + k AS aid
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS k) _k),
samp AS (
  SELECT cdn, aid, (aid*31 + j*17) % 4096 - 2048 AS s
  FROM refs CROSS JOIN (SELECT UNNEST(range({MEDIA_NSAMP})) AS j) _j)
SELECT cdn, CAST(COUNT(DISTINCT aid) AS BIGINT) AS n,
       CAST(SUM(s) AS BIGINT) AS sum_samples
FROM samp GROUP BY cdn
"""


def q_media_frames(sf_dir: str):
    """End-to-end VIDEO pipeline with a bit-exact oracle: each media
    ref becomes a REAL YUV4MPEG2 clip (4 gray 8×8 frames — Cmono is
    LOSSLESS; pixel p of frame f = (id*13 + f*7 + p) % 256), the real
    Y4M codec samples every 2nd frame (frames 0 and 2), and per-CDN
    integer pixel sums replay in SQL over the same formula."""
    from pythongis_ray import multimodal as mm, pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, images=True,
                             columns=["page_id", "html"])
    refs = ds.map_batches(pages.extract_image_refs,
                          batch_format="pyarrow", batch_size=4096) \
        .select_columns(["cdn", "img_id"])

    p = np.arange(64, dtype=np.int64)

    def fetch_decode(b: pa.Table) -> pd.DataFrame:
        ids = b["img_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.empty(len(ids), np.int64)
        for i, vid in enumerate(ids):
            frames = np.stack([
                ((vid * 13 + f * 7 + p) % 256).astype(np.uint8)
                .reshape(8, 8) for f in range(MEDIA_NFRAMES)])
            payload = mm.encode_y4m_bytes(frames)       # the "fetch"
            got, w, h, nch = mm.decode_y4m_bytes(       # REAL decode +
                payload, sel=range(0, MEDIA_NFRAMES, 2))  # frame sample
            sums[i] = int(got.astype(np.int64).sum())
        df = pd.DataFrame({
            "cdn": b["cdn"].to_numpy(zero_copy_only=False),
            "s": sums})
        g = df.groupby("cdn", sort=False).agg(
            n=("s", "size"), sum_px=("s", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = refs.map_batches(fetch_decode, batch_format="pyarrow",
                             batch_size=4096)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cdn", sort=False).agg(
            n=("n", "sum"), sum_px=("sum_px", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_px"] = g["sum_px"].astype(np.int64)
        return g

    return bucketed_group_apply(parts, ["cdn"], combine)


SQL_MEDIA_FRAMES = """
WITH refs AS (
  SELECT (doc_id + k) % 7 AS cdn, doc_id * 2 + k AS vid
  FROM documents CROSS JOIN (SELECT UNNEST([0, 1]) AS k) _k),
px AS (
  SELECT cdn, vid, (vid*13 + f*7 + p) % 256 AS v
  FROM refs
  CROSS JOIN (SELECT UNNEST([0, 2]) AS f) _f
  CROSS JOIN (SELECT UNNEST(range(64)) AS p) _p)
SELECT cdn, CAST(COUNT(DISTINCT vid) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_px
FROM px GROUP BY cdn
"""


def q_map_match(sf_dir: str):
    """Map matching (GPS-trace snapping): every event snaps to its
    single nearest road segment (part-derived horizontal lines,
    1-in-16 sample of parts as the road set), then per-road load
    stats (events matched + distinct users). Reuses the knn_lines
    bit-exact single-division point-to-segment kernel, so the whole
    snap is mirrored op-for-op in the oracle. Broadcast road set +
    one bucketed per-road combine — no shuffle of the events."""
    from pythongis_ray.geom import wkb as _wkb
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id"])

    def to_pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        lon, lat = fixtures.units_to_deg(ix, iy)
        return pa.table({"user_id": batch["user_id"],
                         "lon": lon, "lat": lat})

    epts = ds.map_batches(to_pts, batch_format="pyarrow",
                          batch_size=65536)
    pp = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = pp["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk % 16 == 0]                  # 1-in-16 road sample
    sid = pk * 8 + 7
    ix, iy = fixtures.geocode_units(sid)
    ax, ay = fixtures.units_to_deg(ix, iy)
    bx, _ = fixtures.units_to_deg(ix + 8000, iy)
    geoms = [_wkb.encode_linestring(np.array([[x1, y1], [x2, y1]]))
             for x1, y1, x2 in zip(ax, ay, bx)]
    right = pd.DataFrame({"sid": sid, "geometry": geoms})
    nn = spatial.knn_join_geoms(epts, right, k=1, id_col="sid")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sid": b["nn_id"].to_numpy(np.int64),
                             "user_id": b["user_id"].to_numpy(np.int64)})

    pairs = nn.map_batches(project, batch_format="pandas")

    def per_road(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("sid", sort=False).agg(
            n_events=("user_id", "size"),
            n_users=("user_id", "nunique")).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return bucketed_group_apply(pairs, ["sid"], per_road)


def SQL_MAP_MATCH():
    epts = ("(SELECT user_id, event_id*4+1 AS ek FROM events)")
    g = fixtures.sql_geocode("ek").replace("__SRC__", epts)
    sroad = ("(SELECT p_partkey*8+7 AS sid FROM part "
             "WHERE p_partkey % 16 = 0)")
    gr = fixtures.sql_geocode("sid").replace("__SRC__", sroad)
    return f"""
WITH ge AS ({g}),
epts AS (SELECT user_id, ek, ix / 1024.0 - 180.0 AS lon,
                iy / 1024.0 - 90.0 AS lat FROM ge),
sraw AS ({gr}),
seg AS (SELECT sid, ix / 1024.0 - 180.0 AS axx, iy / 1024.0 - 90.0 AS ayy,
               (ix + 8000) / 1024.0 - 180.0 AS bxx,
               iy / 1024.0 - 90.0 AS byy FROM sraw),
d AS (
  SELECT e.user_id, e.ek, s.sid,
         CASE
           WHEN (e.lon - axx) * (bxx - axx) + (e.lat - ayy) * (byy - ayy) <= 0
             THEN (e.lon - axx) * (e.lon - axx) + (e.lat - ayy) * (e.lat - ayy)
           WHEN (e.lon - axx) * (bxx - axx) + (e.lat - ayy) * (byy - ayy)
                >= (bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy)
             THEN (e.lon - bxx) * (e.lon - bxx) + (e.lat - byy) * (e.lat - byy)
           ELSE ((e.lon - axx) * (byy - ayy) - (e.lat - ayy) * (bxx - axx))
                * ((e.lon - axx) * (byy - ayy) - (e.lat - ayy) * (bxx - axx))
                / ((bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy))
         END AS dist_sq
  FROM epts e CROSS JOIN seg s),
r AS (
  SELECT user_id, sid,
         ROW_NUMBER() OVER (PARTITION BY ek
                            ORDER BY dist_sq, sid) AS rn
  FROM d)
SELECT sid, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM r WHERE rn = 1 GROUP BY sid
"""


def q_render_density(sf_dir: str):
    """The renderer's density-rasterization core, oracle-checked:
    customer points scatter onto a 512x256 screen grid through the
    EXACT pixel mapping render.MapCanvas.to_px uses (floor((lon+180)/
    360*W) — identical IEEE double ops in numpy and DuckDB), partial
    count canvases fold associatively, and the output is the
    pixel-count histogram (how many pixels hold k points)."""
    from pythongis_ray import render

    m = render.MapCanvas(width=512, height=256)
    ds = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def partial(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        col, row, ok = m.to_px(lon, lat)
        canvas = np.zeros((m.height, m.width), np.int64)
        np.add.at(canvas, (row[ok], col[ok]), 1)
        return pa.table({"canvas": pa.array([canvas.tobytes()],
                                            pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    canvas = render._fold_canvases(parts, m.height, m.width,
                                   np.int64, "sum")
    nz = canvas[canvas > 0]
    k, n = np.unique(nz, return_counts=True)
    return pd.DataFrame({"points_per_pixel": k.astype(np.int64),
                         "n_pixels": n.astype(np.int64)})


def SQL_RENDER_DENSITY():
    return f"""
WITH cpts AS ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}),
px AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 512) AS BIGINT) AS c,
         CAST(FLOOR((90.0 - lat) / 180.0 * 256) AS BIGINT) AS r
  FROM cpts),
inb AS (SELECT r, c FROM px
        WHERE c >= 0 AND c < 512 AND r >= 0 AND r < 256),
cnt AS (SELECT r, c, COUNT(*) AS k FROM inb GROUP BY r, c)
SELECT CAST(k AS BIGINT) AS points_per_pixel,
       CAST(COUNT(*) AS BIGINT) AS n_pixels
FROM cnt GROUP BY k
"""


def q_render_zones(sf_dir: str):
    """The renderer's polygon-fill core, oracle-checked: the 25 zone
    rectangles rasterize onto a 360x180 canvas through the exact
    pixel-center PIP (render.MapCanvas.add_polygons — crossing-number
    + boundary, which for axis-aligned rects equals inclusive-bounds
    containment), pixels take the MAX zone class (zone_id % 5 + 1),
    and the output is pixels-per-class. SQL replays pixel centers ×
    rect containment × MAX class."""
    import ray.data as rd

    from pythongis_ray import pipelines, render

    zones = pipelines.load_zones(sf_dir).copy()
    zones["cls"] = (zones["zone_id"].to_numpy(np.int64) % 5 + 1) \
        .astype(np.float64)
    m = render.MapCanvas(width=360, height=180)
    # breaks chosen so find_class(cls)+1 == cls (identity classing)
    m.add_polygons(rd.from_pandas(zones[["geometry", "cls"]]),
                   value_col="cls", breaks=[0.5, 1.5, 2.5, 3.5, 4.5, 5.5])
    img_classes = None
    # reuse the layer partial directly to read back class values
    kind, ds, partial, op, mode, color, breaks = m._layers[0]
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
    canvas = render._fold_canvases(parts, m.height, m.width,
                                   np.int64, op)
    nz = canvas[canvas > 0]
    k, n = np.unique(nz, return_counts=True)
    del img_classes
    return pd.DataFrame({"zone_class": k.astype(np.int64),
                         "n_pixels": n.astype(np.int64)})


SQL_RENDER_ZONES = """
WITH z AS (
  SELECT n_nationkey AS zone_id FROM nation),
zr AS (
  SELECT zone_id, zone_id % 5 + 1 AS cls,
         ((zone_id % 5) * 73728 + 0.5) / 1024.0 - 180.0 AS x0,
         ((zone_id // 5) * 36864 + 0.5) / 1024.0 - 90.0 AS y0,
         ((zone_id % 5) * 73728 + 0.5 + 72000) / 1024.0 - 180.0 AS x1,
         ((zone_id // 5) * 36864 + 0.5 + 36000) / 1024.0 - 90.0 AS y1
  FROM z),
px AS (
  SELECT c, r, -180.0 + (c + 0.5) * 1.0 AS cx, 90.0 - (r + 0.5) * 1.0 AS cy
  FROM (SELECT UNNEST(range(360)) AS c) _c
  CROSS JOIN (SELECT UNNEST(range(180)) AS r) _r),
hit AS (
  SELECT p.c, p.r, MAX(zr.cls) AS cls
  FROM px p JOIN zr
    ON p.cx >= zr.x0 AND p.cx <= zr.x1
   AND p.cy >= zr.y0 AND p.cy <= zr.y1
  GROUP BY p.c, p.r)
SELECT CAST(cls AS BIGINT) AS zone_class,
       CAST(COUNT(*) AS BIGINT) AS n_pixels
FROM hit GROUP BY cls
"""


STAY_D2 = 40_000_000_000     # squared units (~200 km on the lattice)
STAY_MIN = 3                 # >= this many consecutive events per stay


def q_stay_points(sf_dir: str):
    """Stay-point detection (mobility analytics): per user, maximal
    runs of time-consecutive events where each hop stays within
    sqrt(STAY_D2) of the PREVIOUS event; runs covering >= STAY_MIN
    events count as stays. Exact: integer squared hop distances on
    the lattice; runs found vectorized (flag diff positions — no
    Python loop over users). One bucketed per-user shuffle (the
    sessionize assumption)."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        x, y = fixtures.geocode_units(eid * 4 + 1)
        same_user = np.r_[False, uid[1:] == uid[:-1]]
        dx = np.r_[0, x[1:] - x[:-1]]
        dy = np.r_[0, y[1:] - y[:-1]]
        near = same_user & (dx * dx + dy * dy <= STAY_D2)
        # runs of `near` flags: a run of length L covers L+1 events
        starts = np.flatnonzero(near & ~np.r_[False, near[:-1]])
        ends = np.flatnonzero(near & ~np.r_[near[1:], False])
        runlen = ends - starts + 1                  # flags per run
        keep = runlen >= (STAY_MIN - 1)
        if not keep.any():
            return pd.DataFrame({"user_id": np.array([], np.int64),
                                 "n_stays": np.array([], np.int64),
                                 "stay_events": np.array([], np.int64)})
        su = uid[starts[keep]]
        ev = runlen[keep] + 1
        d = pd.DataFrame({"user_id": su, "ev": ev})
        out = d.groupby("user_id", sort=False).agg(
            n_stays=("ev", "size"), stay_events=("ev", "sum")) \
            .reset_index()
        out["n_stays"] = out["n_stays"].astype(np.int64)
        out["stay_events"] = out["stay_events"].astype(np.int64)
        return out

    return bucketed_group_apply(ds, ["user_id"], per_bucket)


def SQL_STAY_POINTS():
    src = "(SELECT user_id, ts, event_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
hop AS (
  SELECT user_id, ts, event_id, ix, iy,
         LAG(ix) OVER w AS px, LAG(iy) OVER w AS py
  FROM ge WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
flg AS (
  SELECT user_id, ts, event_id,
         CASE WHEN px IS NOT NULL
                   AND (ix-px)*(ix-px) + (iy-py)*(iy-py) <= {STAY_D2}
              THEN 1 ELSE 0 END AS near
  FROM hop),
isl AS (
  SELECT user_id, near,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, near
                              ORDER BY ts, event_id) AS grp
  FROM flg),
runs AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS flags
  FROM isl WHERE near = 1 GROUP BY user_id, grp
  HAVING COUNT(*) >= {STAY_MIN - 1})
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_stays,
       CAST(SUM(flags + 1) AS BIGINT) AS stay_events
FROM runs GROUP BY user_id
"""


def SQL_RADIUS_GYRATION():
    src = "(SELECT user_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(ix) AS sx, SUM(iy) AS sy, SUM(ix*ix + iy*iy) AS sq
  FROM ge GROUP BY user_id)
SELECT user_id, n,
       CAST(n*sq - sx*sx - sy*sy AS BIGINT) AS rg2_num
FROM agg
"""


# DBSCAN / Ripley parameters: eps in lattice units, minPts counts the
# point itself (DBSCAN's |N_eps(p)| >= minPts). eps=96 on the 256-unit
# city jitter boxes makes the hotspot cities dense cores while the
# uniform background stays noise.
DBSCAN_EPS = 96
DBSCAN_MINPTS = 4
RIPLEY_RADII = (32, 64, 96)


def _keyed_units(sf_dir: str, table: str, key_col: str, mult: int,
                 add: int, out_key: str):
    """Like _keyed_points but keeps the exact integer lattice units."""
    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=[key_col])

    def to_units(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = k * mult + add
        ix, iy = fixtures.geocode_units(key)
        return pa.table({out_key: key, "ix": ix, "iy": iy})

    return ds.map_batches(to_units, batch_format="pyarrow",
                          batch_size=65536)


def q_dbscan(sf_dir: str):
    """DBSCAN density clustering over customer points (the classic
    spatial clustering the reference ecosystem reaches for via
    sklearn): core point = |N_eps(p)| >= minPts (self included,
    exact integer d² <= eps²), clusters = connected components of the
    core-core eps-graph labeled by min member id, border points attach
    to the SMALLEST cluster label among their core neighbors, noise is
    omitted. Distributed plan: exactly-once canonical-tile self-join
    (spatial.dwithin_self_pairs — ONE bucketed shuffle, density-bounded
    tiles) → bucketed degree count → resident-shard Pregel components
    (graph.connected_components) → partitioned border attach. No
    all-pairs stage anywhere; the oracle replays the same definition
    with a recursive reach CTE."""
    from pythongis_ray import graph
    from pythongis_ray.relational import bucketed_group_apply

    empty = pd.DataFrame({"ck": pd.Series([], dtype=np.int64),
                          "cluster": pd.Series([], dtype=np.int64),
                          "core": pd.Series([], dtype=np.int64)})
    pts = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    pairs = spatial.dwithin_self_pairs(
        pts, "ck", "ix", "iy", eps=DBSCAN_EPS).materialize()
    if pairs.count() == 0:
        return empty

    def both_sides(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"ck": pa.array(np.concatenate([a, c]))})

    sides = pairs.map_batches(both_sides, batch_format="pyarrow",
                              batch_size=65536)

    def count_nbrs(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("ck", sort=False).size()
        return pd.DataFrame({"ck": s.index.to_numpy(np.int64),
                             "nbrs": s.to_numpy(np.int64)})

    deg = bucketed_group_apply(sides, ["ck"], count_nbrs)

    def core_flag(b: pa.Table) -> pa.Table:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        nb = b["nbrs"].to_numpy(zero_copy_only=False)
        keep = (nb + 1) >= DBSCAN_MINPTS
        return pa.table({"ck": pa.array(ck[keep]),
                         "is_core": pa.array(np.ones(int(keep.sum()),
                                                     np.int64))})

    core = deg.map_batches(core_flag, batch_format="pyarrow",
                           batch_size=65536).materialize()
    if core.count() == 0:
        return empty

    # attach core flags to both pair sides (partitioned joins — the
    # pair/core tables are candidate-bounded, never the full input)
    fa = rel.join_large(pairs, core.map_batches(
        lambda b: b.rename_columns(["id_a", "core_a"]),
        batch_format="pyarrow"), on="id_a", how="left")
    fb = rel.join_large(fa, core.map_batches(
        lambda b: b.rename_columns(["id_b", "core_b"]),
        batch_format="pyarrow"), on="id_b", how="left")

    def split_edges(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        ca = np.nan_to_num(
            b["core_a"].to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0).astype(np.int64)
        cb = np.nan_to_num(
            b["core_b"].to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0).astype(np.int64)
        cc = (ca == 1) & (cb == 1)
        # border candidates: exactly one side core → (noncore, core)
        ab = (ca == 1) & (cb == 0)
        ba = (cb == 1) & (ca == 0)
        return pa.table({
            "id_a": pa.array(np.concatenate([a[cc]])),
            "id_b": pa.array(np.concatenate([c[cc]])),
        }), pa.table({
            "ck": pa.array(np.concatenate([c[ab], a[ba]])),
            "core_ck": pa.array(np.concatenate([a[ab], c[ba]]))})

    # one pass splitting into two outputs isn't expressible in a single
    # map_batches — the pair table is materialized and tiny, run two
    # cheap filters instead
    def core_edges(b: pa.Table) -> pa.Table:
        t1, _ = split_edges(b)
        return t1

    def border_cand(b: pa.Table) -> pa.Table:
        _, t2 = split_edges(b)
        return t2

    fb = fb.materialize()
    edges = fb.map_batches(core_edges, batch_format="pyarrow",
                           batch_size=65536)
    selfe = core.map_batches(
        lambda b: pa.table({"id_a": b["ck"], "id_b": b["ck"]}),
        batch_format="pyarrow", batch_size=65536)
    comp = graph.connected_components(edges.union(selfe)).materialize()

    bc = fb.map_batches(border_cand, batch_format="pyarrow",
                        batch_size=65536)
    bj = rel.join_large(bc, comp.map_batches(
        lambda b: b.rename_columns(["core_ck", "cluster"]),
        batch_format="pyarrow"), on="core_ck")

    def min_cluster(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("ck", sort=False)["cluster"].min()
        return pd.DataFrame({"ck": s.index.to_numpy(np.int64),
                             "cluster": s.to_numpy(np.int64),
                             "core": np.zeros(len(s), np.int64)})

    border = bucketed_group_apply(bj, ["ck"], min_cluster)
    corerows = comp.map_batches(
        lambda b: pa.table({"ck": b["node"], "cluster": b["component"],
                            "core": pa.array(np.ones(len(b), np.int64))}),
        batch_format="pyarrow", batch_size=65536)
    out = corerows.union(border).materialize()
    if out.count() == 0:
        return empty
    return out


def SQL_DBSCAN():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    return f"""
WITH RECURSIVE
pts AS (SELECT ck, ix, iy FROM ({g}) _g),
prs AS (
  SELECT a.ck AS ca, b.ck AS cb
  FROM pts a JOIN pts b ON a.ck < b.ck
  AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
      <= {DBSCAN_EPS * DBSCAN_EPS}),
deg AS (
  SELECT ck, COUNT(*) AS nb FROM
  (SELECT ca AS ck FROM prs UNION ALL SELECT cb FROM prs) _u
  GROUP BY ck),
core AS (SELECT ck FROM deg WHERE nb + 1 >= {DBSCAN_MINPTS}),
ce AS (
  SELECT p.ca AS a, p.cb AS b FROM prs p
  JOIN core x ON p.ca = x.ck JOIN core y ON p.cb = y.ck),
edges AS (
  SELECT a, b FROM ce UNION SELECT b, a FROM ce
  UNION SELECT ck, ck FROM core),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
comp AS (SELECT src AS ck, MIN(dst) AS cluster FROM reach GROUP BY src),
bcand AS (
  SELECT p.cb AS ck, p.ca AS core_ck FROM prs p
    JOIN core x ON p.ca = x.ck
    LEFT JOIN core y ON p.cb = y.ck WHERE y.ck IS NULL
  UNION ALL
  SELECT p.ca, p.cb FROM prs p
    JOIN core x ON p.cb = x.ck
    LEFT JOIN core y ON p.ca = y.ck WHERE y.ck IS NULL),
border AS (
  SELECT q.ck, MIN(c.cluster) AS cluster
  FROM bcand q JOIN comp c ON q.core_ck = c.ck
  GROUP BY q.ck)
SELECT ck, cluster, CAST(1 AS BIGINT) AS core FROM comp
UNION ALL
SELECT ck, cluster, CAST(0 AS BIGINT) AS core FROM border
"""


def q_ripley_k(sf_dir: str):
    """Ripley's K pair-count curve (the spatial point-pattern
    statistic): the number of unordered point pairs within distance r
    for each r in RIPLEY_RADII, over customer points. One exactly-once
    canonical-tile self-join at the LARGEST radius feeds every radius
    (one shuffle for the whole curve); per-batch partial counts fold to
    a 3-row table. Always emits one row per radius (0 when no pairs)."""
    pts = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    rmax = max(RIPLEY_RADII)
    pairs = spatial.dwithin_self_pairs(pts, "ck", "ix", "iy", eps=rmax)
    radii = np.array(RIPLEY_RADII, np.int64)

    def partial(b: pa.Table) -> pd.DataFrame:
        d2 = b["d2"].to_numpy(zero_copy_only=False)
        n = np.array([(d2 <= r * r).sum() for r in radii], np.int64)
        return pd.DataFrame({"r": radii, "n_pairs": n})

    parts = pairs.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"r": radii,
                             "n_pairs": np.zeros(len(radii), np.int64)})
    g = parts.groupby("r", sort=True)["n_pairs"].sum()
    g = g.reindex(radii, fill_value=0)
    return pd.DataFrame({"r": radii, "n_pairs": g.to_numpy(np.int64)})


def SQL_RIPLEY_K():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    rmax = max(RIPLEY_RADII)
    radii = ", ".join(str(r) for r in RIPLEY_RADII)
    return f"""
WITH pts AS (SELECT ck, ix, iy FROM ({g}) _g),
prs AS (
  SELECT (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy) AS d2
  FROM pts a JOIN pts b ON a.ck < b.ck
  AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
      <= {rmax * rmax}),
radii AS (SELECT UNNEST([{radii}]) AS r)
SELECT CAST(r AS BIGINT) AS r, CAST(COUNT(p.d2) AS BIGINT) AS n_pairs
FROM radii LEFT JOIN prs p ON p.d2 <= r*r
GROUP BY r
"""


def q_robots_filter(sf_dir: str):
    """Crawl-politeness robots.txt filter with longest-prefix-match
    semantics (the Google robots rule: the most specific matching rule
    wins, default allow). Each host ``site{s}.example`` publishes two
    synthetic rules — ``Disallow: /<d>`` with d = s%10 and
    ``Allow: /<d><e>`` with e = (s*7)%10 — and every page URL is
    judged against its host's rules: blocked iff the path starts with
    d and is NOT rescued by the longer allow prefix de. URLs are
    parsed back OUT of the synthesized page url strings (one
    vectorized extract_regex — the oracle replays the generator
    arithmetic, so the parse is verified bit-for-bit, the img_hosts
    pattern). Output: per-host page/blocked/allowed counts."""
    from pythongis_ray import pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False,
                             columns=["page_id", "url"])

    def judge(b: pa.Table) -> pd.DataFrame:
        m = pc.extract_regex(
            b["url"], r"^https://site(?P<s>[0-9]+)\.example/(?P<p>[0-9]+)$")
        s = pc.struct_field(m, "s").to_pandas().astype(np.int64).to_numpy()
        path = pc.struct_field(m, "p")
        d = pc.cast(pa.array(s % 10), pa.string())
        e = pc.cast(pa.array((s * 7) % 10), pa.string())
        c1 = pc.utf8_slice_codeunits(path, 0, 1)
        c2 = pc.utf8_slice_codeunits(path, 1, 2)
        blocked = pc.and_(pc.equal(c1, d),
                          pc.invert(pc.equal(c2, e))).to_numpy(
                              zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"site": s, "blocked": blocked})
        g = df.groupby("site", sort=False).agg(
            n_pages=("blocked", "size"),
            n_blocked=("blocked", "sum")).reset_index()
        g["n_pages"] = g["n_pages"].astype(np.int64)
        return g

    parts = ds.map_batches(judge, batch_format="pyarrow",
                           batch_size=8192)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("site", sort=False).agg(
            n_pages=("n_pages", "sum"),
            n_blocked=("n_blocked", "sum")).reset_index()
        g["n_pages"] = g["n_pages"].astype(np.int64)
        g["n_blocked"] = g["n_blocked"].astype(np.int64)
        g["n_allowed"] = g["n_pages"] - g["n_blocked"]
        return g

    return bucketed_group_apply(parts, ["site"], combine)


SQL_ROBOTS_FILTER = """
WITH p AS (SELECT doc_id % 50 AS site, CAST(doc_id AS VARCHAR) AS path
           FROM documents),
v AS (SELECT site,
             CASE WHEN substr(path, 1, 1) = CAST(site % 10 AS VARCHAR)
                   AND substr(path, 2, 1) <> CAST((site*7) % 10 AS VARCHAR)
                  THEN 1 ELSE 0 END AS blocked
      FROM p)
SELECT site, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(blocked) AS BIGINT) AS n_blocked,
       CAST(COUNT(*) - SUM(blocked) AS BIGINT) AS n_allowed
FROM v GROUP BY site
"""


# co-presence: spatial eps (lattice units) and time window (microsec)
COPRES_EPS = 96
COPRES_WINDOW_US = 3_600_000_000  # 1 hour


def q_co_presence(sf_dir: str):
    """Spatio-temporal co-presence join (the contact-tracing /
    co-location analytic): pairs of DIFFERENT users with events within
    96 lattice units AND within 1 hour of each other, counted per
    unordered user pair. Plan: one exactly-once canonical-tile spatial
    self-join over event points prunes to the distance-bounded
    candidate set, the time predicate filters AFTER pairing (spatial
    candidates are density-bounded, so no space-time grid is needed),
    user/ts attach via partitioned joins on the tiny pair table. The
    oracle replays the full predicate as an inequality self-join."""
    from pythongis_ray.relational import bucketed_group_apply

    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"event_id": pa.array(eid), "ix": ix, "iy": iy,
                         "user_id": batch["user_id"],
                         "ts_us": pa.array(us)})

    pts = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    # user/ts ride THROUGH the self-join (carry) and the time + same-
    # user predicates prune IN-KERNEL — no re-join onto the pair table,
    # and only the ~0.1% of spatial candidates inside the window ever
    # leave a bucket
    pairs = spatial.dwithin_self_pairs(
        pts, "event_id", "ix", "iy", eps=COPRES_EPS,
        carry=("user_id", "ts_us"),
        pair_filter=lambda d2, ca, cb:
            (ca["user_id"] != cb["user_id"])
            & (np.abs(ca["ts_us"] - cb["ts_us"]) <= COPRES_WINDOW_US))
    empty = pd.DataFrame({"user_a": pd.Series([], dtype=np.int64),
                          "user_b": pd.Series([], dtype=np.int64),
                          "n_meet": pd.Series([], dtype=np.int64)})

    def fold(b: pa.Table) -> pd.DataFrame:
        ua = b["user_id_a"].to_numpy(zero_copy_only=False)
        ub = b["user_id_b"].to_numpy(zero_copy_only=False)
        lo = np.minimum(ua, ub)
        hi = np.maximum(ua, ub)
        df = pd.DataFrame({"user_a": lo, "user_b": hi})
        g = df.groupby(["user_a", "user_b"], sort=False).size()
        return pd.DataFrame({
            "user_a": g.index.get_level_values(0).to_numpy(np.int64),
            "user_b": g.index.get_level_values(1).to_numpy(np.int64),
            "n_meet": g.to_numpy(np.int64)})

    parts = pairs.map_batches(fold, batch_format="pyarrow",
                              batch_size=65536)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_a", "user_b"], sort=False)["n_meet"].sum()
        return pd.DataFrame({
            "user_a": g.index.get_level_values(0).to_numpy(np.int64),
            "user_b": g.index.get_level_values(1).to_numpy(np.int64),
            "n_meet": g.to_numpy(np.int64)})

    out = bucketed_group_apply(parts, ["user_a", "user_b"],
                               combine).materialize()
    if out.count() == 0:
        return empty
    return out


def SQL_CO_PRESENCE():
    src = "(SELECT event_id, user_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g})
SELECT LEAST(a.user_id, b.user_id) AS user_a,
       GREATEST(a.user_id, b.user_id) AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_meet
FROM ge a JOIN ge b
  ON a.event_id < b.event_id
 AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
     <= {COPRES_EPS * COPRES_EPS}
 AND a.user_id <> b.user_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {COPRES_WINDOW_US}
GROUP BY LEAST(a.user_id, b.user_id), GREATEST(a.user_id, b.user_id)
"""


# trajectory similarity: home-cell resolution (4° tiles) — users are
# paired only within their home tile, the blocking key
TRAJ_CELL = 4096


def q_traj_hausdorff(sf_dir: str):
    """Trajectory-similarity join: symmetric discrete Hausdorff
    distance (exact integer d²) between the event-point sets of every
    pair of users sharing a HOME TILE (home = location of the user's
    smallest event_id; tile = 4°). The mobility-mining classic
    (comparing movement footprints) as a blocked pair join: a tiny
    per-user home table routes each user's full trajectory to ONE
    tile bucket; inside a bucket the kernel computes all pair
    Hausdorffs at once from a row-chunked distance matrix +
    minimum/maximum.reduceat over user blocks — no per-pair Python
    loop. Pair volume is bounded by tile membership (the blocking
    assumption, documented like snm_pairs' halo blocks)."""
    from pythongis_ray.relational import bucketed_group_apply

    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"event_id": pa.array(eid),
                         "user_id": batch["user_id"],
                         "ix": ix, "iy": iy})

    pts = ev.map_batches(prep, batch_format="pyarrow",
                         batch_size=65536).materialize()

    def first_pt(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], kind="stable")
        top = g.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({
            "user_id": top["user_id"].to_numpy(np.int64),
            "hx": top["ix"].to_numpy(np.int64) // TRAJ_CELL,
            "hy": top["iy"].to_numpy(np.int64) // TRAJ_CELL})

    home = bucketed_group_apply(pts, ["user_id"], first_pt)
    routed = rel.join_large(pts, home, on="user_id")

    empty = pd.DataFrame({"user_a": pd.Series([], dtype=np.int64),
                          "user_b": pd.Series([], dtype=np.int64),
                          "h2": pd.Series([], dtype=np.int64)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (_, _), cell in g.groupby(["hx", "hy"], sort=False):
            users = np.unique(cell["user_id"].to_numpy(np.int64))
            if len(users) < 2:
                continue
            cell = cell.sort_values(["user_id", "event_id"],
                                    kind="stable")
            u = cell["user_id"].to_numpy(np.int64)
            x = cell["ix"].to_numpy(np.int64)
            y = cell["iy"].to_numpy(np.int64)
            new = np.empty(len(u), bool)
            new[0] = True
            new[1:] = u[1:] != u[:-1]
            off = np.flatnonzero(new)          # user block offsets
            k = len(off)
            n = len(u)
            # per-point min distance to each OTHER user's block,
            # row-chunked so the d² matrix temporary stays bounded
            pmins = np.empty((n, k), np.int64)
            step = max(1, 2_000_000 // max(n, 1))
            for r0 in range(0, n, step):
                r1 = min(n, r0 + step)
                dx = x[r0:r1, None] - x[None, :]
                dy = y[r0:r1, None] - y[None, :]
                d2 = dx * dx + dy * dy
                pmins[r0:r1] = np.minimum.reduceat(d2, off, axis=1)
            # directed[i, j] = max over i's points of min to j's set
            directed = np.maximum.reduceat(pmins, off, axis=0)
            h2 = np.maximum(directed, directed.T)
            iu, ju = np.triu_indices(k, 1)
            outs.append(pd.DataFrame({
                "user_a": users[iu], "user_b": users[ju],
                "h2": h2[iu, ju]}))
        if not outs:
            return empty.copy()
        return pd.concat(outs, ignore_index=True)

    out = bucketed_group_apply(routed, ["hx", "hy"],
                               per_bucket).materialize()
    if out.count() == 0:
        return empty
    return out


def SQL_TRAJ_HAUSDORFF():
    src = "(SELECT event_id, user_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
me AS (SELECT user_id, MIN(event_id) AS e0 FROM ge GROUP BY user_id),
home AS (SELECT g.user_id, g.ix // {TRAJ_CELL} AS hx,
                g.iy // {TRAJ_CELL} AS hy
         FROM ge g JOIN me ON g.user_id = me.user_id
                          AND g.event_id = me.e0),
up AS (SELECT a.user_id AS ua, b.user_id AS ub
       FROM home a JOIN home b
         ON a.user_id < b.user_id AND a.hx = b.hx AND a.hy = b.hy),
pm AS (SELECT up.ua, up.ub, pa.event_id,
              MIN((pa.ix-pb.ix)*(pa.ix-pb.ix)
                  + (pa.iy-pb.iy)*(pa.iy-pb.iy)) AS mind2
       FROM up JOIN ge pa ON pa.user_id = up.ua
               JOIN ge pb ON pb.user_id = up.ub
       GROUP BY up.ua, up.ub, pa.event_id),
dab AS (SELECT ua, ub, MAX(mind2) AS d FROM pm GROUP BY ua, ub),
pm2 AS (SELECT up.ua, up.ub, pb.event_id,
              MIN((pa.ix-pb.ix)*(pa.ix-pb.ix)
                  + (pa.iy-pb.iy)*(pa.iy-pb.iy)) AS mind2
       FROM up JOIN ge pa ON pa.user_id = up.ua
               JOIN ge pb ON pb.user_id = up.ub
       GROUP BY up.ua, up.ub, pb.event_id),
dba AS (SELECT ua, ub, MAX(mind2) AS d FROM pm2 GROUP BY ua, ub)
SELECT dab.ua AS user_a, dab.ub AS user_b,
       CAST(GREATEST(dab.d, dba.d) AS BIGINT) AS h2
FROM dab JOIN dba ON dab.ua = dba.ua AND dab.ub = dba.ub
"""


def q_assortativity(sf_dir: str):
    """Degree assortativity of the html-extracted web link graph as
    EXACT integer moments (Newman's r with every mean division
    cleared): over the m directed edges, with x/y = TOTAL degree
    (in+out over the edge multiset) of the two endpoints, emit one row
    (m, sxy, sx, sy, sxx, syy) so r = (m*sxy − sx*sy) /
    sqrt((m*sxx − sx²)(m*syy − sy²)). The degree table is node-bounded
    and attached to each endpoint via partitioned joins; the moment
    fold is per-batch partials + a single-row combine, so nothing on
    the driver grows with edge count. Realizes the graph-metric layer
    the reference lacks entirely (its tables are per-feature Python,
    vector/data.py)."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096).materialize()

    def ends(b: pa.Table) -> pa.Table:
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.concatenate([s, d])})

    deg = rel.groupby_aggregate(
        edges.map_batches(ends, batch_format="pyarrow",
                          batch_size=65536),
        ["node"], [("deg", "node", "count")])

    e1 = rel.join_large(
        edges.map_batches(lambda b: pa.table(
            {"node": b["src_page"], "dst_page": b["dst_page"]}),
            batch_format="pyarrow", batch_size=65536),
        deg, on="node")
    e1 = e1.map_batches(lambda b: pd.DataFrame(
        {"node": b["dst_page"].to_numpy(np.int64),
         "dega": b["deg"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=65536)
    e2 = rel.join_large(e1, deg, on="node")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["dega"].to_numpy(np.int64)
        y = b["deg"].to_numpy(np.int64)
        return pd.DataFrame({
            "m": [np.int64(len(b))], "sxy": [np.int64((x * y).sum())],
            "sx": [np.int64(x.sum())], "sy": [np.int64(y.sum())],
            "sxx": [np.int64((x * x).sum())],
            "syy": [np.int64((y * y).sum())]})

    parts = e2.map_batches(partial, batch_format="pandas",
                           batch_size=65536)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({c: [np.int64(g[c].sum())]
                             for c in ("m", "sxy", "sx", "sy",
                                       "sxx", "syy")})

    one = parts.map_batches(lambda b: b.assign(_one=np.int64(0)),
                            batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: combine(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_ASSORTATIVITY = f"""
WITH e AS ({_SQL_PAGE_EDGES}),
ends AS (SELECT src AS node FROM e UNION ALL SELECT dst FROM e),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ends GROUP BY node),
j AS (SELECT da.d AS x, db.d AS y
      FROM e JOIN deg da ON da.node = e.src
             JOIN deg db ON db.node = e.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(x*y) AS BIGINT) AS sxy,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
FROM j
"""


RICH_CLUB_KS = (4, 6, 8, 10, 12)


def q_rich_club(sf_dir: str):
    """Rich-club profile of the web link graph: for each degree
    threshold k, the number of nodes with total degree > k and the
    number of directed edges whose BOTH endpoints exceed k (the
    rich-club coefficient's exact integer numerator/denominator
    inputs; phi(k) = n_edges / (n_nodes*(n_nodes-1)) for the directed
    normalization). Same node-bounded degree attach as assortativity;
    the per-k fold unions edge partials and node partials through one
    tiny k-bucketed combine."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096).materialize()

    def ends(b: pa.Table) -> pa.Table:
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.concatenate([s, d])})

    deg = rel.groupby_aggregate(
        edges.map_batches(ends, batch_format="pyarrow",
                          batch_size=65536),
        ["node"], [("deg", "node", "count")]).materialize()

    e1 = rel.join_large(
        edges.map_batches(lambda b: pa.table(
            {"node": b["src_page"], "dst_page": b["dst_page"]}),
            batch_format="pyarrow", batch_size=65536),
        deg, on="node")
    e1 = e1.map_batches(lambda b: pd.DataFrame(
        {"node": b["dst_page"].to_numpy(np.int64),
         "dega": b["deg"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=65536)
    e2 = rel.join_large(e1, deg, on="node")

    def edge_part(b: pd.DataFrame) -> pd.DataFrame:
        x = b["dega"].to_numpy(np.int64)
        y = b["deg"].to_numpy(np.int64)
        ks = np.array(RICH_CLUB_KS, np.int64)
        ne = np.array([((x > k) & (y > k)).sum() for k in ks], np.int64)
        return pd.DataFrame({"k": ks, "n_nodes": np.zeros(len(ks),
                                                          np.int64),
                             "n_edges": ne})

    def node_part(b: pd.DataFrame) -> pd.DataFrame:
        d = b["deg"].to_numpy(np.int64)
        ks = np.array(RICH_CLUB_KS, np.int64)
        nn = np.array([(d > k).sum() for k in ks], np.int64)
        return pd.DataFrame({"k": ks, "n_nodes": nn,
                             "n_edges": np.zeros(len(ks), np.int64)})

    parts = e2.map_batches(edge_part, batch_format="pandas",
                           batch_size=65536).union(
        deg.map_batches(node_part, batch_format="pandas",
                        batch_size=65536))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", sort=False).agg(
            n_nodes=("n_nodes", "sum"),
            n_edges=("n_edges", "sum")).reset_index()
        for c in ("k", "n_nodes", "n_edges"):
            out[c] = out[c].astype(np.int64)
        return out

    return rel.bucketed_group_apply(parts, ["k"], combine)


def SQL_RICH_CLUB():
    ks = ", ".join(f"({k})" for k in RICH_CLUB_KS)
    return f"""
WITH e AS ({_SQL_PAGE_EDGES}),
ends AS (SELECT src AS node FROM e UNION ALL SELECT dst FROM e),
deg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ends GROUP BY node),
ks(k) AS (VALUES {ks})
SELECT CAST(ks.k AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE d > ks.k)
           AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM e JOIN deg da ON da.node = e.src
               JOIN deg db ON db.node = e.dst
        WHERE da.d > ks.k AND db.d > ks.k) AS n_edges
FROM ks
"""


# impossible-travel: squared speed limit in (lattice units / second)^2
TRAVEL_SPEED2 = 400


def q_impossible_travel(sf_dir: str):
    """Impossible-travel detection (the geo-fraud / account-abuse
    classic): per user, consecutive events ordered by ts whose implied
    speed exceeds the limit — flagged iff d² > {TRAVEL_SPEED2}·(Δt_s+1)²
    with d² the exact integer lattice distance and Δt_s the floored
    second gap (the +1 makes zero-gap hops finite and keeps the whole
    predicate integer-exact). One user-bucketed shuffle, vectorized
    diff inside the bucket ((user_id, ts) has no ties in the
    fixtures, so the order is deterministic); output per-user hop and
    flag counts."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"user_id": batch["user_id"], "ts_us": us,
                         "ix": ix, "iy": iy})

    pts = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        x = g["ix"].to_numpy(np.int64)
        y = g["iy"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        dt = (t[1:] - t[:-1]) // 1_000_000
        d2 = (x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2
        flag = (d2 > TRAVEL_SPEED2 * (dt + 1) ** 2) & same
        df = pd.DataFrame({"user_id": u[1:][same],
                           "f": flag[same].astype(np.int64)})
        out = df.groupby("user_id", sort=False).agg(
            n_hops=("f", "size"), n_flagged=("f", "sum")).reset_index()
        out["n_hops"] = out["n_hops"].astype(np.int64)
        out["n_flagged"] = out["n_flagged"].astype(np.int64)
        return out

    return rel.bucketed_group_apply(pts, ["user_id"], per_bucket)


def SQL_IMPOSSIBLE_TRAVEL():
    src = "(SELECT event_id, user_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
hops AS (SELECT user_id,
                LAG(ix) OVER w AS px, LAG(iy) OVER w AS py,
                LAG(epoch_us(ts)) OVER w AS pt,
                ix, iy, epoch_us(ts) AS t
         FROM ge WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
v AS (SELECT user_id,
             CASE WHEN (ix-px)*(ix-px) + (iy-py)*(iy-py)
                       > {TRAVEL_SPEED2}
                         * ((t-pt)//1000000 + 1)
                         * ((t-pt)//1000000 + 1)
                  THEN 1 ELSE 0 END AS f
      FROM hops WHERE px IS NOT NULL)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hops,
       CAST(SUM(f) AS BIGINT) AS n_flagged
FROM v GROUP BY user_id
"""


WS_DOUBLINGS = 10  # basin label = flow pointer applied 2^10 times


def q_watershed(sf_dir: str):
    """Watershed basin labeling over the D8 flow graph (the hydrology
    companion to flow_acc, realizing the drainage layer behind the
    reference's empty slope stub, raster/analyzer.py:655): every cell
    is labeled with the SINK it ultimately drains to, computed by
    pointer doubling — {WS_DOUBLINGS} doublings = 2^{WS_DOUBLINGS}
    pointer steps, exact because the 8° grid has ≤ 45×23 cells so no
    drainage path exceeds 1024 hops. The corpus-sized work is the one
    streamed density pass + cell-bucketed stencil; the doubling acts
    on the cell-bounded pointer table (flow_acc's bounded-rounds
    contract). SQL replays each doubling as a self-join CTE."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        txs, tys, tags = [cx], [cy], [np.full(len(b), 8, np.int64)]
        for d, (dx, dy) in enumerate(_D8):
            txs.append(cx - dx)
            tys.append(cy - dy)
            tags.append(np.full(len(b), d, np.int64))
        return pd.DataFrame({"cx": np.concatenate(txs),
                             "cy": np.concatenate(tys),
                             "tag": np.concatenate(tags),
                             "v": np.tile(v, 9)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(9))
        p = p[p[8].notna()]
        own = p[8].to_numpy(np.int64)
        big = np.int64(1) << 62
        keys = np.full((len(p), 8), big, np.int64)
        for d in range(8):
            bn = p[d].to_numpy(np.float64)
            has = ~np.isnan(bn)
            lower = has & (bn < own)
            keys[lower, d] = bn[lower].astype(np.int64) * 8 + d
        best = keys.min(axis=1)
        has_flow = best < big
        d_star = keys.argmin(axis=1)
        cx = p.index.get_level_values(0).to_numpy(np.int64)
        cy = p.index.get_level_values(1).to_numpy(np.int64)
        dx = np.array([d[0] for d in _D8], np.int64)[d_star]
        dy = np.array([d[1] for d in _D8], np.int64)[d_star]
        return pd.DataFrame({
            "cx": cx, "cy": cy,
            "tx": np.where(has_flow, cx + dx, cx),
            "ty": np.where(has_flow, cy + dy, cy)})

    cells = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)

    def label(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cx", "cy"], kind="stable") \
            .reset_index(drop=True)
        key = g["cx"].to_numpy(np.int64) * (np.int64(1) << 32) \
            + g["cy"].to_numpy(np.int64)
        tkey = g["tx"].to_numpy(np.int64) * (np.int64(1) << 32) \
            + g["ty"].to_numpy(np.int64)
        ptr = np.searchsorted(key, tkey)
        for _ in range(WS_DOUBLINGS):
            ptr = ptr[ptr]
        cx = g["cx"].to_numpy(np.int64)
        cy = g["cy"].to_numpy(np.int64)
        return pd.DataFrame({"cx": cx, "cy": cy,
                             "basin_x": cx[ptr], "basin_y": cy[ptr]})

    one = cells.map_batches(lambda b: b.assign(_one=np.int64(0)),
                            batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: label(g.drop(columns=["_one"])),
        batch_format="pandas")


def SQL_WATERSHED():
    dirs = ", ".join(f"({d}, {dx}, {dy})"
                     for d, (dx, dy) in enumerate(_D8))
    steps = []
    prev = "p0"
    for r in range(1, WS_DOUBLINGS + 1):
        steps.append(f"""
p{r} AS MATERIALIZED (
  SELECT a.cx, a.cy, b.tx, b.ty
  FROM {prev} a JOIN {prev} b ON b.cx = a.tx AND b.cy = a.ty)""")
        prev = f"p{r}"
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
cells AS MATERIALIZED (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
cand AS (SELECT a.cx, a.cy, b.n AS bn, d.d AS d,
                a.cx + d.dx AS tx, a.cy + d.dy AS ty
         FROM cells a
         CROSS JOIN (VALUES {dirs}) d(d, dx, dy)
         JOIN cells b ON b.cx = a.cx + d.dx AND b.cy = a.cy + d.dy
         WHERE b.n < a.n),
flow AS (SELECT cx, cy, tx, ty FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY cx, cy
                                      ORDER BY bn, d) AS rn
         FROM cand) WHERE rn = 1),
p0 AS MATERIALIZED (
  SELECT c.cx, c.cy,
         COALESCE(f.tx, c.cx) AS tx, COALESCE(f.ty, c.cy) AS ty
  FROM cells c LEFT JOIN flow f ON f.cx = c.cx AND f.cy = c.cy),
{",".join(steps)[1:]}
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(tx AS BIGINT) AS basin_x, CAST(ty AS BIGINT) AS basin_y
FROM p{WS_DOUBLINGS}
"""


def q_benford(sf_dir: str):
    """Benford's-law first-digit audit (the fraud-screening classic)
    of event values per event_type: leading decimal digit of the
    exact integer cents, counted per (type, digit). The digit is
    extracted by a bounded vectorized divide-by-10 loop (≤19 steps on
    the whole array — no string round-trip, no per-row Python); SQL
    replays it as substr of the integer's decimal text, identical for
    positive ints. Partial counts fold per batch; only (type, digit)
    rows shuffle."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        c = np.rint(b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        keep = c > 0
        d = c[keep]
        while True:
            big = d >= 10
            if not big.any():
                break
            d = np.where(big, d // 10, d)
        df = pd.DataFrame({"event_type":
                           b["event_type"].to_pandas()[keep].to_numpy(),
                           "digit": d})
        g = (df.groupby(["event_type", "digit"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return rel.groupby_aggregate(parts, ["event_type", "digit"],
                                 [("n", "n", "sum")])


SQL_BENFORD = """
WITH c AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
d AS (SELECT event_type,
             CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                 AS digit
      FROM c WHERE cents > 0)
SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n
FROM d GROUP BY event_type, digit
"""


def q_attribution(sf_dir: str):
    """Last-touch conversion attribution: every purchase event is
    credited to the user's immediately preceding event's type (the
    marketing-analytics classic — which touchpoint gets the sale).
    One user-bucketed shuffle; inside a bucket the previous-event
    lookup is a vectorized shift over the (user, ts)-sorted frame
    ((user_id, ts) has no ties in the fixtures). Output: per
    attributed channel, purchases credited."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        cur = et[1:][same]
        prev = et[:-1][same]
        sel = cur == "purchase"
        df = pd.DataFrame({"channel": prev[sel]})
        out = (df.groupby("channel", sort=False).size()
               .rename("n_purchases").reset_index())
        out["n_purchases"] = out["n_purchases"].astype(np.int64)
        return out

    parts = rel.bucketed_group_apply(ds, ["user_id"], per_bucket)
    return rel.groupby_aggregate(parts, ["channel"],
                                 [("n_purchases", "n_purchases", "sum")])


SQL_ATTRIBUTION = """
WITH h AS (SELECT event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts) AS prev
           FROM events)
SELECT prev AS channel, CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM h WHERE event_type = 'purchase' AND prev IS NOT NULL
GROUP BY prev
"""


GEOHASH_CHARS = 4          # 20 bits: 10 lon + 10 lat
_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def q_geohash_cells(sf_dir: str):
    """Geohash cell index (the public base-32 interleaved-bit format,
    lon bit first) over the lineitem point set: count points per
    {GEOHASH_CHARS}-char geohash. On the dyadic lattice every geohash
    bit is EXACT integer arithmetic — lon bit j = (ix·2^(j+1)) //
    368640 mod 2 (and lat over 184320) — so the whole encode replays
    bit-for-bit in SQL, including the base-32 char lookup. Adds the
    third public cell-index family next to quadkey (grid.py) and
    Z-order (zorder_shards)."""
    pts = points_lineitem(sf_dir)
    nbits = GEOHASH_CHARS * 5

    def encode(batch: pa.Table) -> pd.DataFrame:
        ix = batch["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = batch["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.zeros(len(ix), np.int64)
        lon_j = 0
        lat_j = 0
        for b in range(nbits):
            if b % 2 == 0:
                bit = (ix << (lon_j + 1)) // 368640 % 2
                lon_j += 1
            else:
                bit = (iy << (lat_j + 1)) // 184320 % 2
                lat_j += 1
            v = v * 2 + bit
        df = pd.DataFrame({"v": v})
        g = df.groupby("v", sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = pts.map_batches(encode, batch_format="pyarrow",
                            batch_size=65536)
    agg = rel.groupby_aggregate(parts, ["v"], [("n", "n", "sum")])

    alpha = np.array(list(_GH32))

    def stringify(b: pd.DataFrame) -> pd.DataFrame:
        v = b["v"].to_numpy(np.int64)
        gh = np.full(len(v), "", object)
        for c in range(GEOHASH_CHARS):
            shift = 5 * (GEOHASH_CHARS - 1 - c)
            gh = np.char.add(gh.astype(str),
                             alpha[(v >> shift) & 31])
        return pd.DataFrame({"geohash": gh,
                             "n": b["n"].to_numpy(np.int64)})

    return agg.map_batches(stringify, batch_format="pandas",
                           batch_size=65536)


def SQL_GEOHASH_CELLS():
    terms = []
    lon_j = 0
    lat_j = 0
    nbits = GEOHASH_CHARS * 5
    for b in range(nbits):
        w = 1 << (nbits - 1 - b)
        if b % 2 == 0:
            terms.append(f"((ix * {1 << (lon_j + 1)}) // 368640 % 2) * {w}")
            lon_j += 1
        else:
            terms.append(f"((iy * {1 << (lat_j + 1)}) // 184320 % 2) * {w}")
            lat_j += 1
    vexpr = " + ".join(terms)
    chars = " || ".join(
        f"substr('{_GH32}', (v >> {5 * (GEOHASH_CHARS - 1 - c)}) % 32 + 1, 1)"
        for c in range(GEOHASH_CHARS))
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
enc AS (SELECT {vexpr} AS v FROM pts),
agg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM enc GROUP BY v)
SELECT {chars} AS geohash, n FROM agg
"""


def q_lisa_quadrants(sf_dir: str):
    """LISA cluster classification (Anselin's local Moran quadrants —
    the hot/cold-spot cluster map, complementing the global moran_i
    and gi_star queries): every interior cell of the density grid is
    classified HH=1 / LL=2 / HL=3 / LH=4 by the SIGNS of its own
    centered value and its rook-lag sum, with the global mean division
    cleared (z_i ∝ T·n_i − S, so signs are exact int64 at every
    checked scale). The two global scalars (T cells, S total) are a
    bounded driver fold; the lag is the slope_grid 5-tag sparse
    stencil. Cells where either term is exactly 0 get quad=0."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")]).materialize()

    tot = grid_ds.map_batches(
        lambda b: pd.DataFrame({"t": [np.int64(len(b))],
                                "s": [np.int64(b["n"].sum())]}),
        batch_format="pandas", batch_size=65536).to_pandas()
    T = np.int64(tot["t"].sum())
    S = np.int64(tot["s"].sum())

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx, cx - 1, cx + 1, cx, cx])
        ty = np.concatenate([cy, cy, cy, cy - 1, cy + 1])
        tag = np.repeat(np.arange(5, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 5)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(5))
        ok = p.notna().all(axis=1)
        p = p[ok]
        z = T * p[0].to_numpy(np.int64) - S
        lag = sum(T * p[k].to_numpy(np.int64) - S for k in range(1, 5))
        quad = np.zeros(len(p), np.int64)
        quad[(z > 0) & (lag > 0)] = 1
        quad[(z < 0) & (lag < 0)] = 2
        quad[(z > 0) & (lag < 0)] = 3
        quad[(z < 0) & (lag > 0)] = 4
        idx = p.index.to_frame(index=False)
        return pd.DataFrame({"cx": idx["cx"].to_numpy(np.int64),
                             "cy": idx["cy"].to_numpy(np.int64),
                             "quad": quad})

    out = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)
    return rel.with_empty_schema(out, pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()), ("quad", pa.int64())]))


def SQL_LISA_QUADRANTS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS MATERIALIZED (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(n) AS BIGINT) AS s FROM g),
j AS (SELECT c.cx, c.cy,
             tot.t * c.n - tot.s AS z,
             (tot.t * e.n - tot.s) + (tot.t * w.n - tot.s)
             + (tot.t * n_.n - tot.s) + (tot.t * s_.n - tot.s) AS lag
      FROM g c CROSS JOIN tot
      JOIN g e  ON e.cx = c.cx + 1 AND e.cy = c.cy
      JOIN g w  ON w.cx = c.cx - 1 AND w.cy = c.cy
      JOIN g n_ ON n_.cx = c.cx AND n_.cy = c.cy - 1
      JOIN g s_ ON s_.cx = c.cx AND s_.cy = c.cy + 1)
SELECT cx, cy,
       CAST(CASE WHEN z > 0 AND lag > 0 THEN 1
                 WHEN z < 0 AND lag < 0 THEN 2
                 WHEN z > 0 AND lag < 0 THEN 3
                 WHEN z < 0 AND lag > 0 THEN 4
                 ELSE 0 END AS BIGINT) AS quad
FROM j
"""


FILL_ROUNDS = 40  # ≥ max boundary distance on the 45×23-cell 8° grid


def q_fill_sinks(sf_dir: str):
    """Depression filling (the priority-flood hydrology pre-step that
    makes flow_acc/watershed drainage-complete): filled(c) is the
    lowest level water at cell c can escape to the grid BOUNDARY, the
    fixed point of f ← max(elev, min over 8 neighbors of f) with
    boundary cells (any missing neighbor) pinned at their elevation.
    {FILL_ROUNDS} Jacobi rounds are exact here because no cell is
    farther than {FILL_ROUNDS} steps from the boundary on the ≤45×23
    cell grid (bounded-rounds contract, as flow_acc). The corpus pass
    is the one streamed density aggregate; the rounds act on the
    cell-bounded table as a DENSE ≤45×23 array inside the single
    bounded combine. SQL replays each round as a min-over-neighbors
    join CTE. Output: cells whose filled level exceeds elevation
    (the detected sinks) plus depth."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        cx = g["cx"].to_numpy(np.int64)
        cy = g["cy"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        x0, y0 = cx.min(), cy.min()
        W = int(cx.max() - x0) + 1
        H = int(cy.max() - y0) + 1
        BIG = np.int64(1) << 60
        elev = np.full((H + 2, W + 2), -1, np.int64)   # pad = missing
        elev[cy - y0 + 1, cx - x0 + 1] = n
        present = elev >= 0
        # boundary: any of the 8 neighbors missing
        nb_ok = np.ones_like(present)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                sh = np.zeros_like(present)
                sh[max(0, dy):H + 2 + min(0, dy),
                   max(0, dx):W + 2 + min(0, dx)] = \
                    present[max(0, -dy):H + 2 + min(0, -dy),
                            max(0, -dx):W + 2 + min(0, -dx)]
                nb_ok &= sh
        interior = present & nb_ok
        f = np.where(present & ~interior, elev, BIG)
        f[~present] = BIG
        for _ in range(FILL_ROUNDS):
            m = np.full_like(f, BIG)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    sh = np.full_like(f, BIG)
                    sh[max(0, dy):H + 2 + min(0, dy),
                       max(0, dx):W + 2 + min(0, dx)] = \
                        f[max(0, -dy):H + 2 + min(0, -dy),
                          max(0, -dx):W + 2 + min(0, -dx)]
                    m = np.minimum(m, sh)
            f = np.where(interior, np.maximum(elev, m), f)
        yy, xx = np.nonzero(present & (f > elev))
        return pd.DataFrame({
            "cx": (xx + x0 - 1).astype(np.int64),
            "cy": (yy + y0 - 1).astype(np.int64),
            "elev": elev[yy, xx],
            "filled": f[yy, xx]})

    one = grid_ds.map_batches(lambda b: b.assign(_one=np.int64(0)),
                              batch_format="pandas")
    out = one.groupby("_one").map_groups(
        lambda g: fill(g.drop(columns=["_one"])),
        batch_format="pandas").materialize()
    if out.count() == 0:
        # a drainage-complete grid has NO sinks — typed empty pandas
        # (Dataset.to_pandas drops the schema of an all-empty dataset)
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("cx", "cy", "elev", "filled")})
    return out


def SQL_FILL_SINKS():
    dirs = ", ".join(f"({dx}, {dy})"
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if not (dx == 0 and dy == 0))
    steps = []
    prev = "f0"
    for r in range(1, FILL_ROUNDS + 1):
        steps.append(f"""
f{r} AS MATERIALIZED (
  SELECT c.cx, c.cy, c.n, c.inter,
         CASE WHEN c.inter = 0 THEN c.f
              ELSE GREATEST(c.n, (SELECT MIN(p.f) FROM {prev} p
                    JOIN (VALUES {dirs}) d(dx, dy)
                      ON p.cx = c.cx + d.dx AND p.cy = c.cy + d.dy))
         END AS f
  FROM {prev} c)""")
        prev = f"f{r}"
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS MATERIALIZED (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
nbcnt AS (SELECT c.cx, c.cy,
                 (SELECT COUNT(*) FROM g p
                  JOIN (VALUES {dirs}) d(dx, dy)
                    ON p.cx = c.cx + d.dx AND p.cy = c.cy + d.dy) AS k
          FROM g c),
f0 AS MATERIALIZED (
  SELECT g.cx, g.cy, g.n,
         CASE WHEN nb.k = 8 THEN 1 ELSE 0 END AS inter,
         CASE WHEN nb.k = 8 THEN CAST(1152921504606846976 AS BIGINT)
              ELSE g.n END AS f
  FROM g JOIN nbcnt nb ON nb.cx = g.cx AND nb.cy = g.cy),
{",".join(steps)[1:]}
SELECT cx, cy, CAST(n AS BIGINT) AS elev, CAST(f AS BIGINT) AS filled
FROM f{FILL_ROUNDS} WHERE f > n
"""


def q_reproject_moll(sf_dir: str):
    """Per-point Mollweide (equal-area pseudocylindrical world
    projection, authalic-sphere form, geom/proj.py) over the customer
    points — the world-thematic-map workflow (rows-only:
    transcendental Newton solve; correctness locked by the
    invariant-based unit tests: exact local equal-area vs the
    ellipsoid, pseudocylindrical shape, 2:1 boundary ellipse,
    pole-exact round trips)."""
    from pythongis_ray.geom import proj as _proj

    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        x, y = _proj.moll_forward(lon, lat, 0.0)
        return pa.table({"ck": batch["ck"],
                         "moll_x": pa.array(x), "moll_y": pa.array(y)})

    return cpts.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def q_jsonl_roundtrip(sf_dir: str):
    """Corpus-interchange loop: documents → distributed ndjson shards
    (sources.write_jsonl) → distributed re-read → (doc_id, text). The
    value-hash match vs SELECT doc_id, text FROM documents proves
    every text byte (including CJK codepoints through their JSON
    escapes) survived the encode/decode — the per-row byte-identity
    invariant extended to the ndjson format."""
    import shutil
    import tempfile

    from pythongis_ray import sources

    d = tempfile.mkdtemp(prefix="jsonl_q_", dir="/tmp")
    try:
        ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"])
        sources.write_jsonl(ds, d)
        back = sources.read_jsonl(d)
        return back.select_columns(["doc_id", "text"]).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


SQL_JSONL_ROUNDTRIP = "SELECT doc_id, text FROM documents"


def q_hard_negatives(sf_dir: str):
    """Contrastive hard-negative mining over the embedding corpus:
    for each of the 8 query vectors, the top-1 corpus vector by exact
    quantized dot product whose LABEL differs from the query's — the
    highest-similarity wrong-class example a contrastive trainer pairs
    against each anchor. Distributed part: broadcast query matrix,
    per-batch masked matmul partial top-k (embed.hard_negatives);
    driver combine over nq·nbatches rows."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "<", 8)])
    nn = embed.hard_negatives(emb, qdf, k=1)
    out = nn[["query_id", "neighbor_id", "score"]].reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


SQL_HARD_NEGATIVES = """
WITH q AS (
  SELECT vec_id AS query_id, label AS qlab,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qe
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qe,
              list_transform(e.embedding,
                             x -> round(CAST(x AS DOUBLE) * 1000)))
              AS BIGINT) AS score
  FROM q CROSS JOIN embeddings e WHERE e.label <> q.qlab
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score FROM ranked WHERE rank = 1
"""


def q_move_octants(sf_dir: str):
    """Movement-direction histogram (the mobility-mining direction
    rose): every consecutive user hop is classified into one of 8
    45°-boundary sectors using ONLY sign and magnitude comparisons of
    the exact integer displacement (octant boundaries at 0/45/90/…
    are rational predicates — no atan2, bit-replayable in SQL CASE).
    Zero-displacement hops are excluded. One user-bucketed shuffle,
    vectorized np.select in the bucket; output global per-octant hop
    counts."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"user_id": batch["user_id"], "ts_us": us,
                         "ix": ix, "iy": iy})

    pts = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        x = g["ix"].to_numpy(np.int64)
        y = g["iy"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        dx = (x[1:] - x[:-1])[same]
        dy = (y[1:] - y[:-1])[same]
        nz = (dx != 0) | (dy != 0)
        dx, dy = dx[nz], dy[nz]
        octant = np.select(
            [(dx > 0) & (dy >= 0) & (dx > dy),
             (dy > 0) & (dx > 0) & (dy >= dx),
             (dy > 0) & (dx <= 0) & (dy > -dx),
             (dx < 0) & (dy > 0) & (-dx >= dy),
             (dx < 0) & (dy <= 0) & (-dx > -dy),
             (dy < 0) & (dx < 0) & (-dy >= -dx),
             (dy < 0) & (dx >= 0) & (-dy > dx)],
            [0, 1, 2, 3, 4, 5, 6], default=7).astype(np.int64)
        gq = pd.Series(octant).value_counts().sort_index()
        return pd.DataFrame({"octant": gq.index.to_numpy(np.int64),
                             "n_hops": gq.to_numpy(np.int64)})

    parts = rel.bucketed_group_apply(pts, ["user_id"], per_bucket)
    return rel.groupby_aggregate(parts, ["octant"],
                                 [("n_hops", "n_hops", "sum")])


def SQL_MOVE_OCTANTS():
    src = "(SELECT event_id, user_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
hops AS (SELECT ix - LAG(ix) OVER w AS dx, iy - LAG(iy) OVER w AS dy
         FROM ge WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
v AS (SELECT CASE
        WHEN dx >  0 AND dy >= 0 AND dx >  dy  THEN 0
        WHEN dy >  0 AND dx >  0 AND dy >= dx  THEN 1
        WHEN dy >  0 AND dx <= 0 AND dy > -dx  THEN 2
        WHEN dx <  0 AND dy >  0 AND -dx >= dy THEN 3
        WHEN dx <  0 AND dy <= 0 AND -dx > -dy THEN 4
        WHEN dy <  0 AND dx <  0 AND -dy >= -dx THEN 5
        WHEN dy <  0 AND dx >= 0 AND -dy > dx  THEN 6
        ELSE 7 END AS octant
      FROM hops
      WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0))
SELECT CAST(octant AS BIGINT) AS octant,
       CAST(COUNT(*) AS BIGINT) AS n_hops
FROM v GROUP BY octant
"""


def q_peaks(sf_dir: str):
    """Time-series peak detection over the hourly event-count series
    per event_type: an hour is a PEAK iff its count strictly exceeds
    both neighbor hours' counts (absent hours count 0 — the standard
    local-maximum definition on a sparse series). The corpus pass is
    one (type, hour) count aggregate; the neighbor test runs inside
    one type-bucketed combine via searchsorted against the hour-sorted
    bounded series (hours × types rows, not events)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def hourly(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "hour": us // 3_600_000_000})
        g = (df.groupby(["event_type", "hour"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(hourly, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["event_type", "hour"],
                                   [("n", "n", "sum")])

    def find_peaks(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values("hour", kind="stable")
            h = gg["hour"].to_numpy(np.int64)
            n = gg["n"].to_numpy(np.int64)
            prev = np.zeros(len(h), np.int64)
            nxt = np.zeros(len(h), np.int64)
            i = np.searchsorted(h, h - 1)
            ok = (i < len(h)) & (h[np.minimum(i, len(h) - 1)] == h - 1)
            prev[ok] = n[i[ok]]
            j = np.searchsorted(h, h + 1)
            ok = (j < len(h)) & (h[np.minimum(j, len(h) - 1)] == h + 1)
            nxt[ok] = n[j[ok]]
            keep = (n > prev) & (n > nxt)
            outs.append(pd.DataFrame({
                "event_type": np.repeat(et, keep.sum()),
                "hour": h[keep], "n": n[keep]}))
        cols = {"event_type": pd.Series(dtype=object),
                "hour": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64)}
        if not outs:
            return pd.DataFrame(cols)
        return pd.concat(outs, ignore_index=True)

    return rel.bucketed_group_apply(counts, ["event_type"], find_peaks)


SQL_PEAKS = """
WITH c AS (SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
SELECT c.event_type, c.hour, c.n
FROM c
LEFT JOIN c p ON p.event_type = c.event_type AND p.hour = c.hour - 1
LEFT JOIN c x ON x.event_type = c.event_type AND x.hour = c.hour + 1
WHERE c.n > COALESCE(p.n, 0) AND c.n > COALESCE(x.n, 0)
"""


# colocation: spatial eps in lattice units
COLOC_EPS = 64
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_colocation(sf_dir: str):
    """Spatial colocation pattern mining (the participation-count core
    of the Shekhar/Huang colocation framework): for every ORDERED pair
    of distinct event types (A, B), how many A-events have at least
    one B-event within {COLOC_EPS} lattice units. One exactly-once
    canonical-tile self-join carries the (int-coded) event type
    through the shuffle and drops same-type candidates IN-KERNEL;
    the participation dedup is one bucketed keep-first over
    (event, other_type) — no per-type passes, no all-pairs."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type"])
    code = {t: i for i, t in enumerate(_EVENT_TYPES)}

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = batch["event_type"].to_pandas().map(code) \
            .to_numpy(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"event_id": pa.array(eid), "ix": ix, "iy": iy,
                         "etype": pa.array(et)})

    pts = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    # materialize the pair boundary: fusing the 12M-row pair emission
    # into the downstream dedup chain bundles tasks to the largest
    # batch and halves parallelism (measured 11.5s staged vs 17-26s
    # fused at sf0.1 / 8 cpus — the CLAUDE.md fusion gotcha)
    pairs = spatial.dwithin_self_pairs(
        pts, "event_id", "ix", "iy", eps=COLOC_EPS, carry=("etype",),
        pair_filter=lambda d2, ca, cb:
            ca["etype"] != cb["etype"]).materialize()

    K = np.int64(len(_EVENT_TYPES))

    def both_dirs(b: pa.Table) -> pd.DataFrame:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        ta = b["etype_a"].to_numpy(zero_copy_only=False)
        tb = b["etype_b"].to_numpy(zero_copy_only=False)
        eid = np.concatenate([ia, ib])
        own = np.concatenate([ta, tb])
        other = np.concatenate([tb, ta])
        # LOCAL dedup before the shuffle: a clustered event meets the
        # same other-type thousands of times in one tile — distinct
        # (eid, own, other) triples are what moves (25M → ~100k rows
        # at sf0.1)
        key = np.unique((eid * K + own) * K + other)
        return pd.DataFrame({"eid": key // (K * K),
                             "own": key // K % K,
                             "other": key % K})

    # batch_size=None → one call per per_bucket output block, so the
    # local dedup sees ALL of a bucket's pairs at once (an event's
    # pairs concentrate in its tile bucket)
    part = pairs.map_batches(both_dirs, batch_format="pyarrow",
                             batch_size=None)
    dd = rel.dedup(part, ["eid", "own", "other"])
    counts = rel.groupby_aggregate(dd, ["own", "other"],
                                   [("n_events", "eid", "count")])

    names = np.array(_EVENT_TYPES)

    def stringify(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "type_a": names[b["own"].to_numpy(np.int64)],
            "type_b": names[b["other"].to_numpy(np.int64)],
            "n_events": b["n_events"].to_numpy(np.int64)})

    out = counts.map_batches(stringify, batch_format="pandas",
                             batch_size=65536).materialize()
    if out.count() == 0:
        # an isolated point set has NO colocations — typed empty
        # pandas (Dataset.to_pandas drops all-empty schemas)
        return pd.DataFrame({"type_a": pd.Series([], dtype=object),
                             "type_b": pd.Series([], dtype=object),
                             "n_events": pd.Series([], dtype=np.int64)})
    return out


def SQL_COLOCATION():
    src = ("(SELECT event_id, event_type, event_id*4+1 AS gk "
           "FROM events)")
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
pairs AS (SELECT a.event_id AS ea, a.event_type AS ta,
                 b.event_id AS eb, b.event_type AS tb
          FROM ge a JOIN ge b
            ON a.event_id < b.event_id
           AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
               <= {COLOC_EPS * COLOC_EPS}
           AND a.event_type <> b.event_type),
bothd AS (SELECT ea AS eid, ta AS own, tb AS other FROM pairs
          UNION
          SELECT eb, tb, ta FROM pairs)
SELECT own AS type_a, other AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM bothd GROUP BY own, other
"""


def q_lang_skew(sf_dir: str):
    """Per-source language-mix divergence from the global mix, with
    the expectation denominator CLEARED to exact integers: for source
    s, div = Σ_l (T·n_sl − n_s·n_l)² where T is the corpus size, n_s
    the source size, n_l the global language count (the χ²-numerator
    family — a source whose language profile matches the corpus gets
    0). The corpus pass is one (source, lang) count; the divergence
    fold runs on that bounded sources×langs table (int64-safe at
    every checked scale: terms ≤ ~2.5e7, squares ≤ 6e14)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "lang"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "lang": b["lang"].to_pandas()})
        g = (df.groupby(["source", "lang"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["source", "lang"],
                                   [("n", "n", "sum")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        T = np.int64(g["n"].sum())
        nl = g.groupby("lang")["n"].sum()
        piv = g.pivot_table(index="source", columns="lang", values="n",
                            aggfunc="sum").fillna(0).astype(np.int64)
        piv = piv.reindex(columns=nl.index, fill_value=0)
        ns = piv.sum(axis=1).to_numpy(np.int64)
        diff = T * piv.to_numpy(np.int64) \
            - ns[:, None] * nl.to_numpy(np.int64)[None, :]
        return pd.DataFrame({
            "source": piv.index.to_numpy(),
            "n_docs": ns,
            "div_num": (diff * diff).sum(axis=1).astype(np.int64)})

    one = counts.map_batches(lambda b: b.assign(_one=np.int64(0)),
                             batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: fold(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_LANG_SKEW = """
WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source, lang),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM c),
nl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_l FROM c GROUP BY lang),
ns AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_s FROM c GROUP BY source),
grid AS (SELECT ns.source, nl.lang, ns.n_s, nl.n_l,
                COALESCE(c.n, 0) AS n
         FROM ns CROSS JOIN nl
         LEFT JOIN c ON c.source = ns.source AND c.lang = nl.lang)
SELECT g.source, CAST(MIN(g.n_s) AS BIGINT) AS n_docs,
       CAST(SUM((t.tt * g.n - g.n_s * g.n_l)
                * (t.tt * g.n - g.n_s * g.n_l)) AS BIGINT) AS div_num
FROM grid g CROSS JOIN t
GROUP BY g.source
"""


def q_winnow_fps(sf_dir: str):
    """Winnowing document fingerprints (MOSS): per doc, distinct
    window-minima of the 5-token shingle hashes (window 4) and how
    many are shared with another doc — the guaranteed-recall,
    ~2/(w+1)-bandwidth local fingerprint standard (see
    text.winnow_stats). Oracle: the full shingle-hash replay of
    dup_shingles plus a list-slice min fold per window in HUGEINT."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return text.winnow_stats(ds, k=5, w=4)


SQL_WINNOW_FPS = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
hw AS (SELECT doc_id,
         [list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(w, '')]),
            (a, x) -> (a * 1099511628211 + x)
                      % CAST('18446744073709551616' AS HUGEINT))
          FOR w IN toks] AS thl,
         len(toks) AS n
       FROM d),
sh AS (SELECT doc_id,
         [list_reduce(list_prepend(CAST(0 AS HUGEINT),
             thl[i + 1 : i + least(n, 5)]),
             (a, x) -> (a * 1000003 + x)
                       % CAST('18446744073709551616' AS HUGEINT))
          FOR i IN range(greatest(n - 4, 1))] AS shs
       FROM hw),
wn AS (SELECT doc_id,
         [list_reduce(shs[i + 1 : i + least(len(shs), 4)],
                      (a, x) -> least(a, x))
          FOR i IN range(greatest(len(shs) - 3, 1))] AS fps
       FROM sh),
ps AS (SELECT doc_id, UNNEST(fps) AS f FROM wn),
pf AS (SELECT DISTINCT doc_id, f FROM ps),
sf AS (SELECT f FROM pf GROUP BY f HAVING COUNT(*) >= 2)
SELECT pf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
       CAST(SUM(CASE WHEN sf.f IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared
FROM pf LEFT JOIN sf ON sf.f = pf.f
GROUP BY pf.doc_id
"""


def q_postings_bytes(sf_dir: str):
    """Inverted-index size estimation: per term, the exact byte cost
    of its delta-encoded varint posting list (the storage model every
    search index uses — gaps of sorted doc ids, LEB128 bytes = 1 +
    one per 7-bit overflow threshold). Per-doc distinct terms explode
    map-side; ONE term-bucketed combine sorts each posting list and
    folds gap bytes vectorized (np.searchsorted on the 2^7k
    thresholds). Output: (word, df, n_bytes)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(b: pa.Table) -> pd.DataFrame:
        col = b["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        toks = pc.split_pattern(arr, " ")
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        nn = np.diff(toks.offsets.to_numpy(
            zero_copy_only=False)).astype(np.int64)
        did = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), nn)
        df = pd.DataFrame({"word": flat, "doc_id": did})
        return df.drop_duplicates(ignore_index=True)

    rows = ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=4096)

    TH = np.array([1 << (7 * j) for j in range(1, 9)], np.int64)

    def per_word(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["word", "doc_id"], kind="stable")
        w = g["word"].to_numpy()
        d = g["doc_id"].to_numpy(np.int64)
        new = np.concatenate(([True], w[1:] != w[:-1]))
        gap = np.where(new, d, d - np.concatenate(([0], d[:-1])))
        nb = 1 + np.searchsorted(TH, gap, side="right")
        out = pd.DataFrame({"word": w, "one": np.int64(1), "nb": nb})
        agg = out.groupby("word", sort=False).agg(
            df=("one", "sum"), n_bytes=("nb", "sum")).reset_index()
        agg["df"] = agg["df"].astype(np.int64)
        agg["n_bytes"] = agg["n_bytes"].astype(np.int64)
        return agg

    return rel.bucketed_group_apply(rows, ["word"], per_word)


SQL_POSTINGS_BYTES = """
WITH ws AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
            FROM documents),
wd AS (SELECT DISTINCT doc_id, word FROM ws),
g AS (SELECT word, doc_id,
             doc_id - LAG(doc_id) OVER (PARTITION BY word
                                        ORDER BY doc_id) AS gap
      FROM wd),
v AS (SELECT word, COALESCE(gap, doc_id) AS val FROM g)
SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(1 + CASE WHEN val >= 128 THEN 1 ELSE 0 END
                  + CASE WHEN val >= 16384 THEN 1 ELSE 0 END
                  + CASE WHEN val >= 2097152 THEN 1 ELSE 0 END
                  + CASE WHEN val >= 268435456 THEN 1 ELSE 0 END
                  + CASE WHEN val >= 34359738368 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bytes
FROM v GROUP BY word
"""


G_FUNC_RADII = (32, 64, 128, 256)


def q_g_function(sf_dir: str):
    """Empirical G-function (nearest-neighbor distance distribution —
    the event-to-event companion of ripley_k's K-function): for each
    r, how many customer points have their nearest OTHER point within
    r, censored at rmax={max(G_FUNC_RADII)} (points whose NN is
    farther contribute to no radius, the standard empirical-G
    censoring). One exactly-once tile self-join at rmax feeds the
    whole curve; per-point minima fold through one id-bucketed
    combine. Output always has one row per radius plus the constant
    denominator n_points."""
    pts = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    n_points = np.int64(pts.count())
    rmax = max(G_FUNC_RADII)
    pairs = spatial.dwithin_self_pairs(pts, "ck", "ix", "iy", eps=rmax)
    radii = np.array(G_FUNC_RADII, np.int64)

    def both(b: pa.Table) -> pd.DataFrame:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        d2 = b["d2"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"ck": np.concatenate([ia, ib]),
                           "d2": np.concatenate([d2, d2])})
        g = df.groupby("ck", sort=False)["d2"].min().reset_index()
        g["d2"] = g["d2"].astype(np.int64)
        return g

    per_pt = rel.bucketed_group_apply(
        pairs.map_batches(both, batch_format="pyarrow",
                          batch_size=65536),
        ["ck"],
        lambda g: g.groupby("ck", sort=False)["d2"].min().reset_index()
                   .astype(np.int64))

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        m = b["d2"].to_numpy(np.int64)
        n = np.array([(m <= r * r).sum() for r in radii], np.int64)
        return pd.DataFrame({"r": radii, "n_within": n})

    parts = per_pt.map_batches(hist, batch_format="pandas",
                               batch_size=65536).to_pandas()
    if len(parts):
        g = parts.groupby("r", sort=True)["n_within"].sum() \
            .reindex(radii, fill_value=0)
        nw = g.to_numpy(np.int64)
    else:
        nw = np.zeros(len(radii), np.int64)
    return pd.DataFrame({"r": radii, "n_within": nw,
                         "n_points": np.full(len(radii), n_points)})


def SQL_G_FUNCTION():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    rmax = max(G_FUNC_RADII)
    radii = ", ".join(f"({r})" for r in G_FUNC_RADII)
    return f"""
WITH pts AS (SELECT ck, ix, iy FROM ({g}) _g),
nn AS (SELECT a.ck,
              MIN((a.ix-b.ix)*(a.ix-b.ix)
                  + (a.iy-b.iy)*(a.iy-b.iy)) AS m
       FROM pts a JOIN pts b
         ON a.ck <> b.ck
        AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
            <= {rmax * rmax}
       GROUP BY a.ck)
SELECT r.r, CAST(SUM(CASE WHEN nn.m <= r.r * r.r THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_within,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_points
FROM (VALUES {radii}) r(r) LEFT JOIN nn ON TRUE
GROUP BY r.r
"""


def q_arrival_gaps(sf_dir: str):
    """Inter-arrival gap quantiles per event_type (the load-profile
    classic): consecutive same-type events in the global (ts,
    event_id)-ordered stream; p50/p90 of the µs gaps by the
    engine-wide quantile_disc convention sorted[floor((n-1)q)]. Type
    cardinality is 5, so each type's series sits whole in one bucket
    (the sessionize partitioning assumption)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values(["ts", "event_id"], kind="stable")
            us = gg["ts"].to_numpy("datetime64[us]").astype(np.int64)
            if len(us) < 2:
                continue
            gap = np.sort(us[1:] - us[:-1])
            n = len(gap)
            # DuckDB quantile_disc picks sorted[ceil(q*n) - 1]
            rows.append({"event_type": et, "n_gaps": n,
                         "p50": gap[(n + 1) // 2 - 1],
                         "p90": gap[(9 * n + 9) // 10 - 1]})
        cols = ("event_type", "n_gaps", "p50", "p90")
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object if c ==
                                              "event_type" else np.int64)
                                 for c in cols})
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(ds, ["event_type"], per_type)


SQL_ARRIVAL_GAPS = """
WITH s AS (SELECT event_type,
                  epoch_us(ts) - LAG(epoch_us(ts))
                      OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS gap
           FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90
FROM s WHERE gap IS NOT NULL GROUP BY event_type
"""


def q_path_trigrams(sf_dir: str):
    """User-journey trigrams: counts of consecutive event-type triples
    per user stream (the order-3 extension of the transitions Markov
    query — path-mining's bread and butter). One user-bucketed
    shuffle; triples form by two vectorized shifts inside the
    (user, ts)-sorted bucket."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        same2 = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        df = pd.DataFrame({"t1": et[:-2][same2], "t2": et[1:-1][same2],
                           "t3": et[2:][same2]})
        out = (df.groupby(["t1", "t2", "t3"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = rel.bucketed_group_apply(ds, ["user_id"], per_bucket)
    return rel.groupby_aggregate(parts, ["t1", "t2", "t3"],
                                 [("n", "n", "sum")])


SQL_PATH_TRIGRAMS = """
WITH s AS (SELECT user_id, event_type AS t3,
                  LAG(event_type) OVER w AS t2,
                  LAG(event_type, 2) OVER w AS t1
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t1 IS NOT NULL GROUP BY t1, t2, t3
"""


def q_sde_moments(sf_dir: str):
    """Standard deviational ellipse inputs per nation (the ESRI
    'Directional Distribution' tool): the exact integer moment
    six-tuple (n, sx, sy, sxx, syy, sxy) of each nation's customer
    points in lattice units — mean center, rotation angle
    tan 2θ = 2·(n·sxy − sx·sy) / ((n·sxx − sx²) − (n·syy − sy²)) and
    both axis lengths derive from it by closed form. Per-batch partial
    sums, one (nation)-keyed combine; nothing floats until the caller
    takes the arctangent."""
    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])

    def partial(b: pa.Table) -> pd.DataFrame:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) * 4 + 1
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(ck)
        x = np.asarray(ix, np.int64)
        y = np.asarray(iy, np.int64)
        df = pd.DataFrame({"nation": nk, "n": np.int64(1), "sx": x,
                           "sy": y, "sxx": x * x, "syy": y * y,
                           "sxy": x * y})
        g = df.groupby("nation", sort=False).sum().reset_index()
        return g.astype(np.int64)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return rel.groupby_aggregate(
        parts, ["nation"],
        [(c, c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])


def SQL_SDE_MOMENTS():
    src = "(SELECT c_nationkey AS nation, c_custkey*4+1 AS gk FROM customer)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g})
SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ix) AS BIGINT) AS sx, CAST(SUM(iy) AS BIGINT) AS sy,
       CAST(SUM(ix*ix) AS BIGINT) AS sxx,
       CAST(SUM(iy*iy) AS BIGINT) AS syy,
       CAST(SUM(ix*iy) AS BIGINT) AS sxy
FROM ge GROUP BY nation
"""


def q_forecast_error(sf_dir: str):
    """Seasonal-naive forecast backtest (the baseline every real
    forecaster must beat): predict each hour's event count per type
    as the SAME HOUR YESTERDAY's count (absent → 0) and report the
    exact integer MAE numerator Σ|actual − forecast| over hours with
    actual traffic. The corpus pass is one (type, hour) count; the
    backtest runs in one type-bucketed combine via searchsorted on
    the hour-sorted bounded series."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def hourly(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "hour": us // 3_600_000_000})
        g = (df.groupby(["event_type", "hour"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(hourly, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["event_type", "hour"],
                                   [("n", "n", "sum")])

    def backtest(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values("hour", kind="stable")
            h = gg["hour"].to_numpy(np.int64)
            n = gg["n"].to_numpy(np.int64)
            f = np.zeros(len(h), np.int64)
            i = np.searchsorted(h, h - 24)
            ok = (i < len(h)) & (h[np.minimum(i, len(h) - 1)] == h - 24)
            f[ok] = n[i[ok]]
            rows.append({"event_type": et, "n_hours": len(h),
                         "mae_num": int(np.abs(n - f).sum())})
        cols = ("event_type", "n_hours", "mae_num")
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object if c ==
                                              "event_type" else np.int64)
                                 for c in cols})
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(counts, ["event_type"], backtest)


SQL_FORECAST_ERROR = """
WITH c AS (SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(ABS(c.n - COALESCE(p.n, 0))) AS BIGINT) AS mae_num
FROM c LEFT JOIN c p
  ON p.event_type = c.event_type AND p.hour = c.hour - 24
GROUP BY c.event_type
"""


RING_VNODES_NEW = 72


def q_ring_rebalance(sf_dir: str):
    """Consistent-hashing rebalance audit (the scale-ops question
    behind every shard expansion): route every distinct key on the
    {RING_VNODES}-vnode ring AND the {RING_VNODES_NEW}-vnode ring and
    count keys per (old_node, new_node) — consistent hashing's
    minimal-movement guarantee shows as a diagonal-dominant matrix
    where only keys adjacent to the 8 new vnodes move. Same broadcast
    ring + streaming key route as hash_ring, two successor lookups
    per key; SQL replays both rings' HUGEINT arithmetic."""
    import ray

    from pythongis_ray import state

    def _h(sx: str) -> int:
        h = 0
        for ch in sx.encode():
            h = (h * 1099511628211 + ch) % (1 << 64)
        return (h * 2862933555777941757) % (1 << 64)

    rings = []
    for nv in (RING_VNODES, RING_VNODES_NEW):
        vn = sorted((_h(f"node{i}"), i) for i in range(nv))
        rings.append((np.array([h for h, _ in vn], np.uint64),
                      np.array([i for _, i in vn], np.int64)))
    vref = ray.put(tuple(rings))

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def keys(b: pa.Table) -> pd.DataFrame:
        et = b["event_type"].to_pandas().to_numpy(object)
        uid = b["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = np.array([f"{e}-{u}" for e, u in zip(et, uid)], object)
        return pd.DataFrame({"key": k}).drop_duplicates()

    raw = ds.map_batches(keys, batch_format="pyarrow",
                         batch_size=65536)
    uniq = rel.bucketed_group_apply(
        raw, ["key"], lambda g: g.drop_duplicates(ignore_index=True))

    def route(b: pd.DataFrame) -> pd.DataFrame:
        (oh, oi), (nh, ni) = state.get_broadcast(
            vref, key_extra=("ring2",))
        ks = b["key"].to_numpy(object)
        hs = np.array([_h(s) for s in ks], np.uint64)
        po = np.searchsorted(oh, hs, "left")
        po[po == len(oh)] = 0
        pn = np.searchsorted(nh, hs, "left")
        pn[pn == len(nh)] = 0
        df = pd.DataFrame({"old_node": oi[po].astype(np.int64),
                           "new_node": ni[pn].astype(np.int64)})
        g = (df.groupby(["old_node", "new_node"], sort=False).size()
             .rename("n_keys").reset_index())
        g["n_keys"] = g["n_keys"].astype(np.int64)
        return g

    parts = uniq.map_batches(route, batch_format="pandas",
                             batch_size=65536)
    return rel.groupby_aggregate(parts, ["old_node", "new_node"],
                                 [("n_keys", "n_keys", "sum")])


def SQL_RING_REBALANCE():
    def ring(nv: int, name: str) -> str:
        return f"""
{name} AS (SELECT v.range AS i,
              (list_reduce(list_prepend(CAST(0 AS HUGEINT),
                [CAST(ascii(c) AS HUGEINT)
                 FOR c IN string_split('node' || CAST(v.range AS VARCHAR),
                                       '')]),
                (a, x) -> (a * 1099511628211 + x)
                          % CAST('18446744073709551616' AS HUGEINT))
               * 2862933555777941757)
              % CAST('18446744073709551616' AS HUGEINT) AS h
            FROM range(0, {nv}) v)"""

    return f"""
WITH {ring(RING_VNODES, "vo")},
{ring(RING_VNODES_NEW, "vn")[1:]},
k AS (SELECT DISTINCT event_type || '-' || CAST(user_id AS VARCHAR)
        AS key FROM events),
kh AS (SELECT key,
         (list_reduce(list_prepend(CAST(0 AS HUGEINT),
           [CAST(ascii(c) AS HUGEINT) FOR c IN string_split(key, '')]),
           (a, x) -> (a * 1099511628211 + x)
                     % CAST('18446744073709551616' AS HUGEINT))
          * 2862933555777941757)
         % CAST('18446744073709551616' AS HUGEINT) AS h
       FROM k),
succ AS (SELECT kh.key,
           COALESCE((SELECT MIN(vo.h) FROM vo WHERE vo.h >= kh.h),
                    (SELECT MIN(h) FROM vo)) AS ovh,
           COALESCE((SELECT MIN(vn.h) FROM vn WHERE vn.h >= kh.h),
                    (SELECT MIN(h) FROM vn)) AS nvh
         FROM kh)
SELECT CAST(vo.i AS BIGINT) AS old_node, CAST(vn.i AS BIGINT) AS new_node,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM succ JOIN vo ON vo.h = succ.ovh JOIN vn ON vn.h = succ.nvh
GROUP BY vo.i, vn.i
"""


def q_distance_decay(sf_dir: str):
    """Movement distance-decay profile (the Lévy-flight / gravity-law
    histogram): consecutive user hops binned by the BINARY ORDER of
    their exact squared distance — band = number of binary digits of
    d² (zero hops excluded), an exact integer banding replayed in SQL
    as length(bin(d2)). One user-bucketed shuffle, searchsorted
    banding in the bucket; output per-band hop counts."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"user_id": batch["user_id"], "ts_us": us,
                         "ix": ix, "iy": iy})

    pts = ev.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    POWS = np.array([np.int64(1) << k for k in range(1, 63)], np.int64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        x = g["ix"].to_numpy(np.int64)
        y = g["iy"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        d2 = ((x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2)[same]
        d2 = d2[d2 > 0]
        band = np.searchsorted(POWS, d2, side="right") + 1
        s = pd.Series(band).value_counts().sort_index()
        return pd.DataFrame({"band": s.index.to_numpy(np.int64),
                             "n_hops": s.to_numpy(np.int64)})

    parts = rel.bucketed_group_apply(pts, ["user_id"], per_bucket)
    return rel.groupby_aggregate(parts, ["band"],
                                 [("n_hops", "n_hops", "sum")])


def SQL_DISTANCE_DECAY():
    src = "(SELECT event_id, user_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
hops AS (SELECT (ix - LAG(ix) OVER w) AS dx, (iy - LAG(iy) OVER w) AS dy
         FROM ge WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
d AS (SELECT dx*dx + dy*dy AS d2 FROM hops
      WHERE dx IS NOT NULL AND dx*dx + dy*dy > 0)
SELECT CAST(length(bin(d2)) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_hops
FROM d GROUP BY band
"""


def q_mann_kendall(sf_dir: str):
    """Emerging-hotspot trend detection (the ESRI 'Emerging Hot Spot'
    core): per 8° cell, the Mann-Kendall S statistic of its DAILY
    event-count series over the global day span (absent days count 0
    — MK runs on the regular series): S = Σ_{i<j} sign(c_j − c_i),
    an exact integer in [-T(T-1)/2, +T(T-1)/2]. The corpus pass is
    one (cell, day) count; the pairwise fold runs per cell on the
    T≈30-long dense vector inside one cell-bucketed combine. Output:
    (cx, cy, s_stat, n_days)."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        df = pd.DataFrame({"cx": np.asarray(ix) // 8192,
                           "cy": np.asarray(iy) // 8192,
                           "day": us // 86_400_000_000})
        g = (df.groupby(["cx", "cy", "day"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ev.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["cx", "cy", "day"],
                                   [("n", "n", "sum")]).materialize()
    span = counts.map_batches(
        lambda b: pd.DataFrame({"lo": [np.int64(b["day"].min())],
                                "hi": [np.int64(b["day"].max())]}),
        batch_format="pandas", batch_size=65536).to_pandas()
    lo, hi = np.int64(span["lo"].min()), np.int64(span["hi"].max())
    T = int(hi - lo + 1)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (cx, cy), gg in g.groupby(["cx", "cy"], sort=False):
            v = np.zeros(T, np.int64)
            v[gg["day"].to_numpy(np.int64) - lo] = \
                gg["n"].to_numpy(np.int64)
            d = np.sign(v[None, :] - v[:, None])
            s = int(np.triu(d, 1).sum())
            rows.append({"cx": int(cx), "cy": int(cy), "s_stat": s,
                         "n_days": T})
        cols = ("cx", "cy", "s_stat", "n_days")
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in cols})
        return pd.DataFrame(rows, columns=list(cols)).astype(np.int64)

    return rel.bucketed_group_apply(counts, ["cx", "cy"], per_cell)


def SQL_MANN_KENDALL():
    src = "(SELECT event_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
c AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ge GROUP BY 1, 2, 3),
span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM c),
cells AS (SELECT DISTINCT cx, cy FROM c),
days AS (SELECT UNNEST(range((SELECT lo FROM span),
                             (SELECT hi FROM span) + 1)) AS day),
grid AS (SELECT cells.cx, cells.cy, days.day,
                COALESCE(c.n, 0) AS n
         FROM cells CROSS JOIN days
         LEFT JOIN c ON c.cx = cells.cx AND c.cy = cells.cy
                    AND c.day = days.day)
SELECT a.cx, a.cy,
       CAST(SUM(CASE WHEN b.n > a.n THEN 1
                     WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat,
       CAST((SELECT hi - lo + 1 FROM span) AS BIGINT) AS n_days
FROM grid a JOIN grid b
  ON a.cx = b.cx AND a.cy = b.cy AND a.day < b.day
GROUP BY a.cx, a.cy
"""


KNOX_EPS = 96                 # lattice units
KNOX_W_S = 3600               # seconds


def q_knox_counts(sf_dir: str):
    """Knox space-time interaction test inputs (the spatial-
    epidemiology classic): over all C(n,2) event pairs, the exact
    counts of pairs CLOSE IN SPACE (d² ≤ {KNOX_EPS}²), CLOSE IN TIME
    (|Δt| ≤ {KNOX_W_S}s), and close in BOTH — the 2×2 table the Knox
    statistic compares against its permutation expectation
    n_s·n_t/n_pairs. Both pair counts ride the SAME exactly-once
    canonical-tile kernel: the spatial one on (ix, iy) with the
    timestamp carried (one pass yields n_space AND n_spacetime), the
    temporal one on (seconds, 0) — the 1-D degeneration of the tile
    join. Single-row output."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"event_id": pa.array(eid), "ix": ix, "iy": iy,
                         "t_s": pa.array(us // 1_000_000)})

    pts = ev.map_batches(prep, batch_format="pyarrow",
                         batch_size=65536).materialize()
    n = np.int64(pts.count())

    sp = spatial.dwithin_self_pairs(pts, "event_id", "ix", "iy",
                                    eps=KNOX_EPS, carry=("t_s",))

    def fold_sp(b: pa.Table) -> pd.DataFrame:
        dt = b["t_s_a"].to_numpy(zero_copy_only=False) \
            - b["t_s_b"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "n_space": [np.int64(b.num_rows)],
            "n_st": [np.int64((np.abs(dt) <= KNOX_W_S).sum())]})

    sps = sp.map_batches(fold_sp, batch_format="pyarrow",
                         batch_size=65536).to_pandas()

    def zero(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "tx": batch["t_s"],
                         "ty": pa.array(np.zeros(batch.num_rows,
                                                 np.int64))})

    tp = spatial.dwithin_self_pairs(
        pts.map_batches(zero, batch_format="pyarrow",
                        batch_size=65536),
        "event_id", "tx", "ty", eps=KNOX_W_S)
    tps = tp.map_batches(
        lambda b: pd.DataFrame({"n_time": [np.int64(b.num_rows)]}),
        batch_format="pyarrow", batch_size=65536).to_pandas()

    return pd.DataFrame({
        "n_pairs": [np.int64(n * (n - 1) // 2)],
        "n_space": [np.int64(sps["n_space"].sum()) if len(sps)
                    else np.int64(0)],
        "n_time": [np.int64(tps["n_time"].sum()) if len(tps)
                   else np.int64(0)],
        "n_st": [np.int64(sps["n_st"].sum()) if len(sps)
                 else np.int64(0)]})


def SQL_KNOX_COUNTS():
    src = "(SELECT event_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
e AS (SELECT event_id, ix, iy, epoch_us(ts) // 1000000 AS s FROM ge),
sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_space,
              CAST(SUM(CASE WHEN abs(a.s - b.s) <= {KNOX_W_S}
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_st
       FROM e a JOIN e b
         ON a.event_id < b.event_id
        AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
            <= {KNOX_EPS * KNOX_EPS}),
tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_time
       FROM e a JOIN e b
         ON a.event_id < b.event_id
        AND b.s BETWEEN a.s - {KNOX_W_S} AND a.s + {KNOX_W_S}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
SELECT CAST(tot.n * (tot.n - 1) // 2 AS BIGINT) AS n_pairs,
       COALESCE(sp.n_space, 0) AS n_space,
       COALESCE(tp.n_time, 0) AS n_time,
       COALESCE(sp.n_st, 0) AS n_st
FROM tot CROSS JOIN sp CROSS JOIN tp
"""


NN_CV_EPS = 256


def q_nn_crossval(sf_dir: str):
    """Leave-one-out nearest-neighbor cross-validation (the
    interpolation-backtest every geostatistics workflow runs before
    trusting a surface): each customer point's value (c_custkey mod
    997, deterministic) is predicted by its nearest OTHER point
    within {NN_CV_EPS} units (ties → smallest neighbor id, censored
    beyond the radius) and the exact integer error folds to one row
    (n_points, n_scored, mae_num). One exactly-once tile self-join
    with the value carried; the per-point argmin is a (d2, neighbor)
    lexicographic head-1 inside one id-bucketed combine."""
    pts_u = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def val(b: pa.Table) -> pa.Table:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        return pa.table({"ck": b["ck"], "ix": b["ix"], "iy": b["iy"],
                         "v": pa.array(ck % 997)})

    pts = pts_u.map_batches(val, batch_format="pyarrow",
                            batch_size=65536).materialize()
    n_points = np.int64(pts.count())
    pairs = spatial.dwithin_self_pairs(pts, "ck", "ix", "iy",
                                       eps=NN_CV_EPS, carry=("v",))

    def both(b: pa.Table) -> pd.DataFrame:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        va = b["v_a"].to_numpy(zero_copy_only=False)
        vb = b["v_b"].to_numpy(zero_copy_only=False)
        d2 = b["d2"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "ck": np.concatenate([ia, ib]),
            "own_v": np.concatenate([va, vb]),
            "d2": np.concatenate([d2, d2]),
            "nbr": np.concatenate([ib, ia]),
            "nbr_v": np.concatenate([vb, va])})
        # local prune: only each point's best candidate in this batch
        # needs to shuffle
        df = df.sort_values(["ck", "d2", "nbr"], kind="stable")
        return df.groupby("ck", sort=False).head(1)

    cand = pairs.map_batches(both, batch_format="pyarrow",
                             batch_size=None)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ck", "d2", "nbr"], kind="stable")
        top = g.groupby("ck", sort=False).head(1)
        return pd.DataFrame({
            "n_scored": [np.int64(len(top))],
            "mae_num": [np.int64(np.abs(
                top["own_v"].to_numpy(np.int64)
                - top["nbr_v"].to_numpy(np.int64)).sum())]})

    parts = rel.bucketed_group_apply(cand, ["ck"], pick).to_pandas()
    return pd.DataFrame({
        "n_points": [n_points],
        "n_scored": [np.int64(parts["n_scored"].sum()) if len(parts)
                     else np.int64(0)],
        "mae_num": [np.int64(parts["mae_num"].sum()) if len(parts)
                    else np.int64(0)]})


def SQL_NN_CROSSVAL():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    return f"""
WITH pts AS (SELECT ck, ix, iy, ck % 997 AS v FROM ({g}) _g),
cand AS (SELECT a.ck, a.v AS own_v, b.v AS nbr_v,
                ROW_NUMBER() OVER (PARTITION BY a.ck
                  ORDER BY (a.ix-b.ix)*(a.ix-b.ix)
                           + (a.iy-b.iy)*(a.iy-b.iy), b.ck) AS rn
         FROM pts a JOIN pts b
           ON a.ck <> b.ck
          AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
              <= {NN_CV_EPS * NN_CV_EPS}),
sel AS (SELECT * FROM cand WHERE rn = 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_points,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(COALESCE(SUM(ABS(own_v - nbr_v)), 0) AS BIGINT) AS mae_num
FROM sel
"""


def q_obb_zones(sf_dir: str):
    """Minimum-area oriented bounding rectangle per supplier zone
    (the ArcGIS 'Minimum Bounding Geometry (RECTANGLE_BY_AREA)'
    classic) by rotating calipers: the optimal rectangle is flush
    with a hull edge, so per zone the engine walks the monotone-chain
    hull's edges and minimizes the EXACT rational area
    (width·height)/|edge|² in Python ints (products reach ~1e23 —
    past int64, the quad_fit precedent), emitting the REDUCED
    fraction as VARCHAR. The oracle re-derives hull edges with the
    O(n³) edge characterization (convex_hull's oracle) and replays
    the rational argmin in HUGEINT with a NOT EXISTS cross-multiplied
    compare — equal minima reduce to the same canonical fraction."""
    from math import gcd

    from pythongis_ray.geom import algo

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def to_pts(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(k * 4 + 3)
        return pa.table({"nk": pa.array(k % 5), "x": pa.array(ix),
                         "y": pa.array(iy)})

    pts = ds.map_batches(to_pts, batch_format="pyarrow",
                         batch_size=65536)

    def per_zone(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, gg in g.groupby("nk", sort=False):
            P = np.unique(gg[["x", "y"]].to_numpy(np.int64), axis=0)
            if len(P) < 2:
                continue
            hull = algo.convex_hull_ccw(P)
            # convex_hull_ccw returns an OPEN vertex list — close the
            # cycle or the last edge's flush direction is never tried
            hull = np.vstack([hull, hull[:1]])
            best = None                      # (num, den) python ints
            x = P[:, 0]
            y = P[:, 1]
            for i in range(len(hull) - 1):
                dx = int(hull[i + 1, 0] - hull[i, 0])
                dy = int(hull[i + 1, 1] - hull[i, 1])
                l2 = dx * dx + dy * dy
                proj = x * dx + y * dy       # |p·d| ≤ 2.7e11, int64 ok
                w = int(proj.max()) - int(proj.min())
                cross = dx * (y - int(hull[i, 1])) \
                    - dy * (x - int(hull[i, 0]))
                h = int(cross.max())
                num = w * h                  # python ints past here
                if best is None or num * best[1] < best[0] * l2:
                    best = (num, l2)
            d = gcd(best[0], best[1]) or 1
            rows.append({"nk": np.int64(nk),
                         "area_num": str(best[0] // d),
                         "area_den": str(best[1] // d)})
        cols = ("nk", "area_num", "area_den")
        if not rows:
            return pd.DataFrame({"nk": pd.Series(dtype=np.int64),
                                 "area_num": pd.Series(dtype=object),
                                 "area_den": pd.Series(dtype=object)})
        return pd.DataFrame(rows, columns=list(cols))

    return rel.bucketed_group_apply(pts, ["nk"], per_zone)


def SQL_OBB_ZONES():
    src = "(SELECT s_suppkey*4+3 AS sup_id, s_suppkey % 5 AS nk FROM supplier)"
    g = fixtures.sql_geocode("sup_id").replace("__SRC__", src)
    return f"""
WITH gp AS ({g}),
p AS (SELECT DISTINCT CAST(nk AS BIGINT) AS nk, ix AS x, iy AS y FROM gp),
e AS (SELECT a.nk, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM p a JOIN p b
        ON a.nk = b.nk AND NOT (a.x = b.x AND a.y = b.y)),
hull AS (SELECT * FROM e
  WHERE NOT EXISTS (
    SELECT 1 FROM p q
    WHERE q.nk = e.nk
      AND NOT (q.x = e.x1 AND q.y = e.y1)
      AND NOT (q.x = e.x2 AND q.y = e.y2)
      AND NOT (
        (e.x2 - e.x1) * (q.y - e.y1) - (e.y2 - e.y1) * (q.x - e.x1) > 0
        OR ((e.x2 - e.x1) * (q.y - e.y1)
              - (e.y2 - e.y1) * (q.x - e.x1) = 0
            AND (q.x - e.x1) * (e.x2 - e.x1)
                  + (q.y - e.y1) * (e.y2 - e.y1) > 0
            AND (q.x - e.x1) * (e.x2 - e.x1)
                  + (q.y - e.y1) * (e.y2 - e.y1)
                < (e.x2 - e.x1) * (e.x2 - e.x1)
                  + (e.y2 - e.y1) * (e.y2 - e.y1))))),
m AS (SELECT h.nk,
             CAST(MAX(q.x * (h.x2 - h.x1) + q.y * (h.y2 - h.y1))
                  - MIN(q.x * (h.x2 - h.x1) + q.y * (h.y2 - h.y1))
                  AS HUGEINT)
             * CAST(MAX((h.x2 - h.x1) * (q.y - h.y1)
                        - (h.y2 - h.y1) * (q.x - h.x1)) AS HUGEINT)
                 AS num,
             CAST((h.x2 - h.x1) * (h.x2 - h.x1)
                  + (h.y2 - h.y1) * (h.y2 - h.y1) AS HUGEINT) AS den
      FROM hull h JOIN p q ON q.nk = h.nk
      GROUP BY h.nk, h.x1, h.y1, h.x2, h.y2),
best AS (SELECT * FROM m r
         WHERE NOT EXISTS (SELECT 1 FROM m s
                           WHERE s.nk = r.nk
                             AND s.num * r.den < r.num * s.den))
SELECT DISTINCT nk,
       CAST(num // GREATEST(gcd(num, den), 1) AS VARCHAR) AS area_num,
       CAST(den // GREATEST(gcd(num, den), 1) AS VARCHAR) AS area_den
FROM best
"""


def q_sqlish_pipeline(sf_dir: str):
    """End-to-end sqlish.Query composition (the reference's
    sql.query(_from/_select/_where/_groupby) surface,
    vector/sql.py:182-244, as one fluent plan): urgent orders →
    computed cents column → hash join to the customer dimension →
    per-mktsegment exact aggregate. Exercises where/select/join/
    groupby through the BUILDER (each stage is the same engine
    operator the standalone queries use) with a plain-SQL oracle."""
    from pythongis_ray import sqlish

    o = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderpriority",
                                    "o_totalprice"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    out = (sqlish.Query(o)
           .where(lambda b: b["o_orderpriority"] == "1-URGENT")
           .select(c_custkey="o_custkey",
                   cents=lambda b: np.rint(
                       b["o_totalprice"].to_numpy() * 100.0)
                   .astype(np.int64))
           .join(cust, on="c_custkey")
           .groupby("c_mktsegment",
                    [("n_orders", "cents", "count"),
                     ("sum_cents", "cents", "sum")])
           .dataset())

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["n_orders"] = b["n_orders"].astype(np.int64)
        b["sum_cents"] = b["sum_cents"].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


SQL_SQLISH_PIPELINE = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY c.c_mktsegment
"""


K_ANON = 5


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit (the release-readiness privacy check): treat
    (lang, source, n_chars//100) as the quasi-identifier tuple over
    documents and report, per language, the number of QI equivalence
    classes, how many violate k={K_ANON}, and the total records at
    re-identification risk inside violating classes. One (QI)-grouped
    count + one per-lang rollup — both bounded shuffles."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source", "n_chars"])

    def qi(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": b["lang"].to_pandas(),
                           "source": b["source"].to_pandas(),
                           "nb": b["n_chars"].to_numpy(
                               zero_copy_only=False) // 100})
        g = (df.groupby(["lang", "source", "nb"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(qi, batch_format="pyarrow", batch_size=65536)
    classes = rel.groupby_aggregate(parts, ["lang", "source", "nb"],
                                    [("n", "n", "sum")])

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.int64)
        viol = n < K_ANON
        out = pd.DataFrame({"lang": g["lang"].to_numpy(),
                            "one": np.int64(1),
                            "v": viol.astype(np.int64),
                            "r": np.where(viol, n, 0)})
        a = out.groupby("lang", sort=False).agg(
            n_classes=("one", "sum"), n_violating=("v", "sum"),
            n_at_risk=("r", "sum")).reset_index()
        for c in ("n_classes", "n_violating", "n_at_risk"):
            a[c] = a[c].astype(np.int64)
        return a

    grouped = rel.bucketed_group_apply(classes, ["lang"], rollup)
    return rel.groupby_aggregate(
        grouped, ["lang"],
        [("n_classes", "n_classes", "sum"),
         ("n_violating", "n_violating", "sum"),
         ("n_at_risk", "n_at_risk", "sum")])


SQL_K_ANONYMITY = f"""
WITH c AS (SELECT lang, source, n_chars // 100 AS nb,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2, 3)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
           AS n_at_risk
FROM c GROUP BY lang
"""


L_DIV = 3


def q_l_diversity(sf_dir: str):
    """l-diversity audit (k-anonymity's companion: a uniform QI class
    still leaks its SENSITIVE attribute): with QI = (user_id bucket
    user_id//100, day) over events and event_type as the sensitive
    attribute, count QI classes whose distinct-sensitive-value count
    falls below l={L_DIV}. Distinct-per-class folds map-side
    (per-batch drop_duplicates) before the one grouped count."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def qi(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "ub": b["user_id"].to_numpy(zero_copy_only=False) // 100,
            "day": us // 86_400_000_000,
            "event_type": b["event_type"].to_pandas()})
        return df.drop_duplicates(ignore_index=True)

    parts = ds.map_batches(qi, batch_format="pyarrow", batch_size=65536)
    dd = rel.dedup(parts, ["ub", "day", "event_type"])
    divers = rel.groupby_aggregate(dd, ["ub", "day"],
                                   [("n_distinct", "event_type",
                                     "count")])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        nd = b["n_distinct"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_classes": [np.int64(len(b))],
            "n_below_l": [np.int64((nd < L_DIV).sum())]})

    parts2 = divers.map_batches(fold, batch_format="pandas",
                                batch_size=65536).to_pandas()
    return pd.DataFrame({
        "n_classes": [np.int64(parts2["n_classes"].sum())],
        "n_below_l": [np.int64(parts2["n_below_l"].sum())]})


SQL_L_DIVERSITY = f"""
WITH d AS (SELECT DISTINCT user_id // 100 AS ub,
                  epoch_us(ts) // 86400000000 AS day, event_type
           FROM events),
c AS (SELECT ub, day, CAST(COUNT(*) AS BIGINT) AS nd
      FROM d GROUP BY ub, day)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN nd < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below_l
FROM c
"""


SFCA_R = 512          # catchment radius, lattice units
SFCA_PPM = 1_000_000  # supply ratio in integer micro-units


def q_access_2sfca(sf_dir: str):
    """Two-step floating catchment accessibility (2SFCA — the
    healthcare-access classic): step 1 gives each supplier the ratio
    R_s = {SFCA_PPM} // (customers within {SFCA_R} units) in exact
    integer micro-units; step 2 sums R_s over the suppliers within
    reach of each customer. The bipartite distance join rides the
    exactly-once self-join kernel over the UNION of both point sets
    (disjoint id spaces, side flag carried, same-side pairs pruned
    in-kernel); D_s and A_c are two bounded grouped folds plus one
    partitioned join of R_s back onto the pair table. Output: per
    customer (ck, n_sup, access_ppm), customers with no supplier in
    reach excluded (documented censoring, mirrored in SQL)."""
    cust = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    sup = _keyed_units(sf_dir, "supplier", "s_suppkey", 4, 3, "sk")

    def tag(side: int, idcol: str):
        def fn(b: pa.Table) -> pa.Table:
            ids = b[idcol].to_numpy(zero_copy_only=False)
            return pa.table({"uid": pa.array(ids * 2 + side),
                             "ix": b["ix"], "iy": b["iy"],
                             "side": pa.array(
                                 np.full(len(ids), side, np.int64))})
        return fn

    both = cust.map_batches(tag(0, "ck"), batch_format="pyarrow",
                            batch_size=65536).union(
        sup.map_batches(tag(1, "sk"), batch_format="pyarrow",
                        batch_size=65536))
    pairs = spatial.dwithin_self_pairs(
        both, "uid", "ix", "iy", eps=SFCA_R, carry=("side",),
        pair_filter=lambda d2, ca, cb: ca["side"] != cb["side"])

    def orient(b: pa.Table) -> pd.DataFrame:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        sa = b["side_a"].to_numpy(zero_copy_only=False)
        # uid = (key*4+add)*2+side — unwrap back to the raw keys
        cu = (np.where(sa == 0, ia, ib) // 2 - 1) // 4
        su = (np.where(sa == 0, ib, ia) // 2 - 3) // 4
        return pd.DataFrame({"ck": cu, "sk": su})

    cs = pairs.map_batches(orient, batch_format="pyarrow",
                           batch_size=65536).materialize()
    dsup = rel.groupby_aggregate(cs, ["sk"], [("d_s", "ck", "count")])

    def ratio(b: pd.DataFrame) -> pd.DataFrame:
        b["r_ppm"] = (SFCA_PPM // b["d_s"].to_numpy(np.int64)) \
            .astype(np.int64)
        return b[["sk", "r_ppm"]]

    rsup = dsup.map_batches(ratio, batch_format="pandas",
                            batch_size=65536)
    joined = rel.join_large(cs, rsup, on="sk")
    out = rel.groupby_aggregate(joined, ["ck"],
                                [("n_sup", "sk", "count"),
                                 ("access_ppm", "r_ppm", "sum")])

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_sup", "access_ppm"):
            b[c] = b[c].astype(np.int64)
        return b

    return out.map_batches(fix, batch_format="pandas")


def SQL_ACCESS_2SFCA():
    csrc = "(SELECT c_custkey*4+1 AS gk, c_custkey AS k FROM customer)"
    ssrc = "(SELECT s_suppkey*4+3 AS gk, s_suppkey AS k FROM supplier)"
    gc = fixtures.sql_geocode("gk").replace("__SRC__", csrc)
    gs = fixtures.sql_geocode("gk").replace("__SRC__", ssrc)
    return f"""
WITH cp AS (SELECT k AS ck, ix, iy FROM ({gc}) _c),
sp AS (SELECT k AS sk, ix, iy FROM ({gs}) _s),
pr AS (SELECT cp.ck, sp.sk
       FROM cp JOIN sp
         ON (cp.ix-sp.ix)*(cp.ix-sp.ix) + (cp.iy-sp.iy)*(cp.iy-sp.iy)
            <= {SFCA_R * SFCA_R}),
ds AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS d_s FROM pr GROUP BY sk),
r AS (SELECT sk, CAST({SFCA_PPM} // d_s AS BIGINT) AS r_ppm FROM ds)
SELECT pr.ck, CAST(COUNT(*) AS BIGINT) AS n_sup,
       CAST(SUM(r.r_ppm) AS BIGINT) AS access_ppm
FROM pr JOIN r ON r.sk = pr.sk
GROUP BY pr.ck
"""


HUFF_R = 512
HUFF_SHIFT = 40


def q_huff_capture(sf_dir: str):
    """Huff gravity-model market capture: every customer within reach
    of ≥1 supplier is captured by the supplier maximizing attraction
    w_s/d² (w_s = s_suppkey%5+1, ties → smallest supplier). The
    argmax is EXACT through an integer order embedding: with d² ≤
    {HUFF_R}² < 2^18, competing rationals differ by ≥ 2^-36, so
    key = (w << {HUFF_SHIFT}) // d² preserves strict order and maps
    equal rationals to equal keys — a vectorized sort key on both
    sides (no per-customer Python loop, no floats). Same bipartite
    side-flagged tile join as access_2sfca. Output: per winning
    supplier, customers captured."""
    cust = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    sup = _keyed_units(sf_dir, "supplier", "s_suppkey", 4, 3, "sk")

    def tag(side: int, idcol: str):
        def fn(b: pa.Table) -> pa.Table:
            ids = b[idcol].to_numpy(zero_copy_only=False)
            return pa.table({"uid": pa.array(ids * 2 + side),
                             "ix": b["ix"], "iy": b["iy"],
                             "side": pa.array(
                                 np.full(len(ids), side, np.int64))})
        return fn

    both = cust.map_batches(tag(0, "ck"), batch_format="pyarrow",
                            batch_size=65536).union(
        sup.map_batches(tag(1, "sk"), batch_format="pyarrow",
                        batch_size=65536))
    pairs = spatial.dwithin_self_pairs(
        both, "uid", "ix", "iy", eps=HUFF_R, carry=("side",),
        pair_filter=lambda d2, ca, cb: ca["side"] != cb["side"])

    def orient(b: pa.Table) -> pd.DataFrame:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        sa = b["side_a"].to_numpy(zero_copy_only=False)
        d2 = b["d2"].to_numpy(zero_copy_only=False)
        ck = (np.where(sa == 0, ia, ib) // 2 - 1) // 4
        sk = (np.where(sa == 0, ib, ia) // 2 - 3) // 4
        w = sk % 5 + 1
        key = (w << HUFF_SHIFT) // np.maximum(d2, 1)
        key[d2 == 0] = np.int64(1) << 62   # co-located: infinite pull
        df = pd.DataFrame({"ck": ck, "sk": sk, "key": key})
        # local prune: only each customer's best candidate per batch
        df = df.sort_values(["ck", "key", "sk"],
                            ascending=[True, False, True],
                            kind="stable")
        return df.groupby("ck", sort=False).head(1)

    cand = pairs.map_batches(orient, batch_format="pyarrow",
                             batch_size=None)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ck", "key", "sk"],
                          ascending=[True, False, True], kind="stable")
        top = g.groupby("ck", sort=False).head(1)
        out = (top.groupby("sk", sort=False).size()
               .rename("n_captured").reset_index())
        out["n_captured"] = out["n_captured"].astype(np.int64)
        return out

    parts = rel.bucketed_group_apply(cand, ["ck"], pick)
    return rel.groupby_aggregate(parts, ["sk"],
                                 [("n_captured", "n_captured", "sum")])


def SQL_HUFF_CAPTURE():
    csrc = "(SELECT c_custkey*4+1 AS gk, c_custkey AS k FROM customer)"
    ssrc = "(SELECT s_suppkey*4+3 AS gk, s_suppkey AS k FROM supplier)"
    gc = fixtures.sql_geocode("gk").replace("__SRC__", csrc)
    gs = fixtures.sql_geocode("gk").replace("__SRC__", ssrc)
    big = 1 << 62
    return f"""
WITH cp AS (SELECT k AS ck, ix, iy FROM ({gc}) _c),
sp AS (SELECT k AS sk, sk % 5 + 1 AS w, ix, iy
       FROM (SELECT k, k AS sk, ix, iy FROM ({gs}) _s) _w),
pr AS (SELECT cp.ck, sp.sk,
              (cp.ix-sp.ix)*(cp.ix-sp.ix)
              + (cp.iy-sp.iy)*(cp.iy-sp.iy) AS d2,
              sp.w
       FROM cp JOIN sp
         ON (cp.ix-sp.ix)*(cp.ix-sp.ix) + (cp.iy-sp.iy)*(cp.iy-sp.iy)
            <= {HUFF_R * HUFF_R}),
keyed AS (SELECT ck, sk,
                 CASE WHEN d2 = 0 THEN CAST({big} AS BIGINT)
                      ELSE (w * {1 << HUFF_SHIFT}) // d2 END AS key
          FROM pr),
win AS (SELECT ck, sk,
               ROW_NUMBER() OVER (PARTITION BY ck
                                  ORDER BY key DESC, sk) AS rn
        FROM keyed)
SELECT sk, CAST(COUNT(*) AS BIGINT) AS n_captured
FROM win WHERE rn = 1 GROUP BY sk
"""


ATTACK_K = 16


def q_attack_robustness(sf_dir: str):
    """Network attack robustness (the Albert-Jeong-Barabási targeted-
    attack experiment): remove the {ATTACK_K} highest-total-degree
    pages (ties → smaller id) from the html-extracted link graph and
    report what remains — surviving nodes/edges, number of connected
    components, and the largest component's size. Hub selection is a
    per-batch partial top-K + bounded driver merge; the post-attack
    components run on the resident hash-min engine with self-edges
    guaranteeing isolated survivors count. Oracle: recursive-CTE
    transitive closure over the filtered edge set."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096).materialize()

    def ends(b: pa.Table) -> pa.Table:
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.concatenate([s, d])})

    deg = rel.groupby_aggregate(
        edges.map_batches(ends, batch_format="pyarrow",
                          batch_size=65536),
        ["node"], [("deg", "node", "count")])

    def part_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["deg", "node"],
                             ascending=[False, True],
                             kind="stable").head(ATTACK_K)

    parts = deg.map_batches(part_topk, batch_format="pandas",
                            batch_size=65536).to_pandas()
    hubs = parts.sort_values(["deg", "node"], ascending=[False, True],
                             kind="stable").head(ATTACK_K)
    hub_set = set(hubs["node"].astype(np.int64))
    import ray as _ray

    href = _ray.put(np.array(sorted(hub_set), np.int64))

    def filt(b: pa.Table) -> pa.Table:
        from pythongis_ray import state

        h = state.get_broadcast(href, key_extra=("attack", ATTACK_K))
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        keep = ~(np.isin(s, h) | np.isin(d, h))
        return pa.table({"id_a": pa.array(s[keep]),
                         "id_b": pa.array(d[keep])})

    surv = edges.map_batches(filt, batch_format="pyarrow",
                             batch_size=65536).materialize()
    n_edges = np.int64(surv.count())

    # survivors include every non-hub page (isolated ones too) via
    # self-edges unioned into the CC input
    def selfe(b: pa.Table) -> pa.Table:
        from pythongis_ray import state

        h = state.get_broadcast(href, key_extra=("attack", ATTACK_K))
        p = b["page_id"].to_numpy(zero_copy_only=False)
        p = p[~np.isin(p, h)]
        return pa.table({"id_a": pa.array(p), "id_b": pa.array(p)})

    nodes_self = pages.pages_dataset(sf_dir, geocode=False,
                                     columns=["page_id"]) \
        .map_batches(selfe, batch_format="pyarrow", batch_size=65536)
    comp = graph.connected_components(surv.union(nodes_self))

    def fold(b: pa.Table) -> pd.DataFrame:
        lab = b["component"].to_numpy(zero_copy_only=False)
        g = pd.Series(lab).value_counts()
        return pd.DataFrame({"comp": g.index.to_numpy(np.int64),
                             "sz": g.to_numpy(np.int64)})

    sizes = rel.groupby_aggregate(
        comp.map_batches(fold, batch_format="pyarrow",
                         batch_size=65536),
        ["comp"], [("sz", "sz", "sum")]).to_pandas()
    return pd.DataFrame({
        "n_nodes": [np.int64(sizes["sz"].sum())],
        "n_edges": [n_edges],
        "n_components": [np.int64(len(sizes))],
        "largest_cc": [np.int64(sizes["sz"].max()) if len(sizes)
                       else np.int64(0)]})


def SQL_ATTACK_ROBUSTNESS():
    return f"""
WITH RECURSIVE
e0 AS ({_SQL_PAGE_EDGES}),
ends AS (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM ends GROUP BY node),
hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT {ATTACK_K}),
se AS (SELECT src, dst FROM e0
       WHERE src NOT IN (SELECT node FROM hubs)
         AND dst NOT IN (SELECT node FROM hubs)),
pages_ AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS p FROM documents
           WHERE doc_id NOT IN (SELECT node FROM hubs)),
edges AS (SELECT src AS a, dst AS b FROM se
          UNION SELECT dst, src FROM se
          UNION SELECT p, p FROM pages_),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
comp AS (SELECT src AS node, MIN(dst) AS label
         FROM reach GROUP BY src),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz
          FROM comp GROUP BY label)
SELECT (SELECT CAST(SUM(sz) AS BIGINT) FROM sizes) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM se) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS n_components,
       (SELECT CAST(MAX(sz) AS BIGINT) FROM sizes) AS largest_cc
"""


def q_linear_ref(sf_dir: str):
    """Linear referencing (the milepost / ST_LineLocatePoint classic):
    every event snaps to its nearest DIAGONAL road segment and gets
    the integer ppm measure along it — floor((10^6·clamp(AP·AB, 0,
    |AB|²)) / |AB|²). Float64 point-to-segment arithmetic is mirrored
    OP-FOR-OP in the oracle (the knn_lines discipline: identical
    formula and evaluation order → identical bits → the argmin and
    the floored measure agree exactly). Broadcast road table, one
    vectorized (batch×roads) argmin per batch; per-road rollup."""
    import ray as _ray

    from pythongis_ray import state

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id"])

    pp = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = np.sort(pp["p_partkey"].to_numpy().astype(np.int64))
    pk = pk[pk % 16 == 0]
    sid = pk * 8 + 7
    rix, riy = fixtures.geocode_units(sid)
    rix = np.asarray(rix, np.int64)
    riy = np.asarray(riy, np.int64)
    dx = (sid * 48271) % 8192 + 512
    dy = (sid * 16807) % 8192 - 4096
    ax, ay = fixtures.units_to_deg(rix, riy)
    bx, by = fixtures.units_to_deg(rix + dx, riy + dy)
    ref = _ray.put({"sid": sid, "ax": ax, "ay": ay, "bx": bx, "by": by})

    def snap(batch: pa.Table) -> pd.DataFrame:
        r = state.get_broadcast(ref, key_extra=("linref",))
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        px, py = fixtures.units_to_deg(np.asarray(ix), np.asarray(iy))
        axx, ayy, bxx, byy = r["ax"], r["ay"], r["bx"], r["by"]
        ex = px[:, None] - axx[None, :]
        ey = py[:, None] - ayy[None, :]
        ux = (bxx - axx)[None, :]
        uy = (byy - ayy)[None, :]
        dot = ex * ux + ey * uy
        l2 = (bxx - axx) ** 2 + (byy - ayy) ** 2
        cr = ex * uy - ey * ux
        d_in = cr * cr / l2[None, :]
        d_a = ex * ex + ey * ey
        fx = px[:, None] - bxx[None, :]
        fy = py[:, None] - byy[None, :]
        d_b = fx * fx + fy * fy
        d = np.where(dot <= 0, d_a,
                     np.where(dot >= l2[None, :], d_b, d_in))
        j = np.argmin(d, axis=1)            # ties → first = min sid
        rows = np.arange(len(eid))
        dsel = dot[rows, j]
        lsel = l2[j]
        mpp = np.floor(
            (1_000_000.0 * np.minimum(np.maximum(dsel, 0.0), lsel))
            / lsel).astype(np.int64)
        df = pd.DataFrame({"sid": r["sid"][j], "m": mpp})
        g = df.groupby("sid", sort=False).agg(
            n_events=("m", "size"), sum_mppm=("m", "sum")).reset_index()
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_mppm"] = g["sum_mppm"].astype(np.int64)
        return g

    parts = ds.map_batches(snap, batch_format="pyarrow",
                           batch_size=16384)
    return rel.groupby_aggregate(parts, ["sid"],
                                 [("n_events", "n_events", "sum"),
                                  ("sum_mppm", "sum_mppm", "sum")])


def SQL_LINEAR_REF():
    epts = "(SELECT event_id*4+1 AS ek FROM events)"
    g = fixtures.sql_geocode("ek").replace("__SRC__", epts)
    sroad = ("(SELECT p_partkey*8+7 AS sid FROM part "
             "WHERE p_partkey % 16 = 0)")
    gr = fixtures.sql_geocode("sid").replace("__SRC__", sroad)
    return f"""
WITH ge AS ({g}),
epts AS (SELECT ek, ix / 1024.0 - 180.0 AS px,
                iy / 1024.0 - 90.0 AS py FROM ge),
sraw AS ({gr}),
seg AS (SELECT sid,
               ix / 1024.0 - 180.0 AS axx, iy / 1024.0 - 90.0 AS ayy,
               (ix + ((sid * 48271) % 8192 + 512)) / 1024.0 - 180.0
                   AS bxx,
               (iy + ((sid * 16807) % 8192 - 4096)) / 1024.0 - 90.0
                   AS byy
        FROM sraw),
d AS (
  SELECT e.ek, s.sid,
         (e.px - axx) * (bxx - axx) + (e.py - ayy) * (byy - ayy) AS dot,
         (bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy) AS l2,
         CASE
           WHEN (e.px - axx) * (bxx - axx) + (e.py - ayy) * (byy - ayy)
                <= 0
             THEN (e.px - axx) * (e.px - axx)
                  + (e.py - ayy) * (e.py - ayy)
           WHEN (e.px - axx) * (bxx - axx) + (e.py - ayy) * (byy - ayy)
                >= (bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy)
             THEN (e.px - bxx) * (e.px - bxx)
                  + (e.py - byy) * (e.py - byy)
           ELSE ((e.px - axx) * (byy - ayy) - (e.py - ayy) * (bxx - axx))
                * ((e.px - axx) * (byy - ayy) - (e.py - ayy) * (bxx - axx))
                / ((bxx - axx) * (bxx - axx) + (byy - ayy) * (byy - ayy))
         END AS dist_sq
  FROM epts e CROSS JOIN seg s),
w AS (SELECT ek, sid, dot, l2,
             ROW_NUMBER() OVER (PARTITION BY ek
                                ORDER BY dist_sq, sid) AS rn
      FROM d),
m AS (SELECT sid,
             CAST(FLOOR((1000000.0 * LEAST(GREATEST(dot, 0), l2)) / l2)
                  AS BIGINT) AS mppm
      FROM w WHERE rn = 1)
SELECT sid, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(mppm) AS BIGINT) AS sum_mppm
FROM m GROUP BY sid
"""


HW_CELL = 2048


def q_home_work(sf_dir: str):
    """Home/work anchor inference (the mobility-mining staple): per
    user, the two most-visited {HW_CELL}-unit cells (visits DESC, then
    cell coords — fully deterministic), and the exact integer squared
    commute distance between the two cell ORIGINS. Users with fewer
    than two distinct cells are excluded (no second anchor). One
    (user, cell) count + one user-bucketed top-2 pick."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        df = pd.DataFrame({"user_id": batch["user_id"].to_numpy(
            zero_copy_only=False),
            "cx": np.asarray(ix) // HW_CELL,
            "cy": np.asarray(iy) // HW_CELL})
        g = (df.groupby(["user_id", "cx", "cy"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ev.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["user_id", "cx", "cy"],
                                   [("n", "n", "sum")])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "cx", "cy"],
                          ascending=[True, False, True, True],
                          kind="stable")
        top = g.groupby("user_id", sort=False).head(2)
        sz = top.groupby("user_id", sort=False)["n"].transform("size")
        top = top[sz == 2]
        h = top.groupby("user_id", sort=False).head(1)
        w = top.groupby("user_id", sort=False).tail(1)
        hx = h["cx"].to_numpy(np.int64) * HW_CELL
        hy = h["cy"].to_numpy(np.int64) * HW_CELL
        wx = w["cx"].to_numpy(np.int64) * HW_CELL
        wy = w["cy"].to_numpy(np.int64) * HW_CELL
        return pd.DataFrame({
            "user_id": h["user_id"].to_numpy(np.int64),
            "home_cx": h["cx"].to_numpy(np.int64),
            "home_cy": h["cy"].to_numpy(np.int64),
            "work_cx": w["cx"].to_numpy(np.int64),
            "work_cy": w["cy"].to_numpy(np.int64),
            "commute_d2": (hx - wx) ** 2 + (hy - wy) ** 2})

    return rel.bucketed_group_apply(counts, ["user_id"], pick)


def SQL_HOME_WORK():
    src = "(SELECT event_id, user_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
c AS (SELECT user_id, ix // {HW_CELL} AS cx, iy // {HW_CELL} AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ge GROUP BY 1, 2, 3),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY n DESC, cx, cy) AS rn
      FROM c),
h AS (SELECT user_id, cx, cy FROM r WHERE rn = 1),
w AS (SELECT user_id, cx, cy FROM r WHERE rn = 2)
SELECT h.user_id, h.cx AS home_cx, h.cy AS home_cy,
       w.cx AS work_cx, w.cy AS work_cy,
       CAST(((h.cx - w.cx) * {HW_CELL}) * ((h.cx - w.cx) * {HW_CELL})
            + ((h.cy - w.cy) * {HW_CELL}) * ((h.cy - w.cy) * {HW_CELL})
            AS BIGINT) AS commute_d2
FROM h JOIN w ON w.user_id = h.user_id
"""


def q_triad_census(sf_dir: str):
    """Directed triad closure census (the network-science motif
    question behind 'is the web hierarchical or cyclic'): over the
    DISTINCT self-loop-free edge set, count directed 2-paths a→b→c
    (distinct nodes), how many close TRANSITIVELY (a→c — the
    feed-forward motif) and how many close CYCLICALLY (c→a; each
    3-cycle counts once per rotation, documented). Distinct edges via
    one bucketed dedup; the path table is in·out-bounded (≤42 rows
    per node here) and closes via two partitioned joins."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    raw = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                         batch_size=4096)

    def clean(b: pa.Table) -> pd.DataFrame:
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        k = s != d
        return pd.DataFrame({"src": s[k], "dst": d[k]}) \
            .drop_duplicates(ignore_index=True)

    edges = rel.dedup(raw.map_batches(clean, batch_format="pyarrow",
                                      batch_size=65536),
                      ["src", "dst"]).materialize()

    def _np64(col):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    mid = edges.map_batches(
        lambda b: pd.DataFrame({"b": _np64(b["src"]),
                                "c": _np64(b["dst"])}),
        batch_format="pyarrow", batch_size=65536)
    first = edges.map_batches(
        lambda b: pd.DataFrame({"a": _np64(b["src"]),
                                "b": _np64(b["dst"])}),
        batch_format="pyarrow", batch_size=65536)
    paths = rel.join_large(first, mid, on="b")
    paths = paths.map_batches(
        lambda b: b[b["a"] != b["c"]][["a", "c"]],
        batch_format="pandas", batch_size=65536).materialize()

    fwd = edges.map_batches(
        lambda b: pd.DataFrame({"a": _np64(b["src"]),
                                "c": _np64(b["dst"]),
                                "f": np.int64(1)}),
        batch_format="pyarrow", batch_size=65536)
    back = edges.map_batches(
        lambda b: pd.DataFrame({"a": _np64(b["dst"]),
                                "c": _np64(b["src"]),
                                "g": np.int64(1)}),
        batch_format="pyarrow", batch_size=65536)
    j1 = rel.join_large(paths, fwd, on=["a", "c"], how="left")
    j2 = rel.join_large(j1, back, on=["a", "c"], how="left")

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        f = b["f"].fillna(0).to_numpy(np.int64)
        g = b["g"].fillna(0).to_numpy(np.int64)
        return pd.DataFrame({"n_paths": [np.int64(len(b))],
                             "n_transitive": [np.int64(f.sum())],
                             "n_cyclic": [np.int64(g.sum())]})

    parts = j2.map_batches(fold, batch_format="pandas",
                           batch_size=65536).to_pandas()
    return pd.DataFrame({
        "n_paths": [np.int64(parts["n_paths"].sum())],
        "n_transitive": [np.int64(parts["n_transitive"].sum())],
        "n_cyclic": [np.int64(parts["n_cyclic"].sum())]})


SQL_TRIAD_CENSUS = f"""
WITH e0 AS ({_SQL_PAGE_EDGES}),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
p AS (SELECT a.src AS a, a.dst AS b, b.dst AS c
      FROM e a JOIN e b ON b.src = a.dst
      WHERE a.src <> b.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e f
                                  WHERE f.src = p.a AND f.dst = p.c)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_transitive,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e g
                                  WHERE g.src = p.c AND g.dst = p.a)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic
FROM p
"""


def q_burstiness(sf_dir: str):
    """Goh-Barabási burstiness inputs per user: the exact integer
    moment triple (n_gaps, sum_gap, sum_gap2) of inter-event gaps in
    floored SECONDS (µs gaps square past int64),
    from which B = (σ−μ)/(σ+μ) follows by one square root — the
    temporal-pattern classifier (B→−1 periodic, 0 Poisson, →1 bursty).
    Users with < 2 gaps excluded; one user-bucketed shuffle."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = u[1:] == u[:-1]
        gap = (t[1:] - t[:-1])[same] // 1_000_000
        uu = u[1:][same]
        df = pd.DataFrame({"user_id": uu, "g": gap})
        out = df.groupby("user_id", sort=False).agg(
            n_gaps=("g", "size"), sum_gap=("g", "sum"),
            sum_gap2=("g", lambda s: np.int64(
                (s.to_numpy(np.int64) ** 2).sum()))).reset_index()
        out = out[out["n_gaps"] >= 2]
        for c in ("n_gaps", "sum_gap", "sum_gap2"):
            out[c] = out[c].astype(np.int64)
        return out

    return rel.bucketed_group_apply(ds, ["user_id"], per_user)


SQL_BURSTINESS = """
WITH s AS (SELECT user_id,
                  (epoch_us(ts) - LAG(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY ts))
                  // 1000000 AS g
           FROM events),
a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(g) AS BIGINT) AS sum_gap,
             CAST(SUM(g * g) AS BIGINT) AS sum_gap2
      FROM s WHERE g IS NOT NULL GROUP BY user_id)
SELECT * FROM a WHERE n_gaps >= 2
"""


def q_simpson_diversity(sf_dir: str):
    """Simpson diversity index inputs per source over its language
    mix, denominator-cleared: D = 1 − Σ n_l(n_l−1) / (N(N−1)), so the
    exact pair (hom_num = Σ n_l(n_l−1), hom_den = N(N−1)) determines
    it — the ecology/market-concentration index (hom_num/hom_den is
    also the collision probability, the Herfindahl cousin). One
    bounded (source, lang) count."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "lang"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "lang": b["lang"].to_pandas()})
        g = (df.groupby(["source", "lang"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["source", "lang"],
                                   [("n", "n", "sum")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.int64)
        out = pd.DataFrame({"source": g["source"].to_numpy(),
                            "h": n * (n - 1), "n": n})
        a = out.groupby("source", sort=False).agg(
            hom_num=("h", "sum"), nn=("n", "sum")).reset_index()
        a["hom_num"] = a["hom_num"].astype(np.int64)
        a["hom_den"] = (a["nn"].astype(np.int64)
                        * (a["nn"].astype(np.int64) - 1))
        return a[["source", "hom_num", "hom_den"]]

    return rel.bucketed_group_apply(counts, ["source"], fold)


SQL_SIMPSON_DIVERSITY = """
WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source, lang)
SELECT source,
       CAST(SUM(n * (n - 1)) AS BIGINT) AS hom_num,
       CAST(SUM(n) * (SUM(n) - 1) AS BIGINT) AS hom_den
FROM c GROUP BY source
"""


RBO_K = 10
# RBO(p=1/2) truncated at K, denominators cleared: score_num =
# Σ_d 2^(K−d) · (lcm(1..K)/d) · overlap@d — exact integers end to end
_RBO_COEF = [(d, (1 << (RBO_K - d)) * (2520 // d))
             for d in range(1, RBO_K + 1)]


def q_rbo_rankings(sf_dir: str):
    """Rank-biased overlap (Webber's RBO, p=1/2, depth {RBO_K})
    between the two natural page authorities — in-degree and 5-round
    integer PageRank — with every denominator cleared:
    score_num = Σ_d 2^(K−d)·(2520/d)·|top_d(A) ∩ top_d(B)| (2520 =
    lcm(1..10)). Both top-10 lists come from per-batch partial top-k
    + a bounded driver merge (ties → smaller page id on both sides
    and in the oracle's ROW_NUMBER). Output: (score_num,
    overlap_at_k) — one row."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096).materialize()

    def indeg(b: pa.Table) -> pd.DataFrame:
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        g = pd.Series(d).value_counts()
        return pd.DataFrame({"node": g.index.to_numpy(np.int64),
                             "v": g.to_numpy(np.int64)})

    ind = rel.groupby_aggregate(
        edges.map_batches(indeg, batch_format="pyarrow",
                          batch_size=65536),
        ["node"], [("v", "v", "sum")])

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["v", "node"], ascending=[False, True],
                             kind="stable").head(RBO_K)

    ind_top = ind.map_batches(topk, batch_format="pandas",
                              batch_size=65536).to_pandas()
    ind_top = ind_top.sort_values(["v", "node"],
                                  ascending=[False, True],
                                  kind="stable").head(RBO_K)
    A = ind_top["node"].to_numpy(np.int64)

    pr = graph.pagerank_actors(edges, src="src_page", dst="dst_page",
                               iters=5)
    pr_top = pr.map_batches(
        lambda b: pd.DataFrame({
            "node": b["node"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "v": b["mass"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}),
        batch_format="pyarrow", batch_size=65536) \
        .map_batches(topk, batch_format="pandas",
                     batch_size=65536).to_pandas()
    pr_top = pr_top.sort_values(["v", "node"], ascending=[False, True],
                                kind="stable").head(RBO_K)
    B = pr_top["node"].to_numpy(np.int64)

    score = 0
    ov_k = 0
    for d, coef in _RBO_COEF:
        ov = len(set(A[:d].tolist()) & set(B[:d].tolist()))
        score += coef * ov
        if d == RBO_K:
            ov_k = ov
    return pd.DataFrame({"score_num": [np.int64(score)],
                         "overlap_at_k": [np.int64(ov_k)]})


def SQL_RBO_RANKINGS():
    coefs = ", ".join(f"({d}, {c})" for d, c in _RBO_COEF)
    return f"""{_sql_pagerank_ctes(5)},
rp AS (SELECT node, ROW_NUMBER() OVER (ORDER BY mass DESC, node) AS r
       FROM m5),
ind AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS v
        FROM e GROUP BY dst),
ri AS (SELECT node, ROW_NUMBER() OVER (ORDER BY v DESC, node) AS r
       FROM ind),
ov AS (SELECT dd.d, dd.c,
              (SELECT COUNT(*) FROM rp a JOIN ri b ON b.node = a.node
               WHERE a.r <= dd.d AND b.r <= dd.d) AS o
       FROM (VALUES {coefs}) dd(d, c))
SELECT CAST(SUM(c * o) AS BIGINT) AS score_num,
       CAST(MAX(CASE WHEN d = {RBO_K} THEN o END) AS BIGINT)
           AS overlap_at_k
FROM ov
"""


def q_kendall_tau(sf_dir: str):
    """Kendall rank-correlation inputs between two per-source metrics
    (doc count vs total chars) with everything integer: over all
    source pairs, concordant − discordant (the τ numerator), plus tie
    counts on each side — the exact (nc − nd, tx, ty, n) tuple that
    determines τ-b. The per-source table is bounded (20 sources), so
    the O(S²) pair fold runs in the single bounded combine (kmv-merge
    contract)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "c": b["n_chars"].to_numpy(
                               zero_copy_only=False)})
        g = df.groupby("source", sort=False).agg(
            n_docs=("c", "size"), sum_chars=("c", "sum")).reset_index()
        for c in ("n_docs", "sum_chars"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    per_src = rel.groupby_aggregate(parts, ["source"],
                                    [("n_docs", "n_docs", "sum"),
                                     ("sum_chars", "sum_chars", "sum")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        x = g["n_docs"].to_numpy(np.int64)
        y = g["sum_chars"].to_numpy(np.int64)
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        iu = np.triu_indices(len(g), 1)
        s = dx[iu] * dy[iu]
        return pd.DataFrame({
            "n_sources": [np.int64(len(g))],
            "nc_minus_nd": [np.int64(s.sum())],
            "ties_x": [np.int64((dx[iu] == 0).sum())],
            "ties_y": [np.int64((dy[iu] == 0).sum())]})

    one = per_src.map_batches(lambda b: b.assign(_one=np.int64(0)),
                              batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: fold(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_KENDALL_TAU = """
WITH m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS x,
                  CAST(SUM(n_chars) AS BIGINT) AS y
           FROM documents GROUP BY source),
pr AS (SELECT sign(b.x - a.x) * sign(b.y - a.y) AS s,
              CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
              CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
       FROM m a JOIN m b ON a.source < b.source)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_sources,
       CAST(COALESCE(SUM(s), 0) AS BIGINT) AS nc_minus_nd,
       CAST(COALESCE(SUM(tx), 0) AS BIGINT) AS ties_x,
       CAST(COALESCE(SUM(ty), 0) AS BIGINT) AS ties_y
FROM pr
"""


TS_SHIFT = 20


def q_theilsen_daily(sf_dir: str):
    """Theil-Sen robust trend estimator per event_type over the daily
    count series: the MEDIAN of all pairwise slopes (Δcount/Δday),
    selected EXACTLY — slopes order by the injective integer embedding
    (Δy·2^{TS_SHIFT}) // Δx (distinct rationals with Δx ≤ days differ
    by ≥ 1/days², far above the floor error), the median row picked
    by ROW_NUMBER at ceil(n/2) under (key, dy, dx), and the winning
    slope emitted as the gcd-reduced fraction. Day series are
    cell-bounded; the pair fold is days² per type."""
    from math import gcd

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def daily(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "day": us // 86_400_000_000})
        g = (df.groupby(["event_type", "day"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(daily, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["event_type", "day"],
                                   [("n", "n", "sum")])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values("day", kind="stable")
            d = gg["day"].to_numpy(np.int64)
            n = gg["n"].to_numpy(np.int64)
            iu, ju = np.triu_indices(len(d), 1)
            dx = d[ju] - d[iu]
            dy = n[ju] - n[iu]
            key = (dy << TS_SHIFT) // dx
            order = np.lexsort((dx, dy, key))
            m = len(key)
            pick = order[(m + 1) // 2 - 1]     # ceil(m/2)-th
            a, b_ = int(dy[pick]), int(dx[pick])
            dgcd = gcd(abs(a), b_) or 1
            rows.append({"event_type": et, "n_pairs": m,
                         "slope_num": a // dgcd,
                         "slope_den": b_ // dgcd})
        cols = ("event_type", "n_pairs", "slope_num", "slope_den")
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object if c ==
                                              "event_type" else np.int64)
                                 for c in cols})
        out = pd.DataFrame(rows, columns=list(cols))
        for c in cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out

    return rel.bucketed_group_apply(counts, ["event_type"], per_type)


def SQL_THEILSEN_DAILY():
    return f"""
WITH c AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
pr AS (SELECT a.event_type,
              b.n - a.n AS dy, b.day - a.day AS dx
       FROM c a JOIN c b ON b.event_type = a.event_type
                        AND b.day > a.day),
k0 AS (SELECT event_type, dy, dx,
             -- FLOOR division (DuckDB // truncates toward zero;
             -- numpy floors) — emulate floor for negative dy
             CASE WHEN dy >= 0 THEN (dy * {1 << TS_SHIFT}) // dx
                  ELSE -(((-dy) * {1 << TS_SHIFT} + dx - 1) // dx)
             END AS key
      FROM pr),
k AS (SELECT event_type, dy, dx, key,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY key, dy, dx) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM k0)
SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
       CAST(dy // GREATEST(gcd(abs(dy), dx), 1) AS BIGINT) AS slope_num,
       CAST(dx // GREATEST(gcd(abs(dy), dx), 1) AS BIGINT) AS slope_den
FROM k WHERE rn = (m + 1) // 2
"""


def q_stl_daily(sf_dir: str):
    """Robust STL-lite decomposition of each event type's daily count
    series, exact integers end to end: trend = centered 7-day MEDIAN
    (odd window → the true middle), seasonal = per-weekday median of
    the detrended values (engine-wide quantile_disc rule
    sorted[ceil(n/2)−1]), residual = detrended − seasonal. The series
    is zero-filled over the global day span (medians on the regular
    grid); only days with a full trend window are emitted. Day counts
    are cell-bounded, so the decomposition runs per type inside one
    bucketed combine; SQL replays the trend window as a day±3
    self-join + quantile_disc."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def daily(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "day": us // 86_400_000_000})
        g = (df.groupby(["event_type", "day"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(daily, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["event_type", "day"],
                                   [("n", "n", "sum")]).materialize()
    span = counts.map_batches(
        lambda b: pd.DataFrame({"lo": [np.int64(b["day"].min())],
                                "hi": [np.int64(b["day"].max())]}),
        batch_format="pandas", batch_size=65536).to_pandas()
    lo, hi = np.int64(span["lo"].min()), np.int64(span["hi"].max())
    T = int(hi - lo + 1)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            v = np.zeros(T, np.int64)
            v[gg["day"].to_numpy(np.int64) - lo] = \
                gg["n"].to_numpy(np.int64)
            if T < 7:
                continue
            win = np.lib.stride_tricks.sliding_window_view(v, 7)
            trend = np.sort(win, axis=1)[:, 3]      # true 7-median
            days = np.arange(lo + 3, hi - 2, dtype=np.int64)
            detr = v[3:T - 3] - trend
            wk = days % 7
            seas = np.zeros(7, np.int64)
            for w in range(7):
                vals = np.sort(detr[wk == w])
                if len(vals):
                    seas[w] = vals[(len(vals) + 1) // 2 - 1]
            s = seas[wk]
            rows.append(pd.DataFrame({
                "event_type": np.repeat(et, len(days)),
                "day": days, "n": v[3:T - 3], "trend": trend,
                "seasonal": s, "resid": detr - s}))
        cols = {"event_type": pd.Series(dtype=object),
                "day": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "trend": pd.Series(dtype=np.int64),
                "seasonal": pd.Series(dtype=np.int64),
                "resid": pd.Series(dtype=np.int64)}
        if not rows:
            return pd.DataFrame(cols)
        return pd.concat(rows, ignore_index=True)

    return rel.bucketed_group_apply(counts, ["event_type"], per_type)


SQL_STL_DAILY = """
WITH c0 AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM c0),
days AS (SELECT UNNEST(range((SELECT lo FROM span),
                             (SELECT hi FROM span) + 1)) AS day),
types AS (SELECT DISTINCT event_type FROM c0),
c AS (SELECT t.event_type, d.day, COALESCE(c0.n, 0) AS n
      FROM types t CROSS JOIN days d
      LEFT JOIN c0 ON c0.event_type = t.event_type
                  AND c0.day = d.day),
tr AS (SELECT a.event_type, a.day, a.n,
              CAST(quantile_disc(b.n, 0.5) AS BIGINT) AS trend
       FROM c a JOIN c b
         ON b.event_type = a.event_type
        AND b.day BETWEEN a.day - 3 AND a.day + 3
       WHERE a.day >= (SELECT lo FROM span) + 3
         AND a.day <= (SELECT hi FROM span) - 3
       GROUP BY a.event_type, a.day, a.n),
se AS (SELECT event_type, day % 7 AS wk,
              CAST(quantile_disc(n - trend, 0.5) AS BIGINT) AS seasonal
       FROM tr GROUP BY event_type, day % 7)
SELECT tr.event_type, tr.day, tr.n, tr.trend, se.seasonal,
       CAST(tr.n - tr.trend - se.seasonal AS BIGINT) AS resid
FROM tr JOIN se ON se.event_type = tr.event_type
               AND se.wk = tr.day % 7
"""


def q_clamped_balance(sf_dir: str):
    """Zero-clamped running balance per user (the inventory/wallet
    semantics naive window sums get wrong): credits = purchase cents,
    debits = error cents, and the balance CLAMPS at zero — which IS
    window-expressible via the prefix-minimum identity
    B_t = S_t − min(0, min_{τ≤t} S_τ) for a one-sided clamp. Output
    per user: raw final sum, clamped final balance, and the deepest
    raw drawdown below zero. One user-bucketed cumsum/cummin; SQL
    replays with SUM/MIN OVER prefix windows."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type",
                                     "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        c = np.rint(g["value"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        et = g["event_type"].to_numpy()
        sign = np.where(et == "purchase", 1,
                        np.where(et == "error", -1, 0))
        amt = c * sign
        df = pd.DataFrame({"u": u, "a": amt})
        s = df.groupby("u", sort=False)["a"].cumsum().to_numpy(np.int64)
        smin = pd.Series(s).groupby(u, sort=False).cummin() \
            .to_numpy(np.int64)
        last = np.concatenate((u[1:] != u[:-1], [True]))
        fin = s[last]
        fmin = np.minimum(smin[last], 0)
        return pd.DataFrame({
            "user_id": u[last],
            "final_raw": fin,
            "final_clamped": fin - fmin,
            "min_prefix": fmin})

    return rel.bucketed_group_apply(ds, ["user_id"], per_user)


SQL_CLAMPED_BALANCE = """
WITH x AS (SELECT user_id, ts,
                  CAST(round(value * 100) AS BIGINT)
                  * CASE event_type WHEN 'purchase' THEN 1
                                    WHEN 'error' THEN -1 ELSE 0 END
                      AS a
           FROM events),
w AS (SELECT user_id,
             SUM(a) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS s,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC) AS rn
      FROM x),
m AS (SELECT user_id, MIN(LEAST(s, 0)) AS fmin, CAST(COUNT(*) AS BIGINT) AS _n
      FROM w GROUP BY user_id)
SELECT w.user_id, CAST(w.s AS BIGINT) AS final_raw,
       CAST(w.s - m.fmin AS BIGINT) AS final_clamped,
       CAST(m.fmin AS BIGINT) AS min_prefix
FROM w JOIN m ON m.user_id = w.user_id
WHERE w.rn = 1
"""


BOOT_B = 64
BOOT_C = 1 << 20
_BOOT_M = 2862933555777941757
_BOOT_A = 3037000493


def q_bootstrap_means(sf_dir: str):
    """Deterministic bootstrap of the per-type value sum: {BOOT_B}
    resamples of size n drawn WITH replacement by the replayable
    64-bit LCG index h(k) = (k·{_BOOT_M} + {_BOOT_A}) mod 2^64 mod n
    over the (ts, event_id)-ordered value array (k = b·2^20 + i) —
    the resampling-inference classic with a bit-exact oracle (the
    pseudonymize/simhash HUGEINT-replay discipline; numpy uint64
    wraparound IS mod 2^64). Output per type: n, observed cent sum,
    resamples strictly above it, and the min/max resample sums."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id",
                                     "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("event_type", sort=False):
            gg = gg.sort_values(["ts", "event_id"], kind="stable")
            x = np.rint(gg["value"].to_numpy(np.float64) * 100.0) \
                .astype(np.int64)
            n = len(x)
            if n == 0:
                continue
            i = np.arange(n, dtype=np.uint64)
            b = np.arange(BOOT_B, dtype=np.uint64)
            with np.errstate(over="ignore"):
                k = b[:, None] * np.uint64(BOOT_C) + i[None, :]
                h = k * np.uint64(_BOOT_M) + np.uint64(_BOOT_A)
            idx = (h % np.uint64(n)).astype(np.int64)
            sums = x[idx].sum(axis=1)
            obs = np.int64(x.sum())
            rows.append({"event_type": et, "n": n,
                         "observed_sum": obs,
                         "n_above": np.int64((sums > obs).sum()),
                         "min_resample": np.int64(sums.min()),
                         "max_resample": np.int64(sums.max())})
        cols = ("event_type", "n", "observed_sum", "n_above",
                "min_resample", "max_resample")
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype=object if c ==
                                              "event_type" else np.int64)
                                 for c in cols})
        out = pd.DataFrame(rows, columns=list(cols))
        for c in cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out

    return rel.bucketed_group_apply(ds, ["event_type"], per_type)


SQL_BOOTSTRAP_MEANS = f"""
WITH x AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS c,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) - 1 AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events),
bb AS (SELECT UNNEST(range(0, {BOOT_B})) AS b),
ii AS (SELECT UNNEST(range(0, (SELECT MAX(n) FROM x))) AS i),
draws AS (SELECT t.event_type, t.n, bb.b, ii.i,
                 CAST((CAST(bb.b * {BOOT_C} + ii.i AS HUGEINT)
                       * {_BOOT_M} + {_BOOT_A})
                      % CAST('18446744073709551616' AS HUGEINT)
                      % t.n AS BIGINT) AS idx
          FROM (SELECT DISTINCT event_type, n FROM x) t
          CROSS JOIN bb CROSS JOIN ii
          WHERE ii.i < t.n),
sums AS (SELECT d.event_type, d.b, CAST(SUM(x.c) AS BIGINT) AS s
         FROM draws d JOIN x ON x.event_type = d.event_type
                             AND x.rn = d.idx
         GROUP BY d.event_type, d.b),
obs AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS observed_sum
        FROM x GROUP BY event_type)
SELECT o.event_type, o.n, o.observed_sum,
       CAST(SUM(CASE WHEN s.s > o.observed_sum THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above,
       CAST(MIN(s.s) AS BIGINT) AS min_resample,
       CAST(MAX(s.s) AS BIGINT) AS max_resample
FROM obs o JOIN sums s ON s.event_type = o.event_type
GROUP BY o.event_type, o.n, o.observed_sum
"""


def q_rle_sessions(sf_dir: str):
    """Run-length structure of each user's event-type stream (the
    behavioral-stereotypy measure: many short runs = erratic, few
    long runs = repetitive): per user, total events, number of runs,
    and the longest run, all exact over the (user, ts) order. One
    user-bucketed shuffle; runs fall out of one vectorized
    change-flag cumsum. SQL replays with LAG + a prefix-sum run id."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        new = np.concatenate(([True],
                              (u[1:] != u[:-1]) | (et[1:] != et[:-1])))
        rid = np.cumsum(new) - 1
        run_len = np.bincount(rid)
        run_user = u[new]
        df = pd.DataFrame({"user_id": run_user, "rl": run_len})
        out = df.groupby("user_id", sort=False).agg(
            n_events=("rl", "sum"), n_runs=("rl", "size"),
            longest_run=("rl", "max")).reset_index()
        for c in ("n_events", "n_runs", "longest_run"):
            out[c] = out[c].astype(np.int64)
        return out

    return rel.bucketed_group_apply(ds, ["user_id"], per_user)


SQL_RLE_SESSIONS = """
WITH runs AS (SELECT user_id,
                SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS rid
         FROM (SELECT user_id, ts,
                      CASE WHEN LAG(event_type) OVER
                               (PARTITION BY user_id ORDER BY ts)
                               IS DISTINCT FROM event_type
                           THEN 1 ELSE 0 END AS chg
               FROM events) _c),
rl AS (SELECT user_id, rid, CAST(COUNT(*) AS BIGINT) AS len
       FROM runs GROUP BY user_id, rid)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(len) AS BIGINT) AS longest_run
FROM rl GROUP BY user_id
"""


PG_CELL = 4096
PG_MIN_USERS = 2


def q_place_graph(sf_dir: str):
    """Place co-visitation graph (the location-graph product every
    mobility platform builds): edges between {PG_CELL}-unit cells
    weighted by DISTINCT common visitors, kept at weight ≥
    {PG_MIN_USERS}. Per-user distinct cells fold map-side; the pair
    explosion runs per user inside one user-bucketed combine (cells
    per user is bounded by their trajectory, the documented blocking
    assumption) and ONE (cell, cell) count shuffles."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "cell": (np.asarray(ix) // PG_CELL) * 1_000_000
            + np.asarray(iy) // PG_CELL})
        return df.drop_duplicates(ignore_index=True)

    cells = rel.dedup(
        ev.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["user_id", "cell"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, gg in g.groupby("user_id", sort=False):
            c = np.sort(gg["cell"].to_numpy(np.int64))
            if len(c) < 2:
                continue
            iu, ju = np.triu_indices(len(c), 1)
            outs.append(pd.DataFrame({"cell_a": c[iu],
                                      "cell_b": c[ju]}))
        if not outs:
            return pd.DataFrame({"cell_a": pd.Series(dtype=np.int64),
                                 "cell_b": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    pr = rel.bucketed_group_apply(cells, ["user_id"], pairs)
    counts = rel.groupby_aggregate(pr, ["cell_a", "cell_b"],
                                   [("n_users", "cell_a", "count")])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_users"] >= PG_MIN_USERS].copy()
        b["n_users"] = b["n_users"].astype(np.int64)
        return b

    out = counts.map_batches(keep, batch_format="pandas",
                             batch_size=65536).materialize()
    if out.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("cell_a", "cell_b", "n_users")})
    return out


def SQL_PLACE_GRAPH():
    src = "(SELECT event_id, user_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
uc AS (SELECT DISTINCT user_id,
              (ix // {PG_CELL}) * 1000000 + iy // {PG_CELL} AS cell
       FROM ge),
pr AS (SELECT a.cell AS cell_a, b.cell AS cell_b
       FROM uc a JOIN uc b
         ON a.user_id = b.user_id AND a.cell < b.cell)
SELECT cell_a, cell_b, CAST(COUNT(*) AS BIGINT) AS n_users
FROM pr GROUP BY cell_a, cell_b
HAVING COUNT(*) >= {PG_MIN_USERS}
"""


NMS_EPS = 128


def q_label_nms(sf_dir: str):
    """Non-maximum suppression over customer points (the cartographic
    label-decluttering / detection-dedup primitive): keep a point iff
    it is the strict maximum of (priority, id) within {NMS_EPS} units
    — priority = ck%97, the total order making NMS parallel and
    deterministic (unlike sequential greedy placement). Pairs from
    the exactly-once tile kernel with priority carried; each pair
    emits its LOSER, one bucketed distinct, and survivors = points
    minus losers via a broadcast suppressed-id filter (losers are
    output-bounded). Output: kept (ck, prio) rows."""
    import ray as _ray

    from pythongis_ray import state

    pts_u = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def addp(b: pa.Table) -> pa.Table:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        return pa.table({"ck": b["ck"], "ix": b["ix"], "iy": b["iy"],
                         "prio": pa.array(ck % 97)})

    pts = pts_u.map_batches(addp, batch_format="pyarrow",
                            batch_size=65536).materialize()
    pairs = spatial.dwithin_self_pairs(pts, "ck", "ix", "iy",
                                       eps=NMS_EPS, carry=("prio",))

    def losers(b: pa.Table) -> pd.DataFrame:
        ia = b["id_a"].to_numpy(zero_copy_only=False)
        ib = b["id_b"].to_numpy(zero_copy_only=False)
        pa_ = b["prio_a"].to_numpy(zero_copy_only=False)
        pb = b["prio_b"].to_numpy(zero_copy_only=False)
        # total order (prio, id): ids are unique so no true ties
        a_wins = (pa_ > pb) | ((pa_ == pb) & (ia > ib))
        lose = np.where(a_wins, ib, ia)
        return pd.DataFrame({"ck": np.unique(lose)})

    sup = rel.dedup(pairs.map_batches(losers, batch_format="pyarrow",
                                      batch_size=None), ["ck"])
    sup_ids = sup.to_pandas()["ck"].to_numpy(np.int64)
    sref = _ray.put(np.sort(sup_ids))

    def keep(b: pa.Table) -> pd.DataFrame:
        s = state.get_broadcast(sref, key_extra=("nms", NMS_EPS))
        ck = b["ck"].to_numpy(zero_copy_only=False)
        k = ~np.isin(ck, s)
        return pd.DataFrame({"ck": ck[k],
                             "prio": b["prio"].to_numpy(
                                 zero_copy_only=False)[k]})

    return pts.map_batches(keep, batch_format="pyarrow",
                           batch_size=65536)


def SQL_LABEL_NMS():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    return f"""
WITH pts AS (SELECT ck, ck % 97 AS prio, ix, iy FROM ({g}) _g)
SELECT p.ck, CAST(p.prio AS BIGINT) AS prio
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.ck <> p.ck
    AND (q.ix-p.ix)*(q.ix-p.ix) + (q.iy-p.iy)*(q.iy-p.iy)
        <= {NMS_EPS * NMS_EPS}
    AND (q.prio > p.prio OR (q.prio = p.prio AND q.ck > p.ck)))
"""


KDE_STEP = 4096
KDE_R = 8192


def q_kde_epanechnikov(sf_dir: str):
    """Kernel density surface with the Epanechnikov kernel made EXACT
    on the lattice: density(cell) = Σ over points within R={KDE_R} of
    (R² − d²) where d is the distance to the cell CENTER on the
    {KDE_STEP}-unit grid — integer weights, no floats (the named-
    kernel upgrade over box-count density/smooth). Each point
    scatters to its fixed 5×5 cell neighborhood map-side (25
    offsets, vectorized), ONE (cell) count shuffle; SQL explodes the
    same 25 offsets via VALUES. Zero-weight contributions drop on
    both sides."""
    pts = points_lineitem(sf_dir)
    half = KDE_STEP // 2
    offs = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)]

    def scatter(batch: pa.Table) -> pd.DataFrame:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        cx0 = ix // KDE_STEP
        cy0 = iy // KDE_STEP
        outs = []
        for dx, dy in offs:
            cx = cx0 + dx
            cy = cy0 + dy
            mx = cx * KDE_STEP + half
            my = cy * KDE_STEP + half
            d2 = (ix - mx) ** 2 + (iy - my) ** 2
            w = KDE_R * KDE_R - d2
            k = w > 0
            if k.any():
                outs.append(pd.DataFrame({"cx": cx[k], "cy": cy[k],
                                          "w": w[k]}))
        if not outs:
            return pd.DataFrame({"cx": pd.Series(dtype=np.int64),
                                 "cy": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        df = pd.concat(outs, ignore_index=True)
        g = df.groupby(["cx", "cy"], sort=False)["w"].sum().reset_index()
        g["w"] = g["w"].astype(np.int64)
        return g

    parts = pts.map_batches(scatter, batch_format="pyarrow",
                            batch_size=65536)
    return rel.groupby_aggregate(parts, ["cx", "cy"],
                                 [("density", "w", "sum")])


def SQL_KDE_EPANECHNIKOV():
    offs = ", ".join(f"({dx}, {dy})" for dx in range(-2, 3)
                     for dy in range(-2, 3))
    half = KDE_STEP // 2
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
sc AS (SELECT (p.ix // {KDE_STEP} + o.dx) AS cx,
              (p.iy // {KDE_STEP} + o.dy) AS cy,
              {KDE_R * KDE_R}
              - (p.ix - ((p.ix // {KDE_STEP} + o.dx) * {KDE_STEP}
                         + {half}))
                * (p.ix - ((p.ix // {KDE_STEP} + o.dx) * {KDE_STEP}
                           + {half}))
              - (p.iy - ((p.iy // {KDE_STEP} + o.dy) * {KDE_STEP}
                         + {half}))
                * (p.iy - ((p.iy // {KDE_STEP} + o.dy) * {KDE_STEP}
                           + {half})) AS w
       FROM pts p CROSS JOIN (VALUES {offs}) o(dx, dy))
SELECT cx, cy, CAST(SUM(w) AS BIGINT) AS density
FROM sc WHERE w > 0 GROUP BY cx, cy
"""


PH_THRESH = 3
PH_MIN_DAYS = 10


def q_persistent_hotspots(sf_dir: str):
    """Persistent hotspots (the stability filter over daily hot-spot
    maps — transient spikes vs durable centers): 8°-cells whose daily
    event count reaches ≥{PH_THRESH} on at least {PH_MIN_DAYS} days,
    with the hot-day count and the total events on hot days. One
    (cell, day) aggregate; the persistence fold is a bounded per-cell
    count."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        df = pd.DataFrame({"cx": np.asarray(ix) // 8192,
                           "cy": np.asarray(iy) // 8192,
                           "day": us // 86_400_000_000})
        g = (df.groupby(["cx", "cy", "day"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ev.map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["cx", "cy", "day"],
                                   [("n", "n", "sum")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["n"] >= PH_THRESH]
        out = g.groupby(["cx", "cy"], sort=False).agg(
            hot_days=("n", "size"),
            hot_events=("n", "sum")).reset_index()
        out = out[out["hot_days"] >= PH_MIN_DAYS]
        for c in ("hot_days", "hot_events"):
            out[c] = out[c].astype(np.int64)
        return out

    out = rel.bucketed_group_apply(counts, ["cx", "cy"],
                                   fold).materialize()
    if out.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("cx", "cy", "hot_days",
                                       "hot_events")})
    return out


def SQL_PERSISTENT_HOTSPOTS():
    src = "(SELECT event_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
c AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ge GROUP BY 1, 2, 3)
SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS hot_days,
       CAST(SUM(n) AS BIGINT) AS hot_events
FROM c WHERE n >= {PH_THRESH}
GROUP BY cx, cy HAVING COUNT(*) >= {PH_MIN_DAYS}
"""


MG_K = 32


def q_heavy_hitters(sf_dir: str):
    """Exact heavy hitters through a Misra-Gries candidate pass (the
    deterministic streaming-sketch companion to cms_topk): per batch,
    an MG({MG_K}) summary keeps every token exceeding 1/({MG_K}+1) of
    the batch — by pigeonhole any token above T/{MG_K} GLOBALLY must
    exceed that in some batch, so the candidate union is a guaranteed
    superset; one exact filtered count then yields the TRUE heavy
    hitters (count > total/{MG_K}) with no false positives. Candidate
    volume is ≤ {MG_K}·nbatches — the sketch bounds the shuffle, the
    verify restores exactness (the engine's sketch-then-verify
    discipline). Output: (word, n, total)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def mg(b: pa.Table) -> pd.DataFrame:
        col = b["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        toks = pc.split_pattern(arr, " ").flatten() \
            .to_numpy(zero_copy_only=False)
        vc = pd.Series(toks).value_counts()
        n = int(vc.sum())
        # exact per-batch counts make the MG guarantee trivial: keep
        # tokens with count > n/(K+1) (what MG's counters retain)
        keep = vc[vc.to_numpy() * (MG_K + 1) > n]
        return pd.DataFrame({"word": keep.index.to_numpy(object),
                             "bn": keep.to_numpy(np.int64),
                             "total": np.int64(n)})

    cand_df = ds.map_batches(mg, batch_format="pyarrow",
                             batch_size=4096).to_pandas()
    empty = pd.DataFrame({"word": pd.Series([], dtype=object),
                          "n": pd.Series([], dtype=np.int64),
                          "total": pd.Series([], dtype=np.int64)})
    if len(cand_df) == 0:
        # no batch-level heavy hitter ⟹ (pigeonhole) no global one
        return empty
    words = sorted(set(cand_df["word"]))

    def count_all(b: pa.Table) -> pd.DataFrame:
        col = b["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        toks = pc.split_pattern(arr, " ").flatten() \
            .to_numpy(zero_copy_only=False)
        vc = pd.Series(toks).value_counts()
        out = vc[vc.index.isin(words)]
        return pd.DataFrame({"word": out.index.to_numpy(object),
                             "n": out.to_numpy(np.int64)})

    parts = ds.map_batches(count_all, batch_format="pyarrow",
                           batch_size=4096).to_pandas()
    g = parts.groupby("word", sort=False)["n"].sum()
    # true token total: one dedicated bounded pass (one row per batch)
    tot_parts = ds.map_batches(
        lambda b: pd.DataFrame({"t": [np.int64(len(
            (b["text"].combine_chunks() if isinstance(
                b["text"], pa.ChunkedArray) else b["text"])
            .to_pandas().str.split(" ").explode()))]}),
        batch_format="pyarrow", batch_size=4096).to_pandas()
    T = np.int64(tot_parts["t"].sum())
    hh = g[g.to_numpy() * MG_K > T].sort_index()
    return pd.DataFrame({"word": hh.index.to_numpy(object),
                         "n": hh.to_numpy(np.int64),
                         "total": np.full(len(hh), T, np.int64)})


SQL_HEAVY_HITTERS = f"""
WITH w AS (SELECT UNNEST(string_split(text, ' ')) AS word
           FROM documents),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM w),
c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word)
SELECT c.word, c.n, t.total
FROM c CROSS JOIN t
WHERE c.n * {MG_K} > t.total
"""


def q_wasserstein_1d(sf_dir: str):
    """Exact 1-D Wasserstein (earth-mover) distance between each
    source's doc-length distribution (bins = n_chars//100) and the
    corpus-wide one, denominators CLEARED: with T_s/T_g the totals
    and cum_s/cum_g the bin-cumulative counts, EMD = num/den where
    num = Σ_i |T_g·cum_s(b_i) − T_s·cum_g(b_i)|·(b_{i+1}−b_i) over
    the sorted distinct bins and den = T_s·T_g — all int64 at every
    checked scale. The (source, bin) table is bounded; the cumulative
    fold runs in the single bounded combine. The drift metric every
    mixture-rebalancing pipeline wants, exactly."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "bin": b["n_chars"].to_numpy(
                               zero_copy_only=False) // 100})
        g = (df.groupby(["source", "bin"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["source", "bin"],
                                   [("n", "n", "sum")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        bins = np.sort(g["bin"].unique().astype(np.int64))
        gap = np.diff(bins)
        glob = g.groupby("bin")["n"].sum().reindex(bins, fill_value=0) \
            .to_numpy(np.int64)
        cg = np.cumsum(glob)
        Tg = np.int64(cg[-1])
        rows = []
        for src, gg in g.groupby("source", sort=False):
            cs = gg.set_index("bin")["n"].reindex(bins, fill_value=0) \
                .to_numpy(np.int64).cumsum()
            Ts = np.int64(cs[-1])
            num = np.abs(Tg * cs[:-1] - Ts * cg[:-1]) @ gap
            rows.append({"source": src, "emd_num": np.int64(num),
                         "emd_den": Ts * Tg})
        out = pd.DataFrame(rows,
                           columns=["source", "emd_num", "emd_den"])
        out["emd_num"] = out["emd_num"].astype(np.int64)
        out["emd_den"] = out["emd_den"].astype(np.int64)
        return out

    one = counts.map_batches(lambda b: b.assign(_one=np.int64(0)),
                             batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: fold(g.drop(columns=["_one"])),
        batch_format="pandas")


SQL_WASSERSTEIN_1D = """
WITH c AS (SELECT source, n_chars // 100 AS bin,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2),
bins AS (SELECT DISTINCT bin FROM c),
nxt AS (SELECT bin, LEAD(bin) OVER (ORDER BY bin) AS nb FROM bins),
srcs AS (SELECT DISTINCT source FROM c),
grid AS (SELECT s.source, b.bin, COALESCE(c.n, 0) AS n
         FROM srcs s CROSS JOIN bins b
         LEFT JOIN c ON c.source = s.source AND c.bin = b.bin),
cs AS (SELECT source, bin,
              SUM(n) OVER (PARTITION BY source ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cs
       FROM grid),
gg AS (SELECT bin, SUM(n) AS n FROM grid GROUP BY bin),
cgt AS (SELECT bin, SUM(n) OVER (ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS cg
        FROM gg),
cum AS (SELECT cs.source, cs.bin, cs.cs, cgt.cg
        FROM cs JOIN cgt ON cgt.bin = cs.bin),
tot AS (SELECT source, MAX(cs) AS ts FROM cum GROUP BY source),
tg AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM documents)
SELECT cum.source,
       CAST(SUM(ABS(tg.t * cum.cs - tot.ts * cum.cg)
                * (nxt.nb - cum.bin)) AS BIGINT) AS emd_num,
       CAST(MAX(tot.ts * tg.t) AS BIGINT) AS emd_den
FROM cum
JOIN nxt ON nxt.bin = cum.bin AND nxt.nb IS NOT NULL
JOIN tot ON tot.source = cum.source
CROSS JOIN tg
GROUP BY cum.source
"""


def q_discrete_1mean(sf_dir: str):
    """Discrete 1-mean facility location: the customer point
    minimizing total SQUARED distance to all customers, exact and
    join-free — expand Σ_q d²(p,q) = n·|p|² − 2·p·S + Q with the
    three global moments (n, S=Σq, Q=Σ|q|²), so one bounded moment
    fold plus one streamed argmin scores every candidate in O(1)
    (the classic sum-of-squares expansion that turns an all-pairs
    objective into two scans). Ties → smallest key. Output one row
    (ck, cost)."""
    pts = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck") \
        .materialize()

    mom = pts.map_batches(
        lambda b: pd.DataFrame({
            "n": [np.int64(b.num_rows)],
            "sx": [np.int64(b["ix"].to_numpy(zero_copy_only=False)
                            .sum())],
            "sy": [np.int64(b["iy"].to_numpy(zero_copy_only=False)
                            .sum())],
            "q": [np.int64((b["ix"].to_numpy(zero_copy_only=False)
                            .astype(np.int64) ** 2
                            + b["iy"].to_numpy(zero_copy_only=False)
                            .astype(np.int64) ** 2).sum())]}),
        batch_format="pyarrow", batch_size=65536).to_pandas()
    n = np.int64(mom["n"].sum())
    sx = np.int64(mom["sx"].sum())
    sy = np.int64(mom["sy"].sum())
    Q = np.int64(mom["q"].sum())

    def score(b: pa.Table) -> pd.DataFrame:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        x = b["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        cost = n * (x * x + y * y) - 2 * (x * sx + y * sy) + Q
        df = pd.DataFrame({"ck": ck, "cost": cost})
        return df.sort_values(["cost", "ck"], kind="stable").head(1)

    best = pts.map_batches(score, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    best = best.sort_values(["cost", "ck"], kind="stable").head(1)
    return best.reset_index(drop=True).astype(np.int64)


def SQL_DISCRETE_1MEAN():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    return f"""
WITH pts AS (SELECT ck, ix, iy FROM ({g}) _g),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ix) AS BIGINT) AS sx,
             CAST(SUM(iy) AS BIGINT) AS sy,
             CAST(SUM(ix*ix + iy*iy) AS BIGINT) AS q FROM pts),
sc AS (SELECT p.ck,
              m.n * (p.ix*p.ix + p.iy*p.iy)
              - 2 * (p.ix*m.sx + p.iy*m.sy) + m.q AS cost
       FROM pts p CROSS JOIN m)
SELECT ck, CAST(cost AS BIGINT) AS cost
FROM sc ORDER BY cost, ck LIMIT 1
"""


KC_ROUNDS = 4


def q_kcenter_greedy(sf_dir: str):
    """Gonzalez greedy k-center seeding over customer points (the
    2-approximation every coreset / kmeans++ pipeline starts from),
    fully deterministic: c₁ = smallest key; each round adds the point
    FARTHEST (exact integer d² to the current center set, ties →
    smallest key). {KC_ROUNDS} rounds of one streamed argmax each —
    the per-round state is just the center list (broadcast scalars).
    Output: (round, ck, d2_to_set) — d2 0 for the seed."""
    pts = _keyed_units(sf_dir, "customer", "c_custkey", 4, 1, "ck") \
        .materialize()

    seed = pts.map_batches(
        lambda b: pd.DataFrame({
            "ck": [np.int64(b["ck"].to_numpy(
                zero_copy_only=False).min())]}),
        batch_format="pyarrow", batch_size=65536).to_pandas()
    c0 = np.int64(seed["ck"].min())
    cx, cy = fixtures.geocode_units(np.array([c0]))
    centers = [(c0, int(np.asarray(cx)[0]), int(np.asarray(cy)[0]))]
    out = [{"round": np.int64(1), "ck": c0, "d2_to_set": np.int64(0)}]

    for r in range(2, KC_ROUNDS + 1):
        carr = np.array([(x, y) for _, x, y in centers], np.int64)

        def far(b: pa.Table, _c=carr) -> pd.DataFrame:
            ck = b["ck"].to_numpy(zero_copy_only=False)
            x = b["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = b["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
            d2 = ((x[:, None] - _c[None, :, 0]) ** 2
                  + (y[:, None] - _c[None, :, 1]) ** 2).min(axis=1)
            df = pd.DataFrame({"ck": ck, "d2": d2})
            return df.sort_values(["d2", "ck"],
                                  ascending=[False, True],
                                  kind="stable").head(1)

        cand = pts.map_batches(far, batch_format="pyarrow",
                               batch_size=65536).to_pandas()
        cand = cand.sort_values(["d2", "ck"], ascending=[False, True],
                                kind="stable").head(1)
        nk = np.int64(cand["ck"].iloc[0])
        nx, ny = fixtures.geocode_units(np.array([nk]))
        centers.append((nk, int(np.asarray(nx)[0]),
                        int(np.asarray(ny)[0])))
        out.append({"round": np.int64(r), "ck": nk,
                    "d2_to_set": np.int64(cand["d2"].iloc[0])})

    df = pd.DataFrame(out, columns=["round", "ck", "d2_to_set"])
    return df.astype(np.int64)


def SQL_KCENTER_GREEDY():
    src = "(SELECT c_custkey*4+1 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    steps = ["c1 AS MATERIALIZED (SELECT ck, ix, iy FROM pts "
             "WHERE ck = (SELECT MIN(ck) FROM pts))"]
    prev_centers = "SELECT * FROM c1"
    sel = ["SELECT 1 AS round, ck, CAST(0 AS BIGINT) AS d2_to_set "
           "FROM c1"]
    for r in range(2, KC_ROUNDS + 1):
        steps.append(f"""
d{r} AS MATERIALIZED (
  SELECT p.ck, p.ix, p.iy,
         MIN((p.ix-c.ix)*(p.ix-c.ix) + (p.iy-c.iy)*(p.iy-c.iy)) AS d2
  FROM pts p CROSS JOIN ({prev_centers}) c
  GROUP BY p.ck, p.ix, p.iy),
c{r} AS MATERIALIZED (
  SELECT ck, ix, iy, d2 FROM d{r}
  ORDER BY d2 DESC, ck LIMIT 1)""")
        prev_centers += f" UNION ALL SELECT ck, ix, iy FROM c{r}"
        sel.append(f"SELECT {r} AS round, ck, CAST(d2 AS BIGINT) "
                   f"AS d2_to_set FROM c{r}")
    return f"""
WITH pts AS (SELECT ck, ix, iy FROM ({g}) _g),
{",".join(steps)}
SELECT CAST(round AS BIGINT) AS round, ck, d2_to_set
FROM ({" UNION ALL ".join(sel)})
"""


def q_concentration(sf_dir: str):
    """Top-1% concentration (the activity-inequality headline next to
    the Gini query): events held by the ceil(U/100) most active users
    (count DESC, user_id ties) vs total. User activity is a bounded
    table; the top slice folds via per-batch partial top-k + driver
    merge. Output one row (n_users, k_top, top_events, total_events)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def partial(b: pa.Table) -> pd.DataFrame:
        g = pd.Series(b["user_id"].to_numpy(zero_copy_only=False)) \
            .value_counts()
        return pd.DataFrame({"user_id": g.index.to_numpy(np.int64),
                             "n": g.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    ua = rel.groupby_aggregate(parts, ["user_id"],
                               [("n", "n", "sum")]).to_pandas()
    U = len(ua)
    k = (U + 99) // 100
    ua = ua.sort_values(["n", "user_id"], ascending=[False, True],
                        kind="stable")
    return pd.DataFrame({
        "n_users": [np.int64(U)], "k_top": [np.int64(k)],
        "top_events": [np.int64(ua["n"].head(k).sum())],
        "total_events": [np.int64(ua["n"].sum())]})


SQL_CONCENTRATION = """
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY user_id),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn
      FROM c),
u AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM c)
SELECT u.nu AS n_users,
       CAST((u.nu + 99) // 100 AS BIGINT) AS k_top,
       CAST(SUM(CASE WHEN r.rn <= (u.nu + 99) // 100 THEN r.n
                     ELSE 0 END) AS BIGINT) AS top_events,
       CAST(SUM(r.n) AS BIGINT) AS total_events
FROM r CROSS JOIN u GROUP BY u.nu
"""


VGM_EPS = 256
VGM_SAMPLE = 16


def q_variogram(sf_dir: str):
    """Directional experimental variogram (the geostatistics core
    that precedes any kriging): over a 1-in-{VGM_SAMPLE} sample of
    the lineitem points, every pair within {VGM_EPS} units
    contributes (q_a−q_b)² to its (direction, lag-band) cell —
    direction = the 45° sector of the displacement folded mod 180°
    (the move_octants sign predicates, octant%4: E/NE/N/NW), lag
    band = binary order of d² (length(bin(d2)) in SQL). Everything
    is exact integers; pairs ride the exactly-once tile kernel with
    coordinates and value carried so direction and Δq compute
    in-kernel-adjacent with no re-join. Output: (dir, band, n_pairs,
    gamma_num = Σ Δq²)."""
    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_quantity"])

    def to_pts(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = ok % VGM_SAMPLE == 0    # sample whole orders — pk =
        pk = (ok * 8 + ln)[keep]       # 8·ok+ln is never ≡0 mod 16
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ix, iy = fixtures.geocode_units(pk)
        return pa.table({"pk": pa.array(pk), "ix": ix, "iy": iy,
                         "qty": pa.array(qty)})

    pts = ds.map_batches(to_pts, batch_format="pyarrow",
                         batch_size=65536)
    pairs = spatial.dwithin_self_pairs(
        pts, "pk", "ix", "iy", eps=VGM_EPS,
        carry=("ix", "iy", "qty"))

    POWS = np.array([np.int64(1) << k for k in range(1, 63)], np.int64)

    def fold(b: pa.Table) -> pd.DataFrame:
        dx = b["ix_a"].to_numpy(zero_copy_only=False) \
            - b["ix_b"].to_numpy(zero_copy_only=False)
        dy = b["iy_a"].to_numpy(zero_copy_only=False) \
            - b["iy_b"].to_numpy(zero_copy_only=False)
        dq = b["qty_a"].to_numpy(zero_copy_only=False) \
            - b["qty_b"].to_numpy(zero_copy_only=False)
        d2 = b["d2"].to_numpy(zero_copy_only=False)
        nz = d2 > 0
        dx, dy, dq, d2 = dx[nz], dy[nz], dq[nz], d2[nz]
        octant = np.select(
            [(dx > 0) & (dy >= 0) & (dx > dy),
             (dy > 0) & (dx > 0) & (dy >= dx),
             (dy > 0) & (dx <= 0) & (dy > -dx),
             (dx < 0) & (dy > 0) & (-dx >= dy),
             (dx < 0) & (dy <= 0) & (-dx > -dy),
             (dy < 0) & (dx < 0) & (-dy >= -dx),
             (dy < 0) & (dx >= 0) & (-dy > dx)],
            [0, 1, 2, 3, 4, 5, 6], default=7).astype(np.int64)
        direc = octant % 4
        band = np.searchsorted(POWS, d2, side="right") + 1
        df = pd.DataFrame({"dir": direc, "band": band,
                           "one": np.int64(1), "g": dq * dq})
        out = df.groupby(["dir", "band"], sort=False).agg(
            n_pairs=("one", "sum"), gamma_num=("g", "sum")).reset_index()
        for c in ("n_pairs", "gamma_num"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = pairs.map_batches(fold, batch_format="pyarrow",
                              batch_size=None)
    out = rel.groupby_aggregate(parts, ["dir", "band"],
                                [("n_pairs", "n_pairs", "sum"),
                                 ("gamma_num", "gamma_num", "sum")]) \
        .materialize()
    if out.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("dir", "band", "n_pairs",
                                       "gamma_num")})
    return out


def SQL_VARIOGRAM():
    src = (f"(SELECT l_orderkey*8+l_linenumber AS gk, "
           f"CAST(l_quantity AS BIGINT) AS qty FROM lineitem "
           f"WHERE l_orderkey % {VGM_SAMPLE} = 0)")
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH pts AS (SELECT gk, qty, ix, iy FROM ({g}) _g),
pr AS (SELECT a.ix - b.ix AS dx, a.iy - b.iy AS dy,
              a.qty - b.qty AS dq,
              (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy) AS d2
       FROM pts a JOIN pts b
         ON a.gk < b.gk
        AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
            <= {VGM_EPS * VGM_EPS}),
v AS (SELECT CASE
        WHEN dx >  0 AND dy >= 0 AND dx >  dy  THEN 0
        WHEN dy >  0 AND dx >  0 AND dy >= dx  THEN 1
        WHEN dy >  0 AND dx <= 0 AND dy > -dx  THEN 2
        WHEN dx <  0 AND dy >  0 AND -dx >= dy THEN 3
        WHEN dx <  0 AND dy <= 0 AND -dx > -dy THEN 4
        WHEN dy <  0 AND dx <  0 AND -dy >= -dx THEN 5
        WHEN dy <  0 AND dx >= 0 AND -dy > dx  THEN 6
        ELSE 7 END % 4 AS dir,
        length(bin(d2)) AS band, dq
      FROM pr WHERE d2 > 0)
SELECT CAST(dir AS BIGINT) AS dir, CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(dq * dq) AS BIGINT) AS gamma_num
FROM v GROUP BY dir, band
"""


def q_cut_conductance(sf_dir: str):
    """Cut conductance of the parity bipartition of the link graph
    (the partition-quality metric behind every min-cut / community
    evaluation): φ = cut / min(vol_even, vol_odd) reported as the
    exact integer triple (cut_edges, vol_even, vol_odd) over the
    directed edge multiset (vol = endpoint incidences). One streamed
    pass of per-batch partials — no shuffle beyond the single-row
    fold."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)

    def partial(b: pa.Table) -> pd.DataFrame:
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        sp = s % 2
        dp = d % 2
        cut = np.int64((sp != dp).sum())
        vol_e = np.int64((sp == 0).sum() + (dp == 0).sum())
        vol_o = np.int64((sp == 1).sum() + (dp == 1).sum())
        return pd.DataFrame({"cut_edges": [cut], "vol_even": [vol_e],
                             "vol_odd": [vol_o]})

    parts = edges.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
    return pd.DataFrame({
        "cut_edges": [np.int64(parts["cut_edges"].sum())],
        "vol_even": [np.int64(parts["vol_even"].sum())],
        "vol_odd": [np.int64(parts["vol_odd"].sum())]})


SQL_CUT_CONDUCTANCE = f"""
WITH e AS ({_SQL_PAGE_EDGES})
SELECT CAST(SUM(CASE WHEN src % 2 <> dst % 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS cut_edges,
       CAST(SUM(CASE WHEN src % 2 = 0 THEN 1 ELSE 0 END)
            + SUM(CASE WHEN dst % 2 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS vol_even,
       CAST(SUM(CASE WHEN src % 2 = 1 THEN 1 ELSE 0 END)
            + SUM(CASE WHEN dst % 2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS vol_odd
FROM e
"""


def q_visitor_mix(sf_dir: str):
    """Resident/visitor mix per cell (the urban-analytics staple built
    on home inference): each user's HOME is their most-visited
    {HW_CELL}-unit cell (visits DESC, then cell coords — the
    home_work rule), and every event splits its cell's traffic into
    resident (event cell == visitor's home) vs visitor counts. The
    home table is user-bounded and joins back onto the event stream
    via one partitioned join; one (cell) count shuffle."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "cx": np.asarray(ix) // HW_CELL,
            "cy": np.asarray(iy) // HW_CELL})

    evc = ev.map_batches(prep, batch_format="pyarrow",
                         batch_size=65536).materialize()

    def vcount(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["user_id", "cx", "cy"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    counts = rel.groupby_aggregate(
        evc.map_batches(vcount, batch_format="pandas",
                        batch_size=65536),
        ["user_id", "cx", "cy"], [("n", "n", "sum")])

    def home(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "n", "cx", "cy"],
                          ascending=[True, False, True, True],
                          kind="stable")
        top = g.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({
            "user_id": top["user_id"].to_numpy(np.int64),
            "hx": top["cx"].to_numpy(np.int64),
            "hy": top["cy"].to_numpy(np.int64)})

    homes = rel.bucketed_group_apply(counts, ["user_id"], home)
    joined = rel.join_large(evc, homes, on="user_id")

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        res = ((b["cx"] == b["hx"]) & (b["cy"] == b["hy"])) \
            .to_numpy().astype(np.int64)
        df = pd.DataFrame({"cx": b["cx"].to_numpy(np.int64),
                           "cy": b["cy"].to_numpy(np.int64),
                           "r": res, "v": 1 - res})
        g = df.groupby(["cx", "cy"], sort=False).agg(
            n_resident=("r", "sum"), n_visitor=("v", "sum")) \
            .reset_index()
        for c in ("n_resident", "n_visitor"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = joined.map_batches(fold, batch_format="pandas",
                               batch_size=65536)
    return rel.groupby_aggregate(parts, ["cx", "cy"],
                                 [("n_resident", "n_resident", "sum"),
                                  ("n_visitor", "n_visitor", "sum")])


def SQL_VISITOR_MIX():
    src = "(SELECT event_id, user_id, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
ec AS (SELECT user_id, ix // {HW_CELL} AS cx, iy // {HW_CELL} AS cy
       FROM ge),
c AS (SELECT user_id, cx, cy, CAST(COUNT(*) AS BIGINT) AS n
      FROM ec GROUP BY 1, 2, 3),
h AS (SELECT user_id, cx AS hx, cy AS hy FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY n DESC, cx, cy) AS rn FROM c)
      WHERE rn = 1)
SELECT ec.cx, ec.cy,
       CAST(SUM(CASE WHEN ec.cx = h.hx AND ec.cy = h.hy
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resident,
       CAST(SUM(CASE WHEN ec.cx = h.hx AND ec.cy = h.hy
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_visitor
FROM ec JOIN h ON h.user_id = ec.user_id
GROUP BY ec.cx, ec.cy
"""


CAL_BIN = 500
CAL_LABEL_CHARS = 300


def q_calibration(sf_dir: str):
    """Reliability-diagram inputs for the quality_lr scorer (the
    ML-eval readout every production classifier ships with): docs bin
    by integer score ({CAL_BIN} milli-weight buckets) against the
    deterministic pseudo-label n_chars ≥ {CAL_LABEL_CHARS}; each bin
    reports (n, n_pos) — the exact counts behind predicted-vs-actual
    calibration. One scoring pass + one bin-count shuffle."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "n_chars"])
    scored = ds.map_batches(text.quality_lr, batch_format="pyarrow",
                            batch_size=8192)

    def binned(b: pa.Table) -> pd.DataFrame:
        sc = b["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "bin": np.floor_divide(sc, CAL_BIN),
            "one": np.int64(1),
            "pos": (nc >= CAL_LABEL_CHARS).astype(np.int64)})
        g = df.groupby("bin", sort=False).agg(
            n=("one", "sum"), n_pos=("pos", "sum")).reset_index()
        for c in ("n", "n_pos"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = scored.map_batches(binned, batch_format="pyarrow",
                               batch_size=65536)
    return rel.groupby_aggregate(parts, ["bin"],
                                 [("n", "n", "sum"),
                                  ("n_pos", "n_pos", "sum")])


def SQL_CALIBRATION():
    # the scorer SQL minus its threshold filter: score for ALL docs
    base = _sql_quality_lr()
    allscores = base[:base.rindex("WHERE ")]
    return f"""
WITH scored AS ({allscores}),
j AS (SELECT s.score, d.n_chars
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
SELECT CAST(CASE WHEN score >= 0 THEN score // {CAL_BIN}
                 ELSE -((-score + {CAL_BIN} - 1) // {CAL_BIN})
            END AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN n_chars >= {CAL_LABEL_CHARS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
FROM j GROUP BY 1
"""


def q_auc_inputs(sf_dir: str):
    """Exact ROC-AUC of the quality scorer against the length
    pseudo-label, as integers: AUC = (concordant + ties/2) / (P·N),
    so the pair (auc2_num = 2·concordant + ties, auc_den = 2·P·N)
    determines it exactly. Computed from the BOUNDED per-score
    (n_pos, n_neg) histogram with one cumulative pass — the
    rank-statistic identity, no pos×neg pair join. Output one row
    (n_pos, n_neg, auc2_num)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "n_chars"])
    scored = ds.map_batches(text.quality_lr, batch_format="pyarrow",
                            batch_size=8192)

    def hist(b: pa.Table) -> pd.DataFrame:
        sc = b["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = (b["n_chars"].to_numpy(zero_copy_only=False)
               >= CAL_LABEL_CHARS).astype(np.int64)
        df = pd.DataFrame({"score": sc, "p": pos, "q": 1 - pos})
        g = df.groupby("score", sort=False).agg(
            n_pos=("p", "sum"), n_neg=("q", "sum")).reset_index()
        for c in ("n_pos", "n_neg"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = scored.map_batches(hist, batch_format="pyarrow",
                               batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["score"],
                                   [("n_pos", "n_pos", "sum"),
                                    ("n_neg", "n_neg", "sum")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("score", kind="stable")
        p = g["n_pos"].to_numpy(np.int64)
        q = g["n_neg"].to_numpy(np.int64)
        cumq = np.concatenate(([0], np.cumsum(q)[:-1]))
        auc2 = np.int64((p * (2 * cumq + q)).sum())
        return pd.DataFrame({"n_pos": [np.int64(p.sum())],
                             "n_neg": [np.int64(q.sum())],
                             "auc2_num": [auc2]})

    one = counts.map_batches(lambda b: b.assign(_one=np.int64(0)),
                             batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: fold(g.drop(columns=["_one"])),
        batch_format="pandas")


def SQL_AUC_INPUTS():
    base = _sql_quality_lr()
    allscores = base[:base.rindex("WHERE ")]
    return f"""
WITH scored AS ({allscores}),
j AS (SELECT s.score,
             CASE WHEN d.n_chars >= {CAL_LABEL_CHARS}
                  THEN 1 ELSE 0 END AS pos
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
h AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(1 - pos) AS BIGINT) AS n_neg
      FROM j GROUP BY score),
c AS (SELECT score, n_pos, n_neg,
             COALESCE(SUM(n_neg) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cumq
      FROM h)
SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg,
       CAST(SUM(n_pos * (2 * cumq + n_neg)) AS BIGINT) AS auc2_num
FROM c
"""


def q_lang_confusion(sf_dir: str):
    """Confusion matrix of the stopword language-ID against the
    labeled lang column (the eval table behind precision/recall per
    class): (lang_true, lang_pred, n) over all docs. One scoring pass
    (the langid actor pool) + one pair-count shuffle; SQL replays the
    count-argmax heuristic and joins the label."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    out = ds.map_batches(text.LanguageId, batch_format="pyarrow",
                         batch_size=8192, concurrency=2)

    def pairs(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang_true": b["lang"].to_pandas(),
                           "lang_pred": b["lang_pred"].to_pandas()})
        g = (df.groupby(["lang_true", "lang_pred"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = out.map_batches(pairs, batch_format="pyarrow",
                            batch_size=65536)
    return rel.groupby_aggregate(parts, ["lang_true", "lang_pred"],
                                 [("n", "n", "sum")])


SQL_LANG_CONFUSION = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS l
              FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS word FROM toks),
sc AS (SELECT doc_id,
  COUNT(*) FILTER (word IN ('der','die','das','und','ist','nicht')) AS de,
  COUNT(*) FILTER (word IN ('the','and','of','to','a','in','is')) AS en,
  COUNT(*) FILTER (word IN ('el','la','los','y','es','una')) AS es,
  COUNT(*) FILTER (word IN ('le','la','les','et','est','une')) AS fr
  FROM w GROUP BY 1),
pred AS (SELECT doc_id,
  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
       WHEN en >= es AND en >= fr THEN 'en'
       WHEN es >= fr THEN 'es'
       ELSE 'fr' END AS lang_pred
  FROM sc)
SELECT d.lang AS lang_true, p.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred
"""


def q_gapfill_daily(sf_dir: str):
    """Gap filling of each USER's daily count series (the sensor-ETL
    staple): for every day in the global span with NO events of a
    type, the linear interpolation between the nearest present
    neighbors as the exact fraction lerp_num/lerp_den — num =
    n_prev·(next−d) + n_next·(d−prev), den = next−prev (boundary gaps
    before the first / after the last present day are excluded on
    both sides). Per-type searchsorted in one bounded combine; SQL
    finds neighbors with window MAX/MIN over the zero-filled grid."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def daily(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy(
            zero_copy_only=False),
            "day": us // 86_400_000_000})
        g = (df.groupby(["user_id", "day"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(daily, batch_format="pyarrow",
                           batch_size=65536)
    counts = rel.groupby_aggregate(parts, ["user_id", "day"],
                                   [("n", "n", "sum")]).materialize()

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, gg in g.groupby("user_id", sort=False):
            gg = gg.sort_values("day", kind="stable")
            d = gg["day"].to_numpy(np.int64)
            n = gg["n"].to_numpy(np.int64)
            if len(d) < 2:
                continue
            grid = np.arange(d[0], d[-1] + 1, dtype=np.int64)
            missing = grid[~np.isin(grid, d)]
            if len(missing) == 0:
                continue
            j = np.searchsorted(d, missing)      # next present
            nd, pv = d[j], d[j - 1]
            nn, pn = n[j], n[j - 1]
            num = pn * (nd - missing) + nn * (missing - pv)
            den = nd - pv
            rows.append(pd.DataFrame({
                "user_id": np.repeat(np.int64(et), len(missing)),
                "day": missing, "lerp_num": num, "lerp_den": den}))
        cols = {"user_id": pd.Series(dtype=np.int64),
                "day": pd.Series(dtype=np.int64),
                "lerp_num": pd.Series(dtype=np.int64),
                "lerp_den": pd.Series(dtype=np.int64)}
        if not rows:
            return pd.DataFrame(cols)
        return pd.concat(rows, ignore_index=True)

    out = rel.bucketed_group_apply(counts, ["user_id"],
                                   fill).materialize()
    if out.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("user_id", "day", "lerp_num",
                                       "lerp_den")})
    return out


SQL_GAPFILL_DAILY = """
WITH c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
span AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
         FROM c GROUP BY user_id),
days AS (SELECT UNNEST(range((SELECT MIN(lo) FROM span),
                             (SELECT MAX(hi) FROM span) + 1)) AS day),
grid AS (SELECT s.user_id, d.day, c.n
         FROM span s JOIN days d
           ON d.day BETWEEN s.lo AND s.hi
         LEFT JOIN c ON c.user_id = s.user_id
                    AND c.day = d.day),
nb AS (SELECT user_id, day, n,
              MAX(CASE WHEN n IS NOT NULL THEN day END)
                  OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pv,
              MIN(CASE WHEN n IS NOT NULL THEN day END)
                  OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN 1 FOLLOWING
                        AND UNBOUNDED FOLLOWING) AS nd
       FROM grid),
pvv AS (SELECT user_id, day AS d2, n AS pn FROM c),
ndd AS (SELECT user_id, day AS d3, n AS nn FROM c)
SELECT nb.user_id, nb.day,
       CAST(pvv.pn * (nb.nd - nb.day)
            + ndd.nn * (nb.day - nb.pv) AS BIGINT) AS lerp_num,
       CAST(nb.nd - nb.pv AS BIGINT) AS lerp_den
FROM nb
JOIN pvv ON pvv.user_id = nb.user_id AND pvv.d2 = nb.pv
JOIN ndd ON ndd.user_id = nb.user_id AND ndd.d3 = nb.nd
WHERE nb.n IS NULL
"""


def q_punchcard(sf_dir: str):
    """Punch-card activity profile (the GitHub-style weekday×hour
    heatmap): counts per (event_type, dow, hour) with dow = epoch-day
    mod 7 and hour = epoch-hour mod 24 — the canonical time-of-week
    rhythm table. Pure map-side fold + one small-key shuffle."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "dow": us // 86_400_000_000 % 7,
                           "hour": us // 3_600_000_000 % 24})
        g = (df.groupby(["event_type", "dow", "hour"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return rel.groupby_aggregate(parts, ["event_type", "dow", "hour"],
                                 [("n", "n", "sum")])


SQL_PUNCHCARD = """
SELECT event_type,
       CAST(epoch_us(ts) // 86400000000 % 7 AS BIGINT) AS dow,
       CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2, 3
"""


def q_explore_return(sf_dir: str):
    """Exploration vs preferential return (the Song et al. mobility
    decomposition): per user over the (ts)-ordered {HW_CELL}-unit
    cell sequence — events visiting a NEVER-seen cell (exploration),
    events immediately repeating the previous cell (inertia), and
    totals. First-visit flags fall out of a vectorized
    first-occurrence test in the user bucket; SQL mirrors with
    ROW_NUMBER over (user, cell) and LAG."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": us,
            "cell": (np.asarray(ix) // HW_CELL) * 1_000_000
            + np.asarray(iy) // HW_CELL})

    pts = ev.map_batches(prep, batch_format="pyarrow",
                         batch_size=65536)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        c = g["cell"].to_numpy(np.int64)
        # first occurrence of (user, cell) in stream order
        df = pd.DataFrame({"u": u, "c": c})
        first = ~df.duplicated(subset=["u", "c"]).to_numpy()
        prev_same = np.concatenate(
            ([False], (u[1:] == u[:-1]) & (c[1:] == c[:-1])))
        out = pd.DataFrame({"user_id": u,
                            "e": first.astype(np.int64),
                            "r": prev_same.astype(np.int64),
                            "one": np.int64(1)})
        a = out.groupby("user_id", sort=False).agg(
            n_events=("one", "sum"), n_explore=("e", "sum"),
            n_inertia=("r", "sum")).reset_index()
        for col in ("n_events", "n_explore", "n_inertia"):
            a[col] = a[col].astype(np.int64)
        return a

    return rel.bucketed_group_apply(pts, ["user_id"], per_user)


def SQL_EXPLORE_RETURN():
    src = "(SELECT event_id, user_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    return f"""
WITH ge AS ({g}),
ec AS (SELECT user_id, ts,
              (ix // {HW_CELL}) * 1000000 + iy // {HW_CELL} AS cell
       FROM ge),
f AS (SELECT user_id, ts, cell,
             ROW_NUMBER() OVER (PARTITION BY user_id, cell
                                ORDER BY ts) AS occ,
             LAG(cell) OVER (PARTITION BY user_id ORDER BY ts) AS pc
      FROM ec)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_explore,
       CAST(SUM(CASE WHEN pc = cell THEN 1 ELSE 0 END) AS BIGINT)
           AS n_inertia
FROM f GROUP BY user_id
"""


SFC_BITS = 6


def q_sfc_locality(sf_dir: str):
    """Space-filling-curve locality audit (the index-design question
    'how much does Z-order beat row-major for neighbor queries'):
    over the occupied 8° density cells, for every rook-adjacent cell
    pair sum |Δkey| under the Morton interleave vs under row-major
    order — exact integers (n_pairs, z_sum, rowmajor_sum). The cell
    table is resolution-bounded; the fold runs in the single bounded
    combine."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])
    W = 368640 // 8192  # row-major width

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cx = g["cx"].to_numpy(np.int64)
        cy = g["cy"].to_numpy(np.int64)
        m = np.zeros(len(cx), np.int64)
        for bit in range(SFC_BITS):
            m |= ((cx >> bit) & 1) << (2 * bit)
            m |= ((cy >> bit) & 1) << (2 * bit + 1)
        rm = cy * W + cx
        key = cx * (np.int64(1) << 32) + cy
        order = np.argsort(key, kind="stable")
        ks = key[order]
        npairs = 0
        zsum = 0
        rsum = 0
        for dx, dy in ((1, 0), (0, 1)):      # each adjacency once
            tk = (cx + dx) * (np.int64(1) << 32) + (cy + dy)
            j = np.searchsorted(ks, tk)
            ok = (j < len(ks)) & (ks[np.minimum(j, len(ks) - 1)] == tk)
            part = order[j[ok]]
            src = np.flatnonzero(ok)
            npairs += int(ok.sum())
            zsum += int(np.abs(m[src] - m[part]).sum())
            rsum += int(np.abs(rm[src] - rm[part]).sum())
        return pd.DataFrame({"n_pairs": [np.int64(npairs)],
                             "z_sum": [np.int64(zsum)],
                             "rowmajor_sum": [np.int64(rsum)]})

    one = grid_ds.map_batches(lambda b: b.assign(_one=np.int64(0)),
                              batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: fold(g.drop(columns=["_one"])),
        batch_format="pandas")


def SQL_SFC_LOCALITY():
    terms = " + ".join(
        f"((cx // {1 << b}) % 2) * {1 << (2 * b)}"
        f" + ((cy // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(SFC_BITS))
    W = 368640 // 8192
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT DISTINCT ix // 8192 AS cx, iy // 8192 AS cy FROM pts),
k AS (SELECT cx, cy, CAST({terms} AS BIGINT) AS m,
             CAST(cy * {W} + cx AS BIGINT) AS rm
      FROM g),
pr AS (SELECT a.m AS ma, b.m AS mb, a.rm AS ra, b.rm AS rb
       FROM k a JOIN k b
         ON (b.cx = a.cx + 1 AND b.cy = a.cy)
         OR (b.cx = a.cx AND b.cy = a.cy + 1))
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ABS(ma - mb)) AS BIGINT) AS z_sum,
       CAST(SUM(ABS(ra - rb)) AS BIGINT) AS rowmajor_sum
FROM pr
"""


SK_POINTS = (5, 10, 20, 40)


def q_explore_curve(sf_dir: str):
    """The S(k) exploration curve (Song et al.'s sublinear
    distinct-places growth law): at each checkpoint k ∈ {SK_POINTS},
    over users with ≥ k events, the exact sum of distinct
    {HW_CELL}-unit cells seen within their first k events — the
    (n_users, sum_cells) pairs that trace S(k). First-occurrence
    cumsum per user in one bucketed combine; SQL mirrors with
    ROW_NUMBER occurrence flags and a prefix sum."""
    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": us,
            "cell": (np.asarray(ix) // HW_CELL) * 1_000_000
            + np.asarray(iy) // HW_CELL})

    pts = ev.map_batches(prep, batch_format="pyarrow",
                         batch_size=65536)
    ks = np.array(SK_POINTS, np.int64)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        first = (~g.duplicated(subset=["user_id", "cell"])
                 .to_numpy()).astype(np.int64)
        # event index within user + cumulative distinct cells
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(new_u)
        idx = np.arange(len(u)) - np.repeat(starts, np.diff(
            np.append(starts, len(u)))) + 1
        cum = np.cumsum(first)
        base = np.repeat(np.concatenate(([0], cum[starts[1:] - 1])),
                         np.diff(np.append(starts, len(u))))
        s_at = cum - base
        rows = []
        for k in ks:
            sel = idx == k
            rows.append({"k": np.int64(k),
                         "n_users": np.int64(sel.sum()),
                         "sum_cells": np.int64(s_at[sel].sum())})
        return pd.DataFrame(rows, columns=["k", "n_users",
                                           "sum_cells"]).astype(np.int64)

    parts = rel.bucketed_group_apply(pts, ["user_id"], per_user)
    return rel.groupby_aggregate(parts, ["k"],
                                 [("n_users", "n_users", "sum"),
                                  ("sum_cells", "sum_cells", "sum")])


def SQL_EXPLORE_CURVE():
    src = "(SELECT event_id, user_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    ks = ", ".join(f"({k})" for k in SK_POINTS)
    return f"""
WITH ge AS ({g}),
ec AS (SELECT user_id, ts,
              (ix // {HW_CELL}) * 1000000 + iy // {HW_CELL} AS cell
       FROM ge),
f AS (SELECT user_id, ts,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, cell
                                          ORDER BY ts) = 1
                  THEN 1 ELSE 0 END AS firstv
      FROM ec),
c AS (SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts)
                 AS idx,
             SUM(firstv) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS s_at
      FROM f)
SELECT k.k, CAST(COUNT(c.user_id) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(c.s_at), 0) AS BIGINT) AS sum_cells
FROM (VALUES {ks}) k(k) LEFT JOIN c ON c.idx = k.k
GROUP BY k.k
"""


# ------------------------------------- r4 batch: interchange + band math

def q_csv_roundtrip(sf_dir: str):
    """CSV interchange loop (reference CSV loader xfield/yfield path,
    /root/reference/pythongis/vector/loader.py:109-140 + CSV saver):
    supplier keyed points → plain CSV via Ray's distributed Arrow CSV
    sink (one file per block) → ``sources.read_points_csv`` (xfield=
    'lon', yfield='lat' → WKB point geometry) → exact lattice-unit
    reconstruction. A hash match proves coordinate doubles survive the
    text format (Arrow writes shortest-round-trip decimals; the dyadic
    lattice makes the rint inverse exact)."""
    import shutil
    import tempfile

    from pythongis_ray import sources
    from pythongis_ray.geom import wkb as _wkb

    pts = _keyed_points(sf_dir, "supplier", "s_suppkey", 8, 3, "sk")
    d = tempfile.mkdtemp(prefix="csvq_", dir="/tmp")
    try:
        pts.write_csv(d)
        back = sources.read_points_csv(d, "lon", "lat")

        def decode(batch: pd.DataFrame) -> pa.Table:
            x, y = _wkb.decode_points([bytes(b) for b in batch["geometry"]])
            ix = np.rint((x + 180.0) * 1024.0).astype(np.int64)
            iy = np.rint((y + 90.0) * 1024.0).astype(np.int64)
            return pa.table({
                "sk": pa.array(batch["sk"].to_numpy(np.int64)),
                "ix": pa.array(ix), "iy": pa.array(iy)})

        return back.map_batches(decode, batch_format="pandas",
                                batch_size=8192).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def SQL_CSV_ROUNDTRIP():
    return f"""
SELECT sk, CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy
FROM ({_sql_keyed_points("supplier", "s_suppkey", 8, 3, "sk")}) _c
"""


def q_shp_roundtrip(sf_dir: str):
    """Shapefile interchange loop (the reference's primary vector
    format, /root/reference/pythongis/vector/loader.py shp branch +
    saver.py): part keyed points → .shp/.shx/.dbf (+.prj) → read back
    → WKB decode + DBF numeric key. Proves ESRI record framing, LE
    coordinate doubles, and DBF N-field text numbers round-trip
    exactly. Driver-side interchange sink like the reference saver."""
    import shutil
    import tempfile

    from pythongis_ray import sources
    from pythongis_ray.geom import wkb as _wkb

    pts = _keyed_points(sf_dir, "part", "p_partkey", 2, 1, "gk")

    def to_geom(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "gk": batch["gk"].to_numpy(np.int64),
            "geometry": list(_wkb.encode_points(
                batch["lon"].to_numpy(np.float64),
                batch["lat"].to_numpy(np.float64)))})

    d = tempfile.mkdtemp(prefix="shpq_", dir="/tmp")
    try:
        g = pts.map_batches(to_geom, batch_format="pandas",
                            batch_size=8192)
        sources.write_shapefile(g, f"{d}/pts.shp")
        back = sources.shapefile_dataset(f"{d}/pts.shp")

        def decode(batch: pd.DataFrame) -> pa.Table:
            x, y = _wkb.decode_points([bytes(b) for b in batch["geometry"]])
            ix = np.rint((x + 180.0) * 1024.0).astype(np.int64)
            iy = np.rint((y + 90.0) * 1024.0).astype(np.int64)
            return pa.table({
                "gk": pa.array(batch["gk"].to_numpy(np.int64)),
                "ix": pa.array(ix), "iy": pa.array(iy)})

        return back.map_batches(decode, batch_format="pandas",
                                batch_size=8192).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def SQL_SHP_ROUNDTRIP():
    return f"""
SELECT gk, CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy
FROM ({_sql_keyed_points("part", "p_partkey", 2, 1, "gk")}) _s
"""


def q_band_math_grid(sf_dir: str):
    """Band math A+B with the reference's nodata mask-union rule
    (/root/reference/pythongis/raster/data.py:318-346) on the real
    TILE-BUFFER path: lineitem and customer point densities are burned
    into 64×64-pixel tiles at res 3 (360 lattice units per pixel —
    pixel edges sit ON the dyadic lattice, so the float pixel
    assignment in rasterize_points is exact, gpx = ix // 360), then
    combined by ``raster.band_math`` (the hash-bucketed paired-tile
    kernel that replaced sort-based map_groups) and unpacked to
    (gpx, gpy, n) pixel rows. Count rasters use nodata=0, so the mask
    union IS an inner join on mutually nonzero pixels: the oracle is
    two pixel-key GROUP BYs joined with n = na + nb."""
    from pythongis_ray import raster

    a = raster.rasterize_points(points_lineitem(sf_dir), res=3)
    cpts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")
    b = raster.rasterize_points(cpts, res=3)
    out = raster.band_math(a, b, "add")
    t = raster.TILE

    def unpack_tiles(batch: pd.DataFrame) -> pd.DataFrame:
        gx, gy, vs = [], [], []
        for cid, buf, nd in zip(batch["cell_id"], batch["tile"],
                                batch["nodata"]):
            arr = raster.bytes_to_tile(buf, t)
            fy, fx = np.nonzero(arr != np.float32(nd))
            if len(fx) == 0:
                continue
            _, cix, ciy = grid.unpack(
                np.array([cid], np.int64).view(np.uint64))
            gx.append(cix[0] * t + fx)
            gy.append(ciy[0] * t + fy)
            vs.append(arr[fy, fx].astype(np.int64))
        if not gx:
            return pd.DataFrame({"gpx": pd.Series([], dtype=np.int64),
                                 "gpy": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"gpx": np.concatenate(gx),
                             "gpy": np.concatenate(gy),
                             "n": np.concatenate(vs)})

    return out.map_batches(unpack_tiles, batch_format="pandas",
                           batch_size=256)


def SQL_BAND_MATH_GRID():
    return f"""
WITH la AS (SELECT ix // 360 AS gpx, iy // 360 AS gpy,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ({SQL_PTS_LINEITEM()}) GROUP BY 1, 2),
lb AS (SELECT ix // 360 AS gpx, iy // 360 AS gpy,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")})
       GROUP BY 1, 2)
SELECT a.gpx, a.gpy, a.n + b.n AS n
FROM la a JOIN lb b ON a.gpx = b.gpx AND a.gpy = b.gpy
"""


VW_TOL_UNITS = 1 << 24          # doubled-area threshold, lattice units²


def q_simplify_vw(sf_dir: str):
    """Line simplification — one Visvalingam–Whyatt effective-area
    sweep (vector.simplify_vw; the reference's manager.simplify is
    shapely Douglas-Peucker, manager.py — VW is the other classic,
    exposed alongside vector.simplify which stays brute-parity
    tested). Fixture: a 7-vertex 'GPS track' per customer (base =
    geocode(ck), vertex deltas hash-derived ±4°, all on the lattice)
    → simplify_vw at doubled-area tol 2^24 units² (coords are
    degrees, so tol = 2^24/2^20 — dyadic, and every cross product is
    float-exact: diffs ≤ 16° are multiples of 2^-10, products
    multiples of 2^-20 bounded by 2^28) → to_vertices explosion →
    exact lattice units. Oracle: LAG/LEAD window cross products in
    pure integer unit space — keep j∈{0,6} or |cross| ≥ 2^24."""
    from pythongis_ray import vector as vec
    from pythongis_ray.geom import wkb as _wkb

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"])

    def mk_tracks(batch: pa.Table) -> pa.Table:
        c = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = c * 4 + 2
        bx, by = fixtures.geocode_units(ck)
        j = np.arange(7, dtype=np.int64)
        kj = ck[:, None] * 8 + j[None, :]
        vx = bx[:, None] + (kj * 48271) % 8192 - 4096
        vy = by[:, None] + (kj * 16807) % 8192 - 4096
        lon = vx / 1024.0 - 180.0
        lat = vy / 1024.0 - 90.0
        geoms = [_wkb.encode_linestring(np.column_stack([lon[i], lat[i]]))
                 for i in range(len(ck))]
        return pa.table({"ck": pa.array(ck),
                         "geometry": pa.array(geoms, pa.binary())})

    tracks = ds.map_batches(mk_tracks, batch_format="pyarrow",
                            batch_size=16384)
    simp = vec.simplify_vw(tracks, VW_TOL_UNITS / 1048576.0)
    verts = vec.to_vertices(simp)

    def to_units(batch: pa.Table) -> pa.Table:
        vx = batch["vx"].to_numpy(zero_copy_only=False)
        vy = batch["vy"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ck": pc.cast(batch["ck"], pa.int64()),
            "ix": pa.array(np.rint((vx + 180.0) * 1024.0).astype(np.int64)),
            "iy": pa.array(np.rint((vy + 90.0) * 1024.0).astype(np.int64))})

    return verts.map_batches(to_units, batch_format="pyarrow",
                             batch_size=65536)


def SQL_SIMPLIFY_VW():
    src = "(SELECT c_custkey*4+2 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    return f"""
WITH base AS (SELECT ck, ix AS bx, iy AS by_ FROM ({g}) _b),
v AS (SELECT ck, j,
             bx + (ck*8+j) * 48271 % 8192 - 4096 AS vx,
             by_ + (ck*8+j) * 16807 % 8192 - 4096 AS vy
      FROM base, (SELECT UNNEST(range(7)) AS j)),
w AS (SELECT ck, j, vx, vy,
             LAG(vx)  OVER (PARTITION BY ck ORDER BY j) AS px,
             LAG(vy)  OVER (PARTITION BY ck ORDER BY j) AS py,
             LEAD(vx) OVER (PARTITION BY ck ORDER BY j) AS nx,
             LEAD(vy) OVER (PARTITION BY ck ORDER BY j) AS ny
      FROM v)
SELECT ck, vx AS ix, vy AS iy FROM w
WHERE j = 0 OR j = 6
   OR abs((vx - px) * (ny - py) - (vy - py) * (nx - px)) >= {VW_TOL_UNITS}
"""


def q_poly_centroids(sf_dir: str):
    """Exact polygon centroids (reference to_points 'centroid' path /
    Feature.get_shapely().centroid): one asymmetric quad per supplier,
    shoelace moments computed by the decode_flat vectorized kernel —
    translated to each ring's FIRST VERTEX so every intermediate stays
    under 2^53 (the absolute-coordinate shoelace overflows float64
    exactness; the local frame is the standard fix). Output is the
    cleared-denominator centroid: a2 = Σcross (doubled area),
    cx_num = 3·a2·x0 + Σ(lx+lx')·cr so that centroid_x = cx_num/(3·a2)
    — all int64. Oracle: the quad's closed-form products in the
    CENTER-anchored frame (a2 = (a+c)(b+d), gxn = (c²−a²)(b+d),
    gyn = (a+c)(d²−b²), so cx_num = 3·a2·cxu + gxn — translation
    invariance makes the first-vertex and center anchors agree).
    vector.centroids (the float operator) is parity-tested against
    this rational form in tests/test_vector.py."""
    from pythongis_ray.geom import wkb as _wkb

    ds = _rd().read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey"])

    def mk_quads(batch: pa.Table) -> pa.Table:
        s = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = s * 16 + 5
        cxu, cyu = fixtures.geocode_units(k)
        a = (k * 7) % 3840 + 257
        b = (k * 11) % 3840 + 257
        c = (k * 13) % 3840 + 257
        d = (k * 17) % 3840 + 257
        rings = np.empty((len(s), 5, 2), np.float64)
        rings[:, 0, 0] = cxu - a
        rings[:, 0, 1] = cyu
        rings[:, 1, 0] = cxu
        rings[:, 1, 1] = cyu - b
        rings[:, 2, 0] = cxu + c
        rings[:, 2, 1] = cyu
        rings[:, 3, 0] = cxu
        rings[:, 3, 1] = cyu + d
        rings[:, 4] = rings[:, 0]
        rings[:, :, 0] = rings[:, :, 0] / 1024.0 - 180.0
        rings[:, :, 1] = rings[:, :, 1] / 1024.0 - 90.0
        return pa.table({"sk": pa.array(s),
                         "geometry": pa.array(
                             _wkb.encode_polygons_uniform(rings),
                             pa.binary())})

    quads = ds.map_batches(mk_quads, batch_format="pyarrow",
                           batch_size=16384)

    def moments(batch: pa.Table) -> pa.Table:
        f = _wkb.decode_flat(batch["geometry"])
        pts, off, feat = f["pts"], f["ring_off"], f["ring_feat"]
        ux = np.rint((pts[:, 0] + 180.0) * 1024.0).astype(np.int64)
        uy = np.rint((pts[:, 1] + 90.0) * 1024.0).astype(np.int64)
        # translate each ring to its first vertex (exactness guard)
        lens = off[1:] - off[:-1]
        x0 = np.repeat(ux[off[:-1]], lens)
        y0 = np.repeat(uy[off[:-1]], lens)
        lx, ly = ux - x0, uy - y0
        last = np.zeros(len(pts), bool)
        last[off[1:] - 1] = True
        src = np.nonzero(~last)[0]
        cr = lx[src] * ly[src + 1] - lx[src + 1] * ly[src]
        gx = (lx[src] + lx[src + 1]) * cr
        gy = (ly[src] + ly[src + 1]) * cr
        nseg = lens - 1
        red = np.concatenate(([0], np.cumsum(nseg)))[:-1]
        a2 = np.add.reduceat(cr, red)
        gxn = np.add.reduceat(gx, red)
        gyn = np.add.reduceat(gy, red)
        sk = batch["sk"].to_numpy(zero_copy_only=False)[feat]
        return pa.table({
            "sk": pa.array(sk),
            "a2": pa.array(a2),
            "cx_num": pa.array(3 * a2 * ux[off[:-1]] + gxn),
            "cy_num": pa.array(3 * a2 * uy[off[:-1]] + gyn)})

    return quads.map_batches(moments, batch_format="pyarrow",
                             batch_size=16384)


def SQL_POLY_CENTROIDS():
    src = "(SELECT s_suppkey AS sk, s_suppkey*16+5 AS k FROM supplier)"
    g = fixtures.sql_geocode("k").replace("__SRC__", src)
    return f"""
WITH q AS (SELECT sk, ix AS cxu, iy AS cyu,
                  (k*7) % 3840 + 257 AS a, (k*11) % 3840 + 257 AS b,
                  (k*13) % 3840 + 257 AS c, (k*17) % 3840 + 257 AS d
           FROM ({g}) _q)
SELECT sk,
       (a + c) * (b + d) AS a2,
       3 * (a + c) * (b + d) * cxu + (c*c - a*a) * (b + d) AS cx_num,
       3 * (a + c) * (b + d) * cyu + (a + c) * (d*d - b*b) AS cy_num
FROM q
"""


def q_hillshade(sf_dir: str):
    """Hillshade over the density terrain (the classic analytic the
    reference's raster/analyzer.py sketches next to slope): per cell,
    the UNNORMALIZED illumination dot product of the surface normal
    (−gx, −gy, 2) with the integer light vector L = (2, 3, 6) (a
    Pythagorean quadruple, |L| = 7): illum_num = −2·gx − 3·gy + 12,
    plus n2 = gx² + gy² + 4 so shade = illum_num/(7·√n2) is fully
    determined downstream — the sqrt never enters the engine. Same
    sparse 4-neighbor stencil as slope_grid (cells emit to neighbors,
    one bucketed combine); exact integers end to end."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        tx = np.concatenate([cx, cx - 1, cx + 1, cx, cx])
        ty = np.concatenate([cy, cy, cy, cy - 1, cy + 1])
        tag = np.repeat(np.arange(5, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "v": np.tile(v, 5)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(5))
        p = p[p.notna().all(axis=1)]
        e = p[1].to_numpy(np.int64)
        w = p[2].to_numpy(np.int64)
        s = p[3].to_numpy(np.int64)
        n_ = p[4].to_numpy(np.int64)
        gx, gy = e - w, s - n_
        idx = p.index.to_frame(index=False)
        return pd.DataFrame({
            "cx": idx["cx"].to_numpy(np.int64),
            "cy": idx["cy"].to_numpy(np.int64),
            "illum_num": -2 * gx - 3 * gy + 12,
            "n2": gx * gx + gy * gy + 4})

    out = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)
    return rel.with_empty_schema(out, pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()),
         ("illum_num", pa.int64()), ("n2", pa.int64())]))


def SQL_HILLSHADE():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY ix // 8192, iy // 8192)
SELECT c.cx, c.cy,
       CAST(-2 * (e.n - w.n) - 3 * (s.n - n_.n) + 12 AS BIGINT)
           AS illum_num,
       CAST((e.n - w.n) * (e.n - w.n)
            + (s.n - n_.n) * (s.n - n_.n) + 4 AS BIGINT) AS n2
FROM g c
JOIN g e  ON e.cx = c.cx + 1 AND e.cy = c.cy
JOIN g w  ON w.cx = c.cx - 1 AND w.cy = c.cy
JOIN g n_ ON n_.cx = c.cx AND n_.cy = c.cy - 1
JOIN g s  ON s.cx = c.cx AND s.cy = c.cy + 1
"""


def q_yule_k(sf_dir: str):
    """Yule's characteristic K inputs per document (the classic
    vocabulary-richness signal used in LLM-corpus quality filtering;
    K = 10⁴·(s2 − n)/n² falls out of the three integer columns):
    token count n_tokens, distinct types v_types, and the sum of
    squared term frequencies s2 = Σ c_w². Documents are independent,
    so the whole computation is ONE stateless map_batches pass —
    vectorized split + a within-batch double groupby; no shuffle at
    any scale."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def per_doc(b: pd.DataFrame) -> pd.DataFrame:
        rows = b["text"].str.split(" ")
        d = pd.DataFrame({
            "doc_id": b["doc_id"].repeat(rows.str.len()).to_numpy(),
            "w": np.concatenate(rows.to_numpy())})
        c = (d.groupby(["doc_id", "w"], sort=False).size()
             .rename("c").reset_index())
        c["cc"] = c["c"] * c["c"]
        g = c.groupby("doc_id", sort=False).agg(
            n_tokens=("c", "sum"), v_types=("c", "count"),
            s2=("cc", "sum")).reset_index()
        for col in ("doc_id", "n_tokens", "v_types", "s2"):
            g[col] = g[col].astype(np.int64)
        return g

    return ds.map_batches(per_doc, batch_format="pandas",
                          batch_size=4096)


SQL_YULE_K = """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents),
f AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM t GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS v_types,
       CAST(SUM(c * c) AS BIGINT) AS s2
FROM f GROUP BY doc_id
"""


T_CLOSE_BAND = 2000   # sensitive attribute: value cents // 2000


def q_t_closeness(sf_dir: str):
    """t-closeness audit — the third leg of the privacy triad next to
    q_k_anonymity and q_l_diversity (Li et al. ICDE'07): per
    quasi-identifier class (event_type, epoch-dow), the CLEARED total
    variation distance between the class's sensitive-value
    distribution (value cents // 2000 band) and the global one:
    tv_num = Σ_s |n_gs·T − T_g·n_s|, so t = tv_num/(2·T·T_g) never
    needs a float. One bounded (class, band) grouped count; the
    global marginal and the per-class fold both happen on that tiny
    table (classes × bands ≤ a few hundred rows)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.round(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                           "dow": us // 86_400_000_000 % 7,
                           "sb": cents // T_CLOSE_BAND})
        g = (df.groupby(["event_type", "dow", "sb"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    cells = rel.groupby_aggregate(parts, ["event_type", "dow", "sb"],
                                  [("n", "n", "sum")]).to_pandas()
    cells["n"] = cells["n"].astype(np.int64)
    piv = cells.pivot_table(index=["event_type", "dow"], columns="sb",
                            values="n", aggfunc="sum", fill_value=0)
    ngs = piv.to_numpy(np.int64)                     # classes × bands
    ns = ngs.sum(axis=0)                             # global marginal
    tg = ngs.sum(axis=1)
    t_total = int(ns.sum())
    tv = np.abs(ngs * t_total - tg[:, None] * ns[None, :]).sum(axis=1)
    idx = piv.index.to_frame(index=False)
    return pd.DataFrame({
        "event_type": idx["event_type"].to_numpy(),
        "dow": idx["dow"].to_numpy(np.int64),
        "n_class": tg,
        "tv_num": tv})


def SQL_T_CLOSENESS():
    return f"""
WITH c AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 % 7 AS dow,
                  CAST(round(value * 100) AS BIGINT) // {T_CLOSE_BAND}
                      AS sb,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
bands AS (SELECT sb, SUM(n) AS ns FROM c GROUP BY sb),
cls AS (SELECT event_type, dow, SUM(n) AS tg FROM c GROUP BY 1, 2),
tot AS (SELECT SUM(n) AS t FROM c),
x AS (SELECT cl.event_type, cl.dow, cl.tg, b.sb, b.ns,
             COALESCE(cc.n, 0) AS ngs
      FROM cls cl CROSS JOIN bands b
      LEFT JOIN c cc ON cc.event_type = cl.event_type
                    AND cc.dow = cl.dow AND cc.sb = b.sb)
SELECT event_type, CAST(dow AS BIGINT) AS dow,
       CAST(MAX(tg) AS BIGINT) AS n_class,
       CAST(SUM(abs(ngs * (SELECT t FROM tot) - tg * ns)) AS BIGINT)
           AS tv_num
FROM x GROUP BY event_type, dow
"""


KM_CENSOR_DAYS = 7


def q_km_inputs(sf_dir: str):
    """Kaplan-Meier survival inputs over user lifetimes (the churn
    curve's exact risk table, censoring-aware — the product estimator
    itself is a cumulative product of these rationals): duration =
    last − first active epoch-day per user; users whose last activity
    falls within {KM_CENSOR_DAYS} days of the global max day are
    right-censored (still active). Per distinct duration t: deaths
    (uncensored ending at t), censored count, and the at-risk set
    size n_t = #(duration ≥ t) — a suffix sum over the day-bounded
    duration table. One user-keyed grouped min/max; everything after
    runs on bounded tables."""
    ds = _events_us(sf_dir, cols=("user_id", "ts"))

    def days(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "day": pa.array(b["ts_us"].to_numpy(zero_copy_only=False)
                            // 86_400_000_000)})

    d = ds.map_batches(days, batch_format="pyarrow", batch_size=65536)
    users = rel.groupby_aggregate(d, ["user_id"],
                                  [("fd", "day", "min"),
                                   ("ld", "day", "max")]).to_pandas()
    fd = users["fd"].to_numpy(np.int64)
    ld = users["ld"].to_numpy(np.int64)
    gmax = int(ld.max())
    dur = ld - fd
    cens = (ld > gmax - KM_CENSOR_DAYS).astype(np.int64)
    t = pd.DataFrame({"dur": dur, "cens": cens})
    g = t.groupby("dur", sort=True).agg(
        deaths=("cens", lambda s: int((1 - s).sum())),
        censored=("cens", "sum"), m=("cens", "count"))
    at_risk = g["m"].to_numpy(np.int64)[::-1].cumsum()[::-1]
    return pd.DataFrame({
        "dur": g.index.to_numpy(np.int64),
        "deaths": g["deaths"].to_numpy(np.int64),
        "censored": g["censored"].to_numpy(np.int64),
        "at_risk": at_risk})


def SQL_KM_INPUTS():
    return f"""
WITH u AS (SELECT user_id,
                  MIN(epoch_us(ts) // 86400000000) AS fd,
                  MAX(epoch_us(ts) // 86400000000) AS ld
           FROM events GROUP BY user_id),
g AS (SELECT MAX(ld) AS gmax FROM u),
s AS (SELECT ld - fd AS dur,
             CASE WHEN ld > (SELECT gmax FROM g) - {KM_CENSOR_DAYS}
                  THEN 1 ELSE 0 END AS cens
      FROM u),
c AS (SELECT dur,
             SUM(1 - cens) AS deaths, SUM(cens) AS censored,
             COUNT(*) AS m
      FROM s GROUP BY dur)
SELECT CAST(dur AS BIGINT) AS dur, CAST(deaths AS BIGINT) AS deaths,
       CAST(censored AS BIGINT) AS censored,
       CAST(SUM(m) OVER (ORDER BY dur DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS at_risk
FROM c
"""


MMR_K = 5


def q_mmr_select(sf_dir: str):
    """Maximal Marginal Relevance selection (Carbonell-Goldstein
    SIGIR'98 — the diverse-retrieval / data-selection greedy): with
    λ = 1/2 the argmax of λ·rel − (1−λ)·maxsim equals the argmax of
    the INTEGER score rel_i − max_{s∈S} dot(i, s) on the ×1000
    quantized embeddings. Query = vec 0; {MMR_K} greedy rounds, each
    ONE distributed pass: per-batch partial argmax (score desc,
    vec_id asc) → a tasks-bounded driver pick; the selected set
    (≤ {MMR_K} vectors) rides along as a broadcast constant. Oracle =
    {MMR_K} chained LIMIT-1 CTEs with GREATEST over the selected
    dots."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    qdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          filters=[("vec_id", "=", 0)])
    qv = embed.quantize(
        np.asarray(list(qdf["embedding"]), np.float64))[0]

    selected: list[tuple[int, int, np.ndarray]] = []   # (id, score, vec)
    for _ in range(MMR_K):
        sel_ids = np.array([s[0] for s in selected], np.int64)
        sel_mat = (np.stack([s[2] for s in selected])
                   if selected else np.zeros((0, len(qv)), np.int64))

        def best(b: pa.Table, sel_ids=sel_ids, sel_mat=sel_mat):
            ids = b["vec_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = ~np.isin(ids, sel_ids) & (ids != 0)
            if not m.any():
                return pd.DataFrame({"vec_id": [], "score": [],
                                     "emb": []})
            X = embed.quantize(embed._as_matrix(b["embedding"]))[m]
            ids = ids[m]
            rel = X @ qv
            ms = (X @ sel_mat.T).max(axis=1) if len(sel_mat) \
                else np.zeros(len(ids), np.int64)
            sc = rel - ms
            i = np.lexsort((ids, -sc))[0]
            return pd.DataFrame({"vec_id": [ids[i]],
                                 "score": [int(sc[i])],
                                 "emb": [X[i].tolist()]})

        cand = emb.map_batches(best, batch_format="pyarrow",
                               batch_size=8192).to_pandas()
        cand = cand.sort_values(["score", "vec_id"],
                                ascending=[False, True], kind="stable")
        w = cand.iloc[0]
        selected.append((int(w["vec_id"]), int(w["score"]),
                         np.asarray(w["emb"], np.int64)))

    return pd.DataFrame({
        "rank": np.arange(1, MMR_K + 1, dtype=np.int64),
        "vec_id": np.array([s[0] for s in selected], np.int64),
        "score": np.array([s[1] for s in selected], np.int64)})


def SQL_MMR_SELECT():
    pre = """
WITH e AS (SELECT vec_id,
                  list_transform(embedding,
                      x -> round(CAST(x AS DOUBLE) * 1000)) AS v
           FROM embeddings),
r AS (SELECT e.vec_id,
             CAST(list_dot_product(e.v,
                  (SELECT v FROM e WHERE vec_id = 0)) AS BIGINT)
                 AS rel, e.v
      FROM e WHERE e.vec_id != 0),
s1 AS (SELECT vec_id, rel AS score, v FROM r
       ORDER BY rel DESC, vec_id LIMIT 1)"""
    ctes = [pre]
    for k in range(2, MMR_K + 1):
        prev = ", ".join(f"CAST(list_dot_product(r.v, (SELECT v FROM s{j})) AS BIGINT)"
                         for j in range(1, k))
        notin = ", ".join(f"(SELECT vec_id FROM s{j})" for j in range(1, k))
        ctes.append(f"""
s{k} AS (SELECT vec_id, rel - GREATEST({prev}) AS score, v
        FROM r WHERE vec_id NOT IN ({notin})
        ORDER BY score DESC, vec_id LIMIT 1)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, vec_id, score FROM s{k}"
        for k in range(1, MMR_K + 1))
    return (",".join(ctes)
            + f"\nSELECT CAST(rank AS BIGINT) AS rank, vec_id, "
              f"CAST(score AS BIGINT) AS score FROM ({sel}) _m\n")


def q_dom_depth(sf_dir: str):
    """DOM structural statistics from raw html bytes (the CC quality
    signal 'template complexity'): pages are synthesized with
    deterministic nesting (1 + page_id % 7 divs wrap the text,
    extract_text stays byte-identical — pages.synthesize_pages
    nest=True), and the engine re-measures max tag-nesting depth and
    tag count with the parser-free vectorized pages.tag_depth kernel
    (split + extract_regex + segmented max-prefix-sum; void elements
    contribute no depth). The oracle replays the planted arithmetic:
    depth = 3 + id % 7, n_tags = 6 + 2·(id % 7) — a hash match means
    the byte-level measurement recovered exactly what synthesis
    planted."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, nest=True,
                             columns=["page_id", "html"])
    return ds.map_batches(pages.tag_depth, batch_format="pyarrow",
                          batch_size=4096)


SQL_DOM_DEPTH = """
SELECT CAST(doc_id AS BIGINT) AS page_id,
       CAST(3 + doc_id % 7 AS BIGINT) AS depth,
       CAST(6 + 2 * (doc_id % 7) AS BIGINT) AS n_tags
FROM documents
"""


IDW_Q = 1 << 30   # inverse-distance weight quantum


def q_idw_cells(sf_dir: str):
    """Inverse-distance-weighted interpolation (the reference's vector
    → raster `interpolate`, /root/reference/pythongis/raster/
    manager.py IDW branch; raster.idw is the float operator — this is
    the exactness-disciplined pipeline form): the {VORONOI_SITES}
    densest terrain cells are sites (same construction as
    q_voronoi_cells); every occupied cell gets the quantized-weight
    IDW estimate of density from ALL sites, w_s = 2^30 // (1 + d²_s)
    — floor-quantized so both sides are integers (true 1/d² weights
    need cleared products of six d² values, far past int64). Output
    is the cleared pair (num = Σ n_s·w_s, den = Σ w_s); the estimate
    num/den never needs a float. Sites broadcast once; the map is
    stateless and vectorized — no shuffle beyond the density grid."""
    import ray

    from pythongis_ray import state

    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grd = rel.groupby_aggregate(cells, ["cx", "cy"],
                                [("n", "cx", "count")]).materialize()

    top = grd.to_pandas().sort_values(
        ["n", "cx", "cy"], ascending=[False, True, True],
        kind="stable").head(VORONOI_SITES).reset_index(drop=True)
    sites_ref = ray.put((top["cx"].to_numpy(np.int64),
                         top["cy"].to_numpy(np.int64),
                         top["n"].to_numpy(np.int64)))

    def interp(batch: pa.Table) -> pa.Table:
        ssx, ssy, sn = state.get_broadcast(sites_ref,
                                           key_extra=("idw_sites",))
        cx = batch["cx"].to_numpy(zero_copy_only=False)
        cy = batch["cy"].to_numpy(zero_copy_only=False)
        dx = cx[:, None] - ssx[None, :]
        dy = cy[:, None] - ssy[None, :]
        w = IDW_Q // (1 + dx * dx + dy * dy)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "num": pa.array((w * sn[None, :]).sum(axis=1)),
                         "den": pa.array(w.sum(axis=1))})

    return grd.map_batches(interp, batch_format="pyarrow",
                           batch_size=65536)


def SQL_IDW_CELLS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
s AS (SELECT cx AS sx, cy AS sy, n AS sn FROM g
      ORDER BY n DESC, cx, cy LIMIT {VORONOI_SITES})
SELECT g.cx, g.cy,
       CAST(SUM(({IDW_Q} // (1 + (g.cx - s.sx) * (g.cx - s.sx)
                               + (g.cy - s.sy) * (g.cy - s.sy))) * s.sn)
            AS BIGINT) AS num,
       CAST(SUM({IDW_Q} // (1 + (g.cx - s.sx) * (g.cx - s.sx)
                              + (g.cy - s.sy) * (g.cy - s.sy)))
            AS BIGINT) AS den
FROM g CROSS JOIN s
GROUP BY g.cx, g.cy
"""


KATZ_L = 4


def q_katz(sf_dir: str):
    """Katz centrality with attenuation β = 1/2 truncated at
    {KATZ_L} hops over the html-extracted link graph, scaled by 2^L
    to stay integer: katz(v) = Σ_l 2^(L−l)·p_l(v) where p_l = in-path
    counts (p_{{l+1}}(v) = Σ_(u,v) p_l(u), multi-edges count with
    multiplicity). The halving attenuation is exact bit arithmetic —
    no float damping (same trick as q_decay_score). Each round is ONE
    partitioned join of the static materialized edge table against
    the shrinking (node, p) table + a destination-keyed combine;
    oracle = chained AS MATERIALIZED join CTEs (support(p_l) ⊆
    support(p_1), so the finalize is LEFT JOINs onto p1)."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    e = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                       batch_size=4096).map_batches(
        lambda b: pa.table({"key": b["src_page"],
                            "dst": b["dst_page"]}),
        batch_format="pyarrow", batch_size=65536).materialize()

    # p1 = indegree (p0 ≡ 1 on every node)
    p = rel.groupby_aggregate(
        e.map_batches(lambda b: pa.table({"node": b["dst"]}),
                      batch_format="pyarrow", batch_size=65536),
        ["node"], [("p", "node", "count")]).materialize()
    levels = [p]
    for _ in range(1, KATZ_L):
        pk = p.map_batches(lambda b: pa.table({"key": b["node"],
                                               "p": b["p"]}),
                           batch_format="pyarrow", batch_size=65536)
        j = rel.join_large(e, pk, on="key", num_buckets=16)
        msgs = j.map_batches(
            lambda b: pa.table({"node": b["dst"], "p": b["p"]}),
            batch_format="pyarrow", batch_size=65536)
        p = rel.groupby_aggregate(msgs, ["node"],
                                  [("p", "p", "sum")]).materialize()
        levels.append(p)

    parts = None
    for li, lev in enumerate(levels):
        wgt = 1 << (KATZ_L - 1 - li)
        t = lev.map_batches(
            lambda b, wgt=wgt: pa.table({
                "node": b["node"],
                "katz": pc.multiply(pc.cast(b["p"], pa.int64()),
                                    pa.scalar(wgt, pa.int64()))}),
            batch_format="pyarrow", batch_size=65536)
        parts = t if parts is None else parts.union(t)
    return rel.groupby_aggregate(parts, ["node"], [("katz", "katz", "sum")])


def SQL_KATZ():
    lvl = ["p1 AS MATERIALIZED (SELECT dst AS node, "
           "CAST(COUNT(*) AS BIGINT) AS p FROM e GROUP BY dst)"]
    for k in range(2, KATZ_L + 1):
        lvl.append(f"""
p{k} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(pp.p) AS BIGINT) AS p
  FROM e JOIN p{k - 1} pp ON pp.node = e.src GROUP BY e.dst)""")
    joins = "\n".join(f"LEFT JOIN p{k} ON p{k}.node = p1.node"
                      for k in range(2, KATZ_L + 1))
    terms = " + ".join(
        f"{1 << (KATZ_L - k)} * COALESCE(p{k}.p, 0)"
        for k in range(2, KATZ_L + 1))
    return f"""
WITH e AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST(doc_id // 2 AS BIGINT) AS dst FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id // 4 AS BIGINT)
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id // 8 AS BIGINT)
  FROM documents),
{",".join(lvl)}
SELECT p1.node, CAST({1 << (KATZ_L - 1)} * p1.p + {terms} AS BIGINT)
           AS katz
FROM p1
{joins}
"""


def q_join_counts(sf_dir: str):
    """Join-count statistics (Cliff-Ord; the binary-surface spatial
    autocorrelation test that completes the moran_i / lisa_quadrants /
    gi_star family): occupied terrain cells are colored Black when
    above the global mean (n·nc > 2·s — the grid_regions level test),
    White otherwise; adjacent occupied pairs (4-neighborhood, counted
    once via the east/north half-stencil) are tallied as BB / BW / WW.
    One density groupby + the sparse-stencil co-location; the global
    tally is three integer sums."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    cells = pts.map_batches(cellify, batch_format="pyarrow",
                            batch_size=65536)
    grd = rel.groupby_aggregate(cells, ["cx", "cy"],
                                [("n", "cx", "count")]).materialize()
    tp = grd.map_batches(
        lambda b: pa.table({"nc": pa.array([b.num_rows], pa.int64()),
                            "s": pa.array([int(pc.sum(b["n"]).as_py())],
                                          pa.int64())}),
        batch_format="pyarrow").to_pandas()
    nc, s = int(tp["nc"].sum()), int(tp["s"].sum())

    # each cell posts its color to its east/north neighbor positions;
    # the resident combine pairs poster with resident exactly once
    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        blk = (b["n"].to_numpy(np.int64) * nc > 2 * s).astype(np.int64)
        tx = np.concatenate([cx, cx + 1, cx])
        ty = np.concatenate([cy, cy, cy + 1])
        tag = np.repeat(np.arange(3, dtype=np.int64), len(b))
        return pd.DataFrame({"cx": tx, "cy": ty, "tag": tag,
                             "blk": np.tile(blk, 3)})

    tagged = grd.map_batches(emit, batch_format="pandas",
                             batch_size=65536)

    def pair_counts(b: pd.DataFrame) -> pd.DataFrame:
        own = b[b["tag"] == 0].set_index(["cx", "cy"])["blk"]
        inc = b[b["tag"] != 0].set_index(["cx", "cy"])["blk"]
        j = inc.to_frame("nb").join(own.to_frame("me"), how="inner")
        t = j["me"].to_numpy(np.int64) + j["nb"].to_numpy(np.int64)
        return pd.DataFrame({
            "bb": [int((t == 2).sum())], "bw": [int((t == 1).sum())],
            "ww": [int((t == 0).sum())]})

    parts = rel.bucketed_group_apply(tagged, ["cx", "cy"], pair_counts)
    out = parts.map_batches(
        lambda b: pd.DataFrame({"bb": [int(b["bb"].sum())],
                                "bw": [int(b["bw"].sum())],
                                "ww": [int(b["ww"].sum())]}),
        batch_format="pandas").to_pandas()
    return pd.DataFrame({"bb": [int(out["bb"].sum())],
                         "bw": [int(out["bw"].sum())],
                         "ww": [int(out["ww"].sum())]})


def SQL_JOIN_COUNTS():
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
g AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy, COUNT(*) AS n
      FROM pts GROUP BY 1, 2),
t AS (SELECT COUNT(*) AS nc, SUM(n) AS s FROM g),
c AS (SELECT cx, cy,
             CASE WHEN n * (SELECT nc FROM t) > 2 * (SELECT s FROM t)
                  THEN 1 ELSE 0 END AS blk
      FROM g),
p AS (SELECT a.blk + b.blk AS tt
      FROM c a JOIN c b
        ON (b.cx = a.cx + 1 AND b.cy = a.cy)
        OR (b.cx = a.cx AND b.cy = a.cy + 1))
SELECT CAST(SUM(CASE WHEN tt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bb,
       CAST(SUM(CASE WHEN tt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bw,
       CAST(SUM(CASE WHEN tt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ww
FROM p
"""


CC_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def q_cross_corr(sf_dir: str):
    """Lagged cross-correlation inputs between the daily 'view' and
    'purchase' series (the marketing lead-lag diagnostic; q_autocorr
    is the self-paired case): the gap-filled day grid [d0, dmax] with
    missing days = 0 makes the alignment deterministic, and per lag
    ℓ ∈ {CC_LAGS} the exact integer moments (n, sx, sy, sxy, sxx,
    syy) over pairs (x_d, y_(d+ℓ)) determine Pearson r without a
    float. Daily counts are one small-key distributed fold; the
    lag algebra runs on the day-bounded table."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pd.DataFrame:
        et = b["event_type"].to_pandas()
        m = et.isin(["view", "purchase"])
        us = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)[m.to_numpy()]
        df = pd.DataFrame({"et": et[m].to_numpy(),
                           "day": us // 86_400_000_000})
        g = (df.groupby(["et", "day"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    daily = rel.groupby_aggregate(parts, ["et", "day"],
                                  [("n", "n", "sum")]).to_pandas()
    daily["n"] = daily["n"].astype(np.int64)
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    days = np.arange(d0, d1 + 1, dtype=np.int64)
    x = np.zeros(len(days), np.int64)
    y = np.zeros(len(days), np.int64)
    for et, arr in (("view", x), ("purchase", y)):
        sub = daily[daily["et"] == et]
        arr[sub["day"].to_numpy(np.int64) - d0] = \
            sub["n"].to_numpy(np.int64)
    rows = []
    for lag in CC_LAGS:
        if lag >= 0:
            xa, ya = x[:len(x) - lag or None], y[lag:]
        else:
            xa, ya = x[-lag:], y[:lag]
        rows.append((lag, len(xa), int(xa.sum()), int(ya.sum()),
                     int((xa * ya).sum()), int((xa * xa).sum()),
                     int((ya * ya).sum())))
    return pd.DataFrame(rows, columns=["lag", "n", "sx", "sy",
                                       "sxy", "sxx", "syy"]) \
        .astype(np.int64)


def SQL_CROSS_CORR():
    lags = ", ".join(f"({v})" for v in CC_LAGS)
    return f"""
WITH e AS (SELECT event_type AS et,
                  epoch_us(ts) // 86400000000 AS day
           FROM events WHERE event_type IN ('view', 'purchase')),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
d AS (SELECT UNNEST(range((SELECT d0 FROM b),
                          (SELECT d1 FROM b) + 1)) AS day),
cv AS (SELECT day, COUNT(*) AS n FROM e WHERE et = 'view'
       GROUP BY day),
cp AS (SELECT day, COUNT(*) AS n FROM e WHERE et = 'purchase'
       GROUP BY day),
s AS (SELECT d.day, COALESCE(cv.n, 0) AS x, COALESCE(cp.n, 0) AS y
      FROM d LEFT JOIN cv ON cv.day = d.day
             LEFT JOIN cp ON cp.day = d.day)
SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.x) AS BIGINT) AS sx, CAST(SUM(b2.y) AS BIGINT) AS sy,
       CAST(SUM(a.x * b2.y) AS BIGINT) AS sxy,
       CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
       CAST(SUM(b2.y * b2.y) AS BIGINT) AS syy
FROM (VALUES {lags}) l(lag)
JOIN s a ON TRUE
JOIN s b2 ON b2.day = a.day + l.lag
GROUP BY l.lag
"""


def _weighted_link_edges(sf_dir: str):
    """Deduped undirected link graph (u < v, self-loops dropped) with
    an LCG-scrambled TOTAL-ORDER weight: wk = ((u·69069 + v·48271)
    mod 2^19)·2^43 + u·2^21 + v. The injective (u,v) pack rides as
    the low bits so ties are impossible (valid for ids < 2^21,
    int64-safe). Shared by q_matching and q_boruvka."""
    from pythongis_ray import pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])

    def canon(b: pa.Table) -> pa.Table:
        s = b["src_page"].to_numpy(zero_copy_only=False)
        d = b["dst_page"].to_numpy(zero_copy_only=False)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        m = u < v
        return pa.table({"u": pa.array(u[m]), "v": pa.array(v[m])})

    e = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                       batch_size=4096) \
        .map_batches(canon, batch_format="pyarrow", batch_size=65536)
    e = rel.dedup(e, ["u", "v"])

    def add_priority(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        ph = (u * 69069 + v * 48271) % (1 << 19)
        return b.append_column(
            "ek", pa.array(ph * (1 << 43) + u * (1 << 21) + v))

    return e.map_batches(add_priority, batch_format="pyarrow",
                         batch_size=65536).materialize()


_SQL_WEIGHTED_LINK_EDGES = """
links AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST(doc_id // 2 AS BIGINT) AS dst FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id // 4 AS BIGINT)
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id // 8 AS BIGINT)
  FROM documents),
e1 AS MATERIALIZED (
  SELECT u, v,
         ((u * 69069 + v * 48271) % 524288) * 8796093022208
             + u * 2097152 + v AS ek
  FROM (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM links WHERE least(src, dst) < greatest(src, dst)) _e)"""


MATCH_ROUNDS = 3


def q_matching(sf_dir: str):
    """Distributed greedy matching via locally-dominant edges (Hoepman
    2004 / Preis'99: an edge is matched when it is the min-priority
    incident edge of BOTH endpoints — rounds are conflict-free and
    deterministic, unlike sequential greedy): over the deduped
    undirected link graph (u < v, self-loops dropped), priority =
    edge key u·2²¹ + v (a total order). {MATCH_ROUNDS} simultaneous
    rounds; each is one per-node min fold + two keyed joins + the
    endpoint elimination anti-joins — all bucketed (native=False: the
    native Dataset.join would spawn an actor pool per round). Output
    (u, v, round matched). A fixed round count keeps the oracle
    replayable as chained CTEs; edges still augmentable after round
    {MATCH_ROUNDS} are out of scope on BOTH sides by construction."""
    # LCG-scrambled total-order priority (see _weighted_link_edges):
    # without it every node's min edge points at its lowest-id
    # ancestor and dominance collapses into the hub core (a 9-edge
    # matching at every scale); scrambling scatters local minima so
    # each round matches a constant fraction (Hoepman's expectation).
    # materialized: each round consumes `alive` twice (the endpoint
    # fold and the attach join) — lazy, that re-runs the whole
    # link-extraction lineage two times per round
    alive = _weighted_link_edges(sf_dir).materialize()

    matched_parts = []
    for rnd in range(1, MATCH_ROUNDS + 1):
        both = alive.map_batches(
            lambda b: pa.table({
                "node": pa.concat_arrays([
                    pc.cast(b["u"], pa.int64()).combine_chunks(),
                    pc.cast(b["v"], pa.int64()).combine_chunks()]),
                "ek": pa.concat_arrays(
                    [pc.cast(b["ek"], pa.int64()).combine_chunks()] * 2)}),
            batch_format="pyarrow", batch_size=65536)
        # materialized: nm feeds BOTH endpoint projections — lazy, the
        # groupby would execute twice
        nm = rel.groupby_aggregate(both, ["node"],
                                   [("mn", "ek", "min")]).materialize()
        nmu = nm.map_batches(lambda b: pa.table(
            {"u": b["node"], "mu": b["mn"]}),
            batch_format="pyarrow", batch_size=65536)
        nmv = nm.map_batches(lambda b: pa.table(
            {"v": b["node"], "mv": b["mn"]}),
            batch_format="pyarrow", batch_size=65536)
        j = rel.join_large(alive, nmu, on="u", num_buckets=16,
                           native=False)
        j = rel.join_large(j, nmv, on="v", num_buckets=16,
                           native=False)

        def pick(b: pd.DataFrame, rnd=rnd) -> pd.DataFrame:
            m = (b["ek"].to_numpy(np.int64)
                 == b["mu"].to_numpy(np.int64)) \
                & (b["ek"].to_numpy(np.int64)
                   == b["mv"].to_numpy(np.int64))
            g = b[m]
            return pd.DataFrame({
                "u": g["u"].to_numpy(np.int64),
                "v": g["v"].to_numpy(np.int64),
                "round": np.full(int(m.sum()), rnd, np.int64)})

        matched = j.map_batches(pick, batch_format="pandas",
                                batch_size=65536).materialize()
        matched_parts.append(matched)
        if rnd == MATCH_ROUNDS:
            break
        gone = matched.map_batches(
            lambda b: pa.table({
                "node": pa.concat_arrays([
                    pc.cast(b["u"], pa.int64()).combine_chunks(),
                    pc.cast(b["v"], pa.int64()).combine_chunks()]),
                "hit": pa.array(np.ones(b.num_rows * 2, np.int64))}),
            batch_format="pyarrow", batch_size=65536)
        gone = rel.dedup(gone, ["node"])
        for col in ("u", "v"):
            side = gone.map_batches(
                lambda b, col=col: pa.table({col: b["node"],
                                             f"hit_{col}": b["hit"]}),
                batch_format="pyarrow", batch_size=65536)
            alive = rel.join_large(alive, side, on=col, num_buckets=16,
                                   how="left", native=False)
            alive = alive.map_batches(
                lambda b, col=col: b[b[f"hit_{col}"].isna()]
                [["u", "v", "ek"]],
                batch_format="pandas", batch_size=65536)
        alive = alive.materialize()

    out = None
    for mpart in matched_parts:
        out = mpart if out is None else out.union(mpart)
    res = out.to_pandas()
    if len(res) == 0:
        return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64),
                             "round": pd.Series([], dtype=np.int64)})
    return res.astype(np.int64)


def SQL_MATCHING():
    ctes = []
    sels = []
    for r in range(1, MATCH_ROUNDS + 1):
        ctes.append(f"""
nm{r} AS MATERIALIZED (
  SELECT node, MIN(ek) AS mn FROM (
    SELECT u AS node, ek FROM e{r}
    UNION ALL SELECT v AS node, ek FROM e{r}) _n{r} GROUP BY node),
m{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e
  JOIN nm{r} a ON a.node = e.u AND a.mn = e.ek
  JOIN nm{r} b ON b.node = e.v AND b.mn = e.ek)""")
        sels.append(f"SELECT u, v, {r} AS round FROM m{r}")
        if r < MATCH_ROUNDS:
            ctes.append(f"""
e{r + 1} AS MATERIALIZED (
  SELECT * FROM e{r}
  WHERE u NOT IN (SELECT u FROM m{r} UNION SELECT v FROM m{r})
    AND v NOT IN (SELECT u FROM m{r} UNION SELECT v FROM m{r}))""")
    return f"""
WITH {_SQL_WEIGHTED_LINK_EDGES},
{",".join(ctes)}
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(round AS BIGINT) AS round
FROM ({" UNION ALL ".join(sels)}) _m
"""


BORUVKA_ROUNDS = 3
BR_CC_ROUNDS = 8      # SQL pointer-doubling steps (2^8-hop reach, margin)
BR_LOCAL_RESOLVE_CAP = 4_000_000   # successor rows; ≈64 MB driver-side


def q_boruvka(sf_dir: str):
    """Borůvka minimum-spanning-forest rounds over the weighted link
    graph (Borůvka 1926 — THE distributed MST algorithm: GraphX /
    Parallel Borůvka both use exactly this round structure): each
    round every component selects its minimum-weight outgoing edge
    (the scrambled total order of _weighted_link_edges — injective,
    so the classic multiple-min-edge pitfall can't occur), selected
    edges join the forest, and touching components merge by pointer
    DOUBLING on the successor forest (each component's min edge names
    its merge partner — a functional graph whose only cycles are the
    mutual 2-cycles, broken by min; the watershed idiom).
    {BORUVKA_ROUNDS} fixed rounds → a partial forest at large scale
    (full MST needs ~log₂ N rounds; the fixture tree completes in 3),
    deterministic on both sides. Per round: two keyed joins attach
    component labels to edges, one per-component min fold, the
    doubling loop (log₂ iterations, each a keyed join on the
    component-level table, converged via a changed-count), one
    relabel join — every step bucketed; the edge table is static and
    materialized once (joins consume their input per call — a lazy
    edge Dataset would re-run the whole link-extraction lineage
    2× per round). Oracle: chained CTE rounds with
    {BR_CC_ROUNDS} fixed doubling steps (2^{BR_CC_ROUNDS}-hop reach —
    the engine side converges, so an oracle match also certifies the
    SQL step budget suffices at this scale)."""
    e = _weighted_link_edges(sf_dir).materialize()

    def init_comp(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        n = np.unique(np.concatenate([u, v]))
        return pa.table({"node": pa.array(n)})

    comp = rel.dedup(e.map_batches(init_comp, batch_format="pyarrow",
                                   batch_size=65536), ["node"])
    comp = comp.map_batches(
        lambda b: b.append_column("comp", b["node"]),
        batch_format="pyarrow", batch_size=65536).materialize()

    sel_parts = []
    for rnd in range(1, BORUVKA_ROUNDS + 1):
        cu = comp.map_batches(lambda b: pa.table(
            {"u": b["node"], "cu": b["comp"]}),
            batch_format="pyarrow", batch_size=65536)
        cv = comp.map_batches(lambda b: pa.table(
            {"v": b["node"], "cv": b["comp"]}),
            batch_format="pyarrow", batch_size=65536)
        j = rel.join_large(e, cu, on="u", num_buckets=16, native=False)
        j = rel.join_large(j, cv, on="v", num_buckets=16, native=False)
        cand = j.map_batches(
            lambda b: b[b["cu"].to_numpy() != b["cv"].to_numpy()],
            batch_format="pandas", batch_size=65536).materialize()
        if cand.count() == 0:
            break
        both = cand.map_batches(
            lambda b: pd.DataFrame({
                "comp": np.concatenate([b["cu"].to_numpy(np.int64),
                                        b["cv"].to_numpy(np.int64)]),
                "ek": np.tile(b["ek"].to_numpy(np.int64), 2)}),
            batch_format="pandas", batch_size=65536)
        m = rel.groupby_aggregate(both, ["comp"], [("mw", "ek", "min")])
        # merge: successor pointers (each component's min edge names
        # its merge partner — a functional graph whose only cycles are
        # the mutual 2-cycles), resolved to canonical roots by pointer
        # DOUBLING to a fixed point — the watershed idiom, ~10×
        # cheaper than per-round hash-min CC at this shape. ONE ek
        # join serves both outputs: mm = (component, its min edge row)
        # yields the selected forest edges (dedup by ek — an edge
        # chosen by both endpoints appears twice) AND the successor
        # table, so the former separate cand×min-keys join is gone.
        mm = rel.join_large(
            m.map_batches(lambda b: pa.table(
                {"mcomp": b["comp"], "ek": b["mw"]}),
                batch_format="pyarrow", batch_size=65536),
            cand, on="ek", num_buckets=16, native=False).materialize()
        sel = rel.dedup(mm.map_batches(
            lambda b: pa.table({"u": pa.Array.from_pandas(b["u"]),
                                "v": pa.Array.from_pandas(b["v"]),
                                "ek": pa.Array.from_pandas(b["ek"])}),
            batch_format="pandas", batch_size=65536),
            ["ek"]).materialize()
        sel_parts.append((rnd, sel))
        succ = mm.map_batches(
            lambda b: pd.DataFrame({
                "comp": b["mcomp"].to_numpy(np.int64),
                "s": np.where(
                    b["mcomp"].to_numpy(np.int64)
                    == b["cu"].to_numpy(np.int64),
                    b["cv"].to_numpy(np.int64),
                    b["cu"].to_numpy(np.int64))}),
            batch_format="pandas", batch_size=65536).materialize()
        if succ.count() <= BR_LOCAL_RESOLVE_CAP:
            # successor-forest resolve, driver-local: the table is one
            # row per MERGING component (geometrically shrinking round
            # over round), so it is bounded in practice — squaring the
            # successor FUNCTION in numpy (f ← f∘f, true pointer
            # doubling) replaces the 2-cycle-break join plus ~10
            # bucketed doubling joins with microseconds. The
            # distributed path below stays for a round where the
            # successor table is still huge.
            dp = succ.to_pandas()
            comp_ids = dp["comp"].to_numpy(np.int64)
            s = dp["s"].to_numpy(np.int64)
            order = np.argsort(comp_ids, kind="stable")
            keys = comp_ids[order]
            sv = s[order]
            # break the mutual 2-cycles: p = self where succ(succ)
            # loops back and we are the smaller endpoint
            idx = np.clip(np.searchsorted(keys, sv), 0, len(keys) - 1)
            ss = np.where(keys[idx] == sv, sv[idx], sv)
            f = np.where((ss == keys) & (keys < sv), keys, sv)
            for _ in range(64):
                idx = np.clip(np.searchsorted(keys, f), 0, len(keys) - 1)
                nf = np.where(keys[idx] == f, f[idx], f)
                if np.array_equal(nf, f):
                    break
                f = nf
            roots = _rd().from_pandas(pd.DataFrame(
                {"comp": keys, "root": f}))
        else:
            s2 = rel.join_large(
                succ,
                succ.map_batches(lambda b: pa.table(
                    {"s": pa.Array.from_pandas(b["comp"]),
                     "ss": pa.Array.from_pandas(b["s"])}),
                    batch_format="pandas", batch_size=65536),
                on="s", num_buckets=16, native=False)
            p = s2.map_batches(
                lambda b: pd.DataFrame({
                    "comp": b["comp"].to_numpy(np.int64),
                    "p": np.where((b["ss"].to_numpy(np.int64)
                                   == b["comp"].to_numpy(np.int64))
                                  & (b["comp"].to_numpy(np.int64)
                                     < b["s"].to_numpy(np.int64)),
                                  b["comp"].to_numpy(np.int64),
                                  b["s"].to_numpy(np.int64))}),
                batch_format="pandas", batch_size=65536).materialize()
            for _ in range(10):
                pj = rel.join_large(
                    p,
                    p.map_batches(lambda b: pa.table(
                        {"p": pa.Array.from_pandas(b["comp"]),
                         "pp": pa.Array.from_pandas(b["p"])}),
                        batch_format="pandas", batch_size=65536),
                    on="p", num_buckets=16, native=False)
                nxt = pj.map_batches(
                    lambda b: pd.DataFrame({
                        "comp": b["comp"].to_numpy(np.int64),
                        "p": b["pp"].to_numpy(np.int64),
                        "chg": (b["pp"].to_numpy(np.int64)
                                != b["p"].to_numpy(np.int64))
                        .astype(np.int64)}),
                    batch_format="pandas", batch_size=65536).materialize()
                changed = nxt.sum("chg")
                p = nxt.drop_columns(["chg"]).materialize()
                if not changed:
                    break
            roots = p.map_batches(
                lambda b: pa.table({"comp": pa.Array.from_pandas(b["comp"]),
                                    "root": pa.Array.from_pandas(b["p"])}),
                batch_format="pandas", batch_size=65536)
        comp = rel.join_large(comp, roots, on="comp", num_buckets=16,
                              how="left", native=False)
        comp = comp.map_batches(
            lambda b: pd.DataFrame({
                "node": b["node"].to_numpy(np.int64),
                "comp": np.where(b["root"].isna(),
                                 b["comp"].to_numpy(np.int64),
                                 b["root"].to_numpy(np.float64)
                                 ).astype(np.int64)}),
            batch_format="pandas", batch_size=65536).materialize()

    frames = []
    for rnd, sel in sel_parts:
        d = sel.to_pandas()
        frames.append(pd.DataFrame({
            "u": d["u"].to_numpy(np.int64),
            "v": d["v"].to_numpy(np.int64),
            "round": np.full(len(d), rnd, np.int64)}))
    if not frames:
        return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64),
                             "round": pd.Series([], dtype=np.int64)})
    return pd.concat(frames, ignore_index=True)


def SQL_BORUVKA():
    ctes = ["""c0 AS MATERIALIZED (
  SELECT node, node AS comp FROM (
    SELECT u AS node FROM e1 UNION SELECT v FROM e1) _n)"""]
    sels = []
    prev_c = "c0"
    for r in range(1, BORUVKA_ROUNDS + 1):
        ctes.append(f"""
cand{r} AS MATERIALIZED (
  SELECT e.u, e.v, e.ek, a.comp AS cu, b.comp AS cv
  FROM e1 e JOIN {prev_c} a ON a.node = e.u
            JOIN {prev_c} b ON b.node = e.v
  WHERE a.comp != b.comp),
pm{r} AS MATERIALIZED (
  SELECT comp, MIN(ek) AS mw FROM (
    SELECT cu AS comp, ek FROM cand{r}
    UNION ALL SELECT cv, ek FROM cand{r}) _b{r}
  GROUP BY comp),
sel{r} AS MATERIALIZED (
  SELECT c.u, c.v FROM cand{r} c
  JOIN (SELECT DISTINCT mw FROM pm{r}) m ON m.mw = c.ek),
succ{r} AS MATERIALIZED (
  SELECT pm.comp,
         CASE WHEN c.cu = pm.comp THEN c.cv ELSE c.cu END AS s
  FROM pm{r} pm JOIN cand{r} c ON c.ek = pm.mw),
p{r}_0 AS MATERIALIZED (
  SELECT a.comp,
         CASE WHEN b.s = a.comp AND a.comp < a.s
              THEN a.comp ELSE a.s END AS p
  FROM succ{r} a JOIN succ{r} b ON b.comp = a.s)""")
        prev_p = f"p{r}_0"
        for s in range(1, BR_CC_ROUNDS + 1):
            ctes.append(f"""
p{r}_{s} AS MATERIALIZED (
  SELECT a.comp, b.p FROM {prev_p} a JOIN {prev_p} b ON b.comp = a.p)""")
            prev_p = f"p{r}_{s}"
        ctes.append(f"""
c{r} AS MATERIALIZED (
  SELECT c.node, COALESCE({prev_p}.p, c.comp) AS comp
  FROM {prev_c} c LEFT JOIN {prev_p} ON {prev_p}.comp = c.comp)""")
        prev_c = f"c{r}"
        sels.append(f"SELECT u, v, {r} AS round FROM sel{r}")
    return f"""
WITH {_SQL_WEIGHTED_LINK_EDGES},
{",".join(ctes)}
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(round AS BIGINT) AS round
FROM ({" UNION ALL ".join(sels)}) _t
"""


STRAHLER_ROUNDS = 12


def q_stream_order(sf_dir: str):
    """Strahler stream order over the D8 flow graph (the hydrology
    suite's last classic, joining flow_direction / flow_acc /
    watershed / fill_sinks): order 1 at source cells (no inflow);
    where a cell's inflows share their maximum order m twice or more,
    the order steps to m+1, else stays m. Computed as
    {STRAHLER_ROUNDS} bounded Jacobi rounds of the monotone update
    from the all-ones start — converged on every test grid (flow
    paths on the ≤45×23 cell table are short), and the R-bounded
    semantics keeps both sides identical by construction regardless.
    Corpus-sized work = one density pass + one cell-bucketed stencil;
    the rounds act on the cell-bounded flow table (flow_acc's
    contract). SQL: per round, inflow max via a grouped fold and the
    count-at-max via a self-join back onto the per-order counts."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grid_ds = rel.groupby_aggregate(ds, ["cx", "cy"],
                                    [("n", "cx", "count")])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        cx = b["cx"].to_numpy(np.int64)
        cy = b["cy"].to_numpy(np.int64)
        v = b["n"].to_numpy(np.int64)
        txs, tys, tags = [cx], [cy], [np.full(len(b), 8, np.int64)]
        for d, (dx, dy) in enumerate(_D8):
            txs.append(cx - dx)
            tys.append(cy - dy)
            tags.append(np.full(len(b), d, np.int64))
        return pd.DataFrame({"cx": np.concatenate(txs),
                             "cy": np.concatenate(tys),
                             "tag": np.concatenate(tags),
                             "v": np.tile(v, 9)})

    tagged = grid_ds.map_batches(emit, batch_format="pandas",
                                 batch_size=65536)

    def stencil(b: pd.DataFrame) -> pd.DataFrame:
        p = b.pivot_table(index=["cx", "cy"], columns="tag",
                          values="v", aggfunc="sum")
        p = p.reindex(columns=range(9))
        p = p[p[8].notna()]
        own = p[8].to_numpy(np.int64)
        big = np.int64(1) << 62
        keys = np.full((len(p), 8), big, np.int64)
        for d in range(8):
            bn = p[d].to_numpy(np.float64)
            has = ~np.isnan(bn)
            lower = has & (bn < own)
            keys[lower, d] = bn[lower].astype(np.int64) * 8 + d
        best = keys.min(axis=1)
        has_flow = best < big
        d_star = keys.argmin(axis=1)
        cx = p.index.get_level_values(0).to_numpy(np.int64)
        cy = p.index.get_level_values(1).to_numpy(np.int64)
        dx = np.array([d[0] for d in _D8], np.int64)[d_star]
        dy = np.array([d[1] for d in _D8], np.int64)[d_star]
        return pd.DataFrame({
            "cx": cx, "cy": cy, "has_flow": has_flow,
            "tx": np.where(has_flow, cx + dx, cx),
            "ty": np.where(has_flow, cy + dy, cy)})

    cells = rel.bucketed_group_apply(tagged, ["cx", "cy"], stencil)

    def rounds(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cx", "cy"], kind="stable") \
            .reset_index(drop=True)
        key = g["cx"].to_numpy(np.int64) * (np.int64(1) << 32) \
            + g["cy"].to_numpy(np.int64)
        tkey = g["tx"].to_numpy(np.int64) * (np.int64(1) << 32) \
            + g["ty"].to_numpy(np.int64)
        tidx = np.searchsorted(key, tkey)
        hf = g["has_flow"].to_numpy(bool)
        o = np.ones(len(g), np.int64)
        for _ in range(STRAHLER_ROUNDS):
            mx = np.zeros(len(g), np.int64)
            np.maximum.at(mx, tidx[hf], o[hf])
            cnt = np.zeros(len(g), np.int64)
            at_max = o[hf] == mx[tidx[hf]]
            np.add.at(cnt, tidx[hf][at_max],
                      np.ones(int(at_max.sum()), np.int64))
            o = np.where(mx == 0, 1, np.where(cnt >= 2, mx + 1, mx))
        return pd.DataFrame({"cx": g["cx"].to_numpy(np.int64),
                             "cy": g["cy"].to_numpy(np.int64),
                             "strahler": o})

    one = cells.map_batches(lambda b: b.assign(_one=np.int64(0)),
                            batch_format="pandas")
    return one.groupby("_one").map_groups(
        lambda g: rounds(g.drop(columns=["_one"])),
        batch_format="pandas")


def _sql_stream_order() -> str:
    dirs = ", ".join(f"({d}, {dx}, {dy})"
                     for d, (dx, dy) in enumerate(_D8))
    rounds = []
    prev = "s0"
    for r in range(1, STRAHLER_ROUNDS + 1):
        rounds.append(f"""
i{r} AS (SELECT f.tx AS cx, f.ty AS cy, {prev}.o, COUNT(*) AS c
         FROM {prev} JOIN flow f
           ON f.cx = {prev}.cx AND f.cy = {prev}.cy
         GROUP BY 1, 2, 3),
x{r} AS (SELECT cx, cy, MAX(o) AS mx FROM i{r} GROUP BY 1, 2),
s{r} AS MATERIALIZED (
  SELECT c.cx, c.cy,
         CASE WHEN x.mx IS NULL THEN 1
              WHEN i.c >= 2 THEN x.mx + 1 ELSE x.mx END AS o
  FROM cells c
  LEFT JOIN x{r} x ON x.cx = c.cx AND x.cy = c.cy
  LEFT JOIN i{r} i ON i.cx = c.cx AND i.cy = c.cy AND i.o = x.mx)""")
        prev = f"s{r}"
    return f"""
WITH pts AS ({SQL_PTS_LINEITEM()}),
cells AS MATERIALIZED (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
        CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
cand AS (SELECT a.cx, a.cy, b.n AS bn, d.d AS d,
                a.cx + d.dx AS tx, a.cy + d.dy AS ty
         FROM cells a
         CROSS JOIN (VALUES {dirs}) d(d, dx, dy)
         JOIN cells b ON b.cx = a.cx + d.dx AND b.cy = a.cy + d.dy
         WHERE b.n < a.n),
flow AS MATERIALIZED (SELECT cx, cy, tx, ty FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY cx, cy
                   ORDER BY bn * 8 + d) AS rn FROM cand) _f
        WHERE rn = 1),
s0 AS MATERIALIZED (SELECT cx, cy, 1 AS o FROM cells),
{",".join(rounds)}
SELECT cx, cy, CAST(o AS BIGINT) AS strahler FROM {prev}
"""


def q_cell_coverage(sf_dir: str):
    """Exact area-weighted rasterization (coverage fractions — the
    anti-aliased counterpart of rasterize_poly's center sampling, the
    reference's `disperse`/zonal weighting geometry): for every 1°
    cell a zone rectangle touches, the EXACT overlap area in
    quarter-unit² (doubled-lattice integers clear the half-unit zone
    insets, so edge cells get true partial weights — no floats
    anywhere). One vectorized flat-map explodes zones into their
    bounded cell cover; coverage is clamp arithmetic per row; no
    shuffle at all. Σcov4 per zone = 144000·72000 exactly (mass
    preservation by construction)."""
    ds = _rd().read_parquet(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey"])

    def explode(batch: pa.Table) -> pa.Table:
        k = batch["n_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x0 = (k % 5) * 147456 + 1          # doubled lattice units
        y0 = (k // 5) * 73728 + 1
        x1 = x0 + 144000
        y1 = y0 + 72000
        cx0, cx1 = x0 // 2048, (x1 - 1) // 2048
        cy0, cy1 = y0 // 2048, (y1 - 1) // 2048
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        reps = nx * ny
        zi = np.repeat(np.arange(len(k), dtype=np.int64), reps)
        # per-zone local cell index → (cx, cy)
        local = np.concatenate([np.arange(r, dtype=np.int64)
                                for r in reps])
        cx = cx0[zi] + local // ny[zi]
        cy = cy0[zi] + local % ny[zi]
        dx = np.minimum(x1[zi], (cx + 1) * 2048) \
            - np.maximum(x0[zi], cx * 2048)
        dy = np.minimum(y1[zi], (cy + 1) * 2048) \
            - np.maximum(y0[zi], cy * 2048)
        return pa.table({"zone_id": pa.array(k[zi]),
                         "cx": pa.array(cx), "cy": pa.array(cy),
                         "cov4": pa.array(dx * dy)})

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=4096)


SQL_CELL_COVERAGE = """
WITH z AS (SELECT n_nationkey AS zone_id,
                  (n_nationkey % 5) * 147456 + 1 AS x0,
                  (n_nationkey // 5) * 73728 + 1 AS y0,
                  (n_nationkey % 5) * 147456 + 144001 AS x1,
                  (n_nationkey // 5) * 73728 + 72001 AS y1
           FROM nation),
cxs AS (SELECT zone_id, x0, y0, x1, y1,
               UNNEST(range(x0 // 2048, (x1 - 1) // 2048 + 1)) AS cx
        FROM z),
c AS (SELECT zone_id, x0, y0, x1, y1, cx,
             UNNEST(range(y0 // 2048, (y1 - 1) // 2048 + 1)) AS cy
      FROM cxs)
SELECT CAST(zone_id AS BIGINT) AS zone_id,
       CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST((LEAST(x1, (cx + 1) * 2048) - GREATEST(x0, cx * 2048))
            * (LEAST(y1, (cy + 1) * 2048) - GREATEST(y0, cy * 2048))
            AS BIGINT) AS cov4
FROM c
"""


RECODE_CAP = 3.0


def q_recode_grid(sf_dir: str):
    """Band recode / conditional overwrite on the real tile-buffer
    path (reference Band.recode, /root/reference/pythongis/raster/
    data.py:516-590): the lineitem density raster at res 3 (pixel
    edges on the lattice — see band_math_grid) recoded with
    'values > {RECODE_CAP} → {RECODE_CAP}' (a cap, the classic
    outlier clamp), then unpacked to nonzero pixels. Count pixels are
    small integers in float32, so the cap is exact and the oracle is
    LEAST(n, cap) per pixel."""
    from pythongis_ray import raster

    a = raster.rasterize_points(points_lineitem(sf_dir), res=3)
    out = raster.recode(a, "gt", RECODE_CAP, RECODE_CAP)
    t = raster.TILE

    def unpack_tiles(batch: pd.DataFrame) -> pd.DataFrame:
        gx, gy, vs = [], [], []
        for cid, buf, nd in zip(batch["cell_id"], batch["tile"],
                                batch["nodata"]):
            arr = raster.bytes_to_tile(buf, t)
            fy, fx = np.nonzero(arr != np.float32(nd))
            if len(fx) == 0:
                continue
            _, cix, ciy = grid.unpack(
                np.array([cid], np.int64).view(np.uint64))
            gx.append(cix[0] * t + fx)
            gy.append(ciy[0] * t + fy)
            vs.append(arr[fy, fx].astype(np.int64))
        if not gx:
            return pd.DataFrame({"gpx": pd.Series([], dtype=np.int64),
                                 "gpy": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"gpx": np.concatenate(gx),
                             "gpy": np.concatenate(gy),
                             "n": np.concatenate(vs)})

    return out.map_batches(unpack_tiles, batch_format="pandas",
                           batch_size=256)


def SQL_RECODE_GRID():
    return f"""
WITH la AS (SELECT ix // 360 AS gpx, iy // 360 AS gpy,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ({SQL_PTS_LINEITEM()}) GROUP BY 1, 2)
SELECT gpx, gpy, LEAST(n, {int(RECODE_CAP)}) AS n FROM la
"""


def _columnar_roundtrip(sf_dir: str, writer, reader, tag: str):
    """Shared engine for the Feather/ORC interchange loops: customer
    keyed points with integer lattice units → per-block columnar sink
    (content-derived names + manifest) → multi-file Dataset read →
    hash-checked against the keyed-point oracle."""
    import shutil
    import tempfile

    pts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 3, "fk")

    def to_units(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        return pa.table({
            "fk": pc.cast(batch["fk"], pa.int64()),
            "ix": pa.array(np.rint((lon + 180.0) * 1024.0)
                           .astype(np.int64)),
            "iy": pa.array(np.rint((lat + 90.0) * 1024.0)
                           .astype(np.int64))})

    d = tempfile.mkdtemp(prefix=f"{tag}_q_", dir="/tmp")
    try:
        writer(pts.map_batches(to_units, batch_format="pyarrow",
                               batch_size=16384), d)
        return reader(d).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_feather_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2) interchange loop: distributed per-block
    sink + manifest → multi-file read. The zero-copy Arrow sibling of
    the parquet path (reference vector loader/saver family)."""
    from pythongis_ray import sources

    return _columnar_roundtrip(sf_dir, sources.write_feather,
                               sources.read_feather, "feather")


def q_orc_roundtrip(sf_dir: str):
    """ORC interchange loop (the Hive/Spark columnar sibling):
    distributed per-block sink + manifest → multi-file read."""
    from pythongis_ray import sources

    return _columnar_roundtrip(sf_dir, sources.write_orc,
                               sources.read_orc, "orc")


def q_avro_roundtrip(sf_dir: str):
    """Avro object-container interchange loop (the classic row-major
    big-data format; clean-room writer/reader from the public 1.11
    spec — zigzag varints, metadata map, sync markers, codec null):
    distributed per-block sink + manifest → per-file parse tasks."""
    from pythongis_ray import sources

    return _columnar_roundtrip(sf_dir, sources.write_avro,
                               sources.read_avro, "avro")


def _sql_columnar_roundtrip():
    return f"""
SELECT fk, CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy
FROM ({_sql_keyed_points("customer", "c_custkey", 4, 3, "fk")}) _f
"""


def q_spearman(sf_dir: str):
    """Spearman rank correlation inputs between l_quantity and price
    cents (the robust monotone-association statistic beside
    kendall_tau): tie-averaged ranks doubled to stay integer —
    2·avgrank(v) = 2·P(v) + c(v) + 1 from the VALUE-DOMAIN count
    table (the mannwhitney discipline: no global sort, no pair
    space), broadcast as searchsorted maps into a stateless per-row
    pass that folds the exact integer moments (n, sx, sy, sxy, sxx,
    syy) — Pearson-on-ranks falls out without a float. Value domains
    are data-bounded (≤ distinct prices), not corpus-bounded."""
    import ray

    from pythongis_ray import state

    ds = _rd().read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_extendedprice"])

    def vals(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.rint(batch["l_extendedprice"]
                    .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"q": pa.array(q), "p": pa.array(p)})

    vds = ds.map_batches(vals, batch_format="pyarrow",
                         batch_size=65536).materialize()

    def rank_map(col: str):
        cnt = rel.groupby_aggregate(
            vds.select_columns([col]), [col],
            [("c", col, "count")]).to_pandas()
        cnt = cnt.sort_values(col, kind="stable").reset_index(drop=True)
        v = cnt[col].to_numpy(np.int64)
        c = cnt["c"].to_numpy(np.int64)
        pre = np.concatenate(([0], np.cumsum(c)))[:-1]
        return v, 2 * pre + c + 1

    qv, qr = rank_map("q")
    pv, pr = rank_map("p")
    maps_ref = ray.put((qv, qr, pv, pr))

    def moments(batch: pa.Table) -> pd.DataFrame:
        mqv, mqr, mpv, mpr = state.get_broadcast(
            maps_ref, key_extra=("spearman",))
        q = batch["q"].to_numpy(zero_copy_only=False)
        p = batch["p"].to_numpy(zero_copy_only=False)
        rx = mqr[np.searchsorted(mqv, q)]
        ry = mpr[np.searchsorted(mpv, p)]
        return pd.DataFrame({
            "n": [len(q)], "sx": [int(rx.sum())], "sy": [int(ry.sum())],
            "sxy": [int((rx * ry).sum())], "sxx": [int((rx * rx).sum())],
            "syy": [int((ry * ry).sum())]})

    parts = vds.map_batches(moments, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
    return pd.DataFrame({c: [int(parts[c].sum())]
                         for c in ("n", "sx", "sy", "sxy",
                                   "sxx", "syy")}).astype(np.int64)


SQL_SPEARMAN = """
WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS p
           FROM lineitem),
rq AS (SELECT q, 2 * (SUM(c) OVER (ORDER BY q) - c) + c + 1 AS r2
       FROM (SELECT q, COUNT(*) AS c FROM b GROUP BY q) _q),
rp AS (SELECT p, 2 * (SUM(c) OVER (ORDER BY p) - c) + c + 1 AS r2
       FROM (SELECT p, COUNT(*) AS c FROM b GROUP BY p) _p),
j AS (SELECT rq.r2 AS rx, rp.r2 AS ry
      FROM b JOIN rq ON rq.q = b.q JOIN rp ON rp.p = b.p)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
       CAST(SUM(rx * ry) AS BIGINT) AS sxy,
       CAST(SUM(rx * rx) AS BIGINT) AS sxx,
       CAST(SUM(ry * ry) AS BIGINT) AS syy
FROM j
"""


def q_gpx_roundtrip(sf_dir: str):
    """GPX interchange loop (GPS tracks — the classic field-data
    format next to the shapefile): the 7-vertex customer tracks →
    distributed .gpx sink (repr doubles = shortest-round-trip text)
    → regex-kernel reader → vertex explosion → exact lattice units.
    A hash match proves the XML text preserved every coordinate and
    track key."""
    import shutil
    import tempfile

    from pythongis_ray import sources, vector as vec
    from pythongis_ray.geom import wkb as _wkb

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"])

    def mk_tracks(batch: pa.Table) -> pa.Table:
        c = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ck = c * 4 + 2
        bx, by = fixtures.geocode_units(ck)
        j = np.arange(7, dtype=np.int64)
        kj = ck[:, None] * 8 + j[None, :]
        vx = bx[:, None] + (kj * 48271) % 8192 - 4096
        vy = by[:, None] + (kj * 16807) % 8192 - 4096
        lon = vx / 1024.0 - 180.0
        lat = vy / 1024.0 - 90.0
        geoms = [_wkb.encode_linestring(np.column_stack([lon[i], lat[i]]))
                 for i in range(len(ck))]
        return pa.table({"tid": pa.array(ck),
                         "geometry": pa.array(geoms, pa.binary())})

    tracks = ds.map_batches(mk_tracks, batch_format="pyarrow",
                            batch_size=16384)
    d = tempfile.mkdtemp(prefix="gpx_q_", dir="/tmp")
    try:
        sources.write_gpx(tracks, d)
        back = sources.read_gpx(d)
        verts = vec.to_vertices(back)

        def to_units(batch: pa.Table) -> pa.Table:
            vx = batch["vx"].to_numpy(zero_copy_only=False)
            vy = batch["vy"].to_numpy(zero_copy_only=False)
            return pa.table({
                "ck": pc.cast(batch["tid"], pa.int64()),
                "ix": pa.array(np.rint((vx + 180.0) * 1024.0)
                               .astype(np.int64)),
                "iy": pa.array(np.rint((vy + 90.0) * 1024.0)
                               .astype(np.int64))})

        return verts.map_batches(to_units, batch_format="pyarrow",
                                 batch_size=65536).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def SQL_GPX_ROUNDTRIP():
    src = "(SELECT c_custkey*4+2 AS ck FROM customer)"
    g = fixtures.sql_geocode("ck").replace("__SRC__", src)
    return f"""
WITH base AS (SELECT ck, ix AS bx, iy AS by_ FROM ({g}) _b)
SELECT ck,
       bx + (ck*8+j) * 48271 % 8192 - 4096 AS ix,
       by_ + (ck*8+j) * 16807 % 8192 - 4096 AS iy
FROM base, (SELECT UNNEST(range(7)) AS j)
"""


COVER_LEVELS = 3          # refinements below the 8192-unit seed cells
_DIA_A2, _DIA_B2 = 30001, 20001      # doubled-unit diamond semi-axes
_DIA_M = _DIA_A2 * _DIA_B2


def q_poly_cover(sf_dir: str):
    """Adaptive polygon cell-cover expansion (the north-star's H3/S2
    polyfill step, mixed-resolution: coarse cells fully inside stop
    early, boundary cells refine): quadkey cover of the 5 region
    diamonds from 8192-unit seed cells down {COVER_LEVELS} levels to
    1024-unit leaves. Containment/overlap tests are EXACT integer
    half-plane arithmetic in doubled units (B2·|dx| + A2·|dy| vs
    A2·B2; the half-odd semi-axes make equality impossible by parity,
    so every cell classifies strictly). Zones explode independently
    in one vectorized pass — the cover is the standard input to the
    engine's cell-keyed spatial joins. Output (zone_id, level, cx,
    cy, full): full=1 interior cells (emitted at the coarsest level
    that contains them), full=0 boundary leaves."""
    ds = _rd().read_parquet(f"{sf_dir}/region.parquet",
                            columns=["r_regionkey"])

    def cover(batch: pa.Table) -> pd.DataFrame:
        k = batch["r_regionkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cx2 = 2 * (k * 73728 + 36864)
        cy2 = np.full_like(k, 184320)
        out_z, out_l, out_x, out_y, out_f = [], [], [], [], []
        # level-0 seeds: bbox cells at 8192 units (16384 doubled)
        s2 = 16384
        zs, xs, ys = [], [], []
        for i in range(len(k)):
            x0 = (cx2[i] - _DIA_A2) // s2
            x1 = (cx2[i] + _DIA_A2) // s2
            y0 = (cy2[i] - _DIA_B2) // s2
            y1 = (cy2[i] + _DIA_B2) // s2
            gx, gy = np.meshgrid(np.arange(x0, x1 + 1),
                                 np.arange(y0, y1 + 1), indexing="ij")
            zs.append(np.full(gx.size, i, np.int64))
            xs.append(gx.ravel())
            ys.append(gy.ravel())
        zi = np.concatenate(zs)
        cx = np.concatenate(xs)
        cy = np.concatenate(ys)
        for level in range(COVER_LEVELS + 1):
            ccx, ccy = cx2[zi], cy2[zi]
            X0, Y0 = cx * s2, cy * s2
            X1, Y1 = X0 + s2, Y0 + s2
            ndx = np.maximum(0, np.maximum(X0 - ccx, ccx - X1))
            ndy = np.maximum(0, np.maximum(Y0 - ccy, ccy - Y1))
            fdx = np.maximum(X1 - ccx, ccx - X0)
            fdy = np.maximum(Y1 - ccy, ccy - Y0)
            inter = _DIA_B2 * ndx + _DIA_A2 * ndy < _DIA_M
            full = _DIA_B2 * fdx + _DIA_A2 * fdy < _DIA_M
            emit = full | (inter & (level == COVER_LEVELS))
            out_z.append(k[zi[emit]])
            out_l.append(np.full(int(emit.sum()), level, np.int64))
            out_x.append(cx[emit])
            out_y.append(cy[emit])
            out_f.append(full[emit].astype(np.int64))
            if level == COVER_LEVELS:
                break
            ref = inter & ~full
            zi, cx, cy = zi[ref], cx[ref], cy[ref]
            # subdivide into 4 children at half size
            zi = np.repeat(zi, 4)
            qx = np.tile(np.array([0, 1, 0, 1], np.int64), len(cx))
            qy = np.tile(np.array([0, 0, 1, 1], np.int64), len(cx))
            cx = np.repeat(cx * 2, 4) + qx
            cy = np.repeat(cy * 2, 4) + qy
            s2 //= 2
        return pd.DataFrame({"zone_id": np.concatenate(out_z),
                             "level": np.concatenate(out_l),
                             "cx": np.concatenate(out_x),
                             "cy": np.concatenate(out_y),
                             "is_full": np.concatenate(out_f)})

    return ds.map_batches(cover, batch_format="pyarrow",
                          batch_size=4096)


def SQL_POLY_COVER():
    a2, b2, m = _DIA_A2, _DIA_B2, _DIA_M

    def cls(s2: int) -> str:
        return f"""
  GREATEST(0, cx * {s2} - cx2, cx2 - cx * {s2} - {s2}) AS ndx,
  GREATEST(0, cy * {s2} - cy2, cy2 - cy * {s2} - {s2}) AS ndy,
  GREATEST(cx * {s2} + {s2} - cx2, cx2 - cx * {s2}) AS fdx,
  GREATEST(cy * {s2} + {s2} - cy2, cy2 - cy * {s2}) AS fdy"""

    ctes = [f"""z AS (SELECT r_regionkey AS zone_id,
           2 * (r_regionkey * 73728 + 36864) AS cx2,
           184320 AS cy2 FROM region),
s0x AS (SELECT zone_id, cx2, cy2,
        UNNEST(range((cx2 - {a2}) // 16384,
                     (cx2 + {a2}) // 16384 + 1)) AS cx FROM z),
g0 AS (SELECT zone_id, cx2, cy2, cx,
       UNNEST(range((cy2 - {b2}) // 16384,
                    (cy2 + {b2}) // 16384 + 1)) AS cy FROM s0x),
c0 AS (SELECT zone_id, cx2, cy2, cx, cy, {cls(16384)} FROM g0)"""]
    sels = [f"SELECT zone_id, 0 AS level, cx, cy, 1 AS is_full FROM c0 "
            f"WHERE {b2} * fdx + {a2} * fdy < {m}"]
    s2 = 16384
    for lvl in range(1, COVER_LEVELS + 1):
        s2 //= 2
        ctes.append(f"""
g{lvl} AS (SELECT zone_id, cx2, cy2, cx * 2 + q.qx AS cx,
                  cy * 2 + q.qy AS cy
          FROM c{lvl - 1}, (VALUES (0, 0), (1, 0), (0, 1), (1, 1))
              q(qx, qy)
          WHERE {b2} * ndx + {a2} * ndy < {m}
            AND NOT ({b2} * fdx + {a2} * fdy < {m})),
c{lvl} AS (SELECT zone_id, cx2, cy2, cx, cy, {cls(s2)} FROM g{lvl})""")
        if lvl < COVER_LEVELS:
            sels.append(
                f"SELECT zone_id, {lvl} AS level, cx, cy, 1 AS is_full "
                f"FROM c{lvl} WHERE {b2} * fdx + {a2} * fdy < {m}")
        else:
            sels.append(
                f"SELECT zone_id, {lvl} AS level, cx, cy, "
                f"CASE WHEN {b2} * fdx + {a2} * fdy < {m} THEN 1 "
                f"ELSE 0 END AS is_full "
                f"FROM c{lvl} WHERE {b2} * ndx + {a2} * ndy < {m}")
    return f"""
WITH {",".join(ctes)}
SELECT CAST(zone_id AS BIGINT) AS zone_id, CAST(level AS BIGINT)
           AS level,
       CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(is_full AS BIGINT) AS is_full
FROM ({" UNION ALL ".join(sels)}) _c
"""


SCD2_OPEN = 1 << 62


def q_scd2(sf_dir: str):
    """Slowly-changing-dimension type-2 history build (the classic
    warehouse ETL op beside q_upsert_merge): each user's event_type
    stream collapses to its CHANGE points, and every change opens a
    validity interval [valid_from, valid_to) closed by the next
    change (open intervals carry the 2^62 sentinel — the driver's
    hash can't take nullable columns). One user-keyed co-location;
    change detection and the LEAD are vectorized shifts inside the
    bucket ((user_id, ts) is tie-free in the fixtures, so the order
    is total)."""
    from pythongis_ray.relational import bucketed_group_apply

    ds = _events_us(sf_dir, cols=("user_id", "ts", "event_type"))

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["user_id", "ts_us"], kind="stable") \
            .reset_index(drop=True)
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        e = g["event_type"].to_numpy()
        first = np.concatenate(([True], u[1:] != u[:-1]))
        chg = first | np.concatenate(([True], e[1:] != e[:-1]))
        cu, ct, ce = u[chg], t[chg], e[chg]
        cfirst = np.concatenate(([True], cu[1:] != cu[:-1]))
        nxt = np.concatenate((ct[1:], [SCD2_OPEN]))
        last = np.concatenate((cfirst[1:], [True]))
        vto = np.where(last, SCD2_OPEN, nxt)
        return pd.DataFrame({"user_id": cu, "event_type": ce,
                             "valid_from": ct, "valid_to": vto})

    return bucketed_group_apply(ds, ["user_id"], per_bucket)


SQL_SCD2 = f"""
WITH o AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts) AS pe
           FROM events),
c AS (SELECT user_id, ts_us, event_type FROM o
      WHERE pe IS NULL OR pe != event_type)
SELECT user_id, event_type, ts_us AS valid_from,
       COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us), {SCD2_OPEN})
           AS valid_to
FROM c
"""


def q_line_intersections(sf_dir: str):
    """Exact intersection POINTS of properly-crossing segment pairs
    (the constructive output the line×line join only tests — the
    reference's shapely `.intersection()` surface, computed
    shapely-free): candidate pairs come from the cell-bucketed
    spatial_join_line_line; the point is emitted as the cleared
    rational (xi_num/den, yi_num/den) with den = cross(r, s)
    canonicalized positive — pure int64 (coords ≤ 2^19 units, deltas
    ≤ 2^13, so num ≤ ~2^47). Touch/collinear contacts are excluded by
    the strict 0 < t_num < den, 0 < u_num < den tests. The refine
    re-derives both segments arithmetically from their keys, so only
    the (ck, sup_id) pair table moves."""
    lines = lines_customer(sf_dir)
    right = seglines_supplier(sf_dir)
    pairs = spatial.spatial_join_line_line(lines, right) \
        .select_columns(["ck", "sup_id"])

    def refine(b: pa.Table) -> pd.DataFrame:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        sk = b["sup_id"].to_numpy(zero_copy_only=False)
        ax, ay = fixtures.geocode_units(ck)
        rx = (ck * 48271) % 8192 - 4096
        ry = (ck * 16807) % 8192 - 4096
        cx, cy = fixtures.geocode_units(sk)
        sx = (sk * 48271) % 8192 - 4096
        sy = (sk * 16807) % 8192 - 4096
        den0 = rx * sy - ry * sx
        tn0 = (cx - ax) * sy - (cy - ay) * sx
        un0 = (cx - ax) * ry - (cy - ay) * rx
        sgn = np.where(den0 < 0, -1, 1)
        den = sgn * den0
        tn = sgn * tn0
        un = sgn * un0
        ok = (den != 0) & (tn > 0) & (tn < den) & (un > 0) & (un < den)
        xi = sgn * (ax * den0 + tn0 * rx)
        yi = sgn * (ay * den0 + tn0 * ry)
        return pd.DataFrame({"ck": ck[ok], "sup_id": sk[ok],
                             "den": den[ok], "xi_num": xi[ok],
                             "yi_num": yi[ok]})

    return pairs.map_batches(refine, batch_format="pyarrow",
                             batch_size=65536)


def SQL_LINE_INTERSECTIONS():
    cs = _sql_keyed_points("customer", "c_custkey", 4, 1, "ck")
    ss = _sql_keyed_points("supplier", "s_suppkey", 8, 7, "sup_id")
    return f"""
WITH a AS (SELECT ck, ix AS ax, iy AS ay,
                  (ck * 48271) % 8192 - 4096 AS rx,
                  (ck * 16807) % 8192 - 4096 AS ry
           FROM ({cs}) _a),
b AS (SELECT sup_id, ix AS cx, iy AS cy,
             (sup_id * 48271) % 8192 - 4096 AS sx,
             (sup_id * 16807) % 8192 - 4096 AS sy
      FROM ({ss}) _b),
p AS (SELECT ck, sup_id,
             rx * sy - ry * sx AS den0,
             (cx - ax) * sy - (cy - ay) * sx AS tn0,
             (cx - ax) * ry - (cy - ay) * rx AS un0,
             ax, ay, rx, ry
      FROM a CROSS JOIN b),
q AS (SELECT ck, sup_id,
             CASE WHEN den0 < 0 THEN -den0 ELSE den0 END AS den,
             CASE WHEN den0 < 0 THEN -tn0 ELSE tn0 END AS tn,
             CASE WHEN den0 < 0 THEN -un0 ELSE un0 END AS un,
             CASE WHEN den0 < 0 THEN -(ax * den0 + tn0 * rx)
                  ELSE ax * den0 + tn0 * rx END AS xi_num,
             CASE WHEN den0 < 0 THEN -(ay * den0 + tn0 * ry)
                  ELSE ay * den0 + tn0 * ry END AS yi_num
      FROM p)
SELECT ck, sup_id, den, xi_num, yi_num FROM q
WHERE den != 0 AND tn > 0 AND tn < den AND un > 0 AND un < den
"""


def q_walk_edge_load(sf_dir: str):
    """Walk-based edge load (the sampled edge-betweenness proxy used
    for graph sparsification / backbone extraction): traversal counts
    per consecutive (u, v) step pair over the deterministic DeepWalk
    corpus (graph.random_walks — resident-shard engine, LCG hop
    choice). Dangling stalls contribute (v, v) self-pairs on both
    sides by the same rule. Pairs fold inside start-keyed buckets
    (one shifted compare), then one (u, v) combine; the oracle wraps
    the chained-CTE walk replay as a derived table and self-joins
    adjacent steps."""
    from pythongis_ray import graph, pages
    from pythongis_ray.relational import bucketed_group_apply

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    walks = graph.random_walks(edges, src="src_page", dst="dst_page",
                               length=WALK_LEN)

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["start", "step"], kind="stable")
        start = b["start"].to_numpy(np.int64)
        node = b["node"].to_numpy(np.int64)
        m = start[1:] == start[:-1]
        df = pd.DataFrame({"u": node[:-1][m], "v": node[1:][m]})
        return (df.groupby(["u", "v"], sort=False)
                .size().rename("pcnt").reset_index())

    parts = bucketed_group_apply(walks, ["start"], pair_bucket)
    out = rel.groupby_aggregate(parts, ["u", "v"],
                                [("cnt", "pcnt", "sum")])
    return out.map_batches(
        lambda b: pa.table({"u": pc.cast(b["u"], pa.int64()),
                            "v": pc.cast(b["v"], pa.int64()),
                            "cnt": pc.cast(b["cnt"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_walk_edge_load() -> str:
    return f"""
SELECT a.node AS u, b.node AS v, CAST(COUNT(*) AS BIGINT) AS cnt
FROM ({_sql_random_walks()}) a
JOIN ({_sql_random_walks()}) b
  ON b.start = a.start AND b.step = a.step + 1
GROUP BY a.node, b.node
"""


def q_compress_ratio(sf_dir: str):
    """Gopher-style compression-ratio quality signal (Rae et al. 2021
    use exactly this redundancy filter): per document, the DEFLATE
    size at a fixed level over the raw byte size, as the integer
    per-mille ratio len(zlib(text))·1000 // len(text). zlib level 6
    is deterministic for a given input on a given zlib build, and the
    ratio is computed inside one stateless map_batches pass (C-speed
    per doc, no Python hot loop beyond the compress call). SQL cannot
    express DEFLATE — rows-only entry; brute-force parity is asserted
    in tests/test_text_embed.py."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ratio(b: pa.Table) -> pa.Table:
        import zlib

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = b["text"].to_pylist()
        rm = np.empty(len(txt), np.int64)
        for i, t in enumerate(txt):
            raw = t.encode()
            rm[i] = (len(zlib.compress(raw, 6)) * 1000
                     // max(1, len(raw)))
        return pa.table({"doc_id": pa.array(ids),
                         "ratio_pm": pa.array(rm)})

    return ds.map_batches(ratio, batch_format="pyarrow",
                          batch_size=4096)


def q_bfs_parents(sf_dir: str):
    """Shortest-path TREE extraction (the constructive counterpart of
    link_distance, like line_intersections is for the line join):
    for every reached non-seed node, its BFS parent = the minimum-id
    in-neighbor sitting exactly one hop closer. Distances come from
    the resident-shard min-plus engine; the parent pick is one
    partitioned edge⋈dist join per side + a destination-keyed min
    fold. Output (node, dist, parent) for 1 ≤ dist < cap; ties break
    to the smallest parent id on both sides by the min fold."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    e = edges.map_batches(
        lambda b: pa.table({"key": b["src_page"],
                            "dst": b["dst_page"]}),
        batch_format="pyarrow", batch_size=65536).materialize()
    dist = graph.bfs_actors(e, src="key", dst="dst",
                            seed_mod=BFS_SEED_MOD,
                            iters=BFS_ITERS).materialize()
    inf = 1 << 40

    du = dist.map_batches(lambda b: pa.table(
        {"key": b["node"], "du": pc.cast(b["dist"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)
    j = rel.join_large(e, du, on="key", num_buckets=16, native=False)
    dv = dist.map_batches(lambda b: pa.table(
        {"dst": b["node"], "dv": pc.cast(b["dist"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)
    j = rel.join_large(j, dv, on="dst", num_buckets=16, native=False)

    def cand(b: pd.DataFrame) -> pd.DataFrame:
        du_ = b["du"].to_numpy(np.int64)
        dv_ = b["dv"].to_numpy(np.int64)
        m = (dv_ >= 1) & (dv_ < inf) & (du_ == dv_ - 1)
        g = b[m]
        return pd.DataFrame({"node": g["dst"].to_numpy(np.int64),
                             "dist": g["dv"].to_numpy(np.int64),
                             "parent": g["key"].to_numpy(np.int64)})

    cands = j.map_batches(cand, batch_format="pandas",
                          batch_size=65536)
    out = rel.groupby_aggregate(cands, ["node", "dist"],
                                [("parent", "parent", "min")])
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "dist": pc.cast(b["dist"], pa.int64()),
            "parent": pc.cast(b["parent"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def _sql_bfs_parents() -> str:
    inf = 1 << 40
    return f"""
SELECT e.dst AS node, d2.dist AS dist, MIN(e.src) AS parent
FROM ({_SQL_PAGE_EDGES}) e
JOIN ({_sql_bfs()}) d1 ON d1.node = e.src
JOIN ({_sql_bfs()}) d2 ON d2.node = e.dst
WHERE d2.dist >= 1 AND d2.dist < {inf} AND d1.dist = d2.dist - 1
GROUP BY e.dst, d2.dist
"""


def q_mvt_roundtrip(sf_dir: str):
    """Mapbox Vector Tile encode → decode loop (clean-room protobuf
    wire format + zigzag-delta command streams, mvt.py — the modern
    web-map output next to the PNG renderer): customer points are
    tiled at 23040-unit tiles, quantized to the extent-4096 tile
    frame with exact floor division qx = (ix mod 23040)·4096 //
    23040, encoded one tile per bucket (features in ck order), and
    decoded back to (tile, fid, qx, qy) rows. A hash match proves the
    wire bytes carry every feature id and quantized coordinate."""
    from pythongis_ray import mvt

    pts = _keyed_points(sf_dir, "customer", "c_custkey", 4, 1, "ck")

    def tile_local(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ix = np.rint((lon + 180.0) * 1024.0).astype(np.int64)
        iy = np.rint((lat + 90.0) * 1024.0).astype(np.int64)
        return pa.table({
            "ck": pc.cast(batch["ck"], pa.int64()),
            "tcx": pa.array(ix // 23040), "tcy": pa.array(iy // 23040),
            "qx": pa.array((ix % 23040) * 4096 // 23040),
            "qy": pa.array((iy % 23040) * 4096 // 23040)})

    local = pts.map_batches(tile_local, batch_format="pyarrow",
                            batch_size=65536)

    def encode_bucket(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (tcx, tcy), g in b.groupby(["tcx", "tcy"], sort=False):
            g = g.sort_values("ck", kind="stable")
            feats = [mvt.encode_point_feature(int(ck), int(qx), int(qy))
                     for ck, qx, qy in zip(g["ck"], g["qx"], g["qy"])]
            tile = mvt.encode_tile([mvt.encode_layer("pts", feats)])
            rows.append({"tcx": np.int64(tcx), "tcy": np.int64(tcy),
                         "tile": tile})
        return pd.DataFrame(rows, columns=["tcx", "tcy", "tile"])

    tiles = rel.bucketed_group_apply(local, ["tcx", "tcy"],
                                     encode_bucket)

    def decode(b: pd.DataFrame) -> pd.DataFrame:
        out = {"tcx": [], "tcy": [], "ck": [], "qx": [], "qy": []}
        for tcx, tcy, blob in zip(b["tcx"], b["tcy"], b["tile"]):
            for layer in mvt.decode_tile(bytes(blob)):
                assert layer["name"] == "pts"
                assert layer["extent"] == 4096
                for fid, gtype, coords in layer["features"]:
                    assert gtype == 1 and len(coords) == 1
                    out["tcx"].append(np.int64(tcx))
                    out["tcy"].append(np.int64(tcy))
                    out["ck"].append(np.int64(fid))
                    out["qx"].append(np.int64(coords[0][0]))
                    out["qy"].append(np.int64(coords[0][1]))
        return pd.DataFrame(out).astype(np.int64)

    return tiles.map_batches(decode, batch_format="pandas",
                             batch_size=256)


def SQL_MVT_ROUNDTRIP():
    return f"""
SELECT ix // 23040 AS tcx, iy // 23040 AS tcy, ck,
       (ix % 23040) * 4096 // 23040 AS qx,
       (iy % 23040) * 4096 // 23040 AS qy
FROM ({_sql_keyed_points("customer", "c_custkey", 4, 1, "ck")}) _m
"""


def q_basin_stats(sf_dir: str):
    """Zonal statistics over a DERIVED zoning — the composition
    pattern (watershed labels feed a zonal rollup the way the
    reference chains manager ops): per drainage basin (q_watershed's
    pointer-doubled sink labels), exact cell count, total density
    ('runoff mass'), and the peak cell density. The labels table is
    cell-bounded; one bucketed join attaches the density grid, one
    basin-keyed combine rolls up. Oracle composes the full watershed
    CTE chain as a derived table and re-joins the cell counts."""
    pts = points_lineitem(sf_dir)

    def cellify(batch: pa.Table) -> pa.Table:
        ix = batch["ix"].to_numpy(zero_copy_only=False)
        iy = batch["iy"].to_numpy(zero_copy_only=False)
        return pa.table({"cx": pa.array(ix // 8192),
                         "cy": pa.array(iy // 8192)})

    ds = pts.map_batches(cellify, batch_format="pyarrow",
                         batch_size=65536)
    grd = rel.groupby_aggregate(ds, ["cx", "cy"],
                                [("n", "cx", "count")]).materialize()

    labels = q_watershed(sf_dir).map_batches(
        lambda b: pd.DataFrame({
            "cx": b["cx"].to_numpy(np.int64),
            "cy": b["cy"].to_numpy(np.int64),
            "bk": b["basin_x"].to_numpy(np.int64) * (np.int64(1) << 32)
            + b["basin_y"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=65536)
    j = rel.join_large(labels, grd, on=["cx", "cy"], num_buckets=16,
                       native=False)
    out = rel.groupby_aggregate(j, ["bk"],
                                [("n_cells", "n", "count"),
                                 ("mass", "n", "sum"),
                                 ("peak", "n", "max")])

    def unpack(b: pd.DataFrame) -> pd.DataFrame:
        bk = b["bk"].to_numpy(np.int64)
        return pd.DataFrame({
            "basin_x": bk >> 32, "basin_y": bk & ((1 << 32) - 1),
            "n_cells": b["n_cells"].to_numpy(np.int64),
            "mass": b["mass"].to_numpy(np.int64),
            "peak": b["peak"].to_numpy(np.int64)})

    return out.map_batches(unpack, batch_format="pandas",
                           batch_size=65536)


def SQL_BASIN_STATS():
    return f"""
WITH pts2 AS ({SQL_PTS_LINEITEM()}),
g2 AS (SELECT ix // 8192 AS cx, iy // 8192 AS cy,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM pts2 GROUP BY 1, 2)
SELECT w.basin_x, w.basin_y,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(g2.n) AS BIGINT) AS mass,
       CAST(MAX(g2.n) AS BIGINT) AS peak
FROM ({SQL_WATERSHED()}) w
JOIN g2 ON g2.cx = w.cx AND g2.cy = w.cy
GROUP BY w.basin_x, w.basin_y
"""


def q_quant_error(sf_dir: str):
    """int8 embedding-quantization distortion audit (the compression
    step every production ANN index takes before PQ): per vector, the
    self-dot under the ×127 int8 grid vs the ×1000 reference grid,
    and the cleared-denominator distortion |d8·1000² − d1000·127²|
    (zero iff the two grids agree exactly after scale adjustment —
    never, so the column measures true rounding loss). One stateless
    vectorized pass; SQL replays both quantizations with
    list_transform + list_dot_product."""
    emb = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def audit(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = embed._as_matrix(b["embedding"]).astype(np.float64)
        q1000 = np.rint(X * 1000).astype(np.int64)
        q8 = np.rint(X * 127).astype(np.int64)
        d1000 = (q1000 * q1000).sum(axis=1)
        d8 = (q8 * q8).sum(axis=1)
        err = np.abs(d8 * 1000000 - d1000 * 16129)
        return pa.table({"vec_id": pa.array(ids),
                         "d8": pa.array(d8), "d1000": pa.array(d1000),
                         "err": pa.array(err)})

    return emb.map_batches(audit, batch_format="pyarrow",
                           batch_size=65536)


SQL_QUANT_ERROR = """
WITH q AS (SELECT vec_id,
    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v1000,
    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127)) AS v8
  FROM embeddings)
SELECT vec_id,
       CAST(list_dot_product(v8, v8) AS BIGINT) AS d8,
       CAST(list_dot_product(v1000, v1000) AS BIGINT) AS d1000,
       CAST(abs(CAST(list_dot_product(v8, v8) AS BIGINT) * 1000000
                - CAST(list_dot_product(v1000, v1000) AS BIGINT) * 16129)
            AS BIGINT) AS err
FROM q
"""


WEAK_TIE_MAX = 2


def q_weak_ties(sf_dir: str):
    """Weak ties (Granovetter — edges whose endpoints share at most
    {WEAK_TIE_MAX} common neighbors, i.e. low triangle support; the
    classic tie-strength / community-boundary signal; support 0 would
    be a true local bridge): the deduped undirected link graph's
    edges left-joined against graph._truss_support (the ktruss
    wedge+probe machinery — edges in no triangle simply don't appear
    there, so the left join's nulls ARE support 0). Oracle: per-edge
    shared-neighbor COUNT over the doubled adjacency, COALESCEd to 0
    for triangle-free edges."""
    e = _weighted_link_edges(sf_dir).map_batches(
        lambda b: pa.table({"u": b["u"], "v": b["v"]}),
        batch_format="pyarrow", batch_size=65536).materialize()
    from pythongis_ray.graph import _truss_support

    supp = _truss_support(e).map_batches(
        lambda b: pa.table({"u": b["u"], "v": b["v"],
                            "support": b["support"]}),
        batch_format="pyarrow", batch_size=65536)
    j = rel.join_large(e, supp, on=["u", "v"], num_buckets=16,
                       how="left", native=False)

    def keep_weak(b: pd.DataFrame) -> pd.DataFrame:
        s = b["support"].fillna(0).to_numpy(np.int64)
        g = s <= WEAK_TIE_MAX
        return pd.DataFrame({"u": b["u"].to_numpy(np.int64)[g],
                             "v": b["v"].to_numpy(np.int64)[g],
                             "support": s[g]})

    out = j.map_batches(keep_weak, batch_format="pandas",
                        batch_size=65536).materialize()
    if out.count() == 0:
        # Dataset.to_pandas drops the schema of an ALL-empty dataset
        # — hand the driver a typed empty pandas frame instead
        return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64),
                             "support": pd.Series([], dtype=np.int64)})
    return out


def SQL_WEAK_TIES():
    return f"""
WITH {_SQL_WEIGHTED_LINK_EDGES},
adj AS MATERIALIZED (
  SELECT u AS x, v AS y FROM e1 UNION ALL SELECT v, u FROM e1),
sup AS (
  SELECT e1.u, e1.v, COUNT(*) AS c
  FROM e1
  JOIN adj a ON a.x = e1.u
  JOIN adj b ON b.x = e1.v AND b.y = a.y
  GROUP BY e1.u, e1.v)
SELECT e1.u, e1.v,
       CAST(COALESCE(sup.c, 0) AS BIGINT) AS support
FROM e1 LEFT JOIN sup ON sup.u = e1.u AND sup.v = e1.v
WHERE COALESCE(sup.c, 0) <= {WEAK_TIE_MAX}
"""


ST_CC_ROUNDS = 12


def q_st_clusters(sf_dir: str):
    """Spatio-temporal event clusters (the ST-DBSCAN shape: outbreak /
    burst detection over the event point cloud): events pair when
    close in BOTH space (d² ≤ {KNOX_EPS}² — the Knox predicate) and
    time (|Δt| ≤ {KNOX_W_S}s, pruned IN-KERNEL by the pair_filter so
    non-qualifying pairs never leave the tile kernel), then pairs
    merge into connected components (resident-shard hash-min,
    converged). Output (cluster = min event id, n_events) — isolated
    events never pair, so every cluster has ≥ 2 members. Oracle:
    range self-join + {ST_CC_ROUNDS} hash-min/pointer-jump rounds
    (the grid_regions idiom; the converged engine certifies the
    budget)."""
    from pythongis_ray import graph

    ev = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ix, iy = fixtures.geocode_units(eid * 4 + 1)
        return pa.table({"event_id": pa.array(eid), "ix": ix, "iy": iy,
                         "t_s": pa.array(us // 1_000_000)})

    pts = ev.map_batches(prep, batch_format="pyarrow",
                         batch_size=65536).materialize()

    def in_window(d2, ca, cb):
        return np.abs(ca["t_s"] - cb["t_s"]) <= KNOX_W_S

    pairs = spatial.dwithin_self_pairs(pts, "event_id", "ix", "iy",
                                       eps=KNOX_EPS, carry=("t_s",),
                                       pair_filter=in_window)
    edges = pairs.map_batches(
        lambda b: pa.table({"id_a": pc.cast(b["id_a"], pa.int64()),
                            "id_b": pc.cast(b["id_b"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536).materialize()
    cc = graph.connected_components(edges)
    out = rel.groupby_aggregate(
        cc.map_batches(lambda b: pa.table(
            {"cluster": pc.cast(b["component"], pa.int64())}),
            batch_format="pyarrow", batch_size=65536),
        ["cluster"], [("n_events", "cluster", "count")])
    return out.map_batches(
        lambda b: pa.table({
            "cluster": pc.cast(b["cluster"], pa.int64()),
            "n_events": pc.cast(b["n_events"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def SQL_ST_CLUSTERS():
    src = "(SELECT event_id, ts, event_id*4+1 AS gk FROM events)"
    g = fixtures.sql_geocode("gk").replace("__SRC__", src)
    rounds = []
    prev = "l0"
    for r in range(1, ST_CC_ROUNDS + 1):
        rounds.append(f"""
l{r} AS MATERIALIZED (
  SELECT n.k, LEAST(n.m, j.lab2) AS lab FROM
    (SELECT e.k1 AS k, MIN(lp.lab) AS m
     FROM ge2 e JOIN {prev} lp ON lp.k = e.k2 GROUP BY e.k1) n
  JOIN
    (SELECT l1.k, l2.lab AS lab2
     FROM {prev} l1 JOIN {prev} l2 ON l2.k = l1.lab) j
  ON j.k = n.k)""")
        prev = f"l{r}"
    return f"""
WITH ge AS ({g}),
e AS (SELECT event_id, ix, iy, epoch_us(ts) // 1000000 AS s FROM ge),
pe AS MATERIALIZED (
  SELECT a.event_id AS k1, b.event_id AS k2
  FROM e a JOIN e b
    ON a.event_id < b.event_id
   AND (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy)
       <= {KNOX_EPS * KNOX_EPS}
   AND b.s BETWEEN a.s - {KNOX_W_S} AND a.s + {KNOX_W_S}),
nd AS (SELECT DISTINCT k FROM (
  SELECT k1 AS k FROM pe UNION ALL SELECT k2 FROM pe) _n),
ge2 AS MATERIALIZED (
  SELECT k1, k2 FROM pe UNION ALL SELECT k2, k1 FROM pe
  UNION ALL SELECT k, k FROM nd),
l0 AS MATERIALIZED (SELECT k, k AS lab FROM nd),
{",".join(rounds)}
SELECT CAST(lab AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM {prev} GROUP BY lab
"""


GRAM_ROUNDS = 6
GRAM_SHIFT = 20      # normalized eigenvector components ≤ 2^20


def q_gram_power(sf_dir: str):
    """Distributed PCA top direction (the 100-TB dimensionality-
    reduction prep): the Gram matrix of the quantized embedding table
    is a SINGLE streaming pass — each block contributes a dim×dim
    int64 partial (one batched matmul), combined by one tiny
    (dim²-bounded) groupby — then {GRAM_ROUNDS} exact integer power-
    iteration rounds on the driver's dim×dim matrix (Python ints, no
    float drift) with the HITS global-max-divisor normalization
    (v ← v·2^{GRAM_SHIFT} // max|w|, Python FLOOR division). Output
    (dim, v): the dominant eigenvector direction, deterministic from
    the all-ones start. Oracle: unnest → self-join Gram in HUGEINT,
    chained per-round CTEs (AS MATERIALIZED — DuckDB re-evaluates
    multiply-referenced iterative CTEs exponentially otherwise) with
    the negative-numerator CASE emulating floor division."""
    from pythongis_ray.embed import _as_matrix, quantize

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def partial_gram(b: pa.Table) -> pa.Table:
        m = quantize(_as_matrix(b["embedding"]))
        g = m.T @ m                        # int64-exact per block
        d = g.shape[0]
        r, c = np.divmod(np.arange(d * d, dtype=np.int64), d)
        return pa.table({"r": r, "c": c, "g": g.ravel()})

    parts = ds.map_batches(partial_gram, batch_format="pyarrow",
                           batch_size=65536)
    gram = rel.groupby_aggregate(parts, ["r", "c"],
                                 [("g", "g", "sum")]).to_pandas()
    d = int(gram["r"].max()) + 1
    G = [[0] * d for _ in range(d)]
    for r, c, g in zip(gram["r"].to_numpy(np.int64),
                       gram["c"].to_numpy(np.int64),
                       gram["g"].to_numpy(np.int64)):
        G[r][c] = int(g)                   # Python ints: no overflow
    v = [1 << GRAM_SHIFT] * d
    for _ in range(GRAM_ROUNDS):
        w = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [(x << GRAM_SHIFT) // mx for x in w]   # Python floor div
    return pd.DataFrame({"dim": np.arange(d, dtype=np.int64),
                         "v": np.array(v, np.int64)})


def SQL_GRAM_POWER():
    s = 1 << GRAM_SHIFT
    ctes = [f"""e AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS HUGEINT)) AS q
  FROM embeddings),
f AS MATERIALIZED (
  SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) AS i
  FROM e),
g AS MATERIALIZED (
  SELECT a.i AS r, b.i AS c, SUM(a.x * b.x) AS g
  FROM f a JOIN f b ON b.vec_id = a.vec_id GROUP BY a.i, b.i),
v0 AS MATERIALIZED (
  SELECT DISTINCT r AS i, CAST({s} AS HUGEINT) AS v FROM g)"""]
    prev = "v0"
    for k in range(1, GRAM_ROUNDS + 1):
        ctes.append(f"""
w{k} AS MATERIALIZED (
  SELECT g.r AS i, SUM(g.g * v.v) AS w
  FROM g JOIN {prev} v ON v.i = g.c GROUP BY g.r),
m{k} AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w{k}),
v{k} AS MATERIALIZED (
  SELECT i, CASE WHEN w >= 0 THEN (w * {s}) // m
                 ELSE -(((-w) * {s} + m - 1) // m) END AS v
  FROM w{k}, m{k})""")
        prev = f"v{k}"
    return f"""
WITH {",".join(ctes)}
SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(v AS BIGINT) AS v
FROM {prev}
"""


TEMPORAL_MOD = 16     # deterministic edge time t = (src+dst) % 16


def q_temporal_reach(sf_dir: str):
    """Time-respecting earliest arrival from the seed pages
    (page_id % {BFS_SEED_MOD} == 0) over the extracted link graph —
    the temporal-graph reachability primitive (information-diffusion
    / contact-tracing shape; Wu et al. VLDB'14 semantics): an edge
    (u→v, t) can be taken only at t ≥ the current arrival at u, and
    taking it arrives at v AT t (not t+1 — instantaneous traversal),
    so arrivals are minima over monotone-time paths. Edge times are
    the deterministic (src+dst) % {TEMPORAL_MOD} — a pure function of
    the edge, identical in the DuckDB replay. Runs on the resident-
    shard min-fold engine (graph._BfsShard temporal mode — edges
    routed once, rounds exchange pre-combined per-destination
    minima), {BFS_ITERS} synchronous rounds. Oracle: chained
    LEFT-JOIN CTEs with the time-qualifying CASE."""
    from pythongis_ray import graph, pages

    ds = pages.pages_dataset(sf_dir, geocode=False, links=True,
                             columns=["page_id", "html"])
    edges = ds.map_batches(pages.extract_links, batch_format="pyarrow",
                           batch_size=4096)
    out = graph.bfs_actors(edges, src="src_page", dst="dst_page",
                           seed_mod=BFS_SEED_MOD, iters=BFS_ITERS,
                           temporal_mod=TEMPORAL_MOD)
    return out.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b["node"], pa.int64()),
            "arrival": pc.cast(b["dist"], pa.int64())}),
        batch_format="pyarrow", batch_size=65536)


def SQL_TEMPORAL_REACH():
    inf = 1 << 40
    tmod = TEMPORAL_MOD
    head = f"""
WITH e AS MATERIALIZED ({_SQL_PAGE_EDGES}),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
d0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN node % {BFS_SEED_MOD} = 0 THEN 0
                         ELSE {inf} END AS BIGINT) AS dist
  FROM nodes)"""
    step = f""",
d{{k}} AS MATERIALIZED (
  SELECT n.node,
         CAST(LEAST(MIN(dn.dist),
              COALESCE(MIN(CASE
                WHEN (e.src + e.dst) % {tmod} >= ds.dist
                THEN (e.src + e.dst) % {tmod} END), {inf}))
           AS BIGINT) AS dist
  FROM nodes n JOIN d{{p}} dn ON dn.node = n.node
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN d{{p}} ds ON ds.node = e.src
  GROUP BY n.node)"""
    body = "".join(step.format(k=k, p=k - 1)
                   for k in range(1, BFS_ITERS + 1))
    return (head + body
            + f"\nSELECT node, dist AS arrival FROM d{BFS_ITERS}")


REGISTRY: dict[str, tuple] = {
    # (fn, sql-or-None)
    "agg_pricing": (q_agg_pricing, SQL_AGG_PRICING),
    "join_segment": (q_join_segment, SQL_JOIN_SEGMENT),
    "join_large": (q_join_large, SQL_JOIN_LARGE),
    "topk_orders": (q_topk_orders, SQL_TOPK_ORDERS),
    "distinct_flags": (q_distinct_flags, SQL_DISTINCT_FLAGS),
    "dedup_docs": (q_dedup_docs, SQL_DEDUP_DOCS),
    "window_events": (q_window_events, SQL_WINDOW_EVENTS),
    "hopping_window": (q_hopping_window, SQL_HOPPING_WINDOW),
    "embed_neardup": (q_embed_neardup, SQL_EMBED_NEARDUP),
    "moving_avg": (q_moving_avg, SQL_MOVING_AVG),
    "moving_median": (q_moving_median, SQL_MOVING_MEDIAN),
    "moving_concat": (q_moving_concat, SQL_MOVING_CONCAT),
    "majority_events": (q_majority_events, SQL_MAJORITY_EVENTS),
    "merge_union": (q_merge_union, SQL_MERGE_UNION),
    "global_rank": (q_global_rank, SQL_GLOBAL_RANK),
    "running_sum": (q_running_sum, SQL_RUNNING_SUM),
    "quantiles": (q_quantiles, SQL_QUANTILES),
    "filter_revenue": (q_filter_revenue, SQL_FILTER_REVENUE),
    "classify_quantity": (q_classify_quantity, SQL_CLASSIFY_QUANTITY),
    "spjoin_rect_pairs": (q_spjoin_rect_pairs, SQL_SPJOIN_RECT_PAIRS),
    "spjoin_rect_shuffle": (q_spjoin_rect_pairs_shuffle, SQL_SPJOIN_RECT_PAIRS),
    "spjoin_rect_agg": (q_spjoin_rect_agg, SQL_SPJOIN_RECT_AGG),
    "spjoin_diamond": (q_spjoin_diamond, SQL_SPJOIN_DIAMOND),
    "spatial_semi": (q_spatial_semi, SQL_SPATIAL_SEMI),
    "spatial_disjoint": (q_spatial_disjoint, SQL_SPATIAL_DISJOINT),
    "spjoin_left": (q_spjoin_left, SQL_SPJOIN_LEFT),
    "knn": (q_knn, SQL_KNN),
    "dwithin": (q_dwithin, SQL_DWITHIN),
    "crop_points": (q_crop_points, SQL_CROP_POINTS),
    "zonal_stats": (q_zonal_stats, SQL_ZONAL_STATS),
    "upscale": (q_upscale, SQL_UPSCALE),
    "rasterize": (q_rasterize, SQL_RASTERIZE),
    "multiband_stats": (q_multiband_stats, SQL_MULTIBAND_STATS),
    "buffer_join": (q_buffer_join, SQL_BUFFER_JOIN),
    "slope_grid": (q_slope_grid, SQL_SLOPE_GRID),
    "asc_roundtrip": (q_asc_roundtrip, SQL_RASTERIZE),
    "flagship": (q_flagship, SQL_FLAGSHIP),
    "doc_tokens": (q_doc_tokens, SQL_DOC_TOKENS),
    "lm_score": (q_lm_score, SQL_LM_SCORE),
    "gopher_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "search_topk": (q_search_topk, SQL_SEARCH_TOPK),
    "token_regex": (q_token_regex, SQL_TOKEN_REGEX),
    "word_topk": (q_word_topk, SQL_WORD_TOPK),
    "lm_surprisal": (q_lm_surprisal, SQL_LM_SURPRISAL),
    "bpe_tokens": (q_bpe_tokens, None),
    "image_neardup": (q_image_neardup, None),
    "cell_pyramid": (q_cell_pyramid, _sql_cell_pyramid),
    "lang_stats": (q_lang_stats, SQL_LANG_STATS),
    "quality": (q_quality, SQL_QUALITY),
    "doc_topk_chars": (q_doc_topk_chars, SQL_DOC_TOPK_CHARS),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "knn_classify": (q_knn_classify, SQL_KNN_CLASSIFY),
    "embed_label_stats": (q_embed_label_stats, SQL_EMBED_LABEL_STATS),
    "median_events": (q_median_events, SQL_MEDIAN_EVENTS),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "polyjoin": (q_polyjoin, SQL_POLYJOIN),
    "line_join": (q_line_join, SQL_LINE_JOIN),
    "line_crosses": (q_line_crosses, SQL_LINE_CROSSES),
    "line_within": (q_line_within, SQL_LINE_WITHIN),
    "line_line_join": (q_line_line_join, SQL_LINE_LINE_JOIN),
    "line_clip": (q_line_clip, SQL_LINE_CLIP),
    "poly_clip": (q_poly_clip, SQL_POLY_CLIP),
    "rasterize_poly": (q_rasterize_poly, SQL_RASTERIZE_POLY),
    "rasterize_line": (q_rasterize_line, SQL_RASTERIZE_LINE),
    "knn_lines": (q_knn_lines, SQL_KNN_LINES),
    "line_join_shuffle": (q_line_join_shuffle, SQL_LINE_JOIN_SHUFFLE),
    "dwithin_lines": (q_dwithin_lines, SQL_DWITHIN_LINES),
    "poly_clip_diff": (q_poly_clip_diff, SQL_POLY_CLIP_DIFF),
    "poly_clip_union": (q_poly_clip_union, SQL_POLY_CLIP_UNION),
    "dissolve": (q_dissolve, SQL_DISSOLVE),
    "dissolve_poly": (q_dissolve_poly, SQL_DISSOLVE_POLY),
    "dissolve_inter": (q_dissolve_inter, SQL_DISSOLVE_INTER),
    "compute_grouped": (q_compute_grouped, SQL_COMPUTE_GROUPED),
    "join_collapse": (q_join_collapse, SQL_JOIN_COLLAPSE),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "asof_orders": (q_asof_orders, SQL_ASOF_ORDERS),
    "interval_events": (q_interval_events, SQL_INTERVAL_EVENTS),
    "extract_text": (q_extract_text, SQL_EXTRACT_TEXT),
    "url_hosts": (q_url_hosts, SQL_URL_HOSTS),
    "url_canon": (q_url_canon, SQL_URL_CANON),
    "repetition": (q_repetition, SQL_REPETITION),
    "quality_funnel": (q_quality_funnel, SQL_QUALITY_FUNNEL),
    "feature_hash": (q_feature_hash, SQL_FEATURE_HASH),
    "decontam": (q_decontam, SQL_DECONTAM),
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
    "canonical_docs": (q_canonical_docs, SQL_CANONICAL_DOCS),
    "line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT),
    "kmv_by_host": (q_kmv_by_host, SQL_KMV_BY_HOST),
    "dup_spans": (q_dup_spans, SQL_DUP_SPANS),
    "pmi_bigrams": (q_pmi_bigrams, SQL_PMI_BIGRAMS),
    "corpus_build": (q_corpus_build, SQL_CORPUS_BUILD),
    "cms_topk": (q_cms_topk, _sql_cms_topk()),
    "quality_lr": (q_quality_lr, _sql_quality_lr()),
    "url_filter": (q_url_filter, _sql_url_filter()),
    "cdc_shared": (q_cdc_shared, _sql_cdc_shared()),
    "pack_shards": (q_pack_shards, SQL_PACK_SHARDS),
    "embed_clusters": (q_embed_clusters, SQL_EMBED_CLUSTERS),
    "semdedup": (q_semdedup, SQL_SEMDEDUP),
    "reproject_x": (q_reproject_x, SQL_REPROJECT_X_F),
    "simhash_pairs": (q_simhash_pairs, SQL_SIMHASH_PAIRS),
    "minhash_pairs": (q_minhash_pairs, SQL_MINHASH_PAIRS),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "simhash": (q_simhash, SQL_SIMHASH),
    "langid": (q_langid, SQL_LANGID),
    "ann_lsh": (q_ann_lsh, _sql_ann_lsh),
    "ann_ivf": (q_ann_ivf, None),
    "ann_ivf_int": (q_ann_ivf_int, _sql_ann_ivf_int),
    "geodetic_buffer": (q_geodetic_buffer, None),
    "reproject_utm": (q_reproject_utm, None),
    "geodetic_area": (q_geodetic_area, None),
    "resample_bilinear": (q_resample_bilinear, None),
    "warp_mercator": (q_warp_mercator, None),
    "warp_utm": (q_warp_utm, None),
    "reproject_conic": (q_reproject_conic, None),
    "warp_albers": (q_warp_albers, None),
    "dedup_near_embed": (q_dedup_near_embed, SQL_DEDUP_NEAR_EMBED),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "gpkg_roundtrip": (q_gpkg_roundtrip, SQL_GPKG_ROUNDTRIP),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "link_graph": (q_link_graph, SQL_LINK_GRAPH),
    "pagerank": (q_pagerank, _sql_pagerank),
    "hits": (q_hits, _sql_hits),
    "trustrank": (q_trustrank, _sql_trustrank),
    "cocitation": (q_cocitation, SQL_COCITATION),
    "host_top_pages": (q_host_top_pages, _sql_host_top_pages),
    "neighbor_agg": (q_neighbor_agg, SQL_NEIGHBOR_AGG),
    "kcore": (q_kcore, _sql_kcore),
    "communities": (q_communities, _sql_lpa),
    "link_distance": (q_link_distance, _sql_bfs),
    "random_walks": (q_random_walks, _sql_random_walks),
    "resolve_redirects": (q_resolve_redirects, _sql_resolve_redirects),
    "walk_skipgrams": (q_walk_skipgrams, _sql_walk_skipgrams),
    "pagerank_hosts": (q_pagerank_hosts,
                       lambda: _sql_pagerank(edges_sql=_SQL_HOST_EDGES)),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "host_cap": (q_host_cap, SQL_HOST_CAP),
    "host_report": (q_host_report, _sql_host_report),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "split_holdout": (q_split_holdout, SQL_SPLIT_HOLDOUT),
    "shuffle_shards": (q_shuffle_shards, SQL_SHUFFLE_SHARDS),
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "phrase_search": (q_phrase_search, SQL_PHRASE_SEARCH),
    "bloom_semijoin": (q_bloom_semijoin, SQL_BLOOM_SEMIJOIN),
    "windowed_distinct": (q_windowed_distinct, SQL_WINDOWED_DISTINCT),
    "proximity": (q_proximity, SQL_PROXIMITY),
    "related_pages": (q_related_pages, SQL_RELATED_PAGES),
    "pq_topk": (q_pq_topk, _sql_pq_topk()),
    "weighted_distance": (q_weighted_distance, _sql_bfs_weighted()),
    "hll_hosts": (q_hll_hosts, SQL_HLL_HOSTS),
    "mutual_links": (q_mutual_links, SQL_MUTUAL_LINKS),
    "scc_hosts": (q_scc_hosts, _sql_scc()),
    "quality_gate": (q_quality_gate, SQL_QUALITY_GATE),
    "crawl_diff": (q_crawl_diff, SQL_CRAWL_DIFF),
    "transitions": (q_transitions, SQL_TRANSITIONS),
    "funnel": (q_funnel, SQL_FUNNEL),
    "retention": (q_retention, SQL_RETENTION),
    "rollup_cube": (q_rollup_cube, SQL_ROLLUP_CUBE),
    "regress_hour": (q_regress_hour, SQL_REGRESS_HOUR),
    "skyline": (q_skyline, SQL_SKYLINE),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "adamic_adar": (q_adamic_adar, SQL_ADAMIC_ADAR),
    "zorder_shards": (q_zorder_shards, _sql_zorder_shards),
    "mad_events": (q_mad_events, SQL_MAD_EVENTS),
    "typo_pairs": (q_typo_pairs, SQL_TYPO_PAIRS),
    "delta_encode": (q_delta_encode, SQL_DELTA_ENCODE),
    "percentile_rank": (q_percentile_rank, SQL_PERCENTILE_RANK),
    "interval_overlap": (q_interval_overlap, SQL_INTERVAL_OVERLAP),
    "twap": (q_twap, SQL_TWAP),
    "host_overlap": (q_host_overlap, SQL_HOST_OVERLAP),
    "flow_acc": (q_flow_acc, _sql_flow_acc),
    "histogram": (q_histogram, SQL_HISTOGRAM),
    "describe_stats": (q_describe_stats, SQL_DESCRIBE_STATS),
    "mosaic": (q_mosaic, _sql_mosaic),
    "concat_events": (q_concat_events, SQL_CONCAT_EVENTS),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "upsert_merge": (q_upsert_merge, SQL_UPSERT_MERGE),
    "basket_pairs": (q_basket_pairs, SQL_BASKET_PAIRS),
    "areal_interp": (q_areal_interp, SQL_AREAL_INTERP),
    "smooth_grid": (q_smooth_grid, SQL_SMOOTH_GRID),
    "dist_cells": (q_dist_cells, SQL_DIST_CELLS),
    "indexed_search": (q_indexed_search, SQL_SEARCH_TOPK),
    "ohlc_bars": (q_ohlc_bars, SQL_OHLC_BARS),
    "global_median": (q_global_median, SQL_GLOBAL_MEDIAN),
    "gini": (q_gini, SQL_GINI),
    "host_entropy": (q_host_entropy, SQL_HOST_ENTROPY),
    "ab_test": (q_ab_test, SQL_AB_TEST),
    "profile_events": (q_profile_events, SQL_PROFILE_EVENTS),
    "q3_revenue": (q_q3_revenue, SQL_Q3_REVENUE),
    "q5_region": (q_q5_region, SQL_Q5_REGION),
    "drawdown": (q_drawdown, SQL_DRAWDOWN),
    "bounce_rate": (q_bounce_rate, SQL_BOUNCE_RATE),
    "ntile10": (q_ntile10, SQL_NTILE10),
    "pivot_hours": (q_pivot_hours, SQL_PIVOT_HOURS),
    "daily_growth": (q_daily_growth, SQL_DAILY_GROWTH),
    "top_hours": (q_top_hours, SQL_TOP_HOURS),
    "streaks": (q_streaks, SQL_STREAKS),
    "above_mean": (q_above_mean, SQL_ABOVE_MEAN),
    "q4_priority": (q_q4_priority, SQL_Q4_PRIORITY),
    "q10_returns": (q_q10_returns, SQL_Q10_RETURNS),
    "q18_large": (q_q18_large, SQL_Q18_LARGE),
    "tri_grid": (q_tri_grid, SQL_TRI_GRID),
    "focal_majority": (q_focal_majority, SQL_FOCAL_MAJORITY),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "nb_lang": (q_nb_lang, SQL_NB_LANG),
    "dup_shingles": (q_dup_shingles, SQL_DUP_SHINGLES),
    "moran_i": (q_moran, SQL_MORAN),
    "convex_hull": (q_convex_hull, SQL_CONVEX_HULL),
    "tree_rollup": (q_tree_rollup, SQL_TREE_ROLLUP),
    "autocorr": (q_autocorr, SQL_AUTOCORR),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
    "late_events": (q_late_events, SQL_LATE_EVENTS),
    "min_circle": (q_mec, SQL_MEC),
    "contours": (q_contours, SQL_CONTOURS),
    "grid_regions": (q_grid_regions, SQL_GRID_REGIONS),
    "region_stats": (q_region_stats, SQL_REGION_STATS),
    "zone_diameter": (q_zone_diameter, SQL_ZONE_DIAMETER),
    "zone_width": (q_zone_width, SQL_ZONE_WIDTH),
    "set_cover": (q_set_cover, SQL_SET_COVER),
    "od_matrix": (q_od_matrix, SQL_OD_MATRIX),
    "hexbin": (q_hexbin, SQL_HEXBIN),
    "radius_gyration": (q_radius_gyration, SQL_RADIUS_GYRATION),
    "stay_points": (q_stay_points, SQL_STAY_POINTS),
    "map_match": (q_map_match, SQL_MAP_MATCH),
    "render_density": (q_render_density, SQL_RENDER_DENSITY),
    "render_zones": (q_render_zones, SQL_RENDER_ZONES),
    "img_hosts": (q_img_hosts, SQL_IMG_HOSTS),
    "media_pixels": (q_media_pixels, SQL_MEDIA_PIXELS),
    "media_audio": (q_media_audio, SQL_MEDIA_AUDIO),
    "media_frames": (q_media_frames, SQL_MEDIA_FRAMES),
    "quadtree_leaves": (q_quadtree_leaves, SQL_QUADTREE),
    "st_trend": (q_st_trend, SQL_ST_TREND),
    "gi_star": (q_gi_star, SQL_GI_STAR),
    "haar_pyramid": (q_haar_pyramid, SQL_HAAR),
    "basket_triples": (q_basket_triples, SQL_BASKET_TRIPLES),
    "outliers": (q_outliers, SQL_OUTLIERS),
    "changepoint": (q_changepoint, SQL_CHANGEPOINT),
    "chunk_docs": (q_chunk_docs, SQL_CHUNK_DOCS),
    "common_span": (q_common_span, SQL_COMMON_SPAN),
    "morph_open": (q_morph_open, SQL_MORPH_OPEN),
    "line_of_sight": (q_line_of_sight, SQL_LINE_OF_SIGHT),
    "winsor_mean": (q_winsor_mean, SQL_WINSOR_MEAN),
    "capacity_assign": (q_capacity_assign, SQL_CAPACITY_ASSIGN),
    "flow_raster": (q_flow_raster, SQL_FLOW_RASTER),
    "kd_partition": (q_kd_partition, SQL_KD_PARTITION),
    "rrf_fuse": (q_rrf_fuse, SQL_RRF_FUSE),
    "hash_ring": (q_hash_ring, SQL_HASH_RING),
    "skyline_depth": (q_skyline_depth, SQL_SKYLINE_DEPTH),
    "flow_direction": (q_flow_direction, SQL_FLOW_DIRECTION),
    "ppjoin": (q_ppjoin, SQL_PPJOIN),
    "snm_pairs": (q_snm_pairs, SQL_SNM_PAIRS),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "ktruss": (q_ktruss, _sql_ktruss),
    "voronoi_cells": (q_voronoi_cells, SQL_VORONOI_CELLS),
    "item_cosine": (q_item_cosine, SQL_ITEM_COSINE),
    "clustering_coeff": (q_clustering_coeff, _sql_clustering_coeff),
    "containment": (q_containment, SQL_CONTAINMENT),
    "crawl_budget": (q_crawl_budget, SQL_CRAWL_BUDGET),
    "landmark_dist": (q_landmark_dist, _sql_landmark_dist),
    "ann_recall": (q_ann_recall, _sql_ann_recall),
    "two_hop": (q_two_hop, _sql_two_hop),
    "cost_distance": (q_cost_distance, SQL_COST_DISTANCE),
    "interval_union": (q_interval_union, SQL_INTERVAL_UNION),
    "decay_score": (q_decay_score, SQL_DECAY_SCORE),
    "quad_fit": (q_quad_fit, SQL_QUAD_FIT),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "mannwhitney": (q_mannwhitney, SQL_MANNWHITNEY),
    "good_turing": (q_good_turing, SQL_GOOD_TURING),
    "modularity": (q_modularity, _sql_modularity),
    "label_compact": (q_label_compact, SQL_LABEL_COMPACT),
    "fd_check": (q_fd_check, SQL_FD_CHECK),
    "type_overlap": (q_type_overlap, SQL_TYPE_OVERLAP),
    "mutual_nn": (q_mutual_nn, SQL_MUTUAL_NN),
    "pseudonymize": (q_pseudonymize, SQL_PSEUDONYMIZE),
    "laplacian": (q_laplacian, SQL_LAPLACIAN),
    "rfm_segments": (q_rfm_segments, SQL_RFM_SEGMENTS),
    "weighted_median": (q_weighted_median, SQL_WEIGHTED_MEDIAN),
    "dau_stickiness": (q_dau_stickiness, SQL_DAU_STICKINESS),
    "cohort_ltv": (q_cohort_ltv, SQL_COHORT_LTV),
    "seq_pattern": (q_seq_pattern, SQL_SEQ_PATTERN),
    "price_band": (q_price_band, SQL_PRICE_BAND),
    "dbscan": (q_dbscan, SQL_DBSCAN),
    "ripley_k": (q_ripley_k, SQL_RIPLEY_K),
    "robots_filter": (q_robots_filter, SQL_ROBOTS_FILTER),
    "co_presence": (q_co_presence, SQL_CO_PRESENCE),
    "traj_hausdorff": (q_traj_hausdorff, SQL_TRAJ_HAUSDORFF),
    "assortativity": (q_assortativity, SQL_ASSORTATIVITY),
    "rich_club": (q_rich_club, SQL_RICH_CLUB),
    "impossible_travel": (q_impossible_travel, SQL_IMPOSSIBLE_TRAVEL),
    "watershed": (q_watershed, SQL_WATERSHED),
    "benford": (q_benford, SQL_BENFORD),
    "attribution": (q_attribution, SQL_ATTRIBUTION),
    "geohash_cells": (q_geohash_cells, SQL_GEOHASH_CELLS),
    "lisa_quadrants": (q_lisa_quadrants, SQL_LISA_QUADRANTS),
    "fill_sinks": (q_fill_sinks, SQL_FILL_SINKS),
    "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "reproject_moll": (q_reproject_moll, None),
    "move_octants": (q_move_octants, SQL_MOVE_OCTANTS),
    "peaks": (q_peaks, SQL_PEAKS),
    "colocation": (q_colocation, SQL_COLOCATION),
    "lang_skew": (q_lang_skew, SQL_LANG_SKEW),
    "winnow_fps": (q_winnow_fps, SQL_WINNOW_FPS),
    "postings_bytes": (q_postings_bytes, SQL_POSTINGS_BYTES),
    "g_function": (q_g_function, SQL_G_FUNCTION),
    "arrival_gaps": (q_arrival_gaps, SQL_ARRIVAL_GAPS),
    "path_trigrams": (q_path_trigrams, SQL_PATH_TRIGRAMS),
    "sde_moments": (q_sde_moments, SQL_SDE_MOMENTS),
    "forecast_error": (q_forecast_error, SQL_FORECAST_ERROR),
    "ring_rebalance": (q_ring_rebalance, SQL_RING_REBALANCE),
    "distance_decay": (q_distance_decay, SQL_DISTANCE_DECAY),
    "mann_kendall": (q_mann_kendall, SQL_MANN_KENDALL),
    "knox_counts": (q_knox_counts, SQL_KNOX_COUNTS),
    "nn_crossval": (q_nn_crossval, SQL_NN_CROSSVAL),
    "obb_zones": (q_obb_zones, SQL_OBB_ZONES),
    "sqlish_pipeline": (q_sqlish_pipeline, SQL_SQLISH_PIPELINE),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "l_diversity": (q_l_diversity, SQL_L_DIVERSITY),
    "access_2sfca": (q_access_2sfca, SQL_ACCESS_2SFCA),
    "huff_capture": (q_huff_capture, SQL_HUFF_CAPTURE),
    "attack_robustness": (q_attack_robustness, SQL_ATTACK_ROBUSTNESS),
    "linear_ref": (q_linear_ref, SQL_LINEAR_REF),
    "home_work": (q_home_work, SQL_HOME_WORK),
    "triad_census": (q_triad_census, SQL_TRIAD_CENSUS),
    "burstiness": (q_burstiness, SQL_BURSTINESS),
    "simpson_diversity": (q_simpson_diversity, SQL_SIMPSON_DIVERSITY),
    "rbo_rankings": (q_rbo_rankings, SQL_RBO_RANKINGS),
    "kendall_tau": (q_kendall_tau, SQL_KENDALL_TAU),
    "theilsen_daily": (q_theilsen_daily, SQL_THEILSEN_DAILY),
    "stl_daily": (q_stl_daily, SQL_STL_DAILY),
    "clamped_balance": (q_clamped_balance, SQL_CLAMPED_BALANCE),
    "bootstrap_means": (q_bootstrap_means, SQL_BOOTSTRAP_MEANS),
    "rle_sessions": (q_rle_sessions, SQL_RLE_SESSIONS),
    "place_graph": (q_place_graph, SQL_PLACE_GRAPH),
    "label_nms": (q_label_nms, SQL_LABEL_NMS),
    "kde_epanechnikov": (q_kde_epanechnikov, SQL_KDE_EPANECHNIKOV),
    "persistent_hotspots": (q_persistent_hotspots,
                            SQL_PERSISTENT_HOTSPOTS),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "wasserstein_1d": (q_wasserstein_1d, SQL_WASSERSTEIN_1D),
    "discrete_1mean": (q_discrete_1mean, SQL_DISCRETE_1MEAN),
    "kcenter_greedy": (q_kcenter_greedy, SQL_KCENTER_GREEDY),
    "concentration": (q_concentration, SQL_CONCENTRATION),
    "variogram": (q_variogram, SQL_VARIOGRAM),
    "cut_conductance": (q_cut_conductance, SQL_CUT_CONDUCTANCE),
    "visitor_mix": (q_visitor_mix, SQL_VISITOR_MIX),
    "calibration": (q_calibration, SQL_CALIBRATION),
    "auc_inputs": (q_auc_inputs, SQL_AUC_INPUTS),
    "lang_confusion": (q_lang_confusion, SQL_LANG_CONFUSION),
    "gapfill_daily": (q_gapfill_daily, SQL_GAPFILL_DAILY),
    "punchcard": (q_punchcard, SQL_PUNCHCARD),
    "explore_return": (q_explore_return, SQL_EXPLORE_RETURN),
    "sfc_locality": (q_sfc_locality, SQL_SFC_LOCALITY),
    "explore_curve": (q_explore_curve, SQL_EXPLORE_CURVE),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "shp_roundtrip": (q_shp_roundtrip, SQL_SHP_ROUNDTRIP),
    "band_math_grid": (q_band_math_grid, SQL_BAND_MATH_GRID),
    "simplify_vw": (q_simplify_vw, SQL_SIMPLIFY_VW),
    "poly_centroids": (q_poly_centroids, SQL_POLY_CENTROIDS),
    "hillshade": (q_hillshade, SQL_HILLSHADE),
    "yule_k": (q_yule_k, SQL_YULE_K),
    "t_closeness": (q_t_closeness, SQL_T_CLOSENESS),
    "km_inputs": (q_km_inputs, SQL_KM_INPUTS),
    "mmr_select": (q_mmr_select, SQL_MMR_SELECT),
    "dom_depth": (q_dom_depth, SQL_DOM_DEPTH),
    "idw_cells": (q_idw_cells, SQL_IDW_CELLS),
    "katz": (q_katz, SQL_KATZ),
    "join_counts": (q_join_counts, SQL_JOIN_COUNTS),
    "cross_corr": (q_cross_corr, SQL_CROSS_CORR),
    "matching": (q_matching, SQL_MATCHING),
    "boruvka": (q_boruvka, SQL_BORUVKA),
    "stream_order": (q_stream_order, _sql_stream_order),
    "cell_coverage": (q_cell_coverage, SQL_CELL_COVERAGE),
    "recode_grid": (q_recode_grid, SQL_RECODE_GRID),
    "feather_roundtrip": (q_feather_roundtrip, _sql_columnar_roundtrip),
    "orc_roundtrip": (q_orc_roundtrip, _sql_columnar_roundtrip),
    "spearman": (q_spearman, SQL_SPEARMAN),
    "gpx_roundtrip": (q_gpx_roundtrip, SQL_GPX_ROUNDTRIP),
    "poly_cover": (q_poly_cover, SQL_POLY_COVER),
    "avro_roundtrip": (q_avro_roundtrip, _sql_columnar_roundtrip),
    "scd2": (q_scd2, SQL_SCD2),
    "line_intersections": (q_line_intersections, SQL_LINE_INTERSECTIONS),
    "walk_edge_load": (q_walk_edge_load, _sql_walk_edge_load),
    "compress_ratio": (q_compress_ratio, None),
    "bfs_parents": (q_bfs_parents, _sql_bfs_parents),
    "mvt_roundtrip": (q_mvt_roundtrip, SQL_MVT_ROUNDTRIP),
    "basin_stats": (q_basin_stats, SQL_BASIN_STATS),
    "quant_error": (q_quant_error, SQL_QUANT_ERROR),
    "weak_ties": (q_weak_ties, SQL_WEAK_TIES),
    "st_clusters": (q_st_clusters, SQL_ST_CLUSTERS),
    "gram_power": (q_gram_power, SQL_GRAM_POWER),
    "temporal_reach": (q_temporal_reach, SQL_TEMPORAL_REACH),
}


def get_queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def get_oracle_sql():
    out = {}
    for name, (_, sql) in REGISTRY.items():
        if sql is None:
            continue
        out[name] = sql() if callable(sql) else sql
    return out
