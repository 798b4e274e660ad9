"""Driver contract for the cosmogony_ray engine.

``entry()``: flagship pipeline (mini-lux cosmogony build + doc-span geotag)
on sf0.001. ``queries()``: one entry per implemented operator/pipeline from
SURVEY.md §2, each ``sf_dir → Dataset/DataFrame/Table``. ``oracle_sql()``:
DuckDB-equivalent SQL per query (geospatial oracles are exact relational
formulations over the rect-world literals, cosmogony_ray/oracle.py).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().

Float policy for oracle parity: monetary aggregates are summed as int64
cents (``floor(x*100+0.5)``) so Ray-side and DuckDB-side sums are bit-equal
regardless of summation order.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

FIXTURE_DIR = "/tmp/cosmogony_ray_fixture/mini_lux"

_CACHE: dict[str, Any] = {}


def _fixture_dir() -> str:
    from cosmogony_ray.fixtures.synth import write_mini_lux

    if not os.path.exists(os.path.join(FIXTURE_DIR, "expected_zones.parquet")):
        write_mini_lux(FIXTURE_DIR, n_docs=200)
    return FIXTURE_DIR


def _cosmo():
    """Build (and cache) the mini-lux cosmogony once per process."""
    if "cosmo" not in _CACHE:
        from cosmogony_ray.config import EngineConfig
        from cosmogony_ray.pipelines.cosmogony import build_cosmogony

        d = _fixture_dir()
        cfg = EngineConfig(rules_dir=os.path.join(d, "rules"))
        _CACHE["cfg"] = cfg
        _CACHE["cosmo"] = build_cosmogony(d, cfg, with_stats=False)
    return _CACHE["cosmo"]


def _boundary_zones_df() -> pd.DataFrame:
    if "zdf" not in _CACHE:
        _CACHE["zdf"] = _cosmo().zones.to_pandas()
    return _CACHE["zdf"]


# --------------------------------------------------------------- geospatial


def _q_inclusion_edges(sf_dir: str):
    return _cosmo().edges.select_columns(["child", "parent"])


def _q_zone_parents(sf_dir: str):
    df = _boundary_zones_df()
    out = df[df["boundary_wkb"].notna()][["osm_id", "parent"]].copy()
    return pa.table(
        {"osm_id": out["osm_id"].tolist(), "parent": out["parent"].tolist()}
    )


def _q_zone_type_counts(sf_dir: str):
    df = _boundary_zones_df()
    out = (
        df[df["boundary_wkb"].notna()]
        .groupby("zone_type", as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    return pa.table({"zone_type": out["zone_type"].tolist(), "n": out["n"].astype("int64").tolist()})


def _q_zone_labels(sf_dir: str):
    df = _boundary_zones_df()
    return pa.table({"osm_id": df["osm_id"].tolist(), "label": df["label"].tolist()})


def _docs_with_points(sf_dir: str) -> rd.Dataset:
    """documents.parquet → interleaved-doc table (doc_id, spans) with one
    text span per doc embedding the md5-derived point at full precision."""
    from cosmogony_ray.functions.geocode import doc_points

    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        lons, lats = doc_points(ids)
        spans = [
            [{"kind": "text", "text": f"doc {i} @{lon!r},{lat!r}", "media_ref": "", "offset": 0}]
            for i, lon, lat in zip(ids, lons, lats)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "spans": pa.array(spans, type=pa.list_(span_t)),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(mk, batch_format="pyarrow")


def _q_geotag_docs(sf_dir: str):
    from cosmogony_ray.stages.geotag import build_zone_index, geotag_docs

    cosmo = _cosmo()
    if "zindex" not in _CACHE:
        _CACHE["zindex"] = build_zone_index(cosmo.zones, _CACHE["cfg"])
    tagged = geotag_docs(_docs_with_points(sf_dir), _CACHE["zindex"], _CACHE["cfg"])

    def flat(t: pa.Table) -> pa.Table:
        tiles = t["tiles"].combine_chunks()
        first = pc.list_element(tiles, 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "zone_osm_id": pc.struct_field(first, "zone_osm_id"),
            }
        )

    return tagged.map_batches(flat, batch_format="pyarrow")


# --------------------------------------------------------------- relational


def _cents(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0 + 0.5).astype(np.int64)


def _q_q1_pricing(sf_dir: str):
    from cosmogony_ray.functions.relops import partial_groupby_sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"].cast(pa.int64()),
                "base_cents": _cents(price),
                "disc_e4": np.floor(price * (1.0 - disc) * 10000.0 + 0.5).astype(np.int64),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return partial_groupby_sum(
        prepped,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": "qty", "sum_base_cents": "base_cents", "sum_disc_e4": "disc_e4"},
        counts="count_order",
    )


def _q_q3_top_orders(sf_dir: str):
    from cosmogony_ray.functions.joins import hash_join
    from cosmogony_ray.functions.relops import partial_groupby_sum, top_k

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "rev_e4": np.floor(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
                    * 10000.0
                    + 0.5
                ).astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )
    co = hash_join(
        orders,
        cust.map_batches(
            lambda t: t.rename_columns(["o_custkey"]), batch_format="pyarrow"
        ),
        "o_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    ).select_columns(["o_orderkey"])
    rev = partial_groupby_sum(li, ["o_orderkey"], {"revenue_e4": "rev_e4"})
    joined = hash_join(
        rev,
        co.map_batches(
            lambda t: t.append_column("keep", pa.array([True] * t.num_rows)),
            batch_format="pyarrow",
        ),
        "o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("revenue_e4", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("keep", pa.bool_())]),
    ).select_columns(["o_orderkey", "revenue_e4"])
    return top_k(joined, ["revenue_e4", "o_orderkey"], 10, descending=True)


def _q_events_by_type(sf_dir: str):
    from cosmogony_ray.functions.relops import partial_groupby_sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    ).map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "value_cents": _cents(t["value"].to_numpy(zero_copy_only=False))}
        ),
        batch_format="pyarrow",
    )
    return partial_groupby_sum(
        ds, ["event_type"], {"sum_value_cents": "value_cents"}, counts="n"
    )


def _q_top_customers(sf_dir: str):
    from cosmogony_ray.functions.joins import hash_join
    from cosmogony_ray.functions.relops import partial_groupby_sum, top_k

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["o_custkey"],
                "total_cents": _cents(t["o_totalprice"].to_numpy(zero_copy_only=False)),
            }
        ),
        batch_format="pyarrow",
    )
    per_cust = partial_groupby_sum(orders, ["c_custkey"], {"sum_total_cents": "total_cents"})
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    joined = hash_join(
        per_cust,
        cust,
        "c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("sum_total_cents", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )
    return top_k(joined, ["sum_total_cents", "c_custkey"], 10, descending=True)


# ------------------------------------------------------------------ contract


def entry() -> Any:
    """Flagship: cosmogony build + geotag of sf0.001-derived interleaved docs
    → flat tile assignments."""
    return _q_geotag_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "inclusion_edges": _q_inclusion_edges,
        "zone_parents": _q_zone_parents,
        "zone_type_counts": _q_zone_type_counts,
        "zone_labels": _q_zone_labels,
        "geotag_docs": _q_geotag_docs,
        "q1_pricing_summary": _q_q1_pricing,
        "q3_top_orders": _q_q3_top_orders,
        "events_by_type": _q_events_by_type,
        "top_customers": _q_top_customers,
    }


def oracle_sql() -> dict[str, str]:
    from cosmogony_ray import oracle
    from cosmogony_ray.fixtures.synth import expected_zones

    ez = expected_zones()
    label_vals = ", ".join(
        "({!r}, {!r})".format(o, l)
        for o, l in zip(ez["osm_id"].to_pylist(), ez["label"].to_pylist())
        if o.startswith("relation:")
    ).replace('"', "'")
    # node:6002 is boundary-less but still labeled; zone_labels covers ALL
    # final zones, so include it
    node_rows = [
        (o, l)
        for o, l in zip(ez["osm_id"].to_pylist(), ez["label"].to_pylist())
        if o.startswith("node:")
    ]
    if node_rows:
        label_vals += ", " + ", ".join(
            "({!r}, {!r})".format(o, l) for o, l in node_rows
        ).replace('"', "'")

    return {
        "inclusion_edges": oracle.sql_inclusion_edges(),
        "zone_parents": oracle.sql_zone_parents(),
        "zone_type_counts": oracle.sql_zone_type_counts(),
        "zone_labels": f"SELECT * FROM (VALUES {label_vals}) AS t(osm_id, label)",
        "geotag_docs": oracle.sql_geotag_docs(),
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
       SUM(CAST(FLOOR(l_extendedprice*100.0 + 0.5) AS BIGINT)) AS sum_base_cents,
       SUM(CAST(FLOOR(l_extendedprice*(1.0-l_discount)*10000.0 + 0.5) AS BIGINT)) AS sum_disc_e4,
       COUNT(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "q3_top_orders": """
SELECT o_orderkey,
       SUM(CAST(FLOOR(l_extendedprice*(1.0-l_discount)*10000.0 + 0.5) AS BIGINT)) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue_e4 DESC, o_orderkey DESC
LIMIT 10
""",
        "events_by_type": """
SELECT event_type,
       SUM(CAST(FLOOR(value*100.0 + 0.5) AS BIGINT)) AS sum_value_cents,
       COUNT(*)::BIGINT AS n
FROM events GROUP BY event_type
""",
        "top_customers": """
SELECT c.c_custkey,
       SUM(CAST(FLOOR(o_totalprice*100.0 + 0.5) AS BIGINT)) AS sum_total_cents,
       ANY_VALUE(c_name) AS c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
ORDER BY sum_total_cents DESC, c_custkey DESC
LIMIT 10
""",
    }
