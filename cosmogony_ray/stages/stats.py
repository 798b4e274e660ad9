"""CosmogonyStats aggregates (A2, /root/reference/cosmogony/src/model.rs:29-47
+ error counters filled during typing, /root/reference/src/lib.rs:146-181).

Implemented as Ray Data grouped counts (small shuffles over the zones table)."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def _count_by(ds: rd.Dataset, col: str) -> dict:
    out = {}
    for row in ds.select_columns([col]).groupby(col).count().take_all():
        out[row[col]] = row["count()"]
    return out


def compute_stats(final_zones: rd.Dataset, typed_zones: rd.Dataset | None = None) -> dict:
    """final_zones: post-cleanup; typed_zones (pre-cleanup, with type_status)
    feeds the error counters."""
    stats = {
        "level_counts": _count_by(final_zones, "admin_level"),
        "zone_type_counts": _count_by(final_zones, "zone_type"),
    }
    wiki = final_zones.map_batches(
        lambda t: pa.table(
            {
                "admin_level": t["admin_level"],
                "has_wiki": pa.compute.is_valid(t["wikidata"]),
            }
        ),
        batch_format="pyarrow",
    )
    wd = {}
    for row in wiki.groupby("admin_level").sum("has_wiki").take_all():
        wd[row["admin_level"]] = int(row["sum(has_wiki)"])
    stats["wikidata_counts"] = wd
    if typed_zones is not None and "type_status" in typed_zones.schema().names:
        st = typed_zones.select_columns(["type_status", "country_code", "admin_level"])
        stats["zone_without_country"] = sum(
            v for k, v in _count_by(st, "type_status").items() if k == "no_country"
        )
        bad = st.map_batches(
            lambda t: t.filter(
                pa.compute.equal(pa.compute.fill_null(t["type_status"], ""), "invalid_country")
            ),
            batch_format="pyarrow",
        )
        stats["zone_with_unknown_country_rules"] = _count_by(bad, "country_code")
        unk = st.map_batches(
            lambda t: t.filter(
                pa.compute.equal(pa.compute.fill_null(t["type_status"], ""), "unknown_level")
            ),
            batch_format="pyarrow",
        )
        per = {}
        for row in unk.groupby(["country_code", "admin_level"]).count().take_all():
            per.setdefault(row["country_code"], {})[row["admin_level"]] = row["count()"]
        stats["unhandled_admin_level"] = per
    return stats
