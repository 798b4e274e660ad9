"""Zone typing: country resolution + libpostal-style rules (actor pool).

The Ray-Data re-expression of ``type_zones`` (/root/reference/src/lib.rs:110-184):

1. ``attach_ancestors``: inclusion edges → per-zone ancestor list, ordered by
   (parent_area asc, parent_osm_id) — the engine's deterministic replacement
   for the reference's R-tree iteration order (SURVEY §7.4 "ordering/tie-break
   determinism"); most-specific ancestor first.
2. ``_typer_fn`` stateless-task stage: rules parsed once on the driver
   (ST1), broadcast with the country map (ST2) and cached per worker; per row:
   country = forced ``cfg.country_code`` (lib.rs:97-108) else
   max-admin-level country over ancestors∪self; then rules lookup.
   Outcomes mirror lib.rs:146-181:
   - ok            → zone_type := rule type, country_code := country
   - no_country    → untouched (stats: zone_without_country)
   - invalid_country → country_code set, type untouched
   - unknown_level → country_code set, type untouched (node zones keep their
     place-tag type and survive; untyped relations are filtered later)
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.joins import hash_join
from ..functions.shuffle import grouped_map
from ..model import ZONE_SCHEMA
from ..state.country import COUNTRY_CODE_TAG, CountryFinder
from ..state.rules import ZoneTyper

ANCESTORS_T = pa.list_(pa.string())


_ANC_SCHEMA = pa.schema([("osm_id", pa.string()), ("ancestors", pa.list_(pa.string()))])


def _collect_ancestors(key: tuple, group: pa.Table) -> pa.Table:
    g = group.sort_by([("parent_area", "ascending"), ("parent", "ascending")])
    return pa.table(
        {
            "osm_id": pa.array([key[0]], type=pa.string()),
            "ancestors": pa.array([g["parent"].to_pylist()], type=ANCESTORS_T),
        },
        schema=_ANC_SCHEMA,
    )


def attach_ancestors(
    zones: rd.Dataset, edges: rd.Dataset, left_schema: pa.Schema | None = None
) -> rd.Dataset:
    """``left_schema`` lets a caller join a THIN projection of the zone
    table (defaulting to ZONE_SCHEMA would make the join pad every missing
    zone column with nulls). No in-tree caller passes it today — the
    round-5 thin-tail experiment that used it was measured slower and
    reverted (see pipelines/cosmogony.py) — but the knob is the correct
    seam for any future projected-join caller."""
    anc = grouped_map(edges, ["child"], _collect_ancestors, empty_schema=_ANC_SCHEMA)
    return hash_join(
        zones,
        anc,
        "osm_id",
        how="left",
        right_unique=True,  # one ancestors row per child by construction
        left_schema=left_schema or ZONE_SCHEMA,
        right_schema=pa.schema([("osm_id", pa.string()), ("ancestors", ANCESTORS_T)]),
    )


def attach_ancestors_broadcast(zones: rd.Dataset, anc_ref) -> rd.Dataset:
    """Append the ``ancestors`` list column from a broadcast (osm_id,
    ancestors) Arrow table via one vectorized ``pc.index_in`` + ``take`` per
    batch — zero-copy broadcast, no per-worker dict unpickling
    (zero-shuffle replacement for ``attach_ancestors`` when the table was
    computed driver-side via ``hierarchy.ancestors_from_edges_df``)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.broadcast import get_cached

    def fn(t: pa.Table) -> pa.Table:
        tbl = get_cached(anc_ref)
        # vectorized index_in per batch (~35 ms at a 350k-row value_set) —
        # NOT a per-worker Python dict build: 32 workers each building a
        # 350k-string dict simultaneously was pure redundant allocation
        idx = (
            pc.index_in(t["osm_id"], value_set=tbl["osm_id"].combine_chunks())
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lists = pc.take(
            tbl["ancestors"].combine_chunks(),
            pa.array(np.where(idx >= 0, idx, None), type=pa.int64()),
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        return t.append_column("ancestors", lists.cast(ANCESTORS_T))

    return zones.map_batches(fn, batch_format="pyarrow")


def build_country_finder(zones: rd.Dataset, typer: ZoneTyper) -> CountryFinder:
    """Scan the (small) zones table for ISO-tagged zones → broadcastable map.
    Streams batches to the driver; zones-side-fits-in-memory assumption
    (SURVEY §7.0)."""
    rows = []
    for b in zones.select_columns(["osm_id", "tags", "admin_level"]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        ids = b["osm_id"].to_pylist()
        tags = b["tags"].to_pylist()
        lvls = b["admin_level"].to_pylist()
        for i in range(len(ids)):
            t = dict(tags[i] or [])
            if COUNTRY_CODE_TAG in t:
                rows.append((ids[i], t, lvls[i]))
    return CountryFinder.from_zone_rows(rows, typer)


_POS_BITS = 20  # score = country_level << _POS_BITS | candidate position


def country_arrays(finder: CountryFinder) -> dict:
    """Columnar view of the country map for the vectorized resolver."""
    import numpy as np

    ids = list(finder.countries.keys())
    return {
        "ids": pa.array(ids, type=pa.string()),
        "iso": np.asarray([finder.countries[i][0] for i in ids], dtype=object),
        "level": np.asarray([finder.countries[i][1] for i in ids], dtype=np.int64),
    }


def type_batch(
    batch: pa.Table,
    typer: ZoneTyper,
    finder: CountryFinder,
    forced: str | None,
    ca: dict | None,
) -> pa.Table:
    """Vectorized typing kernel over one batch with an ``ancestors`` column
    (shared by the distributed stage and the driver fast path — see
    ``_typer_fn`` for the algorithm notes)."""
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    ids_arr = batch["osm_id"]
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    anc = batch["ancestors"]
    if isinstance(anc, pa.ChunkedArray):
        anc = anc.combine_chunks()
    counts = (
        pc.fill_null(pc.list_value_length(anc), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    flat = anc.flatten()  # null rows contribute zero elements

    # ---- country resolution (vectorized finder.find) ----
    cc = np.full(n, None, dtype=object)
    if forced:
        cc[:] = forced
    elif finder.countries:
        hit = (
            pc.index_in(flat, value_set=ca["ids"])
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        self_hit = (
            pc.index_in(ids_arr, value_set=ca["ids"])
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        pos = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], counts)
        score_flat = np.where(
            hit >= 0, (ca["level"][np.maximum(hit, 0)] << _POS_BITS) | pos, -1
        )
        # self candidate sits AFTER the ancestors (position = count), so on
        # equal level the self zone wins — "last max wins"
        self_score = np.where(
            self_hit >= 0,
            (ca["level"][np.maximum(self_hit, 0)] << _POS_BITS) | counts,
            -1,
        )
        best = self_score.copy()
        np.maximum.at(best, seg, score_flat)
        cc_idx = np.full(n, -1, dtype=np.int64)
        m = (score_flat >= 0) & (score_flat == best[seg])
        cc_idx[seg[m]] = hit[m]
        sm = (self_score >= 0) & (self_score == best)
        cc_idx[sm] = self_hit[sm]
        found = cc_idx >= 0
        cc[found] = ca["iso"][cc_idx[found]]

    # ---- rules lookup per unique (country, admin_level) ----
    levels = (
        pc.fill_null(batch["admin_level"], 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    old_types = np.asarray(batch["zone_type"].to_pylist(), dtype=object)
    new_types = old_types.copy()
    status = np.full(n, "no_country", dtype=object)
    has_cc = cc != None  # noqa: E711
    ucc = np.unique(cc[has_cc].astype(str)) if has_cc.any() else []
    ids_np = None
    for c in ucc:
        rows_c = np.nonzero(has_cc & (cc == c))[0]
        rs = typer.rules.get(c)
        if rs is None:
            status[rows_c] = "invalid_country"
            continue
        t_c = np.full(len(rows_c), None, dtype=object)
        for lv in np.unique(levels[rows_c]):
            t_c[levels[rows_c] == lv] = rs.type_by_level.get(str(lv))
        # override hits → full per-row semantics on the (rare) subset
        over = np.zeros(len(rows_c), dtype=bool)
        if rs.id_overrides:
            okeys = pa.array(list(rs.id_overrides.keys()), type=pa.string())
            over |= (
                pc.index_in(ids_arr.take(pa.array(rows_c)), value_set=okeys)
                .is_valid()
                .to_numpy(zero_copy_only=False)
            )
        if rs.contained_by:
            ckeys = pa.array(list(rs.contained_by.keys()), type=pa.string())
            fhit = (
                pc.index_in(flat, value_set=ckeys)
                .is_valid()
                .to_numpy(zero_copy_only=False)
            )
            if fhit.any():
                chits = np.cumsum(np.concatenate(([False], fhit)))
                row_has = (chits[offs[1:]] - chits[offs[:-1]]) > 0
                over |= row_has[rows_c]
        if over.any():
            if ids_np is None:
                ids_np = np.asarray(ids_arr.to_pylist(), dtype=object)
            for k in np.nonzero(over)[0]:
                i = rows_c[k]
                t_c[k] = rs.get_zone_type(
                    ids_np[i],
                    int(levels[i]),
                    list(flat[offs[i] : offs[i + 1]].to_pylist()),
                )
        ok = t_c != None  # noqa: E711
        new_types[rows_c[ok]] = t_c[ok]
        status[rows_c[ok]] = "ok"
        status[rows_c[~ok]] = "unknown_level"  # keep place-tag type (lib.rs:165-180)
    batch = batch.drop_columns(["zone_type", "country_code"])
    batch = batch.append_column(
        "zone_type", pa.array(new_types.tolist(), type=pa.string())
    )
    batch = batch.append_column(
        "country_code", pa.array(cc.tolist(), type=pa.string())
    )
    batch = batch.append_column(
        "type_status", pa.array(status.tolist(), type=pa.string())
    )
    return batch


def _typer_fn(state_ref):
    """Stateless-task typing stage over broadcast (typer, finder, forced)
    state: rules are parsed ONCE on the driver, shipped via ``ray.put``, and
    deserialized once per worker (``get_cached``).

    Round-3 vectorization: the per-row loop (dict walks over to_pylist'd
    ancestor lists) allocated millions of transient PyObjects per batch and
    COLLAPSED under many concurrent workers on one node (measured: the same
    stage ran 2.8 s at 8 CPUs but 15.9 s at 32 at the 349k-zone world —
    allocator/page-fault contention, not compute). Now: country resolution
    is a segmented max over flattened ancestor arrays (``index_in`` against
    the broadcast country table + ``np.maximum.at``; "last max wins" is
    encoded in the score's position bits, matching finder.find / the
    reference's max_by_key), and the rules lookup runs per UNIQUE
    (country, admin_level) with per-row Python only on override hits (id /
    contained_by — rare by construction). Kernel shared with the driver
    fast path: ``type_batch``."""
    from ..functions.broadcast import get_cached, get_cached_transformed

    def fn(batch: pa.Table) -> pa.Table:
        typer, finder, forced = get_cached(state_ref)
        ca = get_cached_transformed(
            state_ref, "cfind", lambda s: country_arrays(s[1])
        )
        return type_batch(batch, typer, finder, forced, ca)

    return fn


def type_zones_table(
    zlite_anc: pa.Table,
    typer: ZoneTyper,
    finder: CountryFinder,
    forced: str | None,
) -> pa.Table:
    """Driver fast path: type a LITE zones table (osm_id, admin_level,
    zone_type, ancestors [+ country_code]) in one vectorized pass — the
    zone-scale analog of the distributed stage, used by the fused build
    path so typing never re-materializes the full zone table."""
    if "country_code" not in zlite_anc.column_names:
        zlite_anc = zlite_anc.append_column(
            "country_code", pa.nulls(zlite_anc.num_rows, pa.string())
        )
    return type_batch(zlite_anc, typer, finder, forced, country_arrays(finder))


def type_zones(
    zones_with_ancestors: rd.Dataset,
    cfg: EngineConfig,
    finder: CountryFinder,
    typer: ZoneTyper | None = None,
) -> rd.Dataset:
    if cfg.rules_dir is None:
        raise ValueError("cfg.rules_dir is required for typing")
    if cfg.country_code is None and finder.is_empty():
        raise ValueError(
            "no country_code provided and no country found; cannot build a cosmogony"
        )  # lib.rs:121-127
    if typer is None:
        typer = ZoneTyper.from_dir(cfg.rules_dir)
    forced = cfg.country_code.upper() if cfg.country_code else None
    state_ref = ray.put((typer, finder, forced))
    return zones_with_ancestors.map_batches(
        _typer_fn(state_ref),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )
