"""Names and labels (P8/P9/D1/D2 + J6 chain walk).

- ``compute_names`` (/root/reference/src/zone_ext.rs:337-355): merge the
  center node's ``name:*`` tags into the zone's tags when the wikidata ids
  match, or for a City when either wikidata is missing.
- ``compute_labels`` (/root/reference/src/zone_ext.rs:309-375): walk the
  parent chain, join names with ", " after consecutive-dedup, append the zip
  suffix to the head (format_zip_code, zone_ext.rs:385-395); one label per
  language present anywhere in the chain (optionally restricted by
  ``filter_langs``), each falling back to the default name per zone.

The chain walk needs fully resolved parents → the zones table (small side) is
collected into a broadcast map and the walk is a stateless ``map_batches``
(SURVEY §2.4 J6). ≤ ~7 hops: zone_type strictly decreases up the chain.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data as rd

from ..config import EngineConfig
from ..model import TAGS_T

_LANG_RE = re.compile(r"^name:(.+)")


def international_names(tags: dict, default_name: str) -> dict[str, str]:
    """name:<lang> entries differing from the default name
    (/root/reference/src/zone_ext.rs:404-417)."""
    out = {}
    for k, v in tags.items():
        if v == default_name:
            continue
        m = _LANG_RE.match(k)
        if m:
            out[m.group(1)] = v
    return out


def compute_names_batch(batch: pa.Table) -> pa.Table:
    tags_col = batch["tags"].to_pylist()
    ct_col = batch["center_tags"].to_pylist()
    wikis = batch["wikidata"].to_pylist()
    types = batch["zone_type"].to_pylist()
    out = []
    for i in range(batch.num_rows):
        tags = dict(tags_col[i] or [])
        ct = dict(ct_col[i] or [])
        cw = ct.get("wikidata")
        if (wikis[i] is not None and wikis[i] == cw) or (
            types[i] == "city" and (cw is None or wikis[i] is None)
        ):
            for k, v in ct.items():
                if k.startswith("name:"):
                    tags.setdefault(k, v)
        out.append(sorted(tags.items()))
    idx = batch.column_names.index("tags")
    return batch.set_column(idx, "tags", pa.array(out, type=TAGS_T))


def compute_names(zones: rd.Dataset) -> rd.Dataset:
    return zones.map_batches(compute_names_batch, batch_format="pyarrow")


_LABEL_MAP_SCHEMA = pa.schema(
    [
        ("zone_uid", pa.string()),
        ("name", pa.string()),
        ("parent", pa.string()),
        ("intl", TAGS_T),
        ("zip_codes", pa.list_(pa.string())),
    ]
)


def build_label_map(named_zones: rd.Dataset) -> pa.Table:
    """(zone_uid, name, parent, intl name:* pairs) — broadcast as an Arrow
    table (zero-copy per worker; a Python dict broadcast cost seconds of
    unpickling per worker at 10⁵ zones).

    The ``name:*`` extraction runs vectorized over the flattened tags map
    (RE2 kernel + offset bookkeeping) — per-row dict conversion was a
    driver-serial hotspot at 10⁴+ zones."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.arrowtools import materialized_table

    full = materialized_table(named_zones).select(
        ["zone_uid", "name", "tags", "parent", "zip_codes"]
    )
    parts = []
    for b in full.to_batches(max_chunksize=65536):
        b = pa.Table.from_batches([b])
        ids = b["zone_uid"].to_pylist()
        names = b["name"].to_pylist()
        tags = b["tags"]
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        offsets = tags.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        row_of = np.repeat(np.arange(len(ids)), counts)
        ext = pc.extract_regex(tags.keys, r"^name:(?P<lang>.+)")
        lang_mask = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        vals = np.asarray(tags.items.to_pylist(), dtype=object)
        name_rep = np.asarray(names, dtype=object)[row_of] if len(row_of) else row_of
        hit = lang_mask & (vals != name_rep)
        langs = pc.struct_field(ext, "lang").to_pylist()
        intl: list[list] = [[] for _ in ids]
        for k in np.nonzero(hit)[0]:
            intl[row_of[k]].append((langs[k], vals[k]))
        parts.append(
            pa.table(
                {
                    "zone_uid": b["zone_uid"],
                    "name": b["name"],
                    "parent": b["parent"],
                    "intl": pa.array(intl, type=TAGS_T),
                    "zip_codes": b["zip_codes"],
                },
                schema=_LABEL_MAP_SCHEMA,
            )
        )
    if not parts:
        return _LABEL_MAP_SCHEMA.empty_table()
    return pa.concat_tables(parts).combine_chunks()


def _label_table_to_map(tbl: pa.Table) -> dict[str, tuple]:
    """Worker-local chain-walk lookup built once per worker from the
    broadcast Arrow table: zone_uid → (name, intl dict, parent)."""
    ids = tbl["zone_uid"].to_pylist()
    names = tbl["name"].to_pylist()
    parents = tbl["parent"].to_pylist()
    intls = tbl["intl"].to_pylist()
    return {
        ids[i]: (names[i], dict(intls[i] or []), parents[i])
        for i in range(len(ids))
    }


def format_zip_code(zips: list[str]) -> str:
    if not zips:
        return ""
    if len(zips) == 1:
        return f" ({zips[0]})"
    return f" ({zips[0]}-{zips[-1]})"


def _chain(osm_id: str, m: dict) -> list[str]:
    out = []
    cur = osm_id
    seen = set()
    while cur is not None and cur in m and cur not in seen:
        seen.add(cur)
        out.append(cur)
        cur = m[cur][2]
    return out


def _labels_fn(map_ref, filter_langs: tuple[str, ...]):
    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_cached_transformed

        m = get_cached_transformed(map_ref, "labelmap", _label_table_to_map)
        ids = batch["zone_uid"].to_pylist()
        zips_col = batch["zip_codes"].to_pylist()
        labels, intl_labels = [], []
        for i, osm_id in enumerate(ids):
            chain = _chain(osm_id, m)
            zsuffix = format_zip_code(zips_col[i] or [])

            def lbl(lang: str | None) -> str:
                names = []
                for cid in chain:
                    n0, intl, _ = m[cid]
                    n = intl.get(lang, n0) if lang is not None else n0
                    if not names or names[-1] != n:  # consecutive dedup (D1)
                        names.append(n)
                if names:
                    names[0] += zsuffix
                return ", ".join(names)

            langs = {l for cid in chain for l in m[cid][1]}
            if filter_langs:
                langs = {l for l in langs if l in filter_langs}
            labels.append(lbl(None))
            intl_labels.append(sorted((l, lbl(l)) for l in langs))
        batch = batch.drop_columns(["label", "international_labels"])
        batch = batch.append_column("label", pa.array(labels, type=pa.string()))
        batch = batch.append_column(
            "international_labels", pa.array(intl_labels, type=TAGS_T)
        )
        return batch

    return fn


def compute_labels(
    named_zones: rd.Dataset, label_map: pa.Table, cfg: EngineConfig
) -> rd.Dataset:
    map_ref = ray.put(label_map)
    return named_zones.map_batches(
        _labels_fn(map_ref, tuple(cfg.filter_langs)), batch_format="pyarrow"
    )


def compute_labels_table(
    label_map: pa.Table, filter_langs: tuple[str, ...]
) -> pa.Table:
    """Driver-side label computation for the zone-scale fast path: one
    chain-walk pass over the label-map table → (zone_uid, label,
    international_labels). Attached to the zones afterwards via a broadcast
    ``pc.index_in`` map — avoids the per-worker chain-map build that made
    the labels stage slower the MORE workers the cluster had."""
    m = _label_table_to_map(label_map)
    ids = label_map["zone_uid"].to_pylist()
    zips_col = label_map["zip_codes"].to_pylist()
    labels, intl_labels = [], []
    for i, osm_id in enumerate(ids):
        chain = _chain(osm_id, m)
        zsuffix = format_zip_code(zips_col[i] or [])

        def lbl(lang: str | None) -> str:
            names = []
            for cid in chain:
                n0, intl, _ = m[cid]
                n = intl.get(lang, n0) if lang is not None else n0
                if not names or names[-1] != n:  # consecutive dedup (D1)
                    names.append(n)
            if names:
                names[0] += zsuffix
            return ", ".join(names)

        langs = {l for cid in chain for l in m[cid][1]}
        if filter_langs:
            langs = {l for l in langs if l in filter_langs}
        labels.append(lbl(None))
        intl_labels.append(sorted((l, lbl(l)) for l in langs))
    return pa.table(
        {
            "zone_uid": pa.array(ids, type=pa.string()),
            "label": pa.array(labels, type=pa.string()),
            "international_labels": pa.array(intl_labels, type=TAGS_T),
        }
    )


def attach_labels_broadcast(named_zones: rd.Dataset, labels_ref) -> rd.Dataset:
    """Set label columns from the broadcast (zone_uid, label,
    international_labels) table — one vectorized index_in/take per batch
    (zip suffix already applied in ``compute_labels_table``)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.broadcast import get_cached, lookup_str_indices

    def fn(batch: pa.Table) -> pa.Table:
        tbl = get_cached(labels_ref)
        raw = lookup_str_indices(labels_ref, "zone_uid", batch["zone_uid"].to_pylist())
        idx = pa.array(np.where(raw >= 0, raw, None), type=pa.int64())
        label = pc.take(tbl["label"].combine_chunks(), idx)
        intl = pc.take(tbl["international_labels"].combine_chunks(), idx)
        if isinstance(label, pa.ChunkedArray):
            label = label.combine_chunks()
        if isinstance(intl, pa.ChunkedArray):
            intl = intl.combine_chunks()
        batch = batch.drop_columns(["label", "international_labels"])
        batch = batch.append_column(
            "label", pc.fill_null(label, "").cast(pa.string())
        )
        batch = batch.append_column(
            "international_labels", pc.fill_null(intl, []).cast(TAGS_T)
        )
        return batch

    return named_zones.map_batches(fn, batch_format="pyarrow")


def clean_untagged_zones(zones: rd.Dataset) -> rd.Dataset:
    """Drop zones never typed (P11, /root/reference/src/lib.rs:196-201)."""
    return zones.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t["zone_type"])),
        batch_format="pyarrow",
    )
