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


def _names_merge_mask(batch: pa.Table) -> "np.ndarray":
    """Vectorized predicate for the center-tags name merge: rows whose
    center_tags hold at least one ``name:*`` key AND satisfy the wikidata
    match rule (zone_ext.rs:337-355). At bench/world scale this is ~0 rows,
    so the per-row merge loop only ever runs on the matching subset."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.arrowtools import tags_get

    ct = batch["center_tags"]
    if isinstance(ct, pa.ChunkedArray):
        ct = ct.combine_chunks()
    n = batch.num_rows
    offsets = ct.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    has_name = np.zeros(n, dtype=bool)
    if len(ct.keys) > 0:
        keymask = pc.starts_with(ct.keys, "name:").to_numpy(zero_copy_only=False)
        hits = np.cumsum(np.concatenate(([False], keymask)))
        has_name = (hits[offsets[1:]] - hits[offsets[:-1]]) > 0
    if not has_name.any():
        return has_name
    cw = tags_get(ct, "wikidata")
    cw_np = np.asarray(cw.to_pylist(), dtype=object)
    wiki = np.asarray(batch["wikidata"].to_pylist(), dtype=object)
    ztype = np.asarray(batch["zone_type"].to_pylist(), dtype=object)
    wiki_match = (wiki != None) & (cw_np != None) & (wiki == cw_np)  # noqa: E711
    city_rule = (ztype == "city") & ((cw_np == None) | (wiki == None))  # noqa: E711
    return has_name & (wiki_match | city_rule)


def compute_names_batch(batch: pa.Table) -> pa.Table:
    mask = _names_merge_mask(batch)
    if not mask.any():
        # nothing merges (the common case at scale) — tags column unchanged,
        # zero-copy passthrough (assembly already emits sorted tag lists)
        return batch
    import numpy as np

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


def _label_map_batch(b: pa.Table) -> pa.Table:
    """One label-map batch: ``name:*`` extraction runs vectorized over the
    flattened tags map (RE2 kernel + offset bookkeeping); only the HIT
    subset (tag value ≠ default name) is ever converted to Python — the
    former whole-column ``items.to_pylist()`` was the hotspot."""
    import numpy as np
    import pyarrow.compute as pc

    n = b.num_rows
    tags = b["tags"]
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    name_col = b["name"]
    if isinstance(name_col, pa.ChunkedArray):
        name_col = name_col.combine_chunks()
    offsets = tags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    intl: list[list] = [[] for _ in range(n)]
    if len(tags.keys) > 0:
        ext = pc.extract_regex(tags.keys, r"^name:(?P<lang>.+)")
        lang_mask = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        if lang_mask.any():
            name_rep = pc.take(name_col, pa.array(row_of, type=pa.int64()))
            neq = pc.fill_null(pc.not_equal(tags.items, name_rep), True)
            hit = lang_mask & neq.to_numpy(zero_copy_only=False)
            hidx = np.nonzero(hit)[0]
            if hidx.size:
                take = pa.array(hidx, type=pa.int64())
                langs = pc.struct_field(ext, "lang").take(take).to_pylist()
                vals = tags.items.take(take).to_pylist()
                for k, fi in enumerate(hidx):
                    intl[row_of[fi]].append((langs[k], vals[k]))
    return pa.table(
        {
            "zone_uid": b["zone_uid"],
            "name": b["name"],
            "parent": b["parent"],
            "intl": pa.array(intl, type=TAGS_T),
            "zip_codes": b["zip_codes"],
        },
        schema=_LABEL_MAP_SCHEMA,
    )


def driver_label_table(
    ztbl: pa.Table,
    typed_tbl: pa.Table,
    parents_tbl: pa.Table,
    filter_langs: tuple[str, ...],
) -> pa.Table:
    """Driver fast path: labels computed in one pass from the ALREADY-PULLED
    zones table + the driver typing/parents tables — no extra executor runs,
    no re-materialization of the full zone table (the fused build path).

    Applies the same name-merge → label-map → chain-walk sequence as the
    staged path: ``compute_names_batch`` (post-typing city rule needs the
    typed zone_type), ``_label_map_batch``, ``compute_labels_table``."""
    import numpy as np
    import pyarrow.compute as pc

    cols = ["zone_uid", "name", "tags", "center_tags", "wikidata", "zip_codes"]
    lite = ztbl.select([c for c in cols if c != "zone_uid"] + ["zone_uid", "osm_id"])
    lite = lite.append_column(
        "zone_type",
        typed_tbl["zone_type"]
        if typed_tbl.num_rows == ztbl.num_rows
        else pa.nulls(ztbl.num_rows, pa.string()),
    )
    merged = compute_names_batch(lite)
    pidx = (
        pc.index_in(ztbl["osm_id"], value_set=parents_tbl["osm_id"].combine_chunks())
        .fill_null(-1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    parent = pc.take(
        parents_tbl["parent"].combine_chunks(),
        pa.array(np.where(pidx >= 0, pidx, None), type=pa.int64()),
    )
    if isinstance(parent, pa.ChunkedArray):
        parent = parent.combine_chunks()
    lm_in = pa.table(
        {
            "zone_uid": ztbl["zone_uid"],
            "name": ztbl["name"],
            "tags": merged["tags"],
            "parent": parent.cast(pa.string()),
            "zip_codes": ztbl["zip_codes"],
        }
    )
    label_map = _label_map_batch(lm_in)
    return compute_labels_table(label_map, filter_langs)


def build_label_map(named_zones: rd.Dataset) -> pa.Table:
    """(zone_uid, name, parent, intl name:* pairs) — broadcast as an Arrow
    table (zero-copy per worker; a Python dict broadcast cost seconds of
    unpickling per worker at 10⁵ zones). The extraction itself runs
    DISTRIBUTED (one ``map_batches`` over the named zones); the driver only
    concatenates the small result table."""
    from ..functions.arrowtools import materialized_table

    packed = named_zones.select_columns(
        ["zone_uid", "name", "tags", "parent", "zip_codes"]
    ).map_batches(_label_map_batch, batch_format="pyarrow")
    return materialized_table(packed.materialize(), schema=_LABEL_MAP_SCHEMA)


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


_MAX_CHAIN = 32  # parent chains are ≤ ~11 hops (type strictly decreases);
# the cap only guards against pathological parent cycles in broken input


def _label_arrays(tbl: pa.Table) -> dict:
    """Columnar chain-walk state built once (per worker or on the driver)
    from the label-map table: ``parent_idx`` int64 parent-pointer array
    (−1 = root/absent), object-dtype names, per-row intl presence. The
    whole chain walk then runs as ≤ _MAX_CHAIN vectorized gathers instead
    of a per-zone dict walk (the dict walk cost ~21 s driver-serial at the
    349k-zone world and could never scale)."""
    import numpy as np
    import pyarrow.compute as pc

    uid = tbl["zone_uid"]
    if isinstance(uid, pa.ChunkedArray):
        uid = uid.combine_chunks()
    parent_idx = (
        pc.index_in(tbl["parent"], value_set=uid)
        .combine_chunks()
        .fill_null(-1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    names_arrow = tbl["name"]
    if isinstance(names_arrow, pa.ChunkedArray):
        names_arrow = names_arrow.combine_chunks()
    names = np.asarray(names_arrow.to_pylist(), dtype=object)
    intl = tbl["intl"]
    if isinstance(intl, pa.ChunkedArray):
        intl = intl.combine_chunks()
    offs = intl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    has_intl = np.diff(offs) > 0
    return {
        "uid": uid,
        "parent_idx": parent_idx,
        "names": names,
        "names_arrow": names_arrow,
        "has_intl": has_intl,
        "tbl": tbl,
        "_intl_cache": {},
    }


def _chain_matrix(arrs: dict, rows: "np.ndarray"):
    """(n × depth) matrix of label-map row indices along each zone's parent
    chain (−1 past the root), via iterated parent-pointer gathers. A step
    that revisits an already-seen row of its own chain stops (cycle guard,
    same semantics as the per-row ``_chain`` walk)."""
    import numpy as np

    parent_idx = arrs["parent_idx"]
    cols = [rows]
    cur = rows
    for _ in range(_MAX_CHAIN - 1):
        alive = cur >= 0
        if not alive.any():
            break
        nxt = np.where(alive, parent_idx[np.maximum(cur, 0)], -1)
        # cycle guard: a next-hop equal to any previous hop of the same
        # chain terminates that chain (checked against all prior columns —
        # depth is tiny, so this stays cheap)
        for prev in cols:
            nxt = np.where((nxt >= 0) & (nxt == prev), -1, nxt)
        if not (nxt >= 0).any():
            cols.append(nxt)
            break
        cols.append(nxt)
        cur = nxt
    return np.stack(cols, axis=1)


def _labels_for_rows(
    arrs: dict, rows: "np.ndarray", zips_list: list, filter_langs: tuple[str, ...]
):
    """Vectorized label computation for ``rows`` (label-map row indices):
    default labels via object-array column concatenation with consecutive
    dedup (D1); international labels per-row ONLY for zones whose chain
    carries any ``name:*`` entry (rare at fixture scale, bounded by the
    lang set at planet scale)."""
    import numpy as np

    import pyarrow.compute as pc

    n = len(rows)
    if n == 0:
        return [], []
    chain = _chain_matrix(arrs, rows)
    names = arrs["names"]
    names_arrow = arrs["names_arrow"]
    valid = chain >= 0
    safe = np.maximum(chain, 0)
    # default labels via C-speed Arrow kernels: per chain level one
    # take + dedup-null mask, then ONE binary_join_element_wise with
    # null_handling="skip" (the object-array string-concat loop this
    # replaces cost ~7 s driver-serial at the 349k-zone world)
    cols = []
    prev = None
    for j in range(chain.shape[1]):
        idxj = pa.array(
            np.where(valid[:, j], chain[:, j], -1), type=pa.int64()
        )
        arr_j = pc.take(
            names_arrow,
            pc.if_else(pc.equal(idxj, -1), pa.scalar(None, pa.int64()), idxj),
        )
        if j == 0:
            masked = arr_j
            if any(zips_list):
                zsfx = pa.array(
                    [format_zip_code(z or []) for z in zips_list],
                    type=pa.string(),
                )
                masked = pc.binary_join_element_wise(arr_j, zsfx, "")
        else:
            dup = pc.fill_null(pc.equal(arr_j, prev), False)
            masked = pc.if_else(dup, pa.scalar(None, pa.string()), arr_j)
        cols.append(masked)
        prev = arr_j
    if len(cols) == 1:
        labels_arrow = pc.fill_null(cols[0], "")
    else:
        labels_arrow = pc.binary_join_element_wise(
            *cols, ", ", null_handling="skip"
        )
    labels = labels_arrow.to_pylist()

    # international labels: only rows whose chain touches intl names
    has_intl = arrs["has_intl"]
    chain_has_intl = (has_intl[safe] & valid).any(axis=1)
    intl_labels: list = [[] for _ in range(n)]
    for i in np.nonzero(chain_has_intl)[0]:
        crow = chain[i][valid[i]]
        cache = arrs["_intl_cache"]
        intls = []
        for r in crow:
            d = cache.get(int(r))
            if d is None:
                d = dict(arrs["tbl"]["intl"][int(r)].as_py() or [])
                cache[int(r)] = d
            intls.append(d)
        langs = {l for d in intls for l in d}
        if filter_langs:
            langs = {l for l in langs if l in filter_langs}
        zfx = format_zip_code(zips_list[i] or [])
        row_out = []
        for lang in langs:
            parts = []
            for k, r in enumerate(crow):
                nm = intls[k].get(lang, names[r])
                if not parts or parts[-1] != nm:
                    parts.append(nm)
            if parts:
                parts[0] += zfx
            row_out.append((lang, ", ".join(parts)))
        intl_labels[i] = sorted(row_out)
    return labels, intl_labels


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
    """Distributed label stage: same vectorized kernel as the driver fast
    path, over the broadcast label-map table. Per-worker prep is columnar
    (``_label_arrays``: one index_in + one to_pylist of names) — NOT the
    per-worker Python dict build that previously made this stage slower the
    MORE workers the cluster had."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ..functions.broadcast import get_cached_transformed

        arrs = get_cached_transformed(map_ref, "labelarrs", _label_arrays)
        rows = (
            pc.index_in(batch["zone_uid"], value_set=arrs["uid"])
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        zips_col = batch["zip_codes"].to_pylist()
        hit = rows >= 0
        labels_np = np.full(batch.num_rows, "", dtype=object)
        intl_np = np.empty(batch.num_rows, dtype=object)
        intl_np[:] = [[] for _ in range(batch.num_rows)]
        if hit.any():
            hidx = np.nonzero(hit)[0]
            lbls, intls = _labels_for_rows(
                arrs, rows[hidx], [zips_col[i] for i in hidx], filter_langs
            )
            labels_np[hidx] = lbls
            for k, i in enumerate(hidx):
                intl_np[i] = intls[k]
        batch = batch.drop_columns(["label", "international_labels"])
        batch = batch.append_column(
            "label", pa.array(labels_np.tolist(), type=pa.string())
        )
        batch = batch.append_column(
            "international_labels", pa.array(intl_np.tolist(), type=TAGS_T)
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
    import numpy as np

    arrs = _label_arrays(label_map)
    rows = np.arange(label_map.num_rows, dtype=np.int64)
    labels, intl_labels = _labels_for_rows(
        arrs, rows, label_map["zip_codes"].to_pylist(), filter_langs
    )
    return pa.table(
        {
            "zone_uid": label_map["zone_uid"],
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

    from ..functions.broadcast import get_cached

    def fn(batch: pa.Table) -> pa.Table:
        tbl = get_cached(labels_ref)
        raw = (
            pc.index_in(batch["zone_uid"], value_set=tbl["zone_uid"].combine_chunks())
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
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
