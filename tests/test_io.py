"""Cosmogony JSON IO: format detection, round-trip, merge (S2-S5 analogs of
/root/reference/tests/cosmogony_test.rs:34-93,179-190)."""

import gzip
import json
import os

import pytest

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.pipelines.cosmogony import build_cosmogony
from cosmogony_ray.sources.cosmogony_io import (
    OutputFormat,
    merge_cosmogonies,
    read_zones,
    write_zones,
)


def test_format_detection():
    assert OutputFormat.from_filename("a.json") == OutputFormat.JSON
    assert OutputFormat.from_filename("a.json.gz") == OutputFormat.JSON_GZ
    assert OutputFormat.from_filename("a.jsonl") == OutputFormat.JSONL
    assert OutputFormat.from_filename("a.jsonl.gz") == OutputFormat.JSONL_GZ
    with pytest.raises(ValueError):
        OutputFormat.from_filename("a.txt")


@pytest.fixture(scope="session")
def final_zones(ray_session, mini_lux_dir):
    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    return build_cosmogony(mini_lux_dir, cfg, with_stats=False).zones


@pytest.mark.parametrize("name", ["c.json", "c.json.gz", "c.jsonl", "c.jsonl.gz"])
def test_write_all_formats_same_zone_count(final_zones, tmp_path, name):
    p = str(tmp_path / name)
    write_zones(final_zones, p)
    back = read_zones(p)
    assert back.count() == final_zones.count() == 30


def test_roundtrip_fields(final_zones, tmp_path):
    p = str(tmp_path / "rt.jsonl")
    write_zones(final_zones, p)
    orig = final_zones.to_pandas().set_index("osm_id").sort_index()
    back = read_zones(p).to_pandas().set_index("osm_id").sort_index()
    assert list(back.index) == list(orig.index)
    for col in ["name", "zone_type", "label", "country_code", "admin_level"]:
        assert list(back[col].fillna("∅")) == list(orig[col].fillna("∅")), col
    # geometry round-trips through GeoJSON
    assert (back["boundary_wkb"].isna() == orig["boundary_wkb"].isna()).all()


def test_dense_ids_deterministic_and_parent_consistent(final_zones, tmp_path):
    p = str(tmp_path / "ids.jsonl")
    write_zones(final_zones, p)
    rows = [json.loads(l) for l in open(p)]
    ids = {r["osm_id"]: r["id"] for r in rows}
    # node zones sort before relations (BTreeMap<OsmId> order, lib.rs:66-95)
    assert ids["node:6002"] == 0
    assert ids["relation:1000"] == 1
    by_id = {r["id"]: r for r in rows}
    for r in rows:
        if r["parent"] is not None:
            assert r["parent"] in by_id
    # capital suburb parent chain resolves by dense id
    q = next(r for r in rows if r["osm_id"] == "relation:4001")
    assert by_id[q["parent"]]["osm_id"] == "relation:3001"


def test_merge_offsets(final_zones, tmp_path):
    a = str(tmp_path / "a.jsonl")
    write_zones(final_zones, a)
    out = str(tmp_path / "merged.jsonl.gz")
    total = merge_cosmogonies([a, a], out)
    assert total == 60
    rows = [json.loads(l) for l in gzip.open(out, "rt")]
    assert [r["id"] for r in rows[:3]] == [0, 1, 2]
    assert rows[30]["id"] == 30  # second file offset by max_id+1
    # parent pointers remapped into the second block
    second = rows[30:]
    for r in second:
        if r["parent"] is not None:
            assert r["parent"] >= 30
    with pytest.raises(ValueError):
        merge_cosmogonies([a], str(tmp_path / "m.json"))


def test_read_docs_format_switch(ray_session, tmp_path):
    """SURVEY §1.4 format switch: parquet dispatch works with column
    pruning; the lance branch raises a clear ImportError when the wheel is
    absent (parquet is this repo's canonical doc format — see
    sources/docs.py); bad format names are rejected."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from cosmogony_ray.sources.docs import _lance_available, read_docs

    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["a", "b"], "extra": [0, 1]}), p
    )
    ds = read_docs(p, columns=["doc_id", "text"])
    assert ds.schema().names == ["doc_id", "text"]
    assert ds.count() == 2
    if not _lance_available():
        with pytest.raises(ImportError, match="canonical doc format"):
            read_docs(str(tmp_path / "docs.lance"))
    with pytest.raises(ValueError):
        read_docs(p, format="orc")
