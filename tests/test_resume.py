"""Kill-and-resume equals cold run (north_rule checkpoint requirement)."""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.pipelines.cosmogony import build_cosmogony
from cosmogony_ray.pipelines.geotag_job import plan_shards, run_geotag_job
from cosmogony_ray.stages.geotag import build_zone_index


@pytest.fixture(scope="session")
def docs_sharded(mini_lux_dir, tmp_path_factory):
    """Rewrite the fixture docs with tiny row groups so the job has ≥3 shards."""
    d = tmp_path_factory.mktemp("docs_rg")
    t = pq.read_table(os.path.join(mini_lux_dir, "docs.parquet"))
    p = str(d / "docs.parquet")
    pq.write_table(t, p, row_group_size=10)
    return p


def _read_out(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    df["zones"] = df["tiles"].map(lambda ts: tuple(t["zone_osm_id"] for t in ts))
    return df[["doc_id", "zones"]].sort_values("doc_id").reset_index(drop=True)


def test_kill_and_resume_equals_cold(ray_session, mini_lux_dir, docs_sharded, tmp_path):
    cfg = EngineConfig(rules_dir=os.path.join(mini_lux_dir, "rules"))
    cosmo = build_cosmogony(mini_lux_dir, cfg, with_stats=False)
    idx = build_zone_index(cosmo.zones, cfg)

    shards = plan_shards([docs_sharded], target_rows_per_shard=10)
    assert len(shards) >= 3

    cold_dir = str(tmp_path / "cold")
    m1 = run_geotag_job([docs_sharded], idx, cold_dir, cfg, target_rows_per_shard=10)
    assert m1["shards_done"] == len(shards)

    # "killed" run: only 2 shards complete
    resume_dir = str(tmp_path / "resume")
    mk = run_geotag_job(
        [docs_sharded], idx, resume_dir, cfg, target_rows_per_shard=10, max_shards=2
    )
    assert mk["shards_done"] == 2
    # resume: completes the rest, skipping finished partitions
    mr = run_geotag_job([docs_sharded], idx, resume_dir, cfg, target_rows_per_shard=10)
    assert mr["shards_skipped"] == 2
    assert mr["shards_done"] == len(shards) - 2

    pd.testing.assert_frame_equal(_read_out(cold_dir), _read_out(resume_dir))

    # manifests carry lineage + metrics
    m = json.load(open(os.path.join(resume_dir, "manifest", "part-00000.json")))
    assert {"lineage", "rows", "seconds", "row_groups"} <= set(m)
