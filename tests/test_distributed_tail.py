"""Fused-vs-distributed hierarchy-tail equality (round-4 verdict ask #1).

The build pipeline computes typing/parents/labels on the driver when the
inclusion-edge table is small (``driver_hierarchy_max_edges``, default 5M)
and hands over to the fully distributed tail above it. The handover path
(`pipelines/cosmogony.py` edges>threshold branch → attach_ancestors /
type_zones / select_parents / attach_parents / compute_names) is the
engine's >5M-edge scale path; these tests force it by setting the
threshold to 0 and assert the OUTPUT IS IDENTICAL to the fused fast path,
column by column, on both the quadtree grid world and the mini-lux world
(voronoi on and off). Semantics per hierarchy_builder.rs:107-131.

The large-scale timing evidence for the same handover (grid world d10,
349k zones / 3.03M edges > threshold 1M, at 8 and 32 CPUs) lives in
``scripts/distributed_tail_bench.py`` → BASELINE.md."""

import os

import pandas as pd
import pytest

from cosmogony_ray.config import EngineConfig
from cosmogony_ray.pipelines.cosmogony import build_cosmogony

_CMP_COLS = [
    "zone_type",
    "parent",
    "label",
    "country_code",
    "name",
    "admin_level",
    "international_labels",
    "zip_codes",
]


def _zones_df(src_dir: str, *, max_edges: int, voronoi: bool) -> pd.DataFrame:
    cfg = EngineConfig(
        rules_dir=os.path.join(src_dir, "rules"),
        disable_voronoi=not voronoi,
        driver_hierarchy_max_edges=max_edges,
    )
    df = build_cosmogony(src_dir, cfg, with_stats=False).zones.to_pandas()
    df = df.set_index("zone_uid").sort_index()

    # normalize nested columns (numpy arrays / lists of kv structs) for
    # hashable cell-wise comparison
    def norm_cell(v):
        if v is None:
            return ()
        return tuple(
            tuple(x) if isinstance(x, (list, tuple)) or hasattr(x, "dtype") else x
            for x in list(v)
        )

    for c in ("international_labels", "zip_codes"):
        df[c] = df[c].map(norm_cell)
    return df


@pytest.fixture(scope="module")
def grid_dir(tmp_path_factory):
    from cosmogony_ray.fixtures.bigworld import write_grid_world

    d = tmp_path_factory.mktemp("grid_d6")
    return write_grid_world(str(d), 6)


def test_distributed_tail_equals_fused_grid(ray_session, grid_dir):
    """Grid world d6 (1365 zones): threshold-0 (distributed tail) output
    == default (driver-fused) output on every public column."""
    fused = _zones_df(grid_dir, max_edges=5_000_000, voronoi=False)
    dist = _zones_df(grid_dir, max_edges=0, voronoi=False)
    assert list(fused.index) == list(dist.index)
    for c in _CMP_COLS:
        pd.testing.assert_series_equal(fused[c], dist[c], check_names=False), c


def test_distributed_tail_equals_fused_lux(ray_session, mini_lux_dir):
    """Mini-lux without voronoi: the two tails agree on the reference-
    golden world too (node zones, zip codes, international labels)."""
    fused = _zones_df(mini_lux_dir, max_edges=5_000_000, voronoi=False)
    dist = _zones_df(mini_lux_dir, max_edges=0, voronoi=False)
    assert list(fused.index) == list(dist.index)
    for c in _CMP_COLS:
        pd.testing.assert_series_equal(fused[c], dist[c], check_names=False), c


def test_distributed_tail_equals_staged_lux_voronoi(ray_session, mini_lux_dir):
    """Mini-lux WITH voronoi additional zones: threshold-0 distributed
    ancestors/parents produce the same final world as the broadcast-staged
    small-edge path (the voronoi branch shares the post-parents tail)."""
    staged = _zones_df(mini_lux_dir, max_edges=5_000_000, voronoi=True)
    dist = _zones_df(mini_lux_dir, max_edges=0, voronoi=True)
    assert list(staged.index) == list(dist.index)
    for c in _CMP_COLS:
        pd.testing.assert_series_equal(staged[c], dist[c], check_names=False), c
