"""Engine configuration (the Ray-Data analog of the reference CLI surface,
/root/reference/src/bin/cosmogony.rs:39-93 — country_code, disable_voronoi,
filter_langs, num-threads → per-stage concurrency — plus the engine-specific
knobs SURVEY.md §2.11 adds: cell scheme, salting, checkpointing)."""

from __future__ import annotations

from dataclasses import dataclass, field

from .geom.cells import GridCells


@dataclass
class EngineConfig:
    # reference-parity knobs
    country_code: str | None = None          # --country-code: skip country detection
    disable_voronoi: bool = True             # --disable-voronoi (off by default in round 1)
    filter_langs: tuple[str, ...] = ()       # --filter-langs
    rules_dir: str | None = None             # libpostal-style YAML dir (rules-as-data)
    # Whether place=suburb NODES become boundary-less base zones. The
    # reference SOURCE constructs them (src/lib.rs:85-91), but its own e2e
    # pins prove the RUNNING reference does not: tests/cosmogony_test.rs:329
    # asserts get_zones_and_stats == 118 on ivory-coast.pbf, which equals the
    # boundary-yielding RELATION count exactly (the fixture also carries 21
    # place=suburb nodes with names — they'd make 139); the Luxembourg
    # library test likewise pins 198 == relations-only with Suburb=55
    # (tests/cosmogony_test.rs:173,210-215). False = reference-parity
    # (relations only); True keeps the node zones (the synthetic-world
    # pipelines and their SQL oracles are defined over this mode).
    place_node_zones: bool = True

    # engine-specific scale knobs
    min_res: int = 2
    max_res: int = 12
    max_cells_per_zone: int = 64             # mega-zone coarsening cap (SURVEY §7.4)
    # RETIRED (round 3): the inclusion join is now a shuffle-free map-side
    # broadcast cell join (stages/inclusion.py), so coarse-cell salting has
    # no groupby hot key left to mitigate; kept for config compatibility
    num_salts: int = 8
    join_num_partitions: int = 32            # shuffle partitions for joins/grouped maps
    # shuffle-output block-size target while building zones: the default
    # 128 MiB target coalesces a whole fixture-scale shuffle into 1-2 blocks,
    # capping every downstream map stage at 1-2 tasks; zone rows carry wide
    # WKB payloads and ~1 ms/row construction cost, so small blocks win
    build_block_size_bytes: int = 8 << 20
    # "broadcast": zero-shuffle assembly — ways/nodes of the admin closure
    # are broadcast Arrow tables, relation construction is an
    # embarrassingly-parallel map (the reference's own in-RAM operating
    # point). "distributed": hash-join assembly for beyond-object-store
    # inputs.
    assembly_mode: str = "broadcast"
    # hierarchy edges ≤ this → parent selection + ancestor lists are computed
    # driver-side from the (small) edge table and broadcast, removing four
    # shuffle barriers; above it the distributed grouped-map path is used
    driver_hierarchy_max_edges: int = 5_000_000
    zone_batch_size: int = 512               # geometry rows per batch (wide WKB rows)
    doc_batch_size: int = 4096               # doc geotag batch size
    geotag_concurrency: int | tuple = (1, 8)      # actor pool size ("actors" mode)
    # "tasks" (default): the geotag stage is a task-pool map whose zone
    # index is a worker-cached broadcast (same pattern as the inclusion
    # join) — no actor-pool spin-up (~2 s fixed per run at 32 CPUs) and the
    # scheduler can use every CPU. "actors": the round-1..3 actor pool
    # (kept for pinned-state deployments, e.g. GPU-resident indexes).
    geotag_mode: str = "tasks"
    checkpoint_dir: str | None = None

    def cells(self) -> GridCells:
        return GridCells(self.min_res, self.max_res, self.max_cells_per_zone)


DEFAULT_CONFIG = EngineConfig()
