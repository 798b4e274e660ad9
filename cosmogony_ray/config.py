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

    # engine-specific scale knobs
    min_res: int = 2
    max_res: int = 12
    max_cells_per_zone: int = 64             # mega-zone coarsening cap (SURVEY §7.4)
    salt_threshold: int = 50_000             # probe rows per cell before salting
    num_salts: int = 8
    join_num_partitions: int = 32            # hash-join partitions for assembly joins
    zone_batch_size: int = 512               # geometry rows per batch (wide WKB rows)
    doc_batch_size: int = 4096               # doc geotag batch size
    geotag_concurrency: int | tuple = (1, 8)      # actor pool size for the doc path
    checkpoint_dir: str | None = None

    def cells(self) -> GridCells:
        return GridCells(self.min_res, self.max_res, self.max_cells_per_zone)


DEFAULT_CONFIG = EngineConfig()
