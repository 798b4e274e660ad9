"""CLI — parity with the reference binary
(/root/reference/src/bin/cosmogony.rs:39-93,151-219):

  python -m cosmogony_ray generate --input <osm_tables_dir> --output out.jsonl
      [--country-code XX] [--disable-voronoi] [--filter-langs fr,de]
      [--rules-dir DIR] [--num-cpus N]
  python -m cosmogony_ray merge A.jsonl B.jsonl ... --output merged.jsonl
  python -m cosmogony_ray ingest extract.osm.pbf --output <osm_tables_dir>
      (PBF → nodes/ways/relations parquet; the S1 ingestion frontend —
      "generate --input" then consumes the directory)

The CLI owns the Ray session (guarded init; library code never inits)."""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_generate(args) -> int:
    _init_ray(args.num_cpus)
    from .config import EngineConfig
    from .pipelines.cosmogony import build_cosmogony
    from .sources.cosmogony_io import write_zones

    cfg = EngineConfig(
        country_code=args.country_code,
        disable_voronoi=args.disable_voronoi,
        filter_langs=tuple(
            s for s in (args.filter_langs or "").split(",") if s
        ),
        rules_dir=args.rules_dir,
    )
    result = build_cosmogony(args.input, cfg)
    write_zones(result.zones, args.output, meta={"stats": result.stats})
    # stats sink (S6, /root/reference/src/bin/cosmogony.rs:171-177)
    print(json.dumps(result.stats, indent=2, default=str), file=sys.stderr)
    import ray

    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    from .sources.pbf import pbf_to_parquet

    pbf_to_parquet(args.pbf, args.output)
    print(f"wrote OSM tables to {args.output}", file=sys.stderr)
    return 0


def cmd_merge(args) -> int:
    from .sources.cosmogony_io import merge_cosmogonies

    total = merge_cosmogonies(args.inputs, args.output)
    print(f"merged {total} zones into {args.output}", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cosmogony_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="build a cosmogony from OSM-shaped tables")
    g.add_argument("--input", required=True, help="dir with nodes/ways/relations.parquet")
    g.add_argument("--output", required=True, help="*.json[l][.gz] output path")
    g.add_argument("--country-code", default=None)
    g.add_argument("--disable-voronoi", action="store_true", default=False)
    g.add_argument("--filter-langs", default="")
    g.add_argument("--rules-dir", required=True)
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_generate)

    i = sub.add_parser("ingest", help="split a .osm.pbf into the three parquet tables")
    i.add_argument("pbf")
    i.add_argument("--output", "-o", required=True)
    i.set_defaults(fn=cmd_ingest)

    m = sub.add_parser("merge", help="merge streamable cosmogony files")
    m.add_argument("inputs", nargs="+")
    m.add_argument("--output", "-o", required=True)
    m.set_defaults(fn=cmd_merge)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
