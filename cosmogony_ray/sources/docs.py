"""Document-stream source with a format switch (SURVEY §1.4/§7.1).

SURVEY designed the doc side as ``read_lance`` (Lance's take-by-rowid and
column-group layout suit the 10¹²-doc design point: per-span projections
without reading media payload columns). This container ships NO lance wheel,
so **parquet is the canonical doc format for this repo**: every driver
contract, fixture and benchmark reads parquet, and the Lance path is a real
dispatch branch that activates when the ``lance`` package is importable —
not a stub inside the engine's own code paths.

``read_docs`` is the single entry: format inferred from the path
(``.lance`` directory → lance, else parquet) or forced via ``format=``.
Column pruning is pushed down in both branches (prune at the read — a doc
scan that loads media payload bytes for a spans-only transform is wrong at
100 TB).
"""

from __future__ import annotations

import os

import ray.data as rd


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_docs(
    path: str,
    columns: list[str] | None = None,
    format: str = "auto",  # noqa: A002 - mirrors ray.data reader kwargs
) -> rd.Dataset:
    """Docs table (doc_id, spans, ...) as a streaming Dataset.

    format="auto": ``<path>.lance``/``*.lance`` dirs → lance, else parquet.
    The lance branch requires the ``lance`` package; a missing wheel raises
    ImportError with the canonical-parquet guidance rather than failing
    deep inside the read tasks."""
    fmt = format
    if fmt == "auto":
        fmt = "lance" if path.rstrip("/").endswith(".lance") else "parquet"
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt == "lance":
        if not _lance_available():
            raise ImportError(
                "lance is not installed in this environment; parquet is the "
                "canonical doc format here — pass a .parquet path, or "
                "install the 'pylance' wheel to enable the lance branch"
            )
        return rd.read_lance(path, columns=columns)
    raise ValueError(f"unknown doc format {format!r} (parquet|lance|auto)")


def docs_path(sf_dir: str) -> str:
    """Canonical docs file inside a testdata scale-factor dir."""
    return os.path.join(sf_dir, "documents.parquet")
