"""Minimal repro: the bench-log "Failed to hash the schemas (for
deduplication): unhashable type: 'dict'" warning is Ray/pyarrow-internal,
triggered by the INPUT parquet files — not by anything this engine emits.

Mechanism (verified on ray 2.49.2 / this container's pyarrow):
1. The driver-generated testdata parquet files carry pandas key-value
   schema metadata (``schema.metadata == {b'pandas': ...}``).
2. ``pa.Schema.__hash__`` raises ``TypeError: unhashable type: 'dict'``
   for schemas with such metadata (pyarrow hashes the metadata mapping).
3. Ray Data's ``unify_schemas`` (ray/data/_internal/arrow_ops/
   transform_pyarrow.py:176-181) tries ``set(schemas)`` as a fast path and
   logs the warning when hashing fails, then falls back to full
   unification — functionally harmless.

The warning therefore appears on a BARE ``read_parquet`` + identity
``map_batches`` with zero engine code involved, which this script shows.
bench.py filters the line from its captured tail for output hygiene only.
"""

import pyarrow.parquet as pq

import ray
import ray.data as rd

SRC = "/root/testdata/sf0.01/lineitem.parquet"


def main() -> None:
    s = pq.read_schema(SRC)
    print("schema metadata keys:", list((s.metadata or {}).keys()))
    try:
        hash(s)
        print("schema is hashable — repro not applicable on this pyarrow")
    except TypeError as e:
        print(f"pa.Schema.__hash__ raises: {e!r}")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    # bare read + identity map: the warning is emitted by ReadParquet itself
    rd.read_parquet(SRC).map_batches(lambda t: t, batch_format="pyarrow").materialize()
    print("done — any 'Failed to hash the schemas' lines above came from "
          "Ray's ReadParquet, not engine code")
    ray.shutdown()


if __name__ == "__main__":
    main()
