"""airbyte_spark — a from-scratch PySpark-native table-maintenance engine.

Provides, over manifest-tracked Parquet lakehouse tables of image+caption
pairs, the capabilities Airbyte's sync/normalization pipeline provides for
its connector acceptance suite (see SURVEY.md for the full mapping):

- MERGE INTO upsert/dedup on a primary key (Airbyte incremental-dedup sync
  mode: window dedup by cursor, cursor-newer-wins, CDC hard delete), as a
  stats-pruned copy-on-write rewrite with explicit skew salting.
- Bin-packing small-file compaction via a greedy first-fit-decreasing
  planner over the file-size histogram from table metadata.
- Z-order / Hilbert clustering via bit-interleaved / Gray-coded keys
  computed in vectorized pandas/Arrow UDFs over (phash, w, h).
- Manifest rewrite with recomputed per-file min/max column stats.
- Snapshot expiry + reachability-based orphan-file GC.
- Per-partition checkpointed lineage and row/byte metrics with ordered
  commit and idempotent resume.

Everything is pyspark.sql DataFrame + pandas/Arrow UDFs; no per-row Python.
"""

__version__ = "0.1.0"
