"""Per-file identity for rewrite operators.

partitionBy reuses part-file BASENAMES across bucket directories (CLAUDE.md
gotcha 7), so any map keyed by `input_file_name()` must key on the trailing
`<dir>/<file>` pair — shared here by compaction bin assignment and the
delete-fold rewrite. The map-literal lookup evaluates JVM-side inside
whole-stage codegen: no join, no shuffle. At ~10^6 victim files per job the
literal would be replaced by a broadcast join against the plan table; the
per-partition job sharding keeps real jobs far below that.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_tail(path: str) -> str:
    return f"{os.path.basename(os.path.dirname(path))}/{os.path.basename(path)}"


def input_file_tail() -> Column:
    parts = F.split(F.input_file_name(), "/")
    return F.concat_ws("/", F.element_at(parts, -2), F.element_at(parts, -1))


def tail_map(path_values: dict[str, object]) -> Column:
    """Column: value assigned to each row by its source file."""
    kv: list[Column] = []
    for p, v in path_values.items():
        kv.extend([F.lit(file_tail(p)), F.lit(v)])
    return F.create_map(*kv)[input_file_tail()]
