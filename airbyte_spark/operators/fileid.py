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

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tail_n(path: str, n: int) -> str:
    return "/".join(path.split("/")[-n:])


def _suffix_depth(paths: list[str]) -> int:
    """Smallest trailing-segment count that keys every path uniquely.
    2 (`<dir>/<file>`) suffices for singly-nested commit dirs; one write
    with table partitions AND a bucket column nests twice
    (`_p_col=v/_pid=N/part-...`), where basenames AND immediate parents
    repeat across sibling partition dirs — grow until distinct."""
    n = 2
    while len({_tail_n(p, n) for p in paths}) != len(paths):
        n += 1
        if n > 16:  # paths are bounded by partition-col count; never hit
            raise ValueError("cannot derive unique file-tail keys")
    return n


def file_tail(path: str, n: int = 2) -> str:
    return _tail_n(path, n)


def input_file_tail(n: int = 2) -> Column:
    """Trailing n path segments of each row's source file, decoded back to
    the RAW on-disk name. input_file_name() returns a URI: segments that
    Spark's escapePathName already percent-escaped on disk (':' -> '%3A')
    get re-encoded ('%' -> '%25'), and spaces become '%20' — matching
    against raw path keys silently misses without decoding (every lookup
    null -> corrupted _mor_seq/_bin). Literal '+' is legal in a URI path
    and must survive URLDecoder's +-means-space rule, hence the
    pre-protection."""
    raw = F.input_file_name()
    decoded = F.url_decode(F.regexp_replace(raw, r"\+", "%2B"))
    parts = F.split(decoded, "/")
    return F.concat_ws(
        "/", *[F.element_at(parts, -(i + 1)) for i in reversed(range(n))]
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def tail_map(path_values: dict[str, object]) -> Column:
    """Column: value assigned to each row by its source file.

    Built as ONE parsed SQL `map(...)` expression: the `F.lit`-per-entry
    form costs 2 py4j round-trips per file (~1 ms each — a full second of
    DRIVER latency at a few hundred files, paid per read_entries call);
    one expr string is a single round trip. Non-int values fall back to
    the literal form."""
    n = _suffix_depth(list(path_values))
    if all(isinstance(v, int) and not isinstance(v, bool)
           for v in path_values.values()):
        items = ", ".join(
            f"{_sql_str(_tail_n(p, n))}, {int(v)}L"
            for p, v in path_values.items()
        )
        return F.expr(f"map({items})")[input_file_tail(n)]
    kv: list[Column] = []
    for p, v in path_values.items():
        kv.extend([F.lit(_tail_n(p, n)), F.lit(v)])
    return F.create_map(*kv)[input_file_tail(n)]
