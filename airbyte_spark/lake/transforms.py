"""Hidden-partitioning transforms (Iceberg table-spec "Partition
Transforms"): a partition spec entry is either a bare column name
(identity) or ``transform(args)`` over a source column —

    bucket(N, col)    pmod(xxhash64(col), N)          any type
    truncate(W, col)  substring / floor-to-multiple   string | integral
    year(col)         'yyyy'                          date | timestamp
    month(col)        'yyyy-MM'                       date | timestamp
    day(col)          'yyyy-MM-dd'                    date | timestamp
    hour(col)         'yyyy-MM-dd-HH'                 timestamp

The table stores the raw spec strings (refs.json ``partition_by``), the
same place identity specs always lived — an identity entry parses to a
field whose name IS the column, so every existing table reads back
unchanged. Transformed fields get Iceberg's derived names
(``<col>_bucket``, ``<col>_trunc``, ``<col>_year|month|day|hour``): the
layout writes ``_p_<field.name>=<value>`` dirs and `DataFileEntry
.partition` keys by field name, so manifest summaries, partition-scoped
maintenance, and partition evolution all compose without knowing
transforms exist.

Scale rationale (why this is the 100-TB feature): ``bucket(N, pk)``
gives MERGE a zero-I/O candidate filter that still works where min/max
range stats degenerate (uuid-ish keys) — the batch's bucket set is ≤N
values computed in one slim Spark pass, and because the bucket is a pure
function of the PK, pruning is ALWAYS safe (a PK can never change
buckets), so merge enables it automatically without the
``merge.partition-pruning`` immutability waiver. Temporal transforms
give cursor scans directory-level pruning before a single footer is
read.

HASH CONTRACT (same rule as the PK bloom sidecars, lake/bloom.py): a
bucket value is ``pmod(xxhash64(col CAST AS declared_type), N)``
computed BY SPARK — never re-implemented in Python. Probing a literal
goes through `transform_literal`, a one-row Spark expression, so the
write side and every probe side use bit-identical hashing. NULL source
values map to the null partition (__HIVE_DEFAULT_PARTITION__), matching
identity-partition behavior, so ``xxhash64(NULL) = seed`` never invents
a bucket.

Reference anchor: the reference's lakehouse destination delegates
layout to Iceberg, whose spec defines these transforms and result types
(iceberg table-spec §Partition Transforms); identity-only partitioning
landed in round 4 (lake/table.py), this generalizes it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_TEMPORAL_TYPES = (DateType, TimestampType, TimestampNTZType)

_TEMPORAL_FORMATS = {
    "year": "yyyy",
    "month": "yyyy-MM",
    "day": "yyyy-MM-dd",
    "hour": "yyyy-MM-dd-HH",
}

_SUFFIX = {
    "bucket": "bucket",
    "truncate": "trunc",
    "year": "year",
    "month": "month",
    "day": "day",
    "hour": "hour",
}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_CALL = re.compile(
    r"^(?P<fn>[a-z]+)\s*\(\s*(?P<args>[^()]*)\s*\)$"
)


@dataclass(frozen=True)
class PartitionField:
    """One resolved partition-spec entry."""

    source: str  # source column name
    transform: str  # identity | bucket | truncate | year | month | day | hour
    param: int | None = None  # N for bucket, W for truncate

    @property
    def name(self) -> str:
        """Layout/manifest field name (Iceberg derived-name convention);
        identity keeps the bare column name for backward compatibility
        with pre-transform tables."""
        if self.transform == "identity":
            return self.source
        return f"{self.source}_{_SUFFIX[self.transform]}"

    @property
    def spec(self) -> str:
        if self.transform == "identity":
            return self.source
        if self.transform in ("bucket", "truncate"):
            return f"{self.transform}({self.param}, {self.source})"
        return f"{self.transform}({self.source})"


def parse_partition_field(spec: str) -> PartitionField:
    """Parse one partition-spec string. Raises ValueError with the exact
    grammar on anything malformed — a typo'd transform must fail at
    create/evolve time, not lay out garbage dirs."""
    s = str(spec).strip()
    if _IDENT.match(s):
        return PartitionField(source=s, transform="identity")
    m = _CALL.match(s)
    if not m:
        raise ValueError(
            f"bad partition spec {spec!r}: expected a column name, "
            "bucket(N, col), truncate(W, col), or year|month|day|hour(col)"
        )
    fn = m.group("fn")
    args = [a.strip() for a in m.group("args").split(",")] if m.group("args") else []
    if fn in ("bucket", "truncate"):
        if len(args) != 2 or not args[0].isdigit() or not _IDENT.match(args[1]):
            raise ValueError(
                f"bad partition spec {spec!r}: expected {fn}(N, col) with integer N"
            )
        n = int(args[0])
        if n < 1:
            raise ValueError(f"bad partition spec {spec!r}: N must be >= 1")
        return PartitionField(source=args[1], transform=fn, param=n)
    if fn in _TEMPORAL_FORMATS:
        if len(args) != 1 or not _IDENT.match(args[0]):
            raise ValueError(f"bad partition spec {spec!r}: expected {fn}(col)")
        return PartitionField(source=args[0], transform=fn)
    raise ValueError(
        f"bad partition spec {spec!r}: unknown transform {fn!r} "
        "(supported: bucket, truncate, year, month, day, hour)"
    )


def parse_partition_spec(specs: list[str]) -> list[PartitionField]:
    fields = [parse_partition_field(s) for s in specs or []]
    names = [f.name for f in fields]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate partition field names: {sorted(dupes)}")
    return fields


def validate_partition_spec(specs: list[str], schema: StructType) -> list[PartitionField]:
    """Parse + type-check a spec list against the table schema."""
    fields = parse_partition_spec(specs)
    for f in fields:
        if f.source not in schema.fieldNames():
            raise ValueError(f"partition source column not in schema: {f.source!r}")
        dt = schema[f.source].dataType
        if f.transform in _TEMPORAL_FORMATS:
            if not isinstance(dt, _TEMPORAL_TYPES):
                raise ValueError(
                    f"{f.spec}: {f.transform} needs a date/timestamp column, "
                    f"got {dt.simpleString()}"
                )
            if f.transform == "hour" and isinstance(dt, DateType):
                raise ValueError(f"{f.spec}: hour() is not defined on date columns")
        if f.transform == "truncate" and not isinstance(
            dt, (StringType, ByteType, ShortType, IntegerType, LongType)
        ):
            raise ValueError(
                f"{f.spec}: truncate needs a string or integral column, "
                f"got {dt.simpleString()}"
            )
    return fields


def partition_expr(field: PartitionField, dt: DataType) -> Column:
    """STRING-typed partition-value expression over the source column —
    the single definition both the writer layout and every probe use.
    All branches are null-safe: a NULL source lands in the null
    partition (Spark renders it __HIVE_DEFAULT_PARTITION__), never a
    hashed/truncated surrogate."""
    col = F.col(field.source)
    if field.transform == "identity":
        return col.cast("string")
    if field.transform == "bucket":
        # xxhash64(NULL)=seed would invent bucket pmod(42,N) — gate it
        return (
            F.when(col.isNull(), F.lit(None).cast("string"))
            .otherwise(
                F.pmod(F.xxhash64(col.cast(dt)), F.lit(field.param)).cast("string")
            )
        )
    if field.transform == "truncate":
        if isinstance(dt, StringType):
            return F.substring(col, 1, field.param)
        # floor-to-multiple, negative-correct: v - pmod(v, W)
        return (col - F.pmod(col, F.lit(field.param))).cast("string")
    return F.date_format(col, _TEMPORAL_FORMATS[field.transform])


def transform_literal(spark, field: PartitionField, value, dt: DataType) -> str | None:
    """Partition value for a python literal, via the SAME Spark
    expression the writer used (one local one-row job — hash-contract
    rule: never re-implement xxhash64 in Python). Identity short-circuits
    to partition_str so probe paths on identity tables stay job-free."""
    from airbyte_spark.lake.table import partition_str

    if value is None:
        return None
    if field.transform == "identity":
        return partition_str(value)
    row = (
        spark.range(1)
        .select(F.lit(value).cast(dt).alias(field.source))
        .select(partition_expr(field, dt).alias("v"))
        .first()
    )
    return row["v"]


def fields_by_key(fields: list[PartitionField]) -> dict[str, PartitionField]:
    """Resolution map for user-facing filters: a filter key may be the
    field NAME (internal callers echo entry.partition dicts back — the
    value is already a layout string) or the SOURCE column (the value is
    a raw literal to transform). Field names win on collision (identity
    fields have name == source, where both readings agree)."""
    out: dict[str, PartitionField] = {}
    for f in fields:
        out.setdefault(f.source, f)
    for f in fields:
        out[f.name] = f
    return out
