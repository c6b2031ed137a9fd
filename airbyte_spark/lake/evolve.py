"""Schema evolution — diff, validation, and commit.

Mirrors the reference's Iceberg schema synchronizer semantics
(load-iceberg-parquet/.../IcebergTableSynchronizer.kt:79-294):

- new nullable column        -> add
- column removed             -> drop (old files keep the data; scans prune)
- legal widening promotions  -> int->long, float->double
  (IcebergSuperTypeFinder.kt:89-121)
- required -> optional       -> relax nullability
- illegal narrowing / type change -> SchemaEvolutionError
- PK change                  -> allowed, flags a sort-order rebuild
  (sort-order evolution, IcebergTableSynchronizer.kt:314-378)

The table keeps a schema registry (id -> schema JSON); data files are
stamped with their write-time schema id, and scans align old files to the
current schema (lake/table.py::_align). This is the two-phase
"write staging with new schema, commit schema at end" pattern
(S3DataLakeStreamLoader.kt:64-94,113-116) collapsed to one metadata commit
because our files self-describe via the registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructType,
)


class SchemaEvolutionError(ValueError):
    pass


# legal widening promotions (IcebergSuperTypeFinder.kt:89-121)
_PROMOTIONS: dict[tuple[str, str], bool] = {
    ("integer", "long"): True,
    ("float", "double"): True,
}


def _is_legal_promotion(old: DataType, new: DataType) -> bool:
    if old == new:
        return True
    return _PROMOTIONS.get((old.typeName(), new.typeName()), False)


@dataclass
class SchemaDiff:
    added: list[str] = field(default_factory=list)
    dropped: list[str] = field(default_factory=list)
    widened: list[tuple[str, str, str]] = field(default_factory=list)  # col, old, new
    relaxed_nullability: list[str] = field(default_factory=list)

    @property
    def is_noop(self) -> bool:
        return not (self.added or self.dropped or self.widened or self.relaxed_nullability)


def diff_schemas(old: StructType, new: StructType) -> SchemaDiff:
    """Validate old -> new evolution; raise SchemaEvolutionError on an
    illegal change, else return the structured diff."""
    d = SchemaDiff()
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    for name, nf in new_fields.items():
        of = old_fields.get(name)
        if of is None:
            if not nf.nullable:
                raise SchemaEvolutionError(
                    f"new column {name!r} must be nullable (no backfill value "
                    "for pre-evolution files)"
                )
            d.added.append(name)
            continue
        if of.dataType != nf.dataType:
            if not _is_legal_promotion(of.dataType, nf.dataType):
                raise SchemaEvolutionError(
                    f"illegal type change for {name!r}: "
                    f"{of.dataType.simpleString()} -> {nf.dataType.simpleString()} "
                    "(legal: int->long, float->double)"
                )
            d.widened.append(
                (name, of.dataType.simpleString(), nf.dataType.simpleString())
            )
        if of.nullable != nf.nullable:
            if of.nullable and not nf.nullable:
                raise SchemaEvolutionError(
                    f"cannot make column {name!r} required: existing files may "
                    "hold nulls"
                )
            d.relaxed_nullability.append(name)
    for name in old_fields:
        if name not in new_fields:
            d.dropped.append(name)
    return d


WIDEN_MAP = {
    "integer": LongType(),
    "float": DoubleType(),
}


def widen_type(t: DataType) -> DataType:
    """The supertype a column widens to, if any (identity otherwise)."""
    if isinstance(t, IntegerType):
        return LongType()
    if isinstance(t, FloatType):
        return DoubleType()
    return t
