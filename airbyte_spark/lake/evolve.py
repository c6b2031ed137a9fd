"""Schema evolution — diff, validation, supertype, and commit.

Mirrors the reference's Iceberg schema synchronizer semantics
(load-iceberg-parquet/.../IcebergTableSynchronizer.kt:79-294), RECURSIVELY
through nested struct / array / map columns (IcebergTypesComparator.kt
walks object and list schemas; IcebergSuperTypeFinder.kt:89-121 resolves
the merged supertype):

- new nullable column / nested field -> add (dotted path in the diff)
- column / nested field removed      -> drop (old files keep the data;
  scans prune / null-align)
- legal widening promotions          -> int->long, float->double, at any
  nesting depth (IcebergSuperTypeFinder.kt:89-121)
- required -> optional               -> relax nullability
- illegal narrowing / type change    -> SchemaEvolutionError (with the
  full dotted path to the offending leaf)
- PK change                          -> allowed, flags a sort-order rebuild
  (sort-order evolution, IcebergTableSynchronizer.kt:314-378)

The table keeps a schema registry (id -> schema JSON); data files are
stamped with their write-time schema id, and scans align old files to the
current schema (lake/table.py::_align_keep -> align_expr, which REBUILDS
nested structs field by field — a plain Spark cast cannot add or drop
struct fields). `merge_supertype` is the merge-path evolution: the union
of the table schema and a source batch's schema (nothing dropped, new
nested fields appended, leaves widened), the shape the reference computes
before every write when the incoming record schema moved.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StructField,
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
    added: list[str] = field(default_factory=list)  # dotted paths
    dropped: list[str] = field(default_factory=list)
    widened: list[tuple[str, str, str]] = field(default_factory=list)  # path, old, new
    relaxed_nullability: list[str] = field(default_factory=list)

    @property
    def is_noop(self) -> bool:
        return not (self.added or self.dropped or self.widened or self.relaxed_nullability)

    @property
    def added_top_level(self) -> list[str]:
        """Top-level added column names only (nested adds carry a dot) —
        what stats-column bookkeeping may index."""
        return [c for c in self.added if "." not in c]


def diff_schemas(old: StructType, new: StructType) -> SchemaDiff:
    """Validate old -> new evolution; raise SchemaEvolutionError on an
    illegal change, else return the structured diff. Recurses through
    struct fields, array elements and map values; nested entries appear
    with dotted paths (`profile.zip`, `tags.element.weight`)."""
    d = SchemaDiff()
    _diff_struct(old, new, "", d)
    return d


def _diff_struct(old: StructType, new: StructType, prefix: str, d: SchemaDiff) -> None:
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    for name, nf in new_fields.items():
        path = f"{prefix}{name}"
        of = old_fields.get(name)
        if of is None:
            if not nf.nullable:
                raise SchemaEvolutionError(
                    f"new column {path!r} must be nullable (no backfill value "
                    "for pre-evolution files)"
                )
            d.added.append(path)
            continue
        _diff_type(of.dataType, nf.dataType, path, d)
        if of.nullable != nf.nullable:
            if of.nullable and not nf.nullable:
                raise SchemaEvolutionError(
                    f"cannot make column {path!r} required: existing files may "
                    "hold nulls"
                )
            d.relaxed_nullability.append(path)
    for name in old_fields:
        if name not in new_fields:
            d.dropped.append(f"{prefix}{name}")


def _diff_type(old: DataType, new: DataType, path: str, d: SchemaDiff) -> None:
    if old == new:
        return
    if isinstance(old, StructType) and isinstance(new, StructType):
        _diff_struct(old, new, f"{path}.", d)
        return
    if isinstance(old, ArrayType) and isinstance(new, ArrayType):
        _diff_type(old.elementType, new.elementType, f"{path}.element", d)
        if old.containsNull and not new.containsNull:
            raise SchemaEvolutionError(
                f"cannot forbid null elements in {path!r}: existing files may "
                "hold null elements"
            )
        return
    if isinstance(old, MapType) and isinstance(new, MapType):
        if old.keyType != new.keyType:
            raise SchemaEvolutionError(
                f"illegal map key type change for {path!r}: "
                f"{old.keyType.simpleString()} -> {new.keyType.simpleString()}"
            )
        _diff_type(old.valueType, new.valueType, f"{path}.value", d)
        return
    if not _is_legal_promotion(old, new):
        raise SchemaEvolutionError(
            f"illegal type change for {path!r}: "
            f"{old.simpleString()} -> {new.simpleString()} "
            "(legal: int->long, float->double, nested struct add/drop/widen)"
        )
    d.widened.append((path, old.simpleString(), new.simpleString()))


def merge_supertype(table: StructType, source: StructType) -> StructType:
    """Union supertype of the table schema and an incoming batch schema —
    the merge/write-path evolution target (IcebergSuperTypeFinder.kt:89-121
    + IcebergTableSynchronizer's update application):

    - table-only fields are KEPT (a batch missing a field never drops it),
    - source-only fields are APPENDED as nullable,
    - shared leaves widen along int->long / float->double (either
      direction resolves to the wider type),
    - shared structs/arrays/maps merge recursively,
    - otherwise-incompatible leaves keep the TABLE's type (the batch is
      cast/nulled into it by coercion, never the other way around).

    Nullability of shared fields stays the TABLE's: Spark DataFrames mark
    nearly everything nullable, and a micro-batch's inferred nullability
    must not silently relax a declared constraint — that is an explicit
    `evolve_schema` decision.

    Returns a schema equal to `table` when nothing needs to change
    (compare with `== table` to decide whether to commit an evolution)."""
    merged = _super_type(table, source)
    assert isinstance(merged, StructType)
    return merged


def _super_type(table: DataType, source: DataType) -> DataType:
    if table == source:
        return table
    if isinstance(table, StructType) and isinstance(source, StructType):
        smap = {f.name: f for f in source.fields}
        out: list[StructField] = []
        for f in table.fields:
            sf = smap.get(f.name)
            if sf is None:
                out.append(f)
            else:
                out.append(
                    StructField(
                        f.name, _super_type(f.dataType, sf.dataType), f.nullable
                    )
                )
        tnames = {f.name for f in table.fields}
        for sf in source.fields:
            if sf.name not in tnames:
                out.append(StructField(sf.name, sf.dataType, True))
        return StructType(out)
    if isinstance(table, ArrayType) and isinstance(source, ArrayType):
        return ArrayType(
            _super_type(table.elementType, source.elementType),
            table.containsNull,
        )
    if isinstance(table, MapType) and isinstance(source, MapType):
        if table.keyType != source.keyType:
            return table
        return MapType(
            table.keyType,
            _super_type(table.valueType, source.valueType),
            table.valueContainsNull,
        )
    if _is_legal_promotion(table, source):
        return source  # table widens toward the source's wider leaf
    return table  # incompatible -> table wins; coercion handles the batch


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
