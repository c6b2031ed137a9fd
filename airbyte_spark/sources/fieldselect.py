"""Field selection — per-stream column selection from the configured
catalog.

Replicates the reference's field-selection validation + projection
(CatalogClientConverters.kt:45-100): when enabled for a stream, only the
selected top-level fields sync. Guards, in the reference's order:

- selection enabled but no fields given -> error (":48-52")
- empty field path -> error (":60-64")
- nested (multi-element) field paths -> unsupported (":65-68")
- the cursor cannot be de-selected in INCREMENTAL syncs (":80-89")
- primary-key components cannot be de-selected in DEDUP mode (":90-97")

Spark realization: a validated ``df.select`` — Catalyst column pruning
pushes the projection into the parquet scan (ReadSchema), so de-selected
payload columns are never read, which at 100 TB is the difference
between scanning the image ``bytes`` column and not.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


class FieldSelectionError(ValueError):
    """Invalid field-selection config (the reference's JsonValidationException)."""


def select_fields(
    df: DataFrame,
    selected_fields: Sequence[Sequence[str]] | None,
    *,
    sync_mode: str = "full_refresh",
    cursor_field: Sequence[str] = (),
    primary_key: Sequence[Sequence[str]] = (),
    dedup: bool = False,
) -> DataFrame:
    """Project ``df`` to the selected fields with the reference's guards.

    ``selected_fields`` is a list of field PATHS (each a list of name
    components, matching the protocol's SelectedFieldInfo.fieldPath);
    only single-element paths are supported, as in the reference.
    """
    if selected_fields is None:
        raise FieldSelectionError(
            "Requested field selection but no selected fields provided"
        )
    names: list[str] = []
    for path in selected_fields:
        if not path:
            raise FieldSelectionError("Selected field path cannot be empty")
        if len(path) > 1:
            raise FieldSelectionError("Nested field selection not supported")
        if path[0] not in names:
            names.append(path[0])

    selected = set(names)
    if sync_mode == "incremental" and cursor_field and (
        cursor_field[0] not in selected
    ):
        raise FieldSelectionError(
            "Cursor field cannot be de-selected in INCREMENTAL syncs"
        )
    if dedup:
        for pk in primary_key:
            if pk and pk[0] not in selected:
                raise FieldSelectionError(
                    "Primary key field cannot be de-selected in DEDUP mode"
                )
    missing = selected.difference(df.columns)
    if missing:
        raise FieldSelectionError(
            f"Selected fields not in stream schema: {sorted(missing)}"
        )
    # preserve the stream's column order, not selection order
    return df.select(*[c for c in df.columns if c in selected])
