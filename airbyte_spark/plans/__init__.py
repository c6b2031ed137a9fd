"""Driver-side planners (metadata-scale logic only — no row data)."""
