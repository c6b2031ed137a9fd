"""Vectorized functions: space-filling curves, text analysis, dedup,
similarity. All row-level compute is numpy over Arrow batches — no per-row
Python anywhere (BASELINE.json contract)."""
