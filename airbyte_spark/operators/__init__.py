"""Maintenance operators: MERGE INTO, compaction, clustering, expiry."""
