"""Sink layer: dynamic table creation, idempotent month-partitioned loads,
JSON output + run manifest (reference S11-S12, T5)."""
