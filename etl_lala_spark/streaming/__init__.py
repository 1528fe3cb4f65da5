"""Structured Streaming layer (reference §2.9 T1-T6 + §2.12 completions):
event-time windows with watermarks, stateful dedup, tagged streams, progress
listeners — the live forms of the batch plans in ``plans.events``."""
