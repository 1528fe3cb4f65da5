"""Source layer: catalog/manifest discovery, archive + binary ingestion,
DBC/DBF decode interface, NDJSON tagged-union reader (reference S1-S10,
SURVEY.md §2.1)."""
