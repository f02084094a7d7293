"""Structured Streaming operators (beyond reference parity).

The reference has no stream processing (SURVEY §2.9 — its "streaming" is
client-side result paging), but the engine's event table and the 100 TB
training-pipeline target want real stream semantics: watermarked windowed
aggregation and custom stateful sessionization.
"""
