"""Operator library: the SURVEY §2 inventory + LLM-pipeline extensions.

Modules:
- relational: scans/filters/joins/aggs/topN/set-ops/scalar fns (§2.1-2.8)
- dedup: exact + MinHash-LSH + SimHash + n-gram Jaccard + embedding cosine
- similarity: brute-force and LSH-bucketed ANN over embeddings
- text: language ID, quality scoring, token counting, fingerprinting
- multimodal: binary-column plumbing with stubbed decoders
"""
