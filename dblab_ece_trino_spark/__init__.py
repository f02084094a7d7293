"""dblab_ece_trino_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference stack (nkorb/dblab-ece-trino: Trino 477 federating PostgreSQL,
MongoDB and Elasticsearch — see /root/reference), re-expressed Spark-first:

- multi-catalog relational data model (``catalog.schema.table`` names)
- the full SQL operator surface of the reference's five benchmark queries
  (scans w/ pushdown, filters, broadcast + partitioned hash joins,
  left outer composite-key joins, partial/final aggregation, DISTINCT,
  TopN, chained EXCEPT, scalar functions incl. the xxhash64 bucketing idiom)
- loader parity (parallel CTAS + hash-bucketed streaming export)
- a benchmark harness capturing results / plans / timings / runtime stats
- LLM-data-pipeline operators beyond the reference: deduplication
  (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
  similarity search (brute-force + LSH-bucketed ANN), text analysis,
  multimodal binary-column plumbing.

Everything is DataFrame/SQL on Catalyst: plans are declared, the optimizer
chooses physical strategies (broadcast vs shuffle, pushdown, AQE). Python
UDFs appear only as Arrow-vectorized pandas UDFs where built-ins genuinely
cannot express the semantics.
"""

from dblab_ece_trino_spark.session import EngineSession, get_spark

__all__ = ["EngineSession", "get_spark"]

__version__ = "0.1.0"
