"""Source/sink format handlers beyond parquet (SURVEY §2.1).

The reference federates three heterogeneous stores through connectors;
this package is the engine's connector seam: csv/json text formats,
JDBC (gated on a driver jar being present), and bucketed/partitioned
parquet sinks for co-located joins.
"""
