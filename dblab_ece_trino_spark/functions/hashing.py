"""Deterministic hash bucketing — the reference loader's partitioning idiom.

Reference (data-loader/loader.py:213-218) buckets rows for parallel export
with::

    mod(bitwise_and(from_big_endian_64(xxhash64(to_utf8(cast(k as varchar)))),
                    9223372036854775807), N) = bucket

Spark collapses the chain: ``F.xxhash64`` already returns a signed bigint,
and ``F.pmod`` gives a non-negative remainder, so the whole idiom is
``pmod(xxhash64(cast(k as string)), N)``.  Hash *values* differ from
Trino's (different seed/input encoding) but the partitioning property —
deterministic, complete, disjoint, uniformly spread — is identical, which
is what the export path needs.

At scale this expression is also the engine's generic salting/partitioning
primitive: it stays inside whole-stage codegen (no Python), so bucketing a
100 TB fact costs one projected column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK63 = 9223372036854775807  # 2**63 - 1, the reference's sign mask


def bucket_expr(key: Column, num_buckets: int) -> Column:
    """Non-negative deterministic bucket id in [0, num_buckets)."""
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(num_buckets)).cast("int")


def bucket_expr_reference_literal(key: Column, num_buckets: int) -> Column:
    """The reference's exact chain, step by step (for parity documentation):
    mask the hash to non-negative, then mod.  Semantically equal to
    ``bucket_expr`` for every input (pmod(x & MASK63, n) == pmod(x, n) only
    when x >= 0, so this variant reproduces the mask-then-mod behavior
    literally; both are valid disjoint-complete bucketings)."""
    return (
        F.xxhash64(key.cast("string")).bitwiseAND(F.lit(MASK63)) % F.lit(num_buckets)
    ).cast("int")
