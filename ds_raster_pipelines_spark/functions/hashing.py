"""Cross-engine string hashing for oracle-checkable dedup operators.

The scale-path dedup family (MinHash, SimHash, fingerprints) needs a
per-word hash that (a) requires no global vocabulary (the round-1 vocab
``dense_rank`` built word ids through a single-partition window — a 100 TB
scale-killer) and (b) is computable bit-identically by the DuckDB oracle.

``xxhash64`` satisfies (a) but not (b) — DuckDB has no Spark-compatible
xxHash64. ``md5`` satisfies both: it is a built-in JVM expression in Spark
(whole-stage codegen'd, no UDF) and a built-in in DuckDB, and a fixed-width
hex prefix parses to the same integer in both engines. MD5 costs more
cycles per byte than xxHash64, but it is stateless and embarrassingly
parallel — the plan shape (map-side hash, no vocab shuffle) is what matters
at scale; callers that don't need an oracle can keep xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column, hex_chars: int = 7) -> Column:
    """First ``hex_chars`` hex digits of md5(col) as a bigint.

    7 hex chars = 28 bits (safe to multiply by 2^31-scale constants inside
    int64 in BOTH engines — DuckDB BIGINT arithmetic is overflow-checked,
    so unlike Spark we cannot rely on wrap-around); 15 chars = 60 bits
    (identity-grade, no further arithmetic headroom).
    """
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def md5_int_sql(expr: str, hex_chars: int = 7) -> str:
    """DuckDB twin of :func:`md5_int` for oracle SQL strings."""
    return f"cast(('0x' || substring(md5({expr}), 1, {hex_chars})) as bigint)"
