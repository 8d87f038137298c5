"""Stable cross-engine hashing primitives.

Every dedup/sketch operator needs hash functions that are *identical*
in Spark and any SQL oracle. Engine-native hashes differ (Spark's
``hash()`` is Murmur3-32 with Spark's seed; DuckDB's ``hash()`` is its
own), so we derive 60-bit integers from md5 hex — md5 is bit-identical
everywhere.

``stable_hash64(x)`` = int(md5(x)[:15 hex], 16) ∈ [0, 2^60): fits a
signed 64-bit integer in both engines.

Seeded variants prefix the seed: md5(seed || ':' || x) — the cheap
standard trick for a hash family (MinHash needs k independent hashes).

Scale note: md5-per-row is ~2× slower than Murmur3 but still
JVM-side/codegen'd in Spark (no Python); for 100 TB dedup the hash cost
is dwarfed by the shuffle. Engines pin the same algorithm so sketches
are portable across the lake (a MinHash signature computed by Spark
matches one computed by a warehouse follower).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash64(col: Column | str) -> Column:
    """60-bit stable hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def seeded_hash64(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return stable_hash64(F.concat(F.lit(f"{seed}:"), c))


def sql_stable_hash64(expr: str) -> str:
    """Same hash for a DuckDB/ANSI oracle."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def sql_seeded_hash64(expr: str, seed: int) -> str:
    return sql_stable_hash64(f"concat('{seed}:', {expr})")


def surrogate_key(*cols: Column | str) -> Column:
    """dbt-utils ``generate_surrogate_key`` parity (the helper the
    reference stubs at dw_transformer stg_stock_symbols.sql:2): md5 of
    the '-'-joined string casts of the key parts, with NULLs first
    coalesced to dbt's sentinel so (NULL, 'a') and ('a', NULL) hash
    differently (a bare concat_ws would silently skip NULLs and
    collide them)."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit("_dbt_utils_surrogate_key_null_"),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))
