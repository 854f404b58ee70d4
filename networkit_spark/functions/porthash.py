"""Portable deterministic hashing: identical values in Spark and DuckDB.

The driver's correctness gate compares our Spark queries against DuckDB
oracle SQL by value hash, so any hash-dependent operator (MinHash, SimHash,
fingerprints) needs a hash function BOTH engines can compute bit-for-bit.
Neither engine's native hash matches the other (Spark: murmur3/xxhash64;
DuckDB: its own), but both have md5.

DuckDB's ``md5_number_lower(s)`` = the LAST 8 bytes of md5(s) read
little-endian as a UBIGINT (verified empirically: md5('abc') =
900150983cd24fb0 d6963f7d28e17f72 → lower = 0x727fe1287d3f96d6).
Spark reproduces it by byte-reversing hex chars 17..32 of ``md5()`` and
converting base-16 → base-10 with ``conv`` (unsigned, returned as string,
carried as DECIMAL(20,0) to avoid signed overflow), then reducing mod a
prime so downstream arithmetic fits in a LONG.

Spark-side cost note: this is pure JVM expression work (md5 + substr +
conv) — whole-stage-codegen friendly, no Python in the row path. It is
only used where cross-engine reproducibility matters; internal-only
hashing uses the cheaper ``xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PRIME = 2_147_483_629  # largest prime < 2^31


def _reversed_lower_hex(col: Column) -> Column:
    """Hex chars 17..32 of md5, byte-pair reversed (little-endian read)."""
    h = F.md5(col)
    pairs = [F.substring(h, 17 + 2 * i, 2) for i in range(8)]
    return F.concat(*reversed(pairs))


def md5_mod(col: Column, salt: str = "", prime: int = DEFAULT_PRIME) -> Column:
    """Spark column: md5_number_lower(salt || col) % prime, as LONG."""
    x = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    dec = F.conv(_reversed_lower_hex(x), 16, 10).cast("decimal(20,0)")
    return (dec % F.lit(prime)).cast("long")


def md5_mod_sql(expr: str, salt: str = "", prime: int = DEFAULT_PRIME) -> str:
    """DuckDB SQL string computing the identical value."""
    x = f"('{salt}' || CAST({expr} AS VARCHAR))" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST(md5_number_lower({x}) % {prime} AS BIGINT)"


def md5_mod_py(value, salt: str = "", prime: int = DEFAULT_PRIME) -> int:
    """Pure-Python equivalent (driver-side sampling, test transcriptions):
    last 8 md5 bytes little-endian, mod prime — bit-identical to
    :func:`md5_mod` and :func:`md5_mod_sql`."""
    import hashlib

    h = hashlib.md5((salt + str(value)).encode()).digest()
    return int.from_bytes(h[8:16], "little") % prime
