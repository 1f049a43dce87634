"""Portable deterministic hashing — identical bits in Spark and DuckDB.

The dedup/similarity operators need content hashes that the correctness
oracle can recompute exactly. ``xxhash64``/``hash`` are Spark-private, so
we standardize on **md5int**: the first 15 hex digits (60 bits) of MD5,
parsed as a positive int64 — computable in any engine, collision odds
~2^-60 per pair. MinHash permutations are universal hashes
``(a·h + b) mod P`` over the 31-bit fold of md5int, with (a, b) drawn once
from a fixed seed; all arithmetic stays below 2^62 so ANSI-mode Spark
never sees an overflow.

Everything here is generated as *SQL text* in two dialects (Spark
Catalyst / DuckDB) so the heavy lifting stays in whole-stage codegen on
the Spark side and the oracle stays bit-identical on the DuckDB side.
"""

from __future__ import annotations

import random

#: 31-bit Mersenne prime — universal-hash modulus.
MERSENNE_P = 2_147_483_647

_rng = random.Random(42)
#: Fixed minhash permutation coefficients (shared by engine and oracle).
NUM_MINHASHES = 32
MINHASH_A = [_rng.randrange(1, MERSENNE_P) for _ in range(NUM_MINHASHES)]
MINHASH_B = [_rng.randrange(0, MERSENNE_P) for _ in range(NUM_MINHASHES)]

#: LSH banding: 8 bands × 4 rows. Detection probability for Jaccard s is
#: 1 - (1 - s^4)^8 — ~0.97 at s=0.8, ~0.19 at s=0.3 (the classic S-curve).
LSH_BANDS = 8
LSH_ROWS = 4
assert LSH_BANDS * LSH_ROWS == NUM_MINHASHES


def md5int_spark(expr: str) -> str:
    """Spark SQL: 60-bit positive int64 from md5 of a string expression."""
    return f"CAST(conv(substring(md5(CAST(({expr}) AS BINARY)), 1, 15), 16, 10) AS BIGINT)"


def md5int_duckdb(expr: str) -> str:
    """DuckDB SQL: identical value to :func:`md5int_spark`."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perm(j: int, h: str) -> str:
    """One universal-hash permutation (dialect-neutral arithmetic)."""
    return f"(({MINHASH_A[j]} * (({h}) % {MERSENNE_P}) + {MINHASH_B[j]}) % {MERSENNE_P})"


def shingles_spark(tokens: str, n: int = 3) -> str:
    """Spark SQL: distinct word n-gram shingle strings of a token array."""
    return (
        f"array_distinct(transform(sequence(1, greatest(size({tokens}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({tokens}, i, {n}))))"
    )


def shingles_duckdb(tokens: str, n: int = 3) -> str:
    """DuckDB SQL: identical shingle list (generate_series is inclusive)."""
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({tokens}) - {n - 1}, 1)),"
        f" i -> array_to_string({tokens}[i:i+{n - 1}], ' ')))"
    )


def minhash_sig_spark(hashes: str) -> str:
    """Spark SQL: array of NUM_MINHASHES minima over a NONEMPTY hash array.

    ``hashes`` must be PRE-REDUCED mod :data:`MERSENNE_P` (reduce once in
    the projection that materializes the array — every permutation needs
    only ``h mod P``, so reducing inside each perm would redo the mod
    32×). Each permutation is one scalar-accumulator ``aggregate`` pass:
    higher-order functions are not whole-stage-codegen'd, so the
    ``array_min(transform(...))`` form paid 32 intermediate array
    allocations per row to the interpreted evaluator — the dominant cost
    of the minhash stage before this rewrite. Initializing the fold at P
    is exact because every perm value is < P and the array is nonempty
    (shingle arrays always carry ≥1 element)."""
    perms = ", ".join(
        f"aggregate({hashes}, CAST({MERSENNE_P} AS BIGINT),"
        f" (m, h) -> least(m, ({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MERSENNE_P}))"
        for j in range(NUM_MINHASHES)
    )
    return f"array({perms})"


def minhash_sig_duckdb(hashes: str) -> str:
    """DuckDB twin of :func:`minhash_sig_spark` — takes the RAW 60-bit
    hashes (the ``% P`` stays inline here); bit-identical output since
    ``(a·(h mod P) + b) mod P == (a·h' + b) mod P`` for ``h' = h mod P``."""
    perms = ", ".join(
        f"list_min(list_transform({hashes}, h -> {minhash_perm(j, 'h')}))"
        for j in range(NUM_MINHASHES)
    )
    return f"[{perms}]"


#: SimHash width — 48 bits keeps every packed value positive int64 and
#: every shift untouched by sign, with ample hamming resolution.
SIMHASH_BITS = 48
