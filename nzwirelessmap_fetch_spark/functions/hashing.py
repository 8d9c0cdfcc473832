"""Cross-engine stable hashing primitives.

Spark's native ``F.hash``/``F.xxhash64`` are Spark-specific (seeded
Murmur3/xxHash), so any operator whose output must be reproducible outside
Spark (the DuckDB oracle, a different engine, a rerun on different
partitioning) derives integer hashes from ``md5`` hex — bit-identical
everywhere — and from pure integer arithmetic on top of it.

These run entirely JVM-side (whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large Mersenne prime (2^31 - 1): modulus for permutation hashing. All
# intermediates stay well under 2^63 — exact in any engine's int64.
MERSENNE_P = 2_147_483_647


def md5_long(col: Column | str) -> Column:
    """First 32 bits of md5 as a non-negative long (0 .. 2^32-1).

    DuckDB twin: ``('0x' || substr(md5(x), 1, 8))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_long60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative long (0 .. 2^60-1) — the
    join-key-narrowing hash: collision odds stay negligible at corpus
    scale (birthday bound ~2^30 keys) while the wire key shrinks from an
    arbitrary-width string to 8 bytes. 15 hex chars so the value always
    fits signed int64 in every engine.

    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def perm_hash(h: Column, a: Column | int, b: Column | int) -> Column:
    """Universal-hash permutation ``(a*h + b) mod P`` for MinHash."""
    a = F.lit(a) if isinstance(a, int) else a
    b = F.lit(b) if isinstance(b, int) else b
    return (a.cast("long") * h + b.cast("long")) % F.lit(MERSENNE_P)


def rolling_hash(text_col: Column | str) -> Column:
    """Polynomial rolling hash over the characters of a string:
    ``acc = (acc*31 + codepoint(c)) mod P``, left-to-right — the classic
    document fingerprint. Exact on any engine (pure int64 arithmetic).

    Characters come from ``split(text, '')`` — EVERY character, including
    line terminators. (A regexp-'.' formulation silently diverges across
    engines: Java excludes \\r, \\u0085, \\u2028, \\u2029; RE2/Python
    exclude only \\n. Found by the hypothesis property test.)

    DuckDB twin::

        list_reduce(
          list_prepend(0::BIGINT,
            list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
          (a, b) -> (a*31 + b) % 2147483647)

    (On '' Spark folds over [] and DuckDB over [''] with ascii('')=0 —
    both yield 0.)
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch).cast("long")) % MERSENNE_P,
    )


def banding_for_threshold(target_j: float, total_perms: int) -> tuple[int, int]:
    """Choose the MinHash-LSH banding (bands, rows_per_band) whose S-curve
    threshold ``(1/b)^(1/r)`` lands closest to ``target_j``.

    The classic knob (Leskovec/Rajaraman/Ullman, "Mining of Massive
    Datasets"): more bands → lower threshold (higher recall, more
    candidates); more rows per band → higher threshold. Searching the
    divisors of the signature length keeps every permutation used.
    Pure driver-side arithmetic — call it once when configuring a dedup
    job, not per row."""
    if not 0.0 < target_j < 1.0:
        raise ValueError(f"target_j must be in (0, 1), got {target_j}")
    if total_perms < 2:
        raise ValueError(f"need ≥2 permutations, got {total_perms}")
    best: tuple[int, int] | None = None
    best_err = float("inf")
    for rows in range(1, total_perms + 1):
        if total_perms % rows:
            continue
        bands = total_perms // rows
        if bands < 1:
            continue
        threshold = (1.0 / bands) ** (1.0 / rows) if bands > 1 else 1.0
        err = abs(threshold - target_j)
        if err < best_err:
            best_err, best = err, (bands, rows)
    assert best is not None
    return best
