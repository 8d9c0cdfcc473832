"""Order-insensitive, engine-portable CONTENT fingerprint of a result
set (r8 verdict directive #4).

The round driver adjudicates a query by collecting both results and
hashing sorted stringified rows — which caps adjudication at whatever
fits on one driver. Output-explosive results (dedup_simhash_hamming is
62.5 M rows at sf1-Zipf) therefore degraded to COUNT parity: both
engines agreed on cardinality, but a plan bug producing the right
cardinality with wrong row content would have passed green.

This module computes a content fingerprint IN-ENGINE on both sides —
each row canonicalizes to a '|'-joined string over name-sorted columns
(string cells length-prefixed so embedded '|' stays unambiguous),
hashes to a 60-bit integer (md5 prefix — both engines own an identical
md5), and the row set reduces with two order-insensitive aggregates
(exact integer SUM and BIT_XOR). No row is ever materialized on a
driver, so no result is too big to adjudicate by content:

    spark:  content_fingerprint(df)              -> 1-row DataFrame
    oracle: content_fingerprint_sql(sql, types)  -> 1-row SELECT

Both produce (n_rows BIGINT, hash_sum STRING, hash_xor BIGINT). SUM is
exact on both sides (Spark decimal(38,0); DuckDB HUGEINT) — 2^60 per
row times 10^18 rows stays inside 38 digits — and ships as its decimal
STRING because a 38-digit integer survives no float conversion: pandas
renders DuckDB's DECIMAL(38,0) as float64, which would corrupt the
exact sum in the very comparison it exists for.

Canonicalization is engine-neutral per column type (integers/booleans/
dates cast to identical strings; timestamps via an explicit 6-digit-
microsecond format; floats pinned at micro precision via
floor(x·10⁶) — the repo's established cross-engine float discipline,
e.g. the *_micro columns). A column type neither table below covers
raises ``ContentHashUnsupported`` so callers degrade to count parity
LOUDLY instead of hashing incomparable strings.

Verdict-equivalence with the driver's hash is pinned two ways:
tools/content_hash_parity.py replays every registry entry at sf0.01 and
asserts the in-engine verdict matches the driver-method verdict, and
tests/test_round9_ops.py perturbs single cells to prove the fingerprint
catches content changes count parity cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ContentHashUnsupported(ValueError):
    """Column type without an engine-portable canonical form."""


_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INT_DDB_PREFIX = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                   "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")

# micro-precision pin for float columns (see module docstring). The pin
# is TIERED by magnitude so it covers the full finite double range
# without overflowing BIGINT (the r9 parity sweep caught a 4.9e19 value
# doing exactly that): |x| < 9e12 hashes at micro precision (floor
# x·10⁶, tag 'm'), |x| < 9e24 at mega precision (floor x/10⁶, tag 'M'),
# and the astronomical tail at floor(x/1e290) (tag 'G'); ±Infinity gets
# a literal tag. Every branch uses only IEEE-exact ops (compare, floor,
# multiply/divide by a power of ten) so both engines take the same
# branch and produce the same integer.

_SPARK_DOUBLE_ELEM = (
    "CASE WHEN isnan(CAST({x} AS DOUBLE)) THEN NULL"
    " WHEN CAST({x} AS DOUBLE) = double('Infinity') THEN 'Inf'"
    " WHEN CAST({x} AS DOUBLE) = double('-Infinity') THEN '-Inf'"
    " WHEN abs(CAST({x} AS DOUBLE)) < 9e12 THEN concat('m',"
    " CAST(CAST(FLOOR(CAST({x} AS DOUBLE) * 1000000.0) AS BIGINT) AS STRING))"
    " WHEN abs(CAST({x} AS DOUBLE)) < 9e24 THEN concat('M',"
    " CAST(CAST(FLOOR(CAST({x} AS DOUBLE) / 1000000.0) AS BIGINT) AS STRING))"
    " ELSE concat('G',"
    " CAST(CAST(FLOOR(CAST({x} AS DOUBLE) / 1e290) AS BIGINT) AS STRING)) END"
)

_DDB_DOUBLE_ELEM = (
    "CASE WHEN isnan(CAST({x} AS DOUBLE)) THEN NULL"
    " WHEN isinf(CAST({x} AS DOUBLE)) THEN"
    " (CASE WHEN CAST({x} AS DOUBLE) > 0 THEN 'Inf' ELSE '-Inf' END)"
    " WHEN abs(CAST({x} AS DOUBLE)) < 9e12 THEN 'm' ||"
    " CAST(CAST(FLOOR(CAST({x} AS DOUBLE) * 1000000.0) AS BIGINT) AS VARCHAR)"
    " WHEN abs(CAST({x} AS DOUBLE)) < 9e24 THEN 'M' ||"
    " CAST(CAST(FLOOR(CAST({x} AS DOUBLE) / 1000000.0) AS BIGINT) AS VARCHAR)"
    " ELSE 'G' ||"
    " CAST(CAST(FLOOR(CAST({x} AS DOUBLE) / 1e290) AS BIGINT) AS VARCHAR) END"
)


# String cells are LENGTH-PREFIXED ("<n>:<s>") so the '|' row joiner
# and the ',' array joiner stay unambiguous: ('a|b','c') canonicalizes
# to '3:a|b|1:c' while ('a','b|c') is '1:a|3:b|c' (r9 ADVICE — a bare
# join let those collide). Length prefixing beats escaping here because
# escaping needs a backslash literal, and Spark SQL treats backslash as
# a string-literal escape while DuckDB does not — a quoting divergence
# waiting to mismatch. Both engines' length() counts code points
# (probed: length('𐍈') = 1 on both), so the prefix is engine-portable.


def _spark_lenprefix(e: F.Column) -> F.Column:
    return F.concat(F.length(e).cast("string"), F.lit(":"), e)


def _spark_cell(name: str, dt: str) -> F.Column:
    c = F.col(name)
    if dt in _INT_SPARK or dt == "boolean":
        e = c.cast("string")
    elif dt == "string":
        e = _spark_lenprefix(c)
    elif dt.startswith("string collate "):
        # Spark 4 collated string (r9 verdict directive #5): the
        # collation defines the EQUALITY classes, so the canonical form
        # is the class representative — lower() under UTF8_LCASE (the
        # oracle twin's lower() rewrite produces exactly these bytes),
        # identity under UTF8_BINARY. Other collations (ICU locale
        # tables) have no engine-portable representative: DuckDB owns
        # no equivalent fold, so they stay loudly unsupported.
        coll = dt.removeprefix("string collate ").strip().upper()
        if coll == "UTF8_BINARY":
            e = _spark_lenprefix(c.cast("string"))
        elif coll == "UTF8_LCASE":
            e = _spark_lenprefix(F.lower(c.cast("string")))
        else:
            raise ContentHashUnsupported(f"{name}: {dt}")
    elif dt == "date":
        # canonicalize as a MIDNIGHT TIMESTAMP: the engines legitimately
        # type the same logical column differently (Spark date_trunc
        # yields timestamp where DuckDB yields DATE) and the driver's
        # pandas layer converts both to Timestamps — the in-engine canon
        # must be equally type-agnostic or it mismatches on green rows
        e = F.concat(c.cast("string"), F.lit(" 00:00:00.000000"))
    elif dt == "timestamp" or dt == "timestamp_ntz":
        e = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif dt in ("double", "float"):
        e = F.expr(_SPARK_DOUBLE_ELEM.format(x=f"`{name}`"))
    elif dt.startswith("decimal"):
        e = c.cast("string")
    elif dt.startswith("array<") and dt.endswith(">"):
        inner = dt[6:-1]
        if inner in _INT_SPARK:
            elem = "CAST(x AS STRING)"
        elif inner == "string":
            elem = "concat(CAST(length(x) AS STRING), ':', x)"
        elif inner in ("double", "float"):
            elem = _SPARK_DOUBLE_ELEM.format(x="x")
        else:
            raise ContentHashUnsupported(f"{name}: {dt}")
        e = F.concat(
            F.lit("["),
            F.array_join(
                F.expr(f"transform(`{name}`, x -> coalesce({elem}, 'NULL'))"),
                ",",
            ),
            F.lit("]"),
        )
    else:
        raise ContentHashUnsupported(f"{name}: {dt}")
    return F.coalesce(e, F.lit("NULL"))


def _ddb_cell(name: str, dt: str) -> str:
    dt = dt.strip().upper()
    q = f'"{name}"'
    if dt.endswith("[]"):
        inner = dt[:-2]
        if inner.startswith(_INT_DDB_PREFIX):
            elem = "CAST(x AS VARCHAR)"
        elif inner in ("VARCHAR", "TEXT", "STRING"):
            elem = "CAST(length(x) AS VARCHAR) || ':' || x"
        elif inner in ("DOUBLE", "FLOAT", "REAL"):
            elem = _DDB_DOUBLE_ELEM.format(x="x")
        else:
            raise ContentHashUnsupported(f"{name}: {dt}")
        # array_to_string returns NULL on an EMPTY list — an empty array
        # must canonicalize '[]' (like Spark's array_join) while a NULL
        # array stays NULL for the outer 'NULL' coalesce
        e = (
            f"CASE WHEN {q} IS NULL THEN NULL ELSE "
            f"'[' || COALESCE(array_to_string(list_transform({q}, "
            f"x -> COALESCE({elem}, 'NULL')), ','), '') || ']' END"
        )
    elif dt.startswith(_INT_DDB_PREFIX) or dt == "BOOLEAN":
        e = f"CAST({q} AS VARCHAR)"
    elif dt in ("VARCHAR", "TEXT", "STRING"):
        e = f"CAST(length({q}) AS VARCHAR) || ':' || {q}"
    elif dt == "DATE":
        # midnight-timestamp canon — see the Spark-side date comment
        e = f"strftime(CAST({q} AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f')"
    elif dt.startswith("TIMESTAMP"):
        e = f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
    elif dt in ("DOUBLE", "FLOAT", "REAL"):
        e = _DDB_DOUBLE_ELEM.format(x=q)
    elif dt.startswith("DECIMAL"):
        e = f"CAST({q} AS VARCHAR)"
    else:
        raise ContentHashUnsupported(f"{name}: {dt}")
    return f"COALESCE({e}, 'NULL')"


def content_fingerprint(df: DataFrame) -> DataFrame:
    """One-row (n_rows, hash_sum, hash_xor) fingerprint of ``df``,
    computed distributively: the canonical-string + md5 projection is
    map-side (whole-stage codegen, no Python), and the only exchange is
    the final 1-row aggregate — the plan scales to any result size the
    underlying query scales to."""
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    cells = [_spark_cell(n, t) for n, t in sorted(fields)]
    row = F.concat_ws("|", *cells)
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10)
    hs = df.select(
        h.cast("decimal(38,0)").alias("h"), h.cast("bigint").alias("hl")
    )
    return hs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum("h"), F.lit(0))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("hash_sum"),
        F.coalesce(F.expr("bit_xor(hl)"), F.lit(0)).cast("bigint").alias("hash_xor"),
    )


def content_fingerprint_sql(inner_sql: str, fields: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`content_fingerprint` over ``inner_sql``
    whose output columns/types are ``fields`` (DuckDB type names, e.g.
    from ``DESCRIBE``)."""
    cells = " || '|' || ".join(_ddb_cell(n, t) for n, t in sorted(fields))
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(COALESCE(SUM(h), 0) AS DECIMAL(38,0)) AS VARCHAR) AS hash_sum,
       CAST(COALESCE(bit_xor(h), 0) AS BIGINT) AS hash_xor
FROM (
  SELECT CAST(('0x' || substr(md5({cells}), 1, 15)) AS BIGINT) AS h
  FROM ({inner_sql})
)
"""
