"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG is order-dependent; after a shuffle join the
partial-aggregation order differs run-to-run and engine-to-engine (we
measured ~1e-16 relative drift vs a DuckDB oracle on sf0.01). To make
aggregate VALUES exactly reproducible — bitwise, across engines and
across partitionings — money-like measures are summed in exact decimal
arithmetic and only the final result is cast back to DOUBLE:

    SUM(x)  ->  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
    AVG(x)  ->  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)

Decimal addition is associative and commutative (integer arithmetic on
the unscaled value), so the result is independent of row order and of
the partial/final aggregation split — which also means the same number
comes out on 1 partition or 10,000. Spark widens sum(DECIMAL(18,4)) to
DECIMAL(28,4): at scale 4 that holds sums up to 10^24, far beyond 100 TB
of money columns. The external type stays DOUBLE so downstream schemas
are unchanged.

This matters at scale beyond testing: deterministic aggregates make
reruns/backfills byte-identical, so downstream diffing and caching work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 4 preserves 2-decimal money exactly and tolerates derived
# values (price * (1 - discount)) to 4 places.
_DECIMAL = "DECIMAL(18,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str) -> Column:
    """Cast a double measure to the exact internal decimal type."""
    return _col(c).cast(_DECIMAL)


#: r8 nanvalues boundary — the MEASURE twin of similarity.finite_vectors:
#: an IEEE NaN measurement is a corrupt reading and becomes NULL (absent)
#: at the load projection of every events-measure query, which the whole
#: NULL-skipping aggregate surface then handles identically in both
#: engines. Applied per-query (not inside dsum) so the boundary is
#: visible in each query's plan and oracle string.
def nan_to_null(c: Column | str) -> Column:
    return F.nanvl(_col(c), F.lit(None).cast("double"))


#: oracle twin: DuckDB `SELECT * REPLACE` keeps every other column
SQL_EVENTS_NANSAFE = (
    "(SELECT * REPLACE (CASE WHEN isnan(value) THEN NULL ELSE value END"
    " AS value) FROM events)"
)


def dsum(c: Column | str) -> Column:
    """Order-independent SUM for double measures (exact decimal internally,
    DOUBLE externally)."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by non-null count.

    Matches SQL ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)``
    — a single double division on deterministic operands.
    """
    return dsum(c) / F.count(_col(c))


# --- SQL-side mirrors (for oracle strings and spark.sql text) -------------


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_DECIMAL})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_DECIMAL})) AS DOUBLE) / COUNT({expr})"


def qround(c: Column | str, digits: int) -> Column:
    """Cross-engine-safe rounding of a double to ``digits`` decimals:
    ``floor(x·10^d + 0.5) / 10^d`` — every step is an IEEE operation
    with one correctly-rounded result, so Spark and DuckDB produce the
    SAME double for the same input, always.

    ``F.round`` is NOT safe as a cross-engine equalizer: Spark rounds
    the shortest decimal representation (``BigDecimal`` HALF_UP via
    ``Double.toString``) while DuckDB rounds the binary value — for
    doubles whose shortest repr ends at the tie digit (0.285 at 2 dp:
    Spark 0.29, DuckDB 0.28) the engines disagree even on bit-identical
    inputs. Use this for any rounded float the oracle gate compares.
    Halves round toward +inf (same formula both engines — symmetric by
    construction, not by convention). Inputs must satisfy
    |x|·10^d < 2^53 (all current uses are ≪ that)."""
    p = float(10**digits)
    return F.floor(_col(c) * p + F.lit(0.5)) / p


def sql_qround(expr: str, digits: int) -> str:
    """DuckDB/ANSI mirror of :func:`qround` — textually the same
    arithmetic, so the doubles match bitwise. The scale is written as an
    exponent literal (``1e6``) because a plain ``1000000.0`` parses as
    DECIMAL in Spark SQL (decimal contagion would change the output
    type); ``1eN`` is DOUBLE in both dialects."""
    return f"(floor(({expr}) * 1e{digits} + 0.5) / 1e{digits})"


def sql_dsum_diff(left: str, right: str) -> str:
    """SUM(left - right) with exact internal arithmetic."""
    return (
        f"CAST(SUM(CAST({left} AS {_DECIMAL}) - CAST({right} AS {_DECIMAL}))"
        " AS DOUBLE)"
    )


def dsum_diff(left: Column | str, right: Column | str) -> Column:
    """Order-independent SUM(left - right) for double measures."""
    return F.sum(dec(left) - dec(right)).cast("double")
