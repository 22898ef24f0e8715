"""Cross-engine float/int conformance: minimal reproducers for every
divergence class found while making 200+ queries value-hash-identical
between Spark (JVM) and DuckDB, plus pins that the repo's mitigations hold.

These are the classes — each one produced (or would produce) a red driver
row while every value was "numerically equal":

1. DECIMAL(38,s) → DOUBLE: DuckDB double-rounds (int128→double, /10^s);
   the JVM's BigDecimal→double rounds once. Diverges when the scaled
   integer exceeds 2^53. Mitigation: cast through VARCHAR (strtod rounds
   once).
2. FMA fusion: DuckDB's vectorized expressions may fuse a·b−c·d into a
   single-rounding fused multiply-add; JVM bytecode never does.
   Mitigation: materialize each product in its own projection (CTE
   MATERIALIZED), or assemble numerators as exact integers.
3. CAST(double AS BIGINT): Spark truncates toward zero, DuckDB rounds.
   Mitigation: explicit FLOOR/ROUND on both engines.
4. Float literals that look equal: ``1.0 - 0.7`` is 0.30000000000000004,
   not the 0.3 a written-down λ-complement means. Mitigation: round
   driver-side constants before lifting them into expressions.
5. DuckDB HUGEINT (SUM of BIGINT) reaches pandas as float64 while Spark
   emits int64 — values equal, container dtype differs, hash flips.
   Mitigation: CAST(SUM(..) AS BIGINT) in every integer-sum oracle.

Basic IEEE ops (+,-,*,/ and sqrt) are correctly rounded on both engines —
everything the registry relies on reduces to those plus the mitigations.
"""

from __future__ import annotations

import duckdb
import pytest


class TestDecimalToDoubleCast:
    # the exact value from agg_corr_exact's red row at sf0.001
    V = "7096786968835.8685"

    def test_direct_cast_double_rounds(self):
        direct = duckdb.sql(
            f"SELECT CAST(CAST('{self.V}' AS DECIMAL(38,4)) AS DOUBLE)"
        ).fetchone()[0]
        # DuckDB's two-step conversion lands 1 ulp ABOVE the correctly
        # rounded value here; if this ever starts passing, the mitigation
        # can be retired (documented, not load-bearing)
        assert direct != float(self.V)

    def test_varchar_bridge_is_correctly_rounded(self):
        bridged = duckdb.sql(
            f"SELECT CAST(CAST(CAST('{self.V}' AS DECIMAL(38,4)) AS VARCHAR)"
            f" AS DOUBLE)"
        ).fetchone()[0]
        assert bridged == float(self.V)  # == python strtod == JVM BigDecimal

    def test_below_2_53_both_paths_agree(self):
        # q6/variance headroom claim: scaled ints < 2^53 convert exactly
        v = "91234567.8901"  # scale 4 -> 9.1e11 scaled, far under 2^53
        a, b = duckdb.sql(
            f"SELECT CAST(CAST('{v}' AS DECIMAL(38,4)) AS DOUBLE),"
            f" CAST(CAST(CAST('{v}' AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        assert a == b == float(v)


class TestCastTruncateVsRound:
    def test_duckdb_rounds_spark_truncates(self, spark):
        x = 16.579999999999998  # value*1e6 lands on the .9999 side
        d = duckdb.sql(
            f"SELECT CAST(CAST({x!r} AS DOUBLE) * 1000000 AS BIGINT)"
        ).fetchone()[0]  # bare literal would parse as DECIMAL and hide the class
        s = spark.sql(
            f"SELECT CAST(CAST({x!r} AS DOUBLE) * 1000000 AS BIGINT) AS v"
        ).collect()[0]["v"]  # Spark also parses bare literals as DECIMAL
        assert d == 16580000 and s == 16579999  # the split, reproduced

    def test_explicit_round_aligns(self, spark):
        x = 16.579999999999998
        d = duckdb.sql(
            f"SELECT CAST(ROUND(CAST({x!r} AS DOUBLE) * 1000000) AS BIGINT)"
        ).fetchone()[0]
        s = spark.sql(
            f"SELECT CAST(ROUND(CAST({x!r} AS DOUBLE) * 1000000, 0) AS BIGINT) AS v"
        ).collect()[0]["v"]
        assert d == s == 16580000

    def test_explicit_floor_aligns(self, spark):
        x = 16.579999999999998
        d = duckdb.sql(
            f"SELECT CAST(FLOOR(CAST({x!r} AS DOUBLE) * 1000000) AS BIGINT)"
        ).fetchone()[0]
        s = spark.sql(
            f"SELECT CAST(FLOOR(CAST({x!r} AS DOUBLE) * 1000000) AS BIGINT) AS v"
        ).collect()[0]["v"]
        assert d == s == 16579999


class TestLambdaComplementLiteral:
    def test_one_minus_lambda_is_not_the_written_constant(self):
        assert 1.0 - 0.7 != 0.3
        assert round(1.0 - 0.7, 10) == 0.3


class TestHugeintDtype:
    def test_sum_bigint_needs_cast_for_int64_dtype(self):
        df1 = duckdb.sql("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)").df()
        df2 = duckdb.sql(
            "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
        ).df()
        assert str(df1["s"].dtype) != "int64"  # HUGEINT -> float64/object
        assert str(df2["s"].dtype) == "int64"


class TestBasicOpsAgree:
    def test_division_and_sqrt_are_correctly_rounded_everywhere(self, spark):
        import math

        pairs = [(7096786968835.8685, 3.0), (1.0, 3.0), (2.0, 7.0)]
        for a, b in pairs:
            py = a / b
            d = duckdb.sql(f"SELECT CAST({a!r} AS DOUBLE) / {b!r}").fetchone()[0]
            s = spark.sql(f"SELECT CAST({a!r} AS DOUBLE) / {b!r} AS v").collect()[
                0
            ]["v"]
            assert py == d == s
            py_s = math.sqrt(a)
            d_s = duckdb.sql(f"SELECT SQRT(CAST({a!r} AS DOUBLE))").fetchone()[0]
            s_s = spark.sql(
                f"SELECT SQRT(CAST({a!r} AS DOUBLE)) AS v"
            ).collect()[0]["v"]
            assert py_s == d_s == s_s
