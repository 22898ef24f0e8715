"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, canonicalizes both frames (columns sorted by name, rows sorted
by all columns), and compares. Stricter than the driver: we demand (near-)
exact values, so any driver-side rounding still hash-matches.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from sea_streamer_spark.plans.queries import QUERIES
from sea_streamer_spark.sources.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None).astype("datetime64[ns]")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.decode("utf-8", "replace") if isinstance(v, (bytes, bytearray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")
    return df


def _dtype_kind(dt) -> str:
    """Classify a dtype the way the driver's canonical hash does: the hash
    renders values through their container dtype, so int64 13044 and float64
    13044.0 hash differently even though they compare numerically equal.
    DuckDB's SUM(BIGINT) -> HUGEINT -> pandas float64 is the bug class that
    produced the only red driver row in round 2 (curation_hash_split)."""
    dt = np.dtype(dt) if not isinstance(dt, pd.api.types.CategoricalDtype) else np.dtype(object)
    if dt.kind in ("i", "u"):
        return "int"
    if dt.kind == "f":
        return "float"
    if dt.kind == "b":
        return "bool"
    if dt.kind == "M":
        return "datetime"
    return "other"


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str, atol=1e-9, rtol=1e-9):
    s, o = canonicalize(spark_df), canonicalize(oracle_df)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        sk, ok_ = _dtype_kind(s[c].dtype), _dtype_kind(o[c].dtype)
        assert sk == ok_, (
            f"{name}: column {c} dtype-kind mismatch spark={s[c].dtype}({sk}) "
            f"oracle={o[c].dtype}({ok_}) — the driver hash will differ even if "
            f"values are equal; CAST the oracle expression to the Spark type"
        )
    for c in s.columns:
        sv, ov = s[c], o[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv_f, ov_f = sv.astype(float), ov.astype(float)
            both_nan = sv_f.isna() & ov_f.isna()
            close = np.isclose(sv_f, ov_f, atol=atol, rtol=rtol) | both_nan
            if not close.all():
                bad = np.where(~close)[0][:5]
                raise AssertionError(
                    f"{name}: column {c} differs at rows {bad.tolist()}: "
                    f"spark={sv_f.iloc[bad].tolist()} oracle={ov_f.iloc[bad].tolist()}"
                )
            exact = (sv_f == ov_f) | both_nan
            if not exact.all():
                # The driver hashes exact values: a 1-ulp skew that passes a
                # tolerance check still flips the hash (caught live: MMR's
                # λ-complement 1.0-0.7 vs 0.3). Strict by default; set
                # SPARK_GRAFT_FLOAT_TOL=1 only while debugging.
                import os

                n = int((~exact).sum())
                msg = (
                    f"{name}.{c}: {n} rows equal only within tolerance — "
                    f"the driver hash WILL differ. First diffs: "
                )
                bad = np.where(~exact)[0][:3]
                msg += str(
                    [(float(sv_f.iloc[i]), float(ov_f.iloc[i])) for i in bad]
                )
                if os.environ.get("SPARK_GRAFT_FLOAT_TOL"):
                    print("WARN " + msg)
                else:
                    raise AssertionError(msg)
        else:
            if np.issubdtype(sv.dtype, np.integer) and np.issubdtype(ov.dtype, np.integer):
                sv, ov = sv.astype("int64"), ov.astype("int64")
            if not sv.equals(ov):
                neq = ~((sv == ov) | (sv.isna() & ov.isna()))
                bad = np.where(neq)[0][:5]
                raise AssertionError(
                    f"{name}: column {c} differs at rows {bad.tolist()}: "
                    f"spark={sv.iloc[bad].tolist()} oracle={ov.iloc[bad].tolist()}"
                )


def check_query(spark, name: str, sf_dir: str) -> int:
    qd = QUERIES[name]
    assert qd.oracle is not None, f"{name} has no oracle"
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.sql(qd.oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
    return len(spark_pdf)
