"""Named-query registry.

Every engine capability is declared as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an equivalent
ANSI-SQL oracle string for DuckDB. The driver's correctness gate runs both at
sf0.01 and hash-compares (BASELINE.json t2). Column names/aliases MUST match
between the two sides.

Determinism rules used throughout the registry:

- money/quantity arithmetic casts doubles to exact DECIMAL before aggregation
  and casts the final aggregate back to DOUBLE — both engines then produce
  bit-identical values regardless of partial-aggregation order;
- every top-k has a total tie-break order;
- floating-point folds (dot products, rolling hashes) use the same explicit
  left-to-right fold on both sides.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QueryDef] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` → rows-only driver check."""

    def deco(fn: QueryFn) -> QueryFn:
        # Every registered query must run on an externally-created session
        # (the correctness driver's): prepare() applies runtime confs and
        # ships the package zip to executor workers via addPyFile — without
        # it, any pickled-by-reference UDF fails to unpickle when the
        # driver's cwd is not the repo root.
        @functools.wraps(fn)
        def prepared(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..session import prepare

            prepare(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = QueryDef(
            name=name, fn=prepared, oracle=oracle, description=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
