"""Query plans: the declared, oracle-checked inventory of engine capabilities.

Importing :mod:`sea_streamer_spark.plans.queries` populates the registry with
every named query (SURVEY.md §2 inventory + LLM-pipeline ops)."""

from .registry import QUERIES, QueryDef, query  # noqa: F401
