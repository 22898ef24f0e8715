"""Aggregate module: importing this populates the full query registry."""

from . import relational  # noqa: F401
from . import relational2  # noqa: F401
from . import relational3  # noqa: F401
from . import relational4  # noqa: F401
from . import relational5  # noqa: F401
from . import streaming_ops  # noqa: F401

try:  # LLM-pipeline ops land in a later milestone of each round
    from . import llm_ops  # noqa: F401
except ImportError:
    pass

from .registry import QUERIES, oracle_sql, queries  # noqa: F401
