"""Sources & sinks: driver parquet tables, `.ss` files, stdio line protocol,
Kafka/Redis transport builders."""

from .tables import TABLE_NAMES, load_table, load_tables, register_views  # noqa: F401
