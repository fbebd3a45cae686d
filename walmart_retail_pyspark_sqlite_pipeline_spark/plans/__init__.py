from .registry import (
    LOCAL_REGISTRY,
    REGISTRY,
    QuerySpec,
    all_specs,
    oracle_sql_map,
    queries_map,
)

__all__ = [
    "LOCAL_REGISTRY",
    "REGISTRY",
    "QuerySpec",
    "all_specs",
    "queries_map",
    "oracle_sql_map",
]
