from .registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map

__all__ = ["REGISTRY", "QuerySpec", "queries_map", "oracle_sql_map"]
