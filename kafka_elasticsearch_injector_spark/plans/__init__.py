from .registry import QUERIES, QueryDef, oracle_sql, queries

__all__ = ["QUERIES", "QueryDef", "queries", "oracle_sql"]
