from .catalog import CATALOG, Q, queries, oracle_sql  # noqa: F401
