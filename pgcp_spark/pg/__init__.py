from pgcp_spark.pg.client import JvmJdbcClient, PgClient
from pgcp_spark.pg.catalog import (
    column_definitions,
    get_indexes,
    list_tables,
    schema_names,
    table_exists,
)
from pgcp_spark.pg.ddl import create_index_statements, create_table_statement

__all__ = [
    "PgClient",
    "JvmJdbcClient",
    "list_tables",
    "schema_names",
    "column_definitions",
    "get_indexes",
    "table_exists",
    "create_table_statement",
    "create_index_statements",
]
