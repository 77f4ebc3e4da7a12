from pgcp_spark.sources.tables import TABLES, load_table, load_table_parallel, register_views

__all__ = ["TABLES", "load_table", "load_table_parallel", "register_views"]
