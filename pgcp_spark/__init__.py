"""pgcp_spark — a PySpark-native analytics engine with the capabilities of
holistics/pgcp, extended with a full relational query layer and
LLM-data-pipeline operators (dedup, similarity search, text analysis).

Layout (see SURVEY.md §7):
  - ``session``        tuned SparkSession factory
  - ``qualified_name`` schema.table parsing (ref: lib/pgcp/qualified_name.rb)
  - ``config``         YAML connection config (ref: lib/pgcp_runner.rb:46-53)
  - ``catalog``        PG catalog introspection SQL (ref: lib/pgcp/postgres.rb)
  - ``ddl``            CREATE TABLE / index DDL synthesis (ref: postgres.rb:263-325)
  - ``transport``      copy orchestration: staging + hotswap (ref: transport.rb)
  - ``sources``        parquet/csv/jdbc readers
  - ``operators``      relational query operators (registered in the registry)
  - ``functions``      dedup / similarity / text-analysis / multimodal ops
  - ``streaming``      Structured Streaming over the events table
  - ``registry``       query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"
