from schema_enforcer_spark.sources.table_io import TableIO

__all__ = ["TableIO"]
