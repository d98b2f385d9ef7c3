"""Sources/sinks: TableIO (Iceberg/Parquet seam), JSON-string ingestion,
defaults/overrides merge + inventory templating."""

from schema_enforcer_spark.sources.table_io import TableIO, with_json_column
from schema_enforcer_spark.sources.defaults import (
    inventory_defaults,
    merge_defaults,
    merge_vars,
    render_templates,
)

__all__ = [
    "TableIO",
    "with_json_column",
    "inventory_defaults",
    "merge_defaults",
    "merge_vars",
    "render_templates",
]
