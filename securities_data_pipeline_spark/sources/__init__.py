from securities_data_pipeline_spark.sources import adapters as _adapters  # noqa: F401  (registers S2/S4 web sources)
from securities_data_pipeline_spark.sources.tables import TABLE_NAMES, load_tables, table

__all__ = ["TABLE_NAMES", "load_tables", "table"]
