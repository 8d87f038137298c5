"""securities_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``tiloye/securities-data-pipeline`` (a pandas + dbt batch ETL/warehouse
system for daily securities market data) as an idiomatic PySpark engine:

- DataFrame/SQL-first: every operator is declared against Catalyst so
  column pruning, predicate pushdown, join selection and AQE come free.
- Batch + Structured Streaming ingestion with merge-upsert sinks.
- A declarative check framework covering the reference's pandera schemas
  and dbt data tests with one mechanism.
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB / 1000-executor
  clusters, tested at small scale factors.

Reference parity citations in docstrings use ``file:line`` paths relative
to the reference snapshot.
"""

from securities_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
