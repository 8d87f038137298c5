from securities_data_pipeline_spark.streaming.ingest import (
    STREAMING_ORACLES,
    STREAMING_QUERIES,
)

__all__ = ["STREAMING_QUERIES", "STREAMING_ORACLES"]
