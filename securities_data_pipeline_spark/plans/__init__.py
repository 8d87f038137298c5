from securities_data_pipeline_spark.plans.relational import RELATIONAL_QUERIES, RELATIONAL_ORACLES

__all__ = ["RELATIONAL_QUERIES", "RELATIONAL_ORACLES"]
