"""Extension operators: dedup, similarity search, text analysis,
multimodal plumbing — the training-data-pipeline surface."""

from securities_data_pipeline_spark.operators.asof import ASOF_ORACLES, ASOF_QUERIES
from securities_data_pipeline_spark.operators.assemble import (
    ASSEMBLE_ORACLES,
    ASSEMBLE_QUERIES,
)
from securities_data_pipeline_spark.operators.boilerplate import (
    BOILERPLATE_ORACLES,
    BOILERPLATE_QUERIES,
)
from securities_data_pipeline_spark.operators.curation import (
    CURATION_ORACLES,
    CURATION_QUERIES,
)
from securities_data_pipeline_spark.operators.dedup import DEDUP_ORACLES, DEDUP_QUERIES
from securities_data_pipeline_spark.operators.grouped import GROUPED_ORACLES, GROUPED_QUERIES
from securities_data_pipeline_spark.operators.profiling import (
    PROFILING_ORACLES,
    PROFILING_QUERIES,
)
from securities_data_pipeline_spark.operators.multimodal import (
    MULTIMODAL_ORACLES,
    MULTIMODAL_QUERIES,
)
from securities_data_pipeline_spark.operators.similarity import (
    SIMILARITY_ORACLES,
    SIMILARITY_QUERIES,
)
from securities_data_pipeline_spark.operators.similarity_ivfpq import (
    IVFPQ_ORACLES,
    IVFPQ_QUERIES,
)
from securities_data_pipeline_spark.operators.sampling import (
    SAMPLING_ORACLES,
    SAMPLING_QUERIES,
)
from securities_data_pipeline_spark.operators.skew import SKEW_ORACLES, SKEW_QUERIES
from securities_data_pipeline_spark.operators.substring import (
    SUBSTRING_ORACLES,
    SUBSTRING_QUERIES,
)
from securities_data_pipeline_spark.operators.textops import TEXT_ORACLES, TEXT_QUERIES

EXTENSION_QUERIES = {
    **TEXT_QUERIES,
    **ASSEMBLE_QUERIES,
    **BOILERPLATE_QUERIES,
    **CURATION_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **IVFPQ_QUERIES,
    **MULTIMODAL_QUERIES,
    **ASOF_QUERIES,
    **GROUPED_QUERIES,
    **SKEW_QUERIES,
    **SAMPLING_QUERIES,
    **SUBSTRING_QUERIES,
    **PROFILING_QUERIES,
}

EXTENSION_ORACLES = {
    **TEXT_ORACLES,
    **ASSEMBLE_ORACLES,
    **BOILERPLATE_ORACLES,
    **CURATION_ORACLES,
    **DEDUP_ORACLES,
    **SIMILARITY_ORACLES,
    **IVFPQ_ORACLES,
    **MULTIMODAL_ORACLES,
    **ASOF_ORACLES,
    **GROUPED_ORACLES,
    **SKEW_ORACLES,
    **SAMPLING_ORACLES,
    **SUBSTRING_ORACLES,
    **PROFILING_ORACLES,
}

__all__ = ["EXTENSION_QUERIES", "EXTENSION_ORACLES"]
