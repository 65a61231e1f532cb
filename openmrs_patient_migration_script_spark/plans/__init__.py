"""Declared-query registry (the SURVEY.md §2 contract).

Importing this package populates ``QUERIES`` / ``ORACLES`` from the query
modules; ``__spark_entry__.py`` re-exports them for the driver.
"""

from openmrs_patient_migration_script_spark.plans.registry import ORACLES, QUERIES, query

# populate the registry
from openmrs_patient_migration_script_spark.plans import (  # noqa: E402,F401
    relational,
    etl_queries,
    text_queries,
    similarity_queries,
    dedup_queries,
    streaming_queries,
    multimodal_queries,
    analytics_queries,
    corpus_queries,
    privacy_queries,
    quality_queries,
    sketch_queries,
    source_queries,
)

__all__ = ["QUERIES", "ORACLES", "query"]
