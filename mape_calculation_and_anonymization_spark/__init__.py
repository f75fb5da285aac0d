"""PySpark-native analytics engine with the capabilities of
jmitterh/mape_calculation_and_anonymization.

A from-scratch, Spark-first re-expression of the reference pandas ETL
tool (MAPE/WAPE pipeline + dataset anonymizer), extended with the
large-scale training-data-pipeline operators the north star asks for
(dedup, similarity search, text analysis, streaming, multimodal
plumbing).

Design rules (see SURVEY.md §7):
  * DataFrame/SQL only — no RDDs; Catalyst does pushdown/pruning.
  * UDFs only where semantics genuinely require Python (blake2b
    pseudonyms); everything else stays JVM-side for codegen.
  * No collects on fact-table paths; only dimension-sized metadata
    (label universes, key tables, final small results) reach the
    driver.
"""

from mape_calculation_and_anonymization_spark.session import get_spark
from mape_calculation_and_anonymization_spark.operators.mape import (
    COLUMN_MAPPINGS,
    MapeCalculation,
    daily_mape_aggregation,
    hourly_aggregation,
)

__all__ = [
    "get_spark",
    "COLUMN_MAPPINGS",
    "MapeCalculation",
    "hourly_aggregation",
    "daily_mape_aggregation",
]
