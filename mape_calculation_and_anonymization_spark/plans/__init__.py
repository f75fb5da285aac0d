from mape_calculation_and_anonymization_spark.plans.audit import (
    count_exchanges,
    physical_plan,
    read_schema_columns,
    uses_broadcast_join,
)

__all__ = [
    "physical_plan",
    "count_exchanges",
    "uses_broadcast_join",
    "read_schema_columns",
]
