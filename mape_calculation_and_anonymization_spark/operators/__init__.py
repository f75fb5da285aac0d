from mape_calculation_and_anonymization_spark.operators.mape import (
    COLUMN_MAPPINGS,
    MapeCalculation,
    daily_mape_aggregation,
    hourly_aggregation,
)

__all__ = [
    "COLUMN_MAPPINGS",
    "MapeCalculation",
    "hourly_aggregation",
    "daily_mape_aggregation",
]
