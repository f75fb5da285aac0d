from mape_calculation_and_anonymization_spark.functions.hashing import blake2b_10hex
from mape_calculation_and_anonymization_spark.functions.labels import (
    anonymize_label_column,
    label_universe,
)

__all__ = ["blake2b_10hex", "anonymize_label_column", "label_universe"]
