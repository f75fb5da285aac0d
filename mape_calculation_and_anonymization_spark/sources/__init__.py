from mape_calculation_and_anonymization_spark.sources.readers import (
    latest_partition,
    lowercase_columns,
    read_csv,
    read_jsonl,
    read_input_folder,
    read_parquet,
)
from mape_calculation_and_anonymization_spark.sources.sinks import (
    anonymized_output_name,
    write_excel_workbook,
    write_parquet_snappy,
)

__all__ = [
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "read_input_folder",
    "latest_partition",
    "lowercase_columns",
    "write_parquet_snappy",
    "write_excel_workbook",
    "anonymized_output_name",
]
