"""Schema system: declared types, inference, validation, registry.

Reference contract: 12 declared types with runtime coercion
(``layers/shared/python/shared/models.py:16-29,187-250``), three
schema modes (manual / auto_inference / single_column), append-only
versioned YAML registry, union-by-name evolution on silver.
"""

from serverless_data_lake_spark.schema.inference import (
    infer_schema_from_payload,
    infer_type_from_value,
    to_snake_case,
)
from serverless_data_lake_spark.schema.registry import SchemaRegistry
from serverless_data_lake_spark.schema.types import (
    ColumnDef,
    DataType,
    EndpointSchema,
    SchemaMode,
    to_spark_type,
    to_struct_type,
)
from serverless_data_lake_spark.schema.validation import (
    ValidationError,
    validate_batch,
    validate_record,
)

__all__ = [
    "ColumnDef",
    "DataType",
    "EndpointSchema",
    "SchemaMode",
    "SchemaRegistry",
    "ValidationError",
    "infer_schema_from_payload",
    "infer_type_from_value",
    "to_snake_case",
    "to_spark_type",
    "to_struct_type",
    "validate_batch",
    "validate_record",
]
