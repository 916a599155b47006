"""Declared type system and its Spark mapping.

The reference declares 12 logical types
(``layers/shared/python/shared/models.py:16-29``) and three schema
modes (``models.py:32-37``). Spark mapping follows SURVEY §1.2 —
notably ``integer`` is widened to ``LongType`` internally because
JSON inference (both DuckDB's and Spark's) produces 64-bit ints, and
``decimal`` is treated as double because the reference validates it
as float.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType as SparkDataType,
    DateType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class DataType(str, Enum):
    STRING = "string"
    VARCHAR = "varchar"
    INTEGER = "integer"
    BIGINT = "bigint"
    FLOAT = "float"
    DOUBLE = "double"
    BOOLEAN = "boolean"
    TIMESTAMP = "timestamp"
    DATE = "date"
    JSON = "json"
    ARRAY = "array"
    DECIMAL = "decimal"


class SchemaMode(str, Enum):
    MANUAL = "manual"
    AUTO_INFERENCE = "auto_inference"
    SINGLE_COLUMN = "single_column"


_SPARK_TYPES: dict[DataType, SparkDataType] = {
    DataType.STRING: StringType(),
    DataType.VARCHAR: StringType(),
    DataType.INTEGER: LongType(),
    DataType.BIGINT: LongType(),
    DataType.FLOAT: DoubleType(),
    DataType.DOUBLE: DoubleType(),
    DataType.BOOLEAN: BooleanType(),
    DataType.TIMESTAMP: TimestampType(),
    DataType.DATE: DateType(),
    DataType.JSON: MapType(StringType(), StringType()),
    DataType.ARRAY: ArrayType(StringType()),
    DataType.DECIMAL: DoubleType(),
}


def to_spark_type(dtype: DataType | str) -> SparkDataType:
    return _SPARK_TYPES[DataType(dtype)]


@dataclass
class ColumnDef:
    name: str
    type: DataType
    required: bool = False
    primary_key: bool = False
    description: str = ""

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "type": self.type.value,
            "required": self.required,
            "primary_key": self.primary_key,
            "description": self.description,
        }

    @classmethod
    def from_dict(cls, d: dict) -> ColumnDef:
        return cls(
            name=d["name"],
            type=DataType(d["type"]),
            required=bool(d.get("required", False)),
            primary_key=bool(d.get("primary_key", False)),
            description=d.get("description", ""),
        )


@dataclass
class EndpointSchema:
    """A named ingestion target ``domain/name`` (reference
    ``EndpointSchema``, ``models.py:74-111``)."""

    domain: str
    name: str
    columns: list[ColumnDef] = field(default_factory=list)
    schema_mode: SchemaMode = SchemaMode.MANUAL
    strict_validation: bool = False
    description: str = ""
    # Scale extension: hive partition columns for this endpoint's
    # SILVER table (e.g. an event-date column). Partition pruning on
    # silver reads + partition-local merges; see catalog.py.
    partition_by: list[str] = field(default_factory=list)

    @property
    def primary_keys(self) -> list[str]:
        return [c.name for c in self.columns if c.primary_key]

    def to_dict(self) -> dict:
        return {
            "domain": self.domain,
            "name": self.name,
            "schema_mode": self.schema_mode.value,
            "strict_validation": self.strict_validation,
            "description": self.description,
            "partition_by": list(self.partition_by),
            "columns": [c.to_dict() for c in self.columns],
        }

    @classmethod
    def from_dict(cls, d: dict) -> EndpointSchema:
        return cls(
            domain=d["domain"],
            name=d["name"],
            columns=[ColumnDef.from_dict(c) for c in d.get("columns", [])],
            schema_mode=SchemaMode(d.get("schema_mode", "manual")),
            strict_validation=bool(d.get("strict_validation", False)),
            description=d.get("description", ""),
            partition_by=list(d.get("partition_by") or []),
        )


def to_struct_type(columns: list[ColumnDef]) -> StructType:
    return StructType(
        [
            StructField(c.name, to_spark_type(c.type), nullable=not c.required)
            for c in columns
        ]
    )
