"""Schema inference from sample JSON payloads.

Behavioral contract from the reference (``lambdas/endpoints/main.py:32-106``):

- type per JSON value with **bool checked before int** (Python bools
  are ints), float → FLOAT, list → ARRAY, dict → JSON;
- ISO-looking strings → TIMESTAMP / DATE (pattern match);
- ``null`` → STRING, not required;
- column names snake_cased and sanitized;
- primary key guessed when the (snake_cased) name is exactly one of
  ``id``, ``uuid``, ``key``.
"""

from __future__ import annotations

import re
from typing import Any

from serverless_data_lake_spark.schema.types import (
    ColumnDef,
    DataType,
    EndpointSchema,
    SchemaMode,
)

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TIMESTAMP_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?$"
)
_CAMEL_RE_1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_RE_2 = re.compile(r"([a-z0-9])([A-Z])")
_SANITIZE_RE = re.compile(r"[^a-z0-9_]")
_PK_NAMES = {"id", "uuid", "key"}


def to_snake_case(name: str) -> str:
    name = _CAMEL_RE_1.sub(r"\1_\2", name)
    name = _CAMEL_RE_2.sub(r"\1_\2", name)
    name = name.replace("-", "_").replace(" ", "_").lower()
    name = _SANITIZE_RE.sub("", name)
    name = re.sub(r"_+", "_", name).strip("_")
    if name and name[0].isdigit():
        name = "_" + name
    return name or "column"


def infer_type_from_value(value: Any) -> DataType:
    if isinstance(value, bool):  # before int: bool is a subclass of int
        return DataType.BOOLEAN
    if isinstance(value, int):
        return DataType.INTEGER
    if isinstance(value, float):
        return DataType.FLOAT
    if isinstance(value, list):
        return DataType.ARRAY
    if isinstance(value, dict):
        return DataType.JSON
    if isinstance(value, str):
        if _TIMESTAMP_RE.match(value):
            return DataType.TIMESTAMP
        if _DATE_RE.match(value):
            return DataType.DATE
    return DataType.STRING


def infer_schema_from_payload(
    domain: str,
    name: str,
    payload: dict[str, Any],
    strict_validation: bool = False,
) -> EndpointSchema:
    columns: list[ColumnDef] = []
    for raw_name, value in payload.items():
        col = to_snake_case(raw_name)
        columns.append(
            ColumnDef(
                name=col,
                type=infer_type_from_value(value),
                required=value is not None,
                primary_key=col in _PK_NAMES,
            )
        )
    return EndpointSchema(
        domain=domain,
        name=name,
        columns=columns,
        schema_mode=SchemaMode.AUTO_INFERENCE,
        strict_validation=strict_validation,
    )


# ---------------------------------------------------------------------------
# Primary-key heuristics over a *sample of records* (reference
# ``ingestion_agent/.../runner.py:292-337``): prefer an exact "id"
# column, then "{singular}_id", then any unique "*_id", then "name",
# then "url" — uniqueness checked against the sample.
# ---------------------------------------------------------------------------
def detect_primary_key(
    records: list[dict[str, Any]], resource_name: str | None = None
) -> str | None:
    if not records:
        return None
    columns = list(records[0].keys())

    def unique(col: str) -> bool:
        vals = [r.get(col) for r in records]
        if any(v is None for v in vals):
            return False
        try:
            return len(set(vals)) == len(vals)
        except TypeError:
            return False

    if "id" in columns and unique("id"):
        return "id"
    if resource_name:
        singular = resource_name.rstrip("s")
        candidate = f"{singular}_id"
        if candidate in columns and unique(candidate):
            return candidate
    for col in columns:
        if col.endswith("_id") and unique(col):
            return col
    for fallback in ("name", "url"):
        if fallback in columns and unique(fallback):
            return fallback
    return None
