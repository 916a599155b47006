"""Payload validation against declared column definitions.

Behavioral contract from the reference
(``layers/shared/python/shared/models.py:187-250`` — a dynamically
built Pydantic model — applied at
``lambdas/serverless_ingestion/main.py:204-279``):

- required columns must be present and non-null;
- values are *coerced* to the declared type where safe (int-like
  strings → int, numeric → float, "true"/"false" → bool);
- ``timestamp`` and ``date`` validate as ISO **strings** (parsing to
  real temporal types happens on the silver write, matching the
  reference where DuckDB's JSON reader does it);
- ``decimal`` validates as float, ``json`` as dict, ``array`` as list;
- **strict** mode rejects the record on any error; non-strict mode
  passes the original record through (errors reported but data kept);
- batch validation returns per-record error lists with indexes
  (partial failure semantics).
"""

from __future__ import annotations

from typing import Any

from serverless_data_lake_spark.schema.inference import _DATE_RE, _TIMESTAMP_RE
from serverless_data_lake_spark.schema.types import ColumnDef, DataType


class ValidationError(ValueError):
    def __init__(self, errors: list[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


def _coerce(value: Any, dtype: DataType) -> Any:
    """Coerce one value; raise ValueError if impossible."""
    if value is None:
        return None
    if dtype in (DataType.STRING, DataType.VARCHAR):
        if isinstance(value, (dict, list)):
            raise ValueError(f"expected string, got {type(value).__name__}")
        return value if isinstance(value, str) else str(value)
    if dtype in (DataType.INTEGER, DataType.BIGINT):
        if isinstance(value, bool):
            raise ValueError("expected integer, got boolean")
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        if isinstance(value, str):
            return int(value)
        raise ValueError(f"expected integer, got {type(value).__name__}")
    if dtype in (DataType.FLOAT, DataType.DOUBLE, DataType.DECIMAL):
        if isinstance(value, bool):
            raise ValueError("expected number, got boolean")
        if isinstance(value, (int, float)):
            return float(value)
        if isinstance(value, str):
            return float(value)
        raise ValueError(f"expected number, got {type(value).__name__}")
    if dtype is DataType.BOOLEAN:
        if isinstance(value, bool):
            return value
        if isinstance(value, str) and value.lower() in ("true", "false"):
            return value.lower() == "true"
        raise ValueError(f"expected boolean, got {value!r}")
    if dtype is DataType.TIMESTAMP:
        if isinstance(value, str) and _TIMESTAMP_RE.match(value):
            return value
        raise ValueError(f"expected ISO timestamp string, got {value!r}")
    if dtype is DataType.DATE:
        if isinstance(value, str) and _DATE_RE.match(value):
            return value
        raise ValueError(f"expected ISO date string, got {value!r}")
    if dtype is DataType.JSON:
        if isinstance(value, dict):
            return value
        raise ValueError(f"expected object, got {type(value).__name__}")
    if dtype is DataType.ARRAY:
        if isinstance(value, list):
            return value
        raise ValueError(f"expected array, got {type(value).__name__}")
    raise ValueError(f"unknown type {dtype}")


def validate_record(
    record: dict[str, Any],
    columns: list[ColumnDef],
    strict: bool = False,
) -> dict[str, Any]:
    """Validate (and coerce) one record.

    Returns the coerced record on success. On failure: raises
    :class:`ValidationError` when ``strict``; returns the **original**
    record otherwise (reference non-strict semantics — data is kept,
    errors surfaced by the caller)."""
    errors: list[str] = []
    out: dict[str, Any] = dict(record)
    for col in columns:
        present = col.name in record and record[col.name] is not None
        if col.required and not present:
            errors.append(f"missing required field: {col.name}")
            continue
        if col.name in record:
            try:
                out[col.name] = _coerce(record[col.name], col.type)
            except (ValueError, TypeError) as exc:
                errors.append(f"{col.name}: {exc}")
    if errors:
        if strict:
            raise ValidationError(errors)
        return dict(record)
    return out


def validate_batch(
    records: list[dict[str, Any]],
    columns: list[ColumnDef],
    strict: bool = False,
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Validate a batch. Returns ``(accepted, failures)`` where each
    failure is ``{"index": i, "errors": [...]}``. In strict mode
    failing records are dropped from ``accepted``; otherwise they
    pass through unmodified (errors still reported).

    Caveat, faithful to the reference: a non-strict record whose
    value can't be coerced (e.g. ``amount: "x"`` for a double
    column) lands in bronze as-is, which widens the inferred silver
    column to string — and a downstream gold ``SUM(amount)`` then
    fails at query time, exactly as the reference's DuckDB/Iceberg
    path behaves on the same input. Use ``strict_validation=True``
    on the endpoint to drop such records at the gate instead."""
    accepted: list[dict[str, Any]] = []
    failures: list[dict[str, Any]] = []
    for i, rec in enumerate(records):
        try:
            coerced = validate_record(rec, columns, strict=True)
            accepted.append(coerced)
        except ValidationError as exc:
            failures.append({"index": i, "errors": exc.errors})
            if not strict:
                accepted.append(dict(rec))
    return accepted, failures
