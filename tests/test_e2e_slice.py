"""End-to-end slice: ingest JSONL with duplicate PKs → silver dedup +
merge → gold aggregate → query through the full serving path.

Mirrors SURVEY §7.2 step 1 and the reference fixtures (FIXTURES.md
F1/F2/F7).
"""

from __future__ import annotations

import pytest

from serverless_data_lake_spark.schema.registry import GoldJobConfig
from serverless_data_lake_spark.schema.types import (
    ColumnDef,
    DataType,
    EndpointSchema,
)

ORDERS_SCHEMA = EndpointSchema(
    domain="sales",
    name="orders",
    columns=[
        ColumnDef("order_id", DataType.INTEGER, required=True, primary_key=True),
        ColumnDef("customer_id", DataType.INTEGER, required=True),
        ColumnDef("total_amount", DataType.DECIMAL, required=True),
        ColumnDef("status", DataType.STRING),
        ColumnDef("created_at", DataType.TIMESTAMP),
    ],
)


@pytest.fixture()
def seeded(lake):
    lake.create_endpoint(ORDERS_SCHEMA)
    lake.ingest_batch(
        "sales",
        "orders",
        [
            {"order_id": 1, "customer_id": 10, "total_amount": 100.0,
             "status": "new", "created_at": "2024-01-15T10:30:00Z"},
            {"order_id": 2, "customer_id": 11, "total_amount": 250.0,
             "status": "new", "created_at": "2024-01-15T11:00:00Z"},
        ],
    )
    # Second batch: duplicate PK 1 (an update) + new PK 3.
    lake.ingest_batch(
        "sales",
        "orders",
        [
            {"order_id": 1, "customer_id": 10, "total_amount": 120.0,
             "status": "paid", "created_at": "2024-01-15T10:30:00Z"},
            {"order_id": 3, "customer_id": 12, "total_amount": 75.5,
             "status": "new", "created_at": "2024-01-16T09:00:00Z"},
        ],
    )
    lake.process_silver("sales", "orders")
    return lake


def test_silver_dedup_one_row_per_pk(seeded):
    res = seeded.query("SELECT order_id, total_amount, status FROM sales.silver.orders")
    assert res.row_count == 3
    by_id = {r["order_id"]: r for r in res.rows}
    # Batch 2's version of PK 1 wins (last-batch-wins across batches).
    assert by_id[1]["total_amount"] == 120.0
    assert by_id[1]["status"] == "paid"
    assert by_id[3]["total_amount"] == 75.5


def test_metadata_columns_dropped(seeded):
    res = seeded.query("SELECT * FROM sales.silver.orders LIMIT 1")
    for col in ("_insert_date", "_domain", "_endpoint"):
        assert col not in res.columns


def test_bronze_query_keeps_metadata(seeded):
    res = seeded.query(
        "SELECT order_id, _domain, _endpoint FROM sales.bronze.orders"
    )
    assert res.row_count == 4  # all raw rows, duplicates included
    assert all(r["_domain"] == "sales" for r in res.rows)


def test_within_object_dedup_keeps_earliest(lake):
    """The reference keeps the EARLIEST _insert_date per PK *within
    one bronze object* (ascending ordinal rank — SURVEY §7.4): a
    Firehose object buffers several pushes, each carrying its own
    ``_insert_date``. Craft one object with two versions of PK 9."""
    lake.create_endpoint(ORDERS_SCHEMA)
    lake.bronze._write_jsonl(
        "sales",
        "orders",
        [
            {"order_id": 9, "customer_id": 1, "total_amount": 1.0,
             "status": "first", "_insert_date": "2024-01-01T00:00:00.000000",
             "_domain": "sales", "_endpoint": "orders"},
            {"order_id": 9, "customer_id": 1, "total_amount": 2.0,
             "status": "second", "_insert_date": "2024-01-01T00:00:01.000000",
             "_domain": "sales", "_endpoint": "orders"},
        ],
    )
    lake.process_silver("sales", "orders")
    res = lake.query("SELECT status FROM sales.silver.orders WHERE order_id = 9")
    assert res.row_count == 1
    assert res.rows[0]["status"] == "first"


def test_across_objects_last_object_wins(lake):
    """Separate ingest calls = separate bronze objects = sequential
    upserts in the reference: the later object's version wins."""
    lake.create_endpoint(ORDERS_SCHEMA)
    lake.ingest("sales", "orders", {"order_id": 9, "customer_id": 1,
                                    "total_amount": 1.0, "status": "first"})
    import time as _t
    _t.sleep(1.1)  # distinct file modification times
    lake.ingest("sales", "orders", {"order_id": 9, "customer_id": 1,
                                    "total_amount": 2.0, "status": "second"})
    lake.process_silver("sales", "orders")
    res = lake.query("SELECT status FROM sales.silver.orders WHERE order_id = 9")
    assert res.row_count == 1
    assert res.rows[0]["status"] == "second"


def test_gold_overwrite_and_upsert(seeded):
    seeded.create_gold_job(
        GoldJobConfig(
            domain="sales",
            name="daily_revenue",
            query=(
                "SELECT CAST(created_at AS DATE) AS day, "
                "CAST(SUM(CAST(total_amount AS DECIMAL(38,4))) AS DOUBLE) AS revenue "
                "FROM sales.silver.orders GROUP BY 1"
            ),
            write_mode="append",
            unique_key=["day"],
        )
    )
    r1 = seeded.run_gold("sales", "daily_revenue")
    assert r1.rows == 2  # two distinct days
    # Re-run: upsert by day — still 2 rows, not 4.
    r2 = seeded.run_gold("sales", "daily_revenue")
    assert r2.rows == 2
    res = seeded.query(
        "SELECT day, revenue FROM sales.gold.daily_revenue ORDER BY day"
    )
    assert res.rows[0]["revenue"] == pytest.approx(370.0)  # 120 + 250
    assert res.rows[1]["revenue"] == pytest.approx(75.5)


def test_dependency_dag(seeded):
    seeded.create_gold_job(
        GoldJobConfig(
            domain="sales",
            name="daily_revenue",
            query=(
                "SELECT CAST(created_at AS DATE) AS day, "
                "CAST(SUM(CAST(total_amount AS DECIMAL(38,4))) AS DOUBLE) AS revenue "
                "FROM sales.silver.orders GROUP BY 1"
            ),
            write_mode="overwrite",
            schedule_type="dependency",
        )
    )
    seeded.create_gold_job(
        GoldJobConfig(
            domain="sales",
            name="report",
            query=(
                "SELECT COUNT(*) AS n_days, "
                "CAST(SUM(CAST(revenue AS DECIMAL(38,4))) AS DOUBLE) AS total "
                "FROM sales.gold.daily_revenue"
            ),
            write_mode="overwrite",
            schedule_type="cron",
            cron_schedule="day",
            dependencies=["daily_revenue"],
        )
    )
    results = seeded.run_gold_by_tag("day")
    names = [r.name for r in results]
    assert names.index("daily_revenue") < names.index("report")
    res = seeded.query("SELECT n_days, total FROM sales.gold.report")
    assert res.rows[0]["n_days"] == 2
    assert res.rows[0]["total"] == pytest.approx(445.5)


def test_row_cap_truncation(seeded):
    seeded.config.max_result_rows = 2
    res = seeded.query("SELECT order_id FROM sales.silver.orders")
    assert res.row_count == 2
    assert res.truncated is True
    seeded.config.max_result_rows = 10_000


def test_schema_evolution_union_by_name(seeded):
    # New column appears in a later batch.
    seeded.ingest_batch(
        "sales",
        "orders",
        [{"order_id": 4, "customer_id": 13, "total_amount": 10.0,
          "status": "new", "created_at": "2024-01-17T09:00:00Z",
          "coupon": "WELCOME"}],
    )
    seeded.process_silver("sales", "orders")
    res = seeded.query(
        "SELECT order_id, coupon FROM sales.silver.orders ORDER BY order_id"
    )
    assert res.row_count == 4
    assert res.rows[-1]["coupon"] == "WELCOME"
    assert res.rows[0]["coupon"] is None


def test_single_column_mode(lake):
    from serverless_data_lake_spark.schema.types import (
        EndpointSchema, SchemaMode,
    )

    lake.create_endpoint(EndpointSchema(
        domain="raw", name="blobs", schema_mode=SchemaMode.SINGLE_COLUMN,
    ))
    lake.ingest_batch("raw", "blobs", [
        {"anything": {"nested": [1, 2]}, "x": 1},
        {"other": "shape"},
    ])
    lake.process_silver("raw", "blobs")
    res = lake.query(
        "SELECT get_json_object(data, '$.x') AS x FROM raw.silver.blobs"
    )
    assert res.row_count == 2
    assert {r["x"] for r in res.rows} == {"1", None}


def test_strict_endpoint_drops_invalid_and_keeps_silver_typed(lake):
    """strict_validation=True must gate malformed records at ingest,
    keeping silver numerically queryable (pinned after the r12
    /verify drive walked both modes end-to-end)."""
    import dataclasses

    lake.create_endpoint(dataclasses.replace(
        ORDERS_SCHEMA, strict_validation=True,
    ))
    res = lake.ingest_batch("sales", "orders", [
        {"order_id": 1, "customer_id": 10, "total_amount": 100.0,
         "status": "new", "created_at": "2024-01-15T10:30:00Z"},
        {"order_id": "bad", "customer_id": 10, "total_amount": "x",
         "status": "new", "created_at": "2024-01-15T10:30:00Z"},
    ])
    assert (res.accepted, res.failed) == (1, 1)
    assert res.errors[0]["index"] == 1
    lake.process_silver("sales", "orders")
    agg = lake.query(
        "SELECT CAST(SUM(CAST(total_amount AS DECIMAL(38,6))) AS DOUBLE)"
        " AS total FROM sales.silver.orders"
    )
    assert agg.rows == [{"total": 100.0}]


def test_non_strict_widening_caveat(lake):
    """The DOCUMENTED non-strict contract (validate_batch docstring,
    faithful to the reference): a malformed record is reported AND
    ingested as-is, widening the silver column to string — a
    downstream numeric aggregate then fails at query time, not at
    ingest. This pin keeps the caveat honest in both directions: the
    record must arrive (no silent drop) and the widening must be
    observable."""
    from serverless_data_lake_spark.plans.query import (
        QueryExecutionError,
    )

    lake.create_endpoint(ORDERS_SCHEMA)  # default: non-strict
    res = lake.ingest_batch("sales", "orders", [
        {"order_id": 1, "customer_id": 10, "total_amount": 100.0,
         "status": "new", "created_at": "2024-01-15T10:30:00Z"},
        {"order_id": "bad", "customer_id": 10, "total_amount": "x",
         "status": "new", "created_at": "2024-01-15T10:30:00Z"},
    ])
    assert (res.accepted, res.failed) == (2, 1)  # reported, not dropped
    lake.process_silver("sales", "orders")
    rows = lake.query(
        "SELECT total_amount FROM sales.silver.orders ORDER BY order_id"
    ).rows
    assert {r["total_amount"] for r in rows} == {"100.0", "x"}  # widened
    import pytest

    with pytest.raises(QueryExecutionError):
        lake.query(
            "SELECT CAST(SUM(CAST(total_amount AS DECIMAL(38,6))) AS"
            " DOUBLE) AS total FROM sales.silver.orders"
        )
