"""SQL-gate cases (ports the reference's ~20 security cases,
tests/test_consumption.py:278-367)."""

from __future__ import annotations

import pytest

from serverless_data_lake_spark.plans.validate import (
    QueryValidationError,
    validate_query,
)

ALLOWED = [
    "SELECT 1",
    "select * from sales.silver.orders",
    "WITH x AS (SELECT 1 AS a) SELECT * FROM x",
    "SELECT 'DROP TABLE users' AS s",  # keyword inside a literal
    "SELECT /* delete nothing */ 1",  # keyword inside a comment
    "SELECT a FROM t WHERE note = 'please truncate this'",
    "SELECT 1;",  # trailing semicolon ok
    "SELECT created_at FROM t",  # 'create' substring of identifier
    "  \n SELECT 1",
]

BLOCKED = [
    "DROP TABLE t",
    "INSERT INTO t VALUES (1)",
    "UPDATE t SET a = 1",
    "DELETE FROM t",
    "CREATE TABLE t (a INT)",
    "ALTER TABLE t ADD COLUMN b INT",
    "TRUNCATE TABLE t",
    "MERGE INTO t USING s ON 1=1 WHEN MATCHED THEN DELETE",
    "GRANT ALL ON t TO x",
    "ATTACH 'db' AS other",
    "INSTALL httpfs",
    "LOAD httpfs",
    "SET memory_limit='1GB'",
    "PRAGMA show_tables",
    "CALL something()",
    "BEGIN TRANSACTION",
    "COPY t TO 'out.csv'",
    "EXPORT DATABASE 'dir'",
    "VACUUM",
    "SELECT * FROM read_csv('f.csv')",
    "SELECT * FROM read_parquet('f.parquet')",
    "SELECT * FROM read_json_auto('f.json')",
    "SELECT * FROM delta_scan('s3://b/t')",
    "SELECT * FROM iceberg_scan('s3://b/t')",
    "SELECT glob('*')",
    "SELECT 1; DROP TABLE t",
    "SELECT 1; SELECT 2",
    "",
    "   ",
]


@pytest.mark.parametrize("sql", ALLOWED)
def test_allowed(sql):
    assert validate_query(sql) == sql


@pytest.mark.parametrize("sql", BLOCKED)
def test_blocked(sql):
    with pytest.raises(QueryValidationError):
        validate_query(sql)


def test_length_cap():
    with pytest.raises(QueryValidationError, match="maximum length"):
        validate_query("SELECT 1 " + " " * 10_000)


def test_select_star_exclude_is_not_a_blocked_statement():
    # EXCEPT-like star modifiers pass through to the dialect layer.
    validate_query("SELECT * EXCLUDE (a) FROM sales.silver.t")
