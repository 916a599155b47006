"""Bronze → silver processing.

The write-path lifecycle (reference
``lambdas/serverless_processing_iceberg/main.py``, SURVEY §3.2):

1. read the new bronze object(s) — JSONL, schema inferred;
2. look up the endpoint's primary keys in the registry;
3. if PKs: window-dedup within the batch — **ascending**
   ``_insert_date``, keep row 1 per PK (the reference's ordinal rank;
   SURVEY §7.4 gotcha: earliest-in-batch wins, later batches still
   overwrite via the upsert, so the end state is last-batch-wins);
   then MERGE into ``{domain}_silver.{endpoint}``;
4. else: plain append;
5. metadata columns (``_insert_date``, ``_domain``, ``_endpoint``)
   are dropped before the silver write;
6. schema evolves union-by-name; the silver schema is registered
   idempotently.

Batch and streaming share this code: the streaming variant calls
:meth:`process_batch` from ``foreachBatch`` (see streaming/).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from serverless_data_lake_spark.catalog import TableStore
from serverless_data_lake_spark.config import LakeConfig
from serverless_data_lake_spark.operators.dedup import keep_one_ordered
from serverless_data_lake_spark.schema.registry import SchemaRegistry
from serverless_data_lake_spark.schema.types import (
    ColumnDef,
    DataType,
    EndpointSchema,
    SchemaMode,
)
from serverless_data_lake_spark.sources.bronze import METADATA_COLUMNS, BronzeZone


@dataclass
class SilverResult:
    domain: str
    endpoint: str
    rows_in: int
    rows_written: int
    mode: str  # "merge" | "append"


class SilverProcessor:
    def __init__(
        self,
        spark: SparkSession,
        config: LakeConfig,
        registry: SchemaRegistry | None = None,
        store: TableStore | None = None,
    ) -> None:
        self.spark = spark
        self.config = config
        self.registry = registry or SchemaRegistry(config.registry_root)
        self.store = store or TableStore(spark, config)
        self.bronze = BronzeZone(spark, config, self.registry)

    # ------------------------------------------------------------------
    def process_endpoint(self, domain: str, endpoint: str) -> SilverResult:
        """Process the full bronze prefix for one endpoint (the batch
        analogue of replaying all S3 events)."""
        df = self.bronze.read(domain, endpoint)
        return self.process_batch(domain, endpoint, self._with_arrival(df))

    def process_objects(
        self, domain: str, endpoint: str, paths: list[str]
    ) -> SilverResult:
        """Process specific bronze objects (the per-S3-event path)."""
        df = self.spark.read.option("inferTimestamp", "true").json(paths)
        return self.process_batch(domain, endpoint, self._with_arrival(df))

    @staticmethod
    def _with_arrival(df: DataFrame) -> DataFrame:
        """Attach the object arrival time (file modification time).

        The reference processes one S3 object per event, sequentially:
        within an object the *earliest* ``_insert_date`` per PK wins
        (ascending ordinal rank), but each later object's upsert
        overwrites earlier state. Replaying a whole prefix in one pass
        reproduces that end state with a single window ordered by
        (arrival DESC, _insert_date ASC) — no per-object driver loop,
        one shuffle total."""
        return df.withColumn(
            "__arrival", F.col("_metadata.file_modification_time")
        )

    def process_batch(
        self, domain: str, endpoint: str, df: DataFrame
    ) -> SilverResult:
        schema = self.registry.get(domain, endpoint)
        primary_keys = schema.primary_keys if schema else []
        rows_in = df.count()

        database = self.config.database_name(domain, "silver")
        if primary_keys:
            order = (
                [F.col("__arrival").desc()] if "__arrival" in df.columns else []
            ) + [F.col("_insert_date").asc()]
            deduped = keep_one_ordered(df, primary_keys, order)
            cleaned = deduped.drop(*METADATA_COLUMNS, "__arrival")
            self.store.merge(database, endpoint, cleaned, primary_keys)
            mode = "merge"
        else:
            cleaned = df.drop(*METADATA_COLUMNS, "__arrival")
            self.store.append(database, endpoint, cleaned)
            mode = "append"

        self._register_silver(domain, endpoint, cleaned, primary_keys)
        rows_written = cleaned.count()
        return SilverResult(domain, endpoint, rows_in, rows_written, mode)

    # ------------------------------------------------------------------
    def _register_silver(
        self,
        domain: str,
        endpoint: str,
        df: DataFrame,
        primary_keys: list[str],
    ) -> None:
        """Idempotent silver-schema registration (reference
        ``register_silver_table``, ``schema_registry.py:348-379``)."""
        type_map = {
            "string": DataType.STRING,
            "long": DataType.BIGINT,
            "integer": DataType.INTEGER,
            "double": DataType.DOUBLE,
            "float": DataType.FLOAT,
            "boolean": DataType.BOOLEAN,
            "timestamp": DataType.TIMESTAMP,
            "date": DataType.DATE,
        }
        columns = []
        for f in df.schema.fields:
            simple = f.dataType.simpleString()
            if simple.startswith("array"):
                dtype = DataType.ARRAY
            elif simple.startswith(("struct", "map")):
                dtype = DataType.JSON
            else:
                dtype = type_map.get(simple, DataType.STRING)
            columns.append(
                ColumnDef(
                    name=f.name,
                    type=dtype,
                    primary_key=f.name in primary_keys,
                )
            )
        self.registry.register_silver(
            EndpointSchema(
                domain=domain,
                name=endpoint,
                columns=columns,
                schema_mode=SchemaMode.AUTO_INFERENCE,
            )
        )
