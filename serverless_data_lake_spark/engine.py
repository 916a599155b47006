"""The Lake facade — one object wiring session, registry, store,
pipeline, and query engine together.

Usage::

    from serverless_data_lake_spark.engine import Lake

    lake = Lake.local("/tmp/my_lake")
    lake.create_endpoint(schema)                  # register bronze endpoint
    lake.ingest("sales", "orders", {...})         # push → bronze JSONL
    lake.process_silver("sales", "orders")        # dedup + MERGE → silver
    lake.create_gold_job(job_cfg); lake.run_gold("sales", "daily_revenue")
    lake.query("SELECT * FROM sales.silver.orders LIMIT 10")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from serverless_data_lake_spark.catalog import TableStore
from serverless_data_lake_spark.config import LakeConfig
from serverless_data_lake_spark.pipeline.gold import GoldRunner, GoldResult
from serverless_data_lake_spark.pipeline.silver import SilverProcessor, SilverResult
from serverless_data_lake_spark.plans.query import QueryEngine, QueryResult
from serverless_data_lake_spark.schema.inference import infer_schema_from_payload
from serverless_data_lake_spark.schema.registry import GoldJobConfig, SchemaRegistry
from serverless_data_lake_spark.schema.types import EndpointSchema
from serverless_data_lake_spark.session import get_spark
from serverless_data_lake_spark.sources.bronze import BronzeZone, IngestResult


class Lake:
    def __init__(self, spark: SparkSession, config: LakeConfig) -> None:
        self.spark = spark
        self.config = config
        self.registry = SchemaRegistry(config.registry_root)
        self.store = TableStore(spark, config)
        self.bronze = BronzeZone(spark, config, self.registry)
        self.silver = SilverProcessor(spark, config, self.registry, self.store)
        self.gold = GoldRunner(spark, config, self.registry, self.store)
        self.queries = QueryEngine(spark, config)
        # Make previously persisted tables resolvable in this session.
        self.store.register_all()

    @classmethod
    def local(cls, root: str, spark: SparkSession | None = None) -> "Lake":
        return cls(spark or get_spark(), LakeConfig(root=root))

    # ------------------------------------------------------------------
    # Endpoint / schema management
    # ------------------------------------------------------------------
    def create_endpoint(self, schema: EndpointSchema) -> int:
        return self.registry.register(schema)

    def infer_endpoint(
        self, domain: str, name: str, sample_payload: dict
    ) -> EndpointSchema:
        schema = infer_schema_from_payload(domain, name, sample_payload)
        self.registry.register(schema)
        return schema

    # ------------------------------------------------------------------
    # Ingest / pipeline
    # ------------------------------------------------------------------
    def ingest(self, domain: str, table: str, record: dict) -> IngestResult:
        return self.bronze.ingest(domain, table, record)

    def ingest_batch(
        self, domain: str, table: str, records: list[dict]
    ) -> IngestResult:
        return self.bronze.ingest_batch(domain, table, records)

    def process_silver(self, domain: str, endpoint: str) -> SilverResult:
        return self.silver.process_endpoint(domain, endpoint)

    def create_gold_job(self, job: GoldJobConfig) -> None:
        self.registry.save_gold_job(job.domain, job)

    def run_gold(self, domain: str, name: str) -> GoldResult:
        job = self.registry.get_gold_job(domain, name)
        if job is None:
            raise KeyError(f"no gold job {domain}.{name}")
        return self.gold.run_job(job)

    def run_gold_by_tag(self, tag: str) -> list[GoldResult]:
        return self.gold.run_by_tag(tag)

    # ------------------------------------------------------------------
    # Query / catalog
    # ------------------------------------------------------------------
    def query(self, sql: str) -> QueryResult:
        return self.queries.query(sql)

    def sql(self, sql: str) -> DataFrame:
        """Validated, rewritten, *lazy* query (engine-internal use)."""
        return self.queries.dataframe(sql)

    def list_tables(self) -> list[dict]:
        return self.store.list_tables()
