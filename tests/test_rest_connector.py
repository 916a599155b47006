"""REST connector: all seven pagination strategies, data-path
auto-detection, fuzzy endpoint dedup, retry, and plan → bronze →
silver integration (reference tests/test_ingestion_runner.py)."""

from __future__ import annotations

import pytest

from serverless_data_lake_spark.sources.rest import (
    EndpointSpec,
    IngestionPlan,
    PaginationConfig,
    RestSource,
    dedupe_endpoint_names,
    detect_data_path,
    extract_path,
    paginate,
    records_from,
)


def fake_server(routes):
    """fetcher closure over {(url): fn(params) -> (body, headers)}."""
    calls = []

    def fetch(url, params, headers):
        calls.append((url, dict(params), dict(headers)))
        fn = routes.get(url)
        if fn is None:
            raise RuntimeError(f"404 {url}")
        out = fn(params)
        return out if isinstance(out, tuple) else (out, {})

    fetch.calls = calls
    return fetch


BASE = "https://api.example.com"


class TestDataPath:
    def test_extract_dot_path(self):
        assert extract_path({"a": {"b": [1]}}, "a.b") == [1]
        assert extract_path({"a": 1}, "a.b") is None
        assert extract_path([1, 2], None) == [1, 2]

    def test_detect_top_level_list(self):
        assert detect_data_path([{"x": 1}]) is None

    def test_detect_largest_list(self):
        body = {"meta": [{"m": 1}], "results": [{"a": 1}, {"a": 2}]}
        assert detect_data_path(body) == "results"

    def test_detect_nested(self):
        body = {"data": {"records": [{"a": 1}, {"a": 2}]}, "count": 2}
        assert detect_data_path(body) == "data.records"

    def test_records_fall_back_to_auto(self):
        body = {"results": [{"a": 1}]}
        assert records_from(body, "wrong.path") == [{"a": 1}]


class TestPagination:
    def spec(self, **kw):
        pag = kw.pop("pagination", {})
        return EndpointSpec(
            name="items", path="/items",
            pagination=PaginationConfig.from_dict(pag), **kw
        )

    def test_single_page(self):
        f = fake_server({f"{BASE}/items": lambda p: [{"id": 1}, {"id": 2}]})
        pages = list(paginate(BASE, self.spec(pagination={"type": "single_page"}), {}, f))
        assert pages == [[{"id": 1}, {"id": 2}]]

    def test_json_link(self):
        f = fake_server({
            f"{BASE}/items": lambda p: {"results": [{"id": 1}],
                                        "next": f"{BASE}/items?page=2"},
            f"{BASE}/items?page=2": lambda p: {"results": [{"id": 2}], "next": None},
        })
        pages = list(paginate(
            BASE, self.spec(pagination={"type": "json_link"}, data_path="results"),
            {}, f,
        ))
        assert [r["id"] for page in pages for r in page] == [1, 2]

    def test_json_link_nested_path(self):
        f = fake_server({
            f"{BASE}/items": lambda p: {"info": {"next": f"{BASE}/p2"},
                                        "results": [{"id": 1}]},
            f"{BASE}/p2": lambda p: {"info": {"next": None}, "results": [{"id": 2}]},
        })
        pages = list(paginate(
            BASE,
            self.spec(pagination={"type": "json_link",
                                  "next_url_path": "info.next"}),
            {}, f,
        ))
        assert len(pages) == 2

    def test_page_number_with_total(self):
        def route(p):
            page = p.get("page", 1)
            return {"items": [{"id": page}], "total": 3}

        f = fake_server({f"{BASE}/items": route})
        pages = list(paginate(
            BASE,
            self.spec(pagination={"type": "page_number", "total_path": "total"}),
            {}, f,
        ))
        assert [r["id"] for page in pages for r in page] == [1, 2, 3]

    def test_page_number_stops_on_empty(self):
        def route(p):
            page = p.get("page", 1)
            return {"items": [{"id": page}] if page <= 2 else []}

        f = fake_server({f"{BASE}/items": route})
        pages = list(paginate(
            BASE, self.spec(pagination={"type": "page_number"}), {}, f
        ))
        assert len(pages) == 2

    def test_offset(self):
        data = [{"id": i} for i in range(5)]

        def route(p):
            off, lim = p.get("offset", 0), p.get("limit", 100)
            return {"items": data[off : off + lim], "total": 5}

        f = fake_server({f"{BASE}/items": route})
        pages = list(paginate(
            BASE,
            self.spec(pagination={"type": "offset", "limit": 2,
                                  "total_path": "total"}),
            {}, f,
        ))
        assert [r["id"] for page in pages for r in page] == [0, 1, 2, 3, 4]

    def test_cursor(self):
        def route(p):
            cur = p.get("cursor")
            if cur is None:
                return {"items": [{"id": 1}], "next_cursor": "c2"}
            return {"items": [{"id": 2}], "next_cursor": None}

        f = fake_server({f"{BASE}/items": route})
        pages = list(paginate(
            BASE, self.spec(pagination={"type": "cursor"}), {}, f
        ))
        assert [r["id"] for page in pages for r in page] == [1, 2]

    def test_header_link(self):
        f = fake_server({
            f"{BASE}/items": lambda p: ([{"id": 1}],
                                        {"Link": f'<{BASE}/p2>; rel="next"'}),
            f"{BASE}/p2": lambda p: ([{"id": 2}], {}),
        })
        pages = list(paginate(
            BASE, self.spec(pagination={"type": "header_link"}), {}, f
        ))
        assert [r["id"] for page in pages for r in page] == [1, 2]

    def test_auto_detects_json_next(self):
        f = fake_server({
            f"{BASE}/items": lambda p: {"results": [{"id": 1}],
                                        "next": f"{BASE}/p2"},
            f"{BASE}/p2": lambda p: {"results": [{"id": 2}], "next": None},
        })
        pages = list(paginate(BASE, self.spec(), {}, f))
        assert [r["id"] for page in pages for r in page] == [1, 2]

    def test_auto_single_page_fallback(self):
        f = fake_server({f"{BASE}/items": lambda p: [{"id": 1}]})
        pages = list(paginate(BASE, self.spec(), {}, f))
        assert pages == [[{"id": 1}]]

    def test_no_fallback_after_pages_yielded(self):
        """A paginator failure AFTER pages were yielded must raise,
        not fall back to single_page — the fallback would re-fetch
        page 1 and duplicate already-ingested records in bronze
        (r1 advice)."""
        from serverless_data_lake_spark.sources.rest import _PaginatorError

        f = fake_server({
            f"{BASE}/items": lambda p: {"results": [{"id": 1}],
                                        "next": f"{BASE}/items"},
        })
        spec = self.spec(
            pagination={"type": "json_link", "max_pages": 2}
        )
        got = []
        with pytest.raises(_PaginatorError):
            for page in paginate(BASE, spec, {}, f):
                got.append(page)
        # Pages seen before the failure were yielded exactly once.
        assert got and all(p == [{"id": 1}] for p in got)

    def test_fallback_when_nothing_yielded(self):
        """Unknown strategy fails before any yield → single_page
        fallback still applies (reference behavior)."""
        f = fake_server({f"{BASE}/items": lambda p: [{"id": 7}]})
        spec = self.spec()
        spec.pagination.type = "page_number"
        # Sabotage: page_number against a server that returns a plain
        # list forever would loop to max_pages; use max_pages=0 so it
        # raises before yielding.
        spec.pagination.max_pages = 0
        pages = list(paginate(BASE, spec, {}, f))
        assert pages == [[{"id": 7}]]


class TestFuzzyDedup:
    def test_plural_normalization(self):
        assert dedupe_endpoint_names(["user", "users"]) == ["user"]
        assert dedupe_endpoint_names(["category", "categories"]) == ["category"]

    def test_similar_names(self):
        assert dedupe_endpoint_names(["customer", "customerz"]) == ["customer"]

    def test_distinct_kept(self):
        assert dedupe_endpoint_names(["users", "orders", "parts"]) == [
            "users", "orders", "parts"
        ]


class TestRetry:
    def test_backoff_then_success(self, lake):
        attempts = []

        def flaky(url, params, headers):
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("boom")
            return [{"id": 1}], {}

        slept = []
        src = RestSource(lake, fetcher=flaky, sleep=slept.append)
        body, _ = src._fetch_retry("u", {}, {})
        assert body == [{"id": 1}]
        assert slept == [1.0, 2.0]

    def test_gives_up_after_max(self, lake):
        def always_fail(url, params, headers):
            raise RuntimeError("down")

        slept = []
        src = RestSource(lake, fetcher=always_fail, sleep=slept.append)
        with pytest.raises(RuntimeError, match="down"):
            src._fetch_retry("u", {}, {})
        assert len(slept) == RestSource.MAX_RETRIES - 1
        assert max(slept) <= RestSource.BACKOFF_CAP


class TestPlanToLake:
    def test_pull_ingest_silver(self, lake):
        records = [{"id": i, "name": f"u{i}", "score": i * 1.5} for i in range(60)]

        def route(p):
            off, lim = p.get("offset", 0), p.get("limit", 100)
            return {"data": records[off : off + lim], "total": len(records)}

        f = fake_server({f"{BASE}/users": route})
        plan = IngestionPlan(
            domain="crm", base_url=BASE,
            endpoints=[EndpointSpec(
                name="users", path="/users", data_path="data",
                pagination=PaginationConfig(type="offset", limit=25,
                                            total_path="total"),
            )],
            auth_type="bearer", auth_token="tok",
        )
        results = RestSource(lake, fetcher=f).run_plan(plan)
        assert results[0].records == 60
        assert results[0].errors == 0
        # auth header reached the server
        assert f.calls[0][2] == {"Authorization": "Bearer tok"}
        # schema registered with PK detected as "id"
        schema = lake.registry.get("crm", "users")
        assert schema.primary_keys == ["id"]
        # bronze → silver → query round trip
        lake.process_silver("crm", "users")
        res = lake.query("SELECT COUNT(*) AS n FROM crm.silver.users")
        assert res.rows[0]["n"] == 60

    def test_pk_drop_retry_on_unbound_key(self, lake):
        """A declared primary key missing from the data retries the
        endpoint once WITHOUT the key (reference runner.py:956-970,
        dlt UnboundColumnException handling); records are ingested
        exactly once and the registered schema carries no PK."""
        f = fake_server({f"{BASE}/users": lambda p: [
            {"name": "a", "score": 1.0}, {"name": "b", "score": 2.0},
        ]})
        plan = IngestionPlan(
            domain="crm", base_url=BASE,
            endpoints=[EndpointSpec(
                name="users", path="/users",
                pagination=PaginationConfig(type="single_page"),
                primary_key="user_uuid",  # not in the records
            )],
        )
        results = RestSource(lake, fetcher=f, sleep=lambda s: None).run_plan(plan)
        assert results[0].records == 2 and results[0].errors == 0
        schema = lake.registry.get("crm", "users")
        assert schema.primary_keys == []
        # retry re-fetched the page (once before, once after the drop)
        assert len(f.calls) == 2

    def test_failed_endpoint_raises_after_all(self, lake):
        f = fake_server({f"{BASE}/good": lambda p: [{"id": 1}]})
        plan = IngestionPlan(
            domain="crm", base_url=BASE,
            endpoints=[
                EndpointSpec(name="good", path="/good"),
                EndpointSpec(name="bad", path="/missing"),
            ],
        )
        src = RestSource(lake, fetcher=f, sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="bad"):
            src.run_plan(plan)
        # the good endpoint still landed
        assert lake.bronze.list_objects("crm", "good")


class TestPlanRegistry:
    def test_save_list_run_by_tag(self, lake):
        f = fake_server({f"{BASE}/items": lambda p: [{"id": 1, "v": 2.0}]})
        plan = IngestionPlan(
            domain="crm", base_url=BASE, tag="hour",
            endpoints=[EndpointSpec(name="items", path="/items")],
        )
        lake.save_ingestion_plan(plan)
        loaded = lake.list_ingestion_plans()
        assert len(loaded) == 1
        assert loaded[0].tag == "hour"
        assert loaded[0].endpoints[0].name == "items"
        src = RestSource(lake, fetcher=f)
        assert src.run_plans_by_tag("day") == []  # tag mismatch
        results = src.run_plans_by_tag("hour")
        assert results[0].records == 1


class TestExport:
    def test_export_parquet(self, lake, tmp_path):
        lake.ingest_batch("crm", "t", [{"id": 1, "v": 1.5}, {"id": 2, "v": 2.5}])
        lake.process_silver("crm", "t")
        n = lake.export_parquet("crm.silver.t", str(tmp_path / "out"))
        assert n == 2
