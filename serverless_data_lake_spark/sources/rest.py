"""Declarative REST-extraction source (reference S13 + P1).

Behavioral contract from the reference's ingestion agent
(``lambdas/ingestion_agent/agents/ingestion_agent/models.py:19-404``,
``runner.py:195-337,560-611,772-1008``):

- an **ingestion plan** = base_url + auth (bearer / api-key header) +
  a list of endpoint specs (path, params, data_path, primary_key,
  pagination);
- **pagination strategies**: ``json_link`` (follow a next-URL field),
  ``page_number`` (with optional total field), ``offset``
  (limit/offset params with optional total), ``cursor`` (cursor
  field → request param), ``header_link`` (RFC-5988 Link header),
  ``auto`` (probe: header link → common next-link fields → single),
  ``single_page``;
- **data-path auto-detection**: find the list of records inside a
  JSON response (largest list of dicts wins; dot-paths supported);
- records are pushed to the bronze ingest API in batches of 25, with
  bounded-exponential retry;
- paginator errors fall back to ``auto`` → ``single_page`` rather
  than failing the run.

This is driver-side Python by design — the *fetch* is inherently
sequential HTTP; Spark enters at the bronze append. The connector is
transport-injectable (``fetcher``) so tests run with a fake server.
"""

from __future__ import annotations

import difflib
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import urljoin

PAGINATION_TYPES = (
    "json_link",
    "page_number",
    "offset",
    "cursor",
    "header_link",
    "auto",
    "single_page",
)

#: fetcher(url, params, headers) -> (json_body, response_headers)
Fetcher = Callable[[str, dict, dict], tuple[Any, dict]]


def default_fetcher(url: str, params: dict, headers: dict) -> tuple[Any, dict]:
    import requests

    resp = requests.get(url, params=params, headers=headers, timeout=30)
    resp.raise_for_status()
    return resp.json(), dict(resp.headers)


@dataclass
class PaginationConfig:
    type: str = "auto"
    # json_link
    next_url_path: str = "next"
    # page_number
    page_param: str = "page"
    start_page: int = 1
    total_path: str | None = None
    # offset
    limit: int = 100
    limit_param: str = "limit"
    offset_param: str = "offset"
    # cursor
    cursor_path: str = "next_cursor"
    cursor_param: str = "cursor"
    max_pages: int = 10_000

    @classmethod
    def from_dict(cls, d: dict | None) -> "PaginationConfig":
        if not d:
            return cls()
        known = {f for f in cls.__dataclass_fields__}  # noqa: SLF001
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class EndpointSpec:
    name: str
    path: str
    data_path: str | None = None  # dot-path to the record list; None=auto
    primary_key: str | None = None
    params: dict[str, Any] = field(default_factory=dict)
    pagination: PaginationConfig = field(default_factory=PaginationConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "EndpointSpec":
        return cls(
            name=d["name"],
            path=d["path"],
            data_path=d.get("data_path"),
            primary_key=d.get("primary_key"),
            params=dict(d.get("params") or {}),
            pagination=PaginationConfig.from_dict(d.get("pagination")),
        )


@dataclass
class IngestionPlan:
    domain: str
    base_url: str
    endpoints: list[EndpointSpec]
    auth_type: str | None = None  # bearer | api_key | None
    auth_token: str | None = None
    api_key_header: str = "X-API-Key"
    tag: str = "day"  # schedule tag, reference O6

    @classmethod
    def from_dict(cls, d: dict) -> "IngestionPlan":
        return cls(
            domain=d["domain"],
            base_url=d["base_url"],
            endpoints=[EndpointSpec.from_dict(e) for e in d.get("endpoints", [])],
            auth_type=d.get("auth_type"),
            auth_token=d.get("auth_token"),
            api_key_header=d.get("api_key_header", "X-API-Key"),
            tag=d.get("tag", "day"),
        )

    def headers(self) -> dict[str, str]:
        if self.auth_type == "bearer" and self.auth_token:
            return {"Authorization": f"Bearer {self.auth_token}"}
        if self.auth_type == "api_key" and self.auth_token:
            return {self.api_key_header: self.auth_token}
        return {}


# ---------------------------------------------------------------------------
# Dot-path helpers (reference extract_data / detect_data_path,
# runner.py:195-289)
# ---------------------------------------------------------------------------
def extract_path(obj: Any, path: str | None) -> Any:
    """Resolve a dot-path ("info.next") into a nested JSON object;
    None/empty path returns the object itself; missing → None."""
    if not path:
        return obj
    cur = obj
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None
    return cur


def detect_data_path(body: Any) -> str | None:
    """Find where the record list lives in a response.

    Top-level list → None (the body itself). Otherwise the dot-path
    to the largest list-of-dicts found within two levels (common API
    shapes: ``results``, ``data``, ``items``, ``data.records``…)."""
    if isinstance(body, list):
        return None
    best: tuple[int, str | None] = (-1, None)
    if isinstance(body, dict):
        for key, val in body.items():
            if "." in key:
                continue  # unrepresentable as a dot-path
            if isinstance(val, list) and (not val or isinstance(val[0], dict)):
                if len(val) > best[0]:
                    best = (len(val), key)
            elif isinstance(val, dict):
                for k2, v2 in val.items():
                    if "." in k2:
                        continue
                    if isinstance(v2, list) and (not v2 or isinstance(v2[0], dict)):
                        if len(v2) > best[0]:
                            best = (len(v2), f"{key}.{k2}")
    return best[1]


def records_from(body: Any, data_path: str | None) -> list[dict]:
    path = data_path if data_path is not None else detect_data_path(body)
    data = extract_path(body, path)
    if data is None and data_path is not None:
        # declared path missing in this page — try auto-detection
        data = extract_path(body, detect_data_path(body))
    if isinstance(data, dict):
        data = [data]
    return [r for r in (data or []) if isinstance(r, dict)]


# ---------------------------------------------------------------------------
# Pagination loops
# ---------------------------------------------------------------------------
def _parse_link_header(headers: dict) -> str | None:
    link = headers.get("Link") or headers.get("link")
    if not link:
        return None
    for part in link.split(","):
        section = part.split(";")
        if len(section) >= 2 and 'rel="next"' in section[1]:
            return section[0].strip().strip("<>")
    return None


def paginate(
    base_url: str,
    spec: EndpointSpec,
    headers: dict,
    fetcher: Fetcher,
) -> Iterator[list[dict]]:
    """Yield pages of records following the configured strategy.
    Paginator failures fall back to auto → single_page (reference
    ``runner.py:971-989``) — but only when no page has been yielded
    yet: pages already yielded are already ingested downstream, and a
    single_page retry would re-fetch page 1 and duplicate its records
    in bronze (unrecoverable for PK-less endpoints)."""
    cfg = spec.pagination
    strategy = cfg.type if cfg.type in PAGINATION_TYPES else "auto"
    url = urljoin(base_url.rstrip("/") + "/", spec.path.lstrip("/"))
    yielded = False
    try:
        for page in _paginate_with(strategy, url, spec, headers, fetcher):
            yield page
            yielded = True
    except _PaginatorError:
        if yielded or strategy in ("auto", "single_page"):
            raise
        yield from _paginate_with("single_page", url, spec, headers, fetcher)


class _PaginatorError(RuntimeError):
    pass


class _PrimaryKeyUnboundError(RuntimeError):
    """Declared primary key column absent from the fetched records
    (the dlt ``UnboundColumnException`` analogue)."""


def _paginate_with(
    strategy: str,
    url: str,
    spec: EndpointSpec,
    headers: dict,
    fetcher: Fetcher,
) -> Iterator[list[dict]]:
    cfg = spec.pagination
    params = dict(spec.params)

    if strategy == "single_page":
        body, _ = fetcher(url, params, headers)
        yield records_from(body, spec.data_path)
        return

    if strategy == "json_link":
        seen = 0
        next_url: str | None = url
        first = True
        while next_url and seen < cfg.max_pages:
            body, _ = fetcher(next_url, params if first else {}, headers)
            first = False
            yield records_from(body, spec.data_path)
            nxt = extract_path(body, cfg.next_url_path)
            if not isinstance(nxt, str) or not nxt:
                return
            next_url = urljoin(url, nxt)
            seen += 1
        if seen >= cfg.max_pages:
            raise _PaginatorError("json_link exceeded max_pages")
        return

    if strategy == "page_number":
        page = cfg.start_page
        fetched = 0
        while page - cfg.start_page < cfg.max_pages:
            body, _ = fetcher(url, {**params, cfg.page_param: page}, headers)
            recs = records_from(body, spec.data_path)
            if not recs:
                return
            yield recs
            fetched += len(recs)
            total = extract_path(body, cfg.total_path) if cfg.total_path else None
            if isinstance(total, int) and fetched >= total:
                return
            page += 1
        raise _PaginatorError("page_number exceeded max_pages")

    if strategy == "offset":
        offset = 0
        while offset // max(cfg.limit, 1) < cfg.max_pages:
            body, _ = fetcher(
                url,
                {**params, cfg.limit_param: cfg.limit, cfg.offset_param: offset},
                headers,
            )
            recs = records_from(body, spec.data_path)
            if not recs:
                return
            yield recs
            offset += cfg.limit
            total = extract_path(body, cfg.total_path) if cfg.total_path else None
            if isinstance(total, int) and offset >= total:
                return
            if len(recs) < cfg.limit:
                return
        raise _PaginatorError("offset exceeded max_pages")

    if strategy == "cursor":
        cursor = None
        pages = 0
        while pages < cfg.max_pages:
            p = dict(params)
            if cursor:
                p[cfg.cursor_param] = cursor
            body, _ = fetcher(url, p, headers)
            recs = records_from(body, spec.data_path)
            yield recs
            cursor = extract_path(body, cfg.cursor_path)
            if not cursor:
                return
            pages += 1
        raise _PaginatorError("cursor exceeded max_pages")

    if strategy == "header_link":
        next_url: str | None = url
        first = True
        pages = 0
        while next_url and pages < cfg.max_pages:
            body, hdrs = fetcher(next_url, params if first else {}, headers)
            first = False
            yield records_from(body, spec.data_path)
            next_url = _parse_link_header(hdrs)
            pages += 1
        return

    if strategy == "auto":
        # Probe order: header link → common json next fields → single.
        body, hdrs = fetcher(url, params, headers)
        yield records_from(body, spec.data_path)
        nxt_hdr = _parse_link_header(hdrs)
        if nxt_hdr:
            follow = EndpointSpec(
                name=spec.name, path=spec.path, data_path=spec.data_path,
                params=spec.params,
                pagination=PaginationConfig(type="header_link",
                                            max_pages=cfg.max_pages),
            )
            gen = _paginate_with("header_link", url, follow, headers, fetcher)
            next(gen, None)  # first page already yielded
            yield from gen
            return
        for candidate in ("next", "info.next", "links.next", "paging.next"):
            nxt = extract_path(body, candidate)
            if isinstance(nxt, str) and nxt:
                pages = 0
                while nxt and pages < cfg.max_pages:
                    body, _ = fetcher(urljoin(url, nxt), {}, headers)
                    yield records_from(body, spec.data_path)
                    nxt = extract_path(body, candidate)
                    pages += 1
                return
        return

    raise _PaginatorError(f"unknown pagination type {strategy}")


# ---------------------------------------------------------------------------
# Fuzzy endpoint-name dedup (reference V4, runner.py:560-611)
# ---------------------------------------------------------------------------
def _normalize_plural(name: str) -> str:
    n = name.lower().strip()
    if n.endswith("ies"):
        return n[:-3] + "y"
    if n.endswith("ses"):
        return n[:-2]
    if n.endswith("s") and not n.endswith("ss"):
        return n[:-1]
    return n


def dedupe_endpoint_names(names: list[str], threshold: float = 0.8) -> list[str]:
    """Drop endpoints whose (plural-normalized) name is ≥ threshold
    similar to one already kept — first occurrence wins."""
    kept: list[str] = []
    kept_norm: list[str] = []
    for name in names:
        norm = _normalize_plural(name)
        if any(
            norm == k
            or difflib.SequenceMatcher(None, norm, k).ratio() >= threshold
            for k in kept_norm
        ):
            continue
        kept.append(name)
        kept_norm.append(norm)
    return kept


# ---------------------------------------------------------------------------
# Plan runner → bronze
# ---------------------------------------------------------------------------
@dataclass
class PullResult:
    endpoint: str
    records: int
    batches: int
    errors: int


class RestSource:
    """Pulls an ingestion plan into a Lake's bronze zone."""

    BATCH_SIZE = 25  # reference dlt batch size (runner.py:824,903)
    MAX_RETRIES = 5
    BACKOFF_CAP = 16.0

    def __init__(self, lake, fetcher: Fetcher | None = None, sleep=time.sleep):
        self.lake = lake
        self.fetcher = fetcher or default_fetcher
        self.sleep = sleep

    def _fetch_retry(self, url: str, params: dict, headers: dict):
        delay = 1.0
        for attempt in range(self.MAX_RETRIES):
            try:
                return self.fetcher(url, params, headers)
            except Exception:  # noqa: BLE001
                if attempt == self.MAX_RETRIES - 1:
                    raise
                self.sleep(min(delay, self.BACKOFF_CAP))
                delay *= 2
        raise RuntimeError("unreachable")

    def run_endpoint(self, plan: IngestionPlan, spec: EndpointSpec) -> PullResult:
        """Pull one endpoint. A declared primary key that does not
        exist in the fetched data triggers ONE retry without the key
        (reference ``runner.py:956-970``: dlt's UnboundColumnException
        → strip ``primary_key`` from every resource and re-run). The
        unbound key is detected on the first page, before anything is
        ingested, so the retry re-pulls from a clean slate."""
        try:
            return self._run_endpoint(plan, spec, drop_pk=False)
        except _PrimaryKeyUnboundError:
            return self._run_endpoint(plan, spec, drop_pk=True)

    def _run_endpoint(
        self, plan: IngestionPlan, spec: EndpointSpec, drop_pk: bool
    ) -> PullResult:
        from serverless_data_lake_spark.schema.inference import (
            detect_primary_key,
            infer_schema_from_payload,
            to_snake_case,
        )

        headers = plan.headers()
        total = batches = errors = 0
        registered = self.lake.registry.get(plan.domain, spec.name) is not None
        for page in paginate(plan.base_url, spec, headers, self._fetch_retry):
            # Normalize record keys to snake_case so they line up with
            # the (snake_cased) registered schema — the reference's dlt
            # layer does the same normalization before POSTing.
            page = [{to_snake_case(k): v for k, v in r.items()} for r in page]
            if not page:
                continue
            if not registered:
                schema = infer_schema_from_payload(plan.domain, spec.name, page[0])
                if drop_pk:
                    pk = None
                elif spec.primary_key:
                    pk = to_snake_case(spec.primary_key)
                    if pk not in {c.name for c in schema.columns}:
                        raise _PrimaryKeyUnboundError(
                            f"declared primary key '{spec.primary_key}' not "
                            f"present in {spec.name} records"
                        )
                else:
                    pk = detect_primary_key(page, spec.name)
                for col in schema.columns:
                    col.primary_key = col.name == pk
                self.lake.registry.register(schema)
                registered = True
            for i in range(0, len(page), self.BATCH_SIZE):
                chunk = page[i : i + self.BATCH_SIZE]
                res = self.lake.ingest_batch(plan.domain, spec.name, chunk)
                total += res.accepted
                errors += res.failed
                batches += 1
        return PullResult(spec.name, total, batches, errors)

    def run_plans_by_tag(self, tag: str) -> list[PullResult]:
        """Scheduled ingestion run (reference O6,
        ``containers/ingestion_runner/entrypoint.py:210-241``): run
        every stored plan with a matching tag, sequentially; raise at
        the end if any plan failed."""
        results: list[PullResult] = []
        failures: list[str] = []
        for plan in self.lake.list_ingestion_plans():
            if plan.tag != tag:
                continue
            try:
                results.extend(self.run_plan(plan))
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{plan.domain}: {exc}")
        if failures:
            raise RuntimeError("; ".join(failures))
        return results

    def run_plan(self, plan: IngestionPlan) -> list[PullResult]:
        """Run every endpoint sequentially; raise at the end if any
        failed (reference ``containers/ingestion_runner/entrypoint.py:
        210-241`` exits non-zero on any failure)."""
        results: list[PullResult] = []
        failures: list[str] = []
        kept = set(dedupe_endpoint_names([e.name for e in plan.endpoints]))
        for spec in plan.endpoints:
            if spec.name not in kept:
                continue
            try:
                results.append(self.run_endpoint(plan, spec))
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{spec.name}: {exc}")
        if failures:
            raise RuntimeError("; ".join(failures))
        return results
