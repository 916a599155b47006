"""HTTP facade mirroring the reference's API surface
(``docs/api-reference.md``) on the Python standard library — no web
framework is shipped in this environment, and the serving layer is a
thin dispatcher anyway; swap for FastAPI where available.

Routes:

====== ======================================== =======================
GET    /consumption/query?sql=…                 run a read-only query
GET    /consumption/tables                      catalog listing
POST   /endpoints                               create endpoint schema
POST   /endpoints/infer                         infer from sample
POST   /ingest/{domain}/{table}                 single-record push
POST   /ingest/{domain}/{table}/batch           batch push
POST   /process/{domain}/{table}                bronze→silver run
POST   /transform/jobs                          create gold job
POST   /transform/jobs/{domain}/{name}/run      run gold job
GET    /transform/jobs/{domain}/{name}/status   last execution status
====== ======================================== =======================

Error contract (reference ``lambdas/query_api/main.py``): validation
failures → 400 with a message; engine failures → 500 with a
path-sanitized message; unknown routes → 404.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlparse

from serverless_data_lake_spark.plans.query import QueryExecutionError
from serverless_data_lake_spark.plans.validate import QueryValidationError
from serverless_data_lake_spark.schema.registry import GoldJobConfig
from serverless_data_lake_spark.schema.types import EndpointSchema
from serverless_data_lake_spark.schema.validation import ValidationError
from serverless_data_lake_spark.serving.chart import suggest_chart

_INGEST_RE = re.compile(r"^/ingest/([\w-]+)/([\w-]+)(/batch)?$")
_PROCESS_RE = re.compile(r"^/process/([\w-]+)/([\w-]+)$")
_JOB_RUN_RE = re.compile(r"^/transform/jobs/([\w-]+)/([\w-]+)/run$")
_JOB_STATUS_RE = re.compile(r"^/transform/jobs/([\w-]+)/([\w-]+)/status$")
_PROFILE_RE = re.compile(
    r"^/consumption/profile/([\w-]+)/([\w-]+)/([\w-]+)$"
)


class LakeServer:
    """Serves one Lake over HTTP. ``start()`` binds an ephemeral (or
    given) port and returns it; ``stop()`` shuts down.

    With ``api_key`` set, every request must carry a matching
    ``x-api-key`` header (constant-time compare) — the reference's
    API-gateway authorizer contract
    (``lambdas/authorizer/main.py:41-59``: lowercase header, SIMPLE
    allow/deny). Unset = open, matching the reference's default local
    stack."""

    def __init__(
        self,
        lake,
        host: str = "127.0.0.1",
        port: int = 0,
        api_key: str | None = None,
    ) -> None:
        self.lake = lake
        self.host = host
        self.port = port
        self.api_key = api_key
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------
    def start(self) -> int:
        lake = self.lake
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: Any) -> None:  # noqa: D102
                pass

            def _authorized(self) -> bool:
                if outer.api_key is None:
                    return True
                import hmac

                supplied = (self.headers.get("x-api-key") or "").strip()
                if not supplied:
                    return False
                return hmac.compare_digest(supplied, outer.api_key)


            # -- helpers -------------------------------------------
            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                length = int(self.headers.get("Content-Length") or 0)
                if not length:
                    return {}
                return json.loads(self.rfile.read(length).decode())

            # -- GET -----------------------------------------------
            def do_GET(self) -> None:  # noqa: N802
                if not self._authorized():
                    self._send(401, {"error": "unauthorized"})
                    return
                url = urlparse(self.path)
                try:
                    if url.path == "/consumption/query":
                        q = parse_qs(url.query).get("sql", [""])[0]
                        res = lake.query(q)
                        self._send(200, {
                            "columns": res.columns,
                            "rows": res.rows,
                            "row_count": res.row_count,
                            "truncated": res.truncated,
                            "chart": suggest_chart(res.rows, q),
                        })
                    elif url.path == "/consumption/tables":
                        self._send(200, {"tables": lake.list_tables()})
                    elif _PROFILE_RE.match(url.path):
                        m = _PROFILE_RE.match(url.path)
                        approx = (
                            parse_qs(url.query).get("approx", ["false"])[0]
                            == "true"
                        )
                        self._send(
                            200,
                            {
                                "profile": lake.profile(
                                    m.group(1),
                                    m.group(2),
                                    m.group(3),
                                    approx=approx,
                                )
                            },
                        )
                    else:
                        m = _JOB_STATUS_RE.match(url.path)
                        if m:
                            status = lake.registry.get_execution_status(
                                m.group(1), m.group(2)
                            )
                            if status is None:
                                self._send(404, {"error": "no status"})
                            else:
                                self._send(200, status)
                        else:
                            self._send(404, {"error": "not found"})
                except QueryValidationError as exc:
                    self._send(400, {"error": str(exc)})
                except QueryExecutionError as exc:
                    self._send(500, {"error": str(exc)})
                except Exception as exc:  # noqa: BLE001
                    self._send(500, {"error": str(exc).splitlines()[0][:300]})

            # -- POST ----------------------------------------------
            def do_POST(self) -> None:  # noqa: N802
                if not self._authorized():
                    self._send(401, {"error": "unauthorized"})
                    return
                url = urlparse(self.path)
                try:
                    body = self._body()
                    m = _INGEST_RE.match(url.path)
                    if m:
                        domain, table, batch = m.group(1), m.group(2), m.group(3)
                        if batch:
                            res = lake.ingest_batch(
                                domain, table, body.get("records", [])
                            )
                        else:
                            res = lake.ingest(domain, table, body)
                        code = 200 if res.failed == 0 else 207
                        self._send(code, {
                            "accepted": res.accepted,
                            "failed": res.failed,
                            "errors": res.errors,
                        })
                        return
                    m = _PROCESS_RE.match(url.path)
                    if m:
                        res = lake.process_silver(m.group(1), m.group(2))
                        self._send(200, {
                            "rows_in": res.rows_in,
                            "rows_written": res.rows_written,
                            "mode": res.mode,
                        })
                        return
                    m = _JOB_RUN_RE.match(url.path)
                    if m:
                        res = lake.run_gold(m.group(1), m.group(2))
                        self._send(200, {
                            "rows": res.rows,
                            "mode": res.mode,
                            "seconds": round(res.seconds, 3),
                        })
                        return
                    if url.path == "/transform/jobs":
                        job = GoldJobConfig.from_dict(body)
                        lake.create_gold_job(job)
                        self._send(201, {"created": f"{job.domain}.{job.name}"})
                        return
                    if url.path == "/endpoints":
                        schema = EndpointSchema.from_dict(body)
                        version = lake.create_endpoint(schema)
                        self._send(201, {"version": version})
                        return
                    if url.path == "/endpoints/infer":
                        schema = lake.infer_endpoint(
                            body["domain"], body["name"], body["payload"]
                        )
                        self._send(201, {"schema": schema.to_dict()})
                        return
                    self._send(404, {"error": "not found"})
                except (ValidationError, KeyError, ValueError) as exc:
                    self._send(400, {"error": str(exc)[:300]})
                except Exception as exc:  # noqa: BLE001
                    self._send(500, {"error": str(exc).splitlines()[0][:300]})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
