"""REST serving shell (api/server.go) over the read-path queries.

The reference wraps a Collection in net/http handlers; this wraps the
resources/frontier DataFrames in a stdlib ``ThreadingHTTPServer`` using the
same routes, response envelope, and quirks:

- routes per api/server.go:47-68: /status, /collection, /collection/{id},
  /captures[...], /jobs
- response envelope per datatogether apiutil: {"data": ..., "meta":
  {"code": N}} (errors: {"meta": {"code": N, "error": msg}, "data": []})
- pagination per apiutil.PageFromRequest: 1-based ``page`` + ``pageSize``
  (default 25), offset = (page-1)*size
- the go#21955 workaround (api/server.go:73-90): a path containing
  "http:/" or "https:/" is 301-redirected with the protocol stripped, so
  capture urls arrive scheme-less and are re-prefixed before lookup
- resolved reads follow RedirectTo up to 20 hops
  (api/collection_handlers.go:164-187) via api.get_resource

Spark shape: each request runs a driver-side DataFrame query (offset/limit
pages push down; point reads are argmax lookups). A serving deployment
would front this with the written CDXJ/parquet tables rather than live
DataFrames — the queries are identical; this shell exists for API parity
and for driving the read path end-to-end in tests.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from pyspark.sql import DataFrame

from walk_spark.api import (
    get_resource, list_requests, list_resources, path_timestamp_url,
)

VERSION = "0.1.0"


def _page(qs: dict) -> tuple[int, int]:
    """apiutil.PageFromRequest: 1-based page, pageSize default 25."""
    try:
        page = max(1, int(qs.get("page", ["1"])[0]))
    except ValueError:
        page = 1
    try:
        size = max(1, int(qs.get("pageSize", ["25"])[0]))
    except ValueError:
        size = 25
    return page, size


def _row_jsonable(d: dict) -> dict:
    import datetime as dt
    out = {}
    for k, v in d.items():
        if isinstance(v, dt.datetime):
            out[k] = v.strftime("%Y-%m-%dT%H:%M:%SZ")
        elif isinstance(v, (bytes, bytearray)):
            out[k] = v.decode("utf-8", errors="replace")
        else:
            out[k] = v
    return out


class WalkServer:
    """Serves one or more walks' resources (+ optional frontier/jobs).

    ``walks``: walk_id -> ok-resources DataFrame (meta projection).
    ``frontier``: optional frontier DataFrame for /jobs request listings.
    ``jobs``: optional list of job dicts (id, metrics, ...) for /jobs.
    """

    def __init__(self, walks: dict[str, DataFrame],
                 frontier: DataFrame | None = None,
                 jobs: list[dict] | None = None) -> None:
        self.walks = walks
        self.frontier = frontier
        self.jobs = jobs or []
        self._srv: ThreadingHTTPServer | None = None

    # -- route implementations (plain functions -> (code, data)) ----------

    def _all_resources(self) -> DataFrame:
        from functools import reduce
        dfs = list(self.walks.values())
        return reduce(lambda a, b: a.unionByName(b), dfs)

    def route(self, path: str, query: str) -> tuple[int, object, bytes | None]:
        """Dispatch one GET. Returns (status, jsonable_data, raw_body) —
        raw_body not None means write bytes, not the JSON envelope."""
        qs = parse_qs(query)
        page, size = _page(qs)
        if path == "/status":
            return 200, [], None
        if path == "/collection":
            ids = sorted(self.walks)
            return 200, ids[(page - 1) * size:(page - 1) * size + size], None
        if path.startswith("/collection/"):
            wid = path[len("/collection/"):].strip("/")
            if wid not in self.walks:
                return 404, [], None
            rows = list_resources(
                self.walks[wid], page - 1, size
            ).collect()
            return 200, [_row_jsonable(r.asDict()) for r in rows], None
        if path == "/captures" or path == "/captures/":
            rows = list_resources(
                self._all_resources(), page - 1, size
            ).collect()
            return 200, [_row_jsonable(r.asDict()) for r in rows], None
        for prefix, resolved, raw in (
            ("/captures/meta/raw/", False, False),
            ("/captures/meta/resolved/", True, False),
            ("/captures/raw/", False, True),
            ("/captures/resolved/", True, True),
        ):
            if path.startswith(prefix):
                try:
                    _t, url = path_timestamp_url(prefix, path)
                except ValueError as e:
                    return 400, {"error": str(e)}, None
                # go#21955 stripped the scheme — restore it (the archive
                # keys are full urls; http is the reference's crawl
                # scheme). A leading '/' survives the strip ("http://x"
                # -> "/x" after removing "http:/").
                if not url.startswith(("http://", "https://")):
                    url = "http://" + url.lstrip("/")
                try:
                    rsc = get_resource(self._all_resources(), url,
                                       resolve_redirects=resolved)
                except ValueError as e:  # max redirects exceeded
                    return 500, {"error": str(e)}, None
                if rsc is None:
                    return 500, {"error": "not found"}, None
                if raw:
                    body = rsc.get("text") or ""
                    return 200, None, body.encode("utf-8")
                return 200, _row_jsonable(rsc), None
        if path == "/jobs" or path == "/jobs/":
            return 200, self.jobs[(page - 1) * size:
                                  (page - 1) * size + size], None
        if path.startswith("/jobs/"):
            jid = path[len("/jobs/"):].strip("/")
            for j in self.jobs:
                if str(j.get("id")) == jid:
                    return 200, j, None
            return 404, [], None
        return 404, [], None

    # -- http shell -------------------------------------------------------

    def _handler_cls(self):
        server = self

        class _H(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet; middleware.go only logs
                pass

            def do_GET(self):  # noqa: N802
                # bug21955Workaround (api/server.go:73-90): strip embedded
                # protocol and redirect once
                for proto in ("http:/", "https:/"):
                    # ignore a proto that is the start of the capture url
                    # only when doubled by the client (/captures/raw/ts/
                    # http://x arrives as .../http:/x after net/http
                    # collapses //)
                    i = self.path.find(proto)
                    if i != -1:
                        loc = self.path[:i] + self.path[i + len(proto):]
                        self.send_response(301)
                        self.send_header("Location", loc)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                u = urlsplit(self.path)
                try:
                    code, data, raw = server.route(u.path, u.query)
                except Exception as e:  # noqa: BLE001
                    code, data, raw = 500, {"error": str(e)}, None
                if raw is not None:
                    self.send_response(code)
                    self.send_header("Content-Length", str(len(raw)))
                    self.end_headers()
                    self.wfile.write(raw)
                    return
                if code == 200:
                    env = {"data": data, "meta": {"code": 200,
                                                  "version": VERSION}}
                else:
                    env = {"meta": {"code": code, "version": VERSION,
                                    **(data if isinstance(data, dict)
                                       else {})},
                           "data": []}
                body = json.dumps(env).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return _H

    def serve(self, port: int = 0) -> int:
        """Start serving on ``port`` (0 = ephemeral) in a daemon thread;
        returns the bound port. ``shutdown()`` stops it."""
        self._srv = ThreadingHTTPServer(("127.0.0.1", port),
                                        self._handler_cls())
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self._srv.server_port

    def shutdown(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv = None


__all__ = ["VERSION", "WalkServer"]
