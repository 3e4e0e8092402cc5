"""HTTP control plane: the reference's Flask trigger server re-expressed.

The reference exposes its pipelines over HTTP (``server.py:10-20`` index
catalog; ``:44-54`` /run/sync_all + /run/sync_incremental + /run/clean,
each running a script synchronously and answering ``{"status": "ok",
"output": ...}`` or a 500 with ``{"status": "error", "error": ...}``).
This analog serves the same surface from the stdlib (no Flask dependency)
and runs the pipelines IN-PROCESS against one shared SparkSession — no
per-request JVM spin-up, which is the Spark-shaped equivalent of the
reference keeping one mysql connection per script run.

Endpoints (GET, like the reference):
  /                → service catalog
  /health          → liveness probe
  /run/full-sync   ?source=DIR&target=DIR[&tables=a,b][&key=k1,k2]
  /run/incremental ?source=DIR&target=DIR[&tables=a,b][&key=k1,k2]
                   [&buckets=N]   (N>0 → bucket-pruned partitioned state)
                   [&mor=1]       (merge-on-read delta state, sinks/mor.py)
  /run/clean       ?target=DIR   (drops the warehouse dir's tables; the
                   target must resolve inside the configured warehouse
                   root — the endpoint is disabled without one)

Synchronous by design: the reference blocks until the script exits; a
queue/async layer belongs in an orchestrator, not the engine.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

CATALOG = {
    "service": "presencia-etl-spark",
    "status": "online",
    "endpoints": {
        "/run/full-sync": "full synchronization (first load)",
        "/run/incremental": "incremental synchronization (daily)",
        "/run/clean": "drop warehouse tables",
        "/run/delete": "row-level delete (where=PRED or retain_days=N&date_col=C)",
        "/state/history": "state bookkeeping: MOR snapshot log / warehouse generations",
        "/sql": "read-only SQL over the warehouse views "
        "(q=SELECT...&generation=N pins a consistent snapshot)",
        "/health": "liveness",
    },
}


def _run_pipeline(spark, cmd: str, params: dict) -> dict:
    from presencia_etl_spark.__main__ import _load_tables
    from presencia_etl_spark.sources.registry import TableConfig

    source, target = params["source"], params["target"]
    names = [t for t in params.get("tables", "").split(",") if t]
    keys = [k for k in params.get("key", "").split(",") if k]
    buckets = int(params.get("buckets", "0"))
    mode = "mor" if params.get("mor", "0") in ("1", "true") else "cow"
    sync_deletes = params.get("sync_deletes", "0") in ("1", "true")
    tables = _load_tables(spark, source, names)
    if not tables:
        raise ValueError(f"no <table>.parquet inputs found under {source!r}")
    configs = {
        n: TableConfig(
            n, key_cols=keys or [df.columns[0]], num_buckets=buckets,
            merge_mode=mode, sync_deletes=sync_deletes,
        )
        for n, df in tables.items()
    }
    if cmd == "full-sync":
        from presencia_etl_spark.plans.full_sync import full_sync

        return full_sync(spark, tables, configs, target)
    from presencia_etl_spark.plans.incremental_sync import incremental_sync

    return incremental_sync(spark, tables, configs, target)


# /sql registration+query must be atomic per request (shared temp-view
# namespace in the one SparkSession behind a ThreadingHTTPServer).
_SQL_MU = threading.Lock()


class _Handler(BaseHTTPRequestHandler):
    spark = None  # injected by make_server
    warehouse_root = None  # injected by make_server; gates /run/clean

    def _clean_target(self, target: str) -> str:
        """Validate a /run/clean target against the configured warehouse root.

        The reference's /run/clean runs a fixed script scoped to its own DB
        tables; a caller-supplied filesystem path must therefore be fenced:
        without a configured root the endpoint is disabled, and any resolved
        path (symlinks followed) outside the root is rejected.
        """
        if self.warehouse_root is None:
            raise PermissionError(
                "/run/clean disabled: server started without a warehouse root"
            )
        root = os.path.realpath(self.warehouse_root)
        resolved = os.path.realpath(target)
        if resolved != root and not resolved.startswith(root + os.sep):
            raise PermissionError(
                f"target {target!r} is outside the warehouse root {root!r}"
            )
        return resolved

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args) -> None:  # quiet test output
        pass

    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        url = urlparse(self.path)
        params = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            if url.path == "/":
                self._reply(200, CATALOG)
            elif url.path == "/health":
                self._reply(200, {"status": "ok"})
            elif url.path in ("/run/full-sync", "/run/incremental"):
                if "source" not in params or "target" not in params:
                    self._reply(
                        400,
                        {"status": "error", "error": "source and target params required"},
                    )
                    return
                out = _run_pipeline(self.spark, url.path.rsplit("/", 1)[-1], params)
                self._reply(200, {"status": "ok", "result": out})
            elif url.path == "/run/clean":
                target = params.get("target")
                if not target:
                    self._reply(400, {"status": "error", "error": "target param required"})
                    return
                try:
                    resolved = self._clean_target(target)
                except PermissionError as e:
                    self._reply(403, {"status": "error", "error": str(e)})
                    return
                shutil.rmtree(resolved, ignore_errors=True)
                self._reply(200, {"status": "ok", "result": {"dropped": resolved}})
            elif url.path == "/run/delete":
                # Destructive like /run/clean → same warehouse-root fence.
                target = params.get("target")
                if not target:
                    self._reply(400, {"status": "error", "error": "target param required"})
                    return
                try:
                    resolved = self._clean_target(target)
                except PermissionError as e:
                    self._reply(403, {"status": "error", "error": str(e)})
                    return
                from presencia_etl_spark.sinks.lifecycle import (
                    apply_retention,
                    delete_rows,
                )

                if "retain_days" in params:
                    if "date_col" not in params:
                        self._reply(
                            400,
                            {"status": "error", "error": "retain_days requires date_col"},
                        )
                        return
                    out = apply_retention(
                        self.spark,
                        resolved,
                        params["date_col"],
                        keep_days=int(params["retain_days"]),
                    )
                elif "where" in params:
                    out = delete_rows(self.spark, resolved, params["where"])
                else:
                    self._reply(
                        400,
                        {"status": "error", "error": "give where=PRED or retain_days=N&date_col=C"},
                    )
                    return
                self._reply(200, {"status": "ok", "result": out})
            elif url.path == "/sql":
                q = params.get("q")
                if not q:
                    self._reply(400, {"status": "error", "error": "q param required"})
                    return
                wh = params.get("warehouse") or self.warehouse_root
                if not wh:
                    self._reply(
                        400,
                        {"status": "error", "error": "warehouse param required "
                         "(no server warehouse root configured)"},
                    )
                    return
                from presencia_etl_spark.sql import run_sql

                gen = params.get("generation")
                # Serialized: the server is threaded but the SparkSession
                # temp-view namespace is shared — two concurrent /sql
                # requests with different generation pins (or warehouse
                # roots) would re-register each other's views between
                # registration and query. One statement at a time keeps
                # the registration+query pair atomic; queries themselves
                # still parallelize across executor cores.
                with _SQL_MU:
                    out = run_sql(
                        self.spark,
                        wh,
                        q,
                        generation=int(gen) if gen is not None else None,
                        limit=int(params.get("limit", "1000")),
                    )
                self._reply(200, {"status": "ok", "result": out})
            elif url.path == "/state/history":
                target = params.get("target")
                if not target:
                    self._reply(400, {"status": "error", "error": "target param required"})
                    return
                try:
                    resolved = self._clean_target(target)
                except PermissionError as e:
                    self._reply(403, {"status": "error", "error": str(e)})
                    return
                from presencia_etl_spark.plans.generations import load_manifest
                from presencia_etl_spark.sinks.mor import META_FILE, mor_history

                out = {}
                if os.path.exists(os.path.join(resolved, META_FILE)):
                    out["mor"] = mor_history(resolved)
                gens = load_manifest(resolved)["generations"]
                if gens:
                    out["generations"] = gens
                self._reply(200, {"status": "ok", "result": out})
            else:
                self._reply(404, {"status": "error", "error": f"unknown path {url.path}"})
        except Exception as e:  # mirror the reference's 500 JSON envelope
            self._reply(500, {"status": "error", "error": str(e)})


def make_server(
    spark,
    host: str = "127.0.0.1",
    port: int = 0,
    warehouse_root: str | None = None,
) -> ThreadingHTTPServer:
    """Build the server bound to (host, port); ``port=0`` picks a free one
    (``server.server_address[1]`` has the real port). Call
    ``serve_forever()`` (or run it in a thread, as the tests do).

    ``warehouse_root`` fences /run/clean: only paths that resolve inside it
    may be dropped, and the endpoint is disabled when it is None."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"spark": spark, "warehouse_root": warehouse_root},
    )
    return ThreadingHTTPServer((host, port), handler)


def serve(
    spark,
    host: str = "127.0.0.1",
    port: int = 8000,
    warehouse_root: str | None = None,
) -> None:
    server = make_server(spark, host, port, warehouse_root=warehouse_root)
    print(json.dumps({"serving": f"http://{host}:{port}", "endpoints": list(CATALOG["endpoints"])}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


def _start_background(spark, host: str = "127.0.0.1", port: int = 0, warehouse_root=None):
    """Test helper: server + thread, returns (server, base_url)."""
    server = make_server(spark, host, port, warehouse_root=warehouse_root)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, f"http://{host}:{server.server_address[1]}"
