"""Local query proxy over static gold artifacts (+ stdlib HTTP server).

Reference ancestor: ``apps/mcp-local-proxy/app/http_client.py`` — a
thin client translating resource URIs into GETs against static JSON
(all compute local, the data tier serves bytes only) — and its CLI /
MCP adapter (``cli.py``, ``server.py``; ``ADR-033/034``). Re-expressed
with zero dependencies:

- :class:`ArtifactClient` resolves ``index/latest.json`` and
  ``<resource_uri>.json`` against either a FILESYSTEM root (the
  publisher's out_root — the "local mirror" path) or an ``http(s)://``
  base (any static file host; :func:`serve_artifacts` provides one).
- Errors carry a status code and never crash an agent loop
  (:class:`ArtifactError`), mirroring the reference's
  ``ArtifactFetchError`` contract.
- :mod:`hoopstat_haus_spark.serving.mcp_stdio` adapts the same two
  operations to agent clients over JSON-RPC/stdio.
"""

from __future__ import annotations

import os
import threading
import urllib.error
import urllib.request
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer


class ArtifactError(Exception):
    """An artifact or the index could not be retrieved."""

    def __init__(self, message: str, status_code: int | None = None):
        self.status_code = status_code
        super().__init__(message)


class ArtifactClient:
    """Fetch gold artifacts by resource URI from a file root or HTTP base."""

    def __init__(self, base: str):
        self.base = base.rstrip("/")

    def fetch_index(self) -> str:
        return self._fetch("index/latest.json", "index")

    def fetch_artifact(self, resource_uri: str) -> str:
        path = resource_uri.strip("/")
        if not path.endswith(".json"):
            path = f"{path}.json"
        if ".." in path.split("/"):
            raise ArtifactError(f"invalid resource uri {resource_uri!r}", status_code=400)
        return self._fetch(path, resource_uri)

    def _fetch(self, rel: str, label: str) -> str:
        if self.base.startswith(("http://", "https://")):
            try:
                with urllib.request.urlopen(f"{self.base}/{rel}") as resp:
                    return resp.read().decode()
            except urllib.error.HTTPError as exc:
                raise ArtifactError(
                    f"artifact {label!r} fetch failed: HTTP {exc.code}", status_code=exc.code
                ) from None
            except urllib.error.URLError as exc:
                raise ArtifactError(f"artifact {label!r} unreachable: {exc.reason}") from None
        path = os.path.join(self.base, rel)
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            raise ArtifactError(f"artifact {label!r} not found", status_code=404) from None
        except OSError as exc:
            raise ArtifactError(f"artifact {label!r} unreadable: {exc}") from None


def serve_artifacts(root: str, port: int = 0) -> tuple[ThreadingHTTPServer, str]:
    """Serve ``root`` as static files on localhost (the CloudFront
    stand-in); returns (server, base_url). Caller shuts down with
    ``server.shutdown()``. Daemon thread — never blocks exit."""
    handler = type(
        "ArtifactHandler",
        (SimpleHTTPRequestHandler,),
        {
            # directory is passed per-instance by the factory below —
            # a class attribute here would be dead, divergence-prone
            # config (SimpleHTTPRequestHandler reads the __init__ arg)
            # quiet: a per-request stderr line per artifact fetch would
            # drown real logs in agent loops
            "log_message": lambda self, fmt, *args: None,
        },
    )

    def factory(*args, **kwargs):
        return handler(*args, directory=root, **kwargs)

    srv = ThreadingHTTPServer(("127.0.0.1", port), factory)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
