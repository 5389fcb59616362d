"""Minimal MCP-style JSON-RPC/stdio adapter over the artifact proxy.

Reference ancestor: ``apps/mcp-local-proxy/app/server.py`` (FastMCP
tools ``get_index`` / ``get_artifact``; ``ADR-034`` dual-runtime
adapter). The container has no MCP SDK, so this speaks the public MCP
wire shape directly with stdlib only: newline-delimited JSON-RPC 2.0
on stdin/stdout, supporting ``initialize``, ``tools/list``, and
``tools/call`` for the same two tools. Tool errors return as content
with ``isError`` (an agent loop must never crash on a 404), matching
the reference's error-string contract.
"""

from __future__ import annotations

import json
import sys

from hoopstat_haus_spark.serving.proxy import ArtifactClient, ArtifactError

PROTOCOL_VERSION = "2024-11-05"

TOOLS = [
    {
        "name": "get_index",
        "description": "Fetch the latest gold-artifact index (index/latest.json): "
        "every published dataset, its pages, row counts, and publish time.",
        "inputSchema": {"type": "object", "properties": {}, "required": []},
    },
    {
        "name": "get_artifact",
        "description": "Fetch one gold artifact by resource URI, e.g. "
        "'agg_pricing_summary/p.../0000' as listed by get_index (.json appended automatically).",
        "inputSchema": {
            "type": "object",
            "properties": {"resource_uri": {"type": "string"}},
            "required": ["resource_uri"],
        },
    },
]


def _tool_result(text: str, is_error: bool = False) -> dict:
    return {"content": [{"type": "text", "text": text}], "isError": is_error}


def handle_request(req: dict, client: ArtifactClient) -> dict | None:
    """One JSON-RPC request → response dict (None for notifications)."""
    method = req.get("method")
    rid = req.get("id")
    if rid is None:
        return None  # notification (e.g. notifications/initialized)
    if method == "initialize":
        result = {
            "protocolVersion": PROTOCOL_VERSION,
            "capabilities": {"tools": {}},
            "serverInfo": {"name": "spark-lakehouse-artifacts", "version": "1.0"},
        }
    elif method == "tools/list":
        result = {"tools": TOOLS}
    elif method == "tools/call":
        params = req.get("params") or {}
        name = params.get("name")
        args = params.get("arguments") or {}
        try:
            if name == "get_index":
                result = _tool_result(client.fetch_index())
            elif name == "get_artifact":
                result = _tool_result(client.fetch_artifact(args["resource_uri"]))
            else:
                result = _tool_result(f"Error: unknown tool {name!r}", is_error=True)
        except ArtifactError as exc:
            result = _tool_result(f"Error: {exc}", is_error=True)
        except KeyError as exc:
            result = _tool_result(f"Error: missing argument {exc}", is_error=True)
    else:
        return {
            "jsonrpc": "2.0",
            "id": rid,
            "error": {"code": -32601, "message": f"method not found: {method}"},
        }
    return {"jsonrpc": "2.0", "id": rid, "result": result}


def serve_stdio(client: ArtifactClient, stdin=None, stdout=None) -> None:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except ValueError:
            continue
        resp = handle_request(req, client)
        if resp is not None:
            stdout.write(json.dumps(resp) + "\n")
            stdout.flush()
