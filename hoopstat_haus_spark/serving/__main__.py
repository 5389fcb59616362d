"""CLI for the serving layer (reference: ``hoopstat-mcp`` CLI, ADR-033).

    python -m hoopstat_haus_spark.serving publish --sf-dir ... --out gold/
    python -m hoopstat_haus_spark.serving serve --root gold/ --port 8080
    python -m hoopstat_haus_spark.serving get-index --base gold/
    python -m hoopstat_haus_spark.serving get-artifact <resource_uri from get-index> --base http://...
    python -m hoopstat_haus_spark.serving mcp --base gold/      # JSON-RPC over stdio

``--base`` accepts a filesystem root or an http(s) URL (env
``SPARK_GRAFT_ARTIFACT_BASE`` as fallback, mirroring the reference's
``HOOPSTAT_BASE_URL``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from hoopstat_haus_spark.serving.proxy import ArtifactClient, ArtifactError, serve_artifacts


def _base(args) -> str:
    base = args.base or os.environ.get("SPARK_GRAFT_ARTIFACT_BASE")
    if not base:
        raise SystemExit("--base (or SPARK_GRAFT_ARTIFACT_BASE) required")
    return base


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hoopstat_haus_spark.serving")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("publish")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--queries", default=None, help="comma-separated registry names")

    s = sub.add_parser("serve")
    s.add_argument("--root", required=True)
    s.add_argument("--port", type=int, default=8080)

    gi = sub.add_parser("get-index")
    gi.add_argument("--base", default=None)

    ga = sub.add_parser("get-artifact")
    ga.add_argument("resource_uri")
    ga.add_argument("--base", default=None)

    m = sub.add_parser("mcp")
    m.add_argument("--base", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "publish":
        from hoopstat_haus_spark.serving.publish import publish_gold_artifacts
        from hoopstat_haus_spark.session import get_spark

        names = args.queries.split(",") if args.queries else None
        index = publish_gold_artifacts(get_spark(), args.sf_dir, args.out, names)
        print(json.dumps({"published": index["datasets"], "artifacts": len(index["artifacts"])}))
        return 0
    if args.cmd == "serve":
        srv, url = serve_artifacts(args.root, args.port)
        print(json.dumps({"serving": args.root, "url": url}), flush=True)
        import threading

        try:
            threading.Event().wait()  # server runs in its daemon thread
        except KeyboardInterrupt:
            srv.shutdown()
        return 0
    if args.cmd in ("get-index", "get-artifact"):
        client = ArtifactClient(_base(args))
        try:
            body = client.fetch_index() if args.cmd == "get-index" else client.fetch_artifact(args.resource_uri)
        except ArtifactError as exc:
            print(f"Error: {exc}", file=sys.stderr)
            return 1
        # pretty-print for humans (reference CLI contract); artifacts are
        # newline-JSON so fall back to raw when a line isn't one object
        try:
            parsed = [json.loads(x) for x in body.strip().splitlines() if x]
            print(json.dumps(parsed[0] if len(parsed) == 1 else parsed, indent=1))
        except ValueError:
            print(body)
        return 0
    if args.cmd == "mcp":
        from hoopstat_haus_spark.serving.mcp_stdio import serve_stdio

        serve_stdio(ArtifactClient(_base(args)))
        return 0
    raise SystemExit(f"unknown command {args.cmd!r}")


if __name__ == "__main__":
    sys.exit(main())
