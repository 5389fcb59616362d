"""Serving layer: gold JSON artifacts + local query proxy.

Reference ancestor: ``apps/mcp-local-proxy`` (serving shim over static
gold artifacts behind CloudFront — all compute local, the cloud serves
only data; ``meta/adr/ADR-033``) and the gold-analytics JSON artifact
publisher (≤100 KB artifacts + ``index/latest.json`` catalog,
``ADR-024``: < 50 ms catalog discovery).

Spark-first analog: :mod:`publish` materializes registry query results
as paged static JSON artifacts with an atomically-swapped index;
:mod:`proxy` resolves resource URIs against a file root or HTTP base
(stdlib server included) and speaks a minimal MCP-style JSON-RPC over
stdio for agent clients. The artifacts are the PRODUCT of the engine's
queries — serving them needs no Spark at all, exactly the reference's
static-data design.
"""

from hoopstat_haus_spark.serving.proxy import ArtifactClient, ArtifactError, serve_artifacts
from hoopstat_haus_spark.serving.publish import publish_gold_artifacts, publish_table_artifacts

__all__ = [
    "ArtifactClient",
    "ArtifactError",
    "publish_gold_artifacts",
    "publish_table_artifacts",
    "serve_artifacts",
]
