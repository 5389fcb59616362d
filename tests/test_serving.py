"""Serving layer: gold-artifact publisher + local proxy + MCP adapter.

Reference parity targets: artifact ≤100 KB paging + index catalog
(gold-analytics json_artifacts + ADR-024, incl. its < 50 ms discovery
criterion), URI→GET client with non-crashing errors (mcp-local-proxy
http_client), and the two-tool MCP surface (server.py)."""

import json
import time

import pytest

from hoopstat_haus_spark.serving import (
    ArtifactClient,
    ArtifactError,
    publish_gold_artifacts,
    serve_artifacts,
)
from hoopstat_haus_spark.serving.mcp_stdio import handle_request

SF = "/root/testdata/sf0.001"
GOLD = ["agg_pricing_summary", "join_revenue_by_nation"]


@pytest.fixture(scope="module")
def gold_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gold"))
    publish_gold_artifacts(spark, SF, root, GOLD)
    return root


def test_publish_index_and_artifact_values(spark, gold_root):
    client = ArtifactClient(gold_root)
    index = json.loads(client.fetch_index())
    assert set(index["datasets"]) == set(GOLD)
    assert all(a["bytes"] <= 100 * 1024 for a in index["artifacts"])
    # served rows must equal the live query result, row for row
    from hoopstat_haus_spark import registry

    uri = next(
        a["resource_uri"]
        for a in index["artifacts"]
        if a["resource_uri"].startswith("agg_pricing_summary/")
    )
    body = client.fetch_artifact(uri)
    served = [json.loads(x) for x in body.strip().splitlines()]
    live = [
        json.loads(x)
        for x in registry.all_queries()["agg_pricing_summary"](spark, SF).toJSON().collect()
    ]
    assert served == live
    assert index["datasets"]["agg_pricing_summary"]["rows"] == len(live)


def test_paging_respects_byte_cap(spark, tmp_path):
    root = str(tmp_path / "paged")
    index = publish_gold_artifacts(spark, SF, root, GOLD, max_artifact_bytes=256)
    assert index["datasets"]["agg_pricing_summary"]["pages"] > 1
    client = ArtifactClient(root)
    # pages concatenate back to the full result, order preserved
    rows = []
    for a in index["artifacts"]:
        if a["resource_uri"].startswith("agg_pricing_summary/"):
            assert a["bytes"] <= 256  # the cap is HARD now (oversize rows raise)
            rows.extend(json.loads(x) for x in client.fetch_artifact(a["resource_uri"]).strip().splitlines())
    from hoopstat_haus_spark import registry

    live = [
        json.loads(x)
        for x in registry.all_queries()["agg_pricing_summary"](spark, SF).toJSON().collect()
    ]
    assert rows == live


def test_file_client_errors(gold_root):
    client = ArtifactClient(gold_root)
    with pytest.raises(ArtifactError) as ei:
        client.fetch_artifact("no_such/latest/0000")
    assert ei.value.status_code == 404
    with pytest.raises(ArtifactError) as ei:
        client.fetch_artifact("../../etc/passwd")
    assert ei.value.status_code == 400


def test_http_serving_and_catalog_latency(gold_root):
    srv, url = serve_artifacts(gold_root)
    try:
        client = ArtifactClient(url)
        index = json.loads(client.fetch_index())
        assert set(index["datasets"]) == set(GOLD)
        uri = next(
            a["resource_uri"]
            for a in index["artifacts"]
            if a["resource_uri"].startswith("join_revenue_by_nation/")
        )
        body = client.fetch_artifact(uri)
        assert body.strip()
        with pytest.raises(ArtifactError) as ei:
            client.fetch_artifact("missing/latest/0000")
        assert ei.value.status_code == 404
        # ADR-024 success criterion: catalog discovery < 50 ms
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            client.fetch_index()
            lat.append(time.perf_counter() - t0)
        assert sorted(lat)[len(lat) // 2] < 0.050, f"median catalog fetch {sorted(lat)[10]:.3f}s"
    finally:
        srv.shutdown()


def test_mcp_stdio_tools(gold_root):
    client = ArtifactClient(gold_root)
    init = handle_request({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}, client)
    assert init["id"] == 1 and init["result"]["serverInfo"]["name"]
    # notifications get no response
    assert handle_request({"jsonrpc": "2.0", "method": "notifications/initialized"}, client) is None
    tools = handle_request({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}, client)
    assert {t["name"] for t in tools["result"]["tools"]} == {"get_index", "get_artifact"}
    call = handle_request(
        {"jsonrpc": "2.0", "id": 3, "method": "tools/call", "params": {"name": "get_index", "arguments": {}}},
        client,
    )
    index = json.loads(call["result"]["content"][0]["text"])
    assert set(index["datasets"]) == set(GOLD)
    # a 404 must come back as isError content, never an exception
    bad = handle_request(
        {
            "jsonrpc": "2.0",
            "id": 4,
            "method": "tools/call",
            "params": {"name": "get_artifact", "arguments": {"resource_uri": "nope/latest/0000"}},
        },
        client,
    )
    assert bad["result"]["isError"] and "Error" in bad["result"]["content"][0]["text"]
    unknown = handle_request({"jsonrpc": "2.0", "id": 5, "method": "bogus"}, client)
    assert unknown["error"]["code"] == -32601


def test_table_publish_pins_one_snapshot_across_maintenance(spark, tmp_path):
    """Round-5: a publish racing maintenance must emit artifacts of ONE
    table state. A MERGE commits between the two rollup
    materializations; both artifacts and the index must still carry the
    snapshot id pinned at publish entry, and both must reflect the
    PRE-merge data."""
    import os

    from pyspark.sql import functions as F

    from hoopstat_haus_spark.lakehouse import TokenLakeTable
    from hoopstat_haus_spark.lakehouse.merge import merge_into
    from hoopstat_haus_spark.serving import publish_table_artifacts
    from hoopstat_haus_spark.tables import synthetic

    t = TokenLakeTable.create(spark, str(tmp_path / "t"), synthetic(spark, 3000), repartition_n=4)
    pinned = t.log.current_id()

    def by_source(df):
        return df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).orderBy("source")

    def first_rollup(df):
        out = by_source(df)
        out.collect()  # materialize BEFORE the race commits
        # concurrent maintenance: insert 25 brand-new docs mid-publish
        ups = (
            synthetic(spark, 3050)
            .withColumn("doc_id", F.concat(F.lit("race-"), F.col("doc_id")))
            .limit(25)
        )
        merge_into(t, ups)
        return out

    root = str(tmp_path / "gold")
    index = publish_table_artifacts(t, root, {"a_first": first_rollup, "b_second": by_source})
    assert t.log.current_id() == pinned + 1, "merge must have committed mid-publish"
    assert index["snapshot_id"] == pinned
    assert all(a["snapshot_id"] == pinned for a in index["artifacts"])
    assert all(d["snapshot_id"] == pinned for d in index["datasets"].values())

    # both artifacts show the SAME (pre-merge) state: identical rollups
    def served(name):
        uri = next(
            a["resource_uri"] for a in index["artifacts"] if a["resource_uri"].startswith(f"{name}/")
        )
        with open(os.path.join(root, uri + ".json")) as f:
            return [json.loads(x) for x in f.read().strip().splitlines()]

    a, b = served("a_first"), served("b_second")
    assert a == b
    assert sum(r["n"] for r in a) == 3000  # no race-* docs leaked in


def test_republish_is_write_once_and_pruned(spark, tmp_path):
    """A republish must never mutate a page URI the previous index
    named (in-flight readers / CDNs hold it), must not leave stale
    higher-numbered pages under the new catalog, and prunes publishes
    older than current+previous."""
    import os

    root = str(tmp_path / "gold")
    idx1 = publish_gold_artifacts(spark, SF, root, ["agg_pricing_summary"])
    uri1 = idx1["artifacts"][0]["resource_uri"]
    body1 = ArtifactClient(root).fetch_artifact(uri1)
    time.sleep(0.002)  # distinct pub_id ms
    idx2 = publish_gold_artifacts(spark, SF, root, ["agg_pricing_summary"])
    uri2 = idx2["artifacts"][0]["resource_uri"]
    assert uri1 != uri2
    # the OLD catalog's page is intact byte-for-byte after the republish
    assert ArtifactClient(root).fetch_artifact(uri1) == body1
    time.sleep(0.002)
    idx3 = publish_gold_artifacts(spark, SF, root, ["agg_pricing_summary"])
    pubs = sorted(os.listdir(os.path.join(root, "agg_pricing_summary")))
    assert len(pubs) == 2  # keep current + previous, prune older
    assert ArtifactClient(root).fetch_artifact(idx3["artifacts"][0]["resource_uri"])


def test_publish_rejects_oversize_row(spark, tmp_path):
    with pytest.raises(ValueError, match="artifact cap"):
        publish_gold_artifacts(
            spark, SF, str(tmp_path / "gold"), ["agg_pricing_summary"], max_artifact_bytes=8
        )
