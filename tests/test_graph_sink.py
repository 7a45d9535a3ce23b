"""Live graph sink (S8/S9 online variant): batched UNWIND/MERGE with an
injectable transport — batching, retry/backoff, idempotent replay, and
the executor-side wire path, all proven against the DataFrame twin
(pipeline/kg.py) without a Bolt library in the container."""

import shutil
import tempfile

import pytest

from web_scraper_spark.sources.graph import (
    FakeGraphServer,
    GraphBatcher,
    JsonlCaptureTransport,
    TransientGraphError,
    read_captured_calls,
    write_graph_live,
)

NODES = [
    {"node_id": "article:1", "label": "Article", "name": "t1"},
    {"node_id": "article:2", "label": "Article", "name": "t2"},
    {"node_id": "entity:Ha Noi", "label": "Entity", "name": "Ha Noi"},
    {"node_id": "source:alpha", "label": "Source", "name": "alpha"},
    {"node_id": "article:1", "label": "Article", "name": "DUPLICATE"},  # MERGE no-op
]
EDGES = [
    {"src": "article:1", "dst": "entity:Ha Noi", "edge_type": "MENTIONS", "example": "s1"},
    {"src": "article:2", "dst": "entity:Ha Noi", "edge_type": "MENTIONS", "example": "s2"},
    {"src": "article:1", "dst": "source:alpha", "edge_type": "PUBLISHED_BY", "example": None},
    # first-writer-wins on re-MERGE of the same key
    {"src": "article:1", "dst": "entity:Ha Noi", "edge_type": "MENTIONS", "example": "LATER"},
]


def test_batching_merge_semantics_and_idempotent_replay():
    server = FakeGraphServer()
    b = GraphBatcher(server, batch_size=2, sleep=lambda s: None)
    assert b.write_nodes(iter(NODES)) == 5
    assert b.write_edges(iter(EDGES)) == 4
    # MERGE semantics: dup node and later edge example did not overwrite
    assert server.nodes["article:1"] == {"label": "Article", "name": "t1"}
    assert server.edges[("article:1", "entity:Ha Noi", "MENTIONS")] == {"example": "s1"}
    assert len(server.nodes) == 4 and len(server.edges) == 3
    # batch sizing: Article label has 3 rows -> 2 calls at batch_size=2
    art_calls = [c for c in b.calls if "`Article`" in c[0]]
    assert [n for _, n, _ in art_calls] == [2, 1]
    # idempotent replay (Spark task retry / at-least-once): state unchanged
    before = (dict(server.nodes), dict(server.edges))
    b2 = GraphBatcher(server, batch_size=2, sleep=lambda s: None)
    b2.write_nodes(iter(NODES))
    b2.write_edges(iter(EDGES))
    assert (server.nodes, server.edges) == before


def test_transient_failures_retry_with_backoff_then_raise():
    server = FakeGraphServer()
    fails = {"left": 2}
    naps = []

    def flaky(cypher, rows):
        if fails["left"] > 0:
            fails["left"] -= 1
            raise TransientGraphError("reset")
        server(cypher, rows)

    b = GraphBatcher(flaky, batch_size=10, max_retries=3, backoff_s=0.5, sleep=naps.append)
    b.write_nodes(iter(NODES))
    assert len(server.nodes) == 4  # succeeded after retries
    assert naps == [0.5, 1.0]  # exponential backoff observed
    # retry budget exhausted -> raises (a graph sink must not drop writes)
    def dead(cypher, rows):
        raise TransientGraphError("down")

    b2 = GraphBatcher(dead, max_retries=2, sleep=lambda s: None)
    with pytest.raises(TransientGraphError):
        b2.write_nodes(iter(NODES[:1]))
    assert [a for _, _, a in b2.calls] == [0, 1]


def test_executor_wire_path_matches_dataframe_twin(spark):
    """write_graph_live on real executors (per-partition JSONL capture),
    replayed through the MERGE interpreter, equals the bulk DataFrame
    twin (pipeline/kg.build_nodes/build_edges) exactly."""
    from web_scraper_spark.pipeline.kg import build_edges, build_nodes

    articles = spark.createDataFrame(
        [(1, "t1", "alpha", "Giáo dục"), (2, "t2", "beta", "Thể thao"), (3, None, "alpha", "Giáo dục")],
        "article_id long, title string, source string, category string",
    )
    entities = spark.createDataFrame(
        [(1, "Ha Noi"), (2, "Ha Noi"), (2, "Nguyen Van An"), (3, "Ha Noi")],
        "article_id long, entity string",
    )
    nodes, edges = build_nodes(articles, entities), build_edges(articles, entities)
    d = tempfile.mkdtemp(prefix="graphcap_")
    try:
        write_graph_live(
            nodes.repartition(3),
            edges.repartition(3),
            transport_factory=lambda: JsonlCaptureTransport(d),
            batch_size=2,
        )
        calls = read_captured_calls(d)
        server = FakeGraphServer()
        for cy, rows in calls:  # nodes first (edge MATCH needs endpoints)
            if "MERGE (n:" in cy:
                server(cy, rows)
        for cy, rows in calls:
            if "MERGE (a)-" in cy:
                server(cy, rows)
        want_nodes = {
            r["node_id"]: {"label": r["label"], "name": r["name"]}
            for r in nodes.collect()
        }
        want_edges = {
            (r["src"], r["dst"], r["edge_type"]): {"example": r["example"]}
            for r in edges.collect()
        }
        assert server.nodes == want_nodes
        assert server.edges == want_edges
        assert len(calls) >= 4  # really batched across partitions
    finally:
        shutil.rmtree(d, ignore_errors=True)
