"""Live property-graph sink: batched UNWIND/MERGE over an injectable
Bolt-shaped transport (S8/S9 live variant).

The reference MERGEs nodes/edges per row through a driver session
(`/root/reference/create_KG.py:32-51,95-138`). The engine's bulk layout
is pipeline/kg.py (MERGE ≈ dropDuplicates, partitioned parquet for
offline loaders); THIS module is the online path: each executor
partition opens its own session and ships `batch_size`-row UNWIND
statements — the canonical Neo4j bulk pattern:

    UNWIND $rows AS row
    MERGE (n:`Label` {node_id: row.node_id})
    ON CREATE SET n.name = row.name

Design points (the parts a 1,000-executor run cares about):
- per-PARTITION sessions via foreachPartition — no driver funnel, API
  concurrency bounded by task slots (same shape as the LLM tier,
  pipeline/relations.LlmClassifier);
- statements are idempotent (MERGE + ON CREATE SET first-writer-wins),
  so Spark task retries and the at-least-once batch replay after a
  transient failure are both safe — semantically identical to the
  DataFrame twin's dropDuplicates, which tests assert by replaying the
  captured wire traffic into an in-process MERGE interpreter;
- transient failures retry with exponential backoff, then raise (a graph
  sink must not silently drop edges — unlike the LLM tier there is no
  meaningful fallback value);
- ``transport`` is injectable: no Bolt wire library exists in this
  container, so tests use (a) a JSONL wire capture that runs on real
  executors and (b) FakeGraphServer, an in-process MERGE interpreter;
  a deployment passes ``neo4j.Session.run`` at the same call site.
"""

from __future__ import annotations

import json
import os
import re
import time as _time
import uuid

from pyspark.sql import DataFrame


class TransientGraphError(Exception):
    """Retryable failure (connection reset, leader switch, deadlock)."""


NODE_CYPHER = (
    "UNWIND $rows AS row "
    "MERGE (n:`{label}` {{node_id: row.node_id}}) "
    "ON CREATE SET n.name = row.name"
)
EDGE_CYPHER = (
    "UNWIND $rows AS row "
    "MATCH (a {{node_id: row.src}}) MATCH (b {{node_id: row.dst}}) "
    "MERGE (a)-[r:`{edge_type}`]->(b) "
    "ON CREATE SET r.example = row.example"
)


class GraphBatcher:
    """Groups rows by label/edge_type, emits UNWIND batches through
    ``transport(cypher, rows)`` with retry+backoff. ``calls`` records
    (cypher, n_rows, attempt) for test inspection."""

    def __init__(
        self,
        transport,
        batch_size: int = 500,
        max_retries: int = 3,
        backoff_s: float = 0.5,
        sleep=None,
    ):
        self.transport = transport
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.sleep = sleep if sleep is not None else _time.sleep
        self.calls: list[tuple[str, int, int]] = []

    def _send(self, cypher: str, rows: list[dict]) -> None:
        for lo in range(0, len(rows), self.batch_size):
            chunk = rows[lo : lo + self.batch_size]
            for attempt in range(self.max_retries):
                self.calls.append((cypher, len(chunk), attempt))
                try:
                    self.transport(cypher, chunk)
                    break
                except TransientGraphError:
                    if attempt == self.max_retries - 1:
                        raise
                    # replaying the whole chunk after a partial write is
                    # safe: MERGE is idempotent
                    self.sleep(self.backoff_s * (2**attempt))

    def write_nodes(self, rows_iter) -> int:
        by_label: dict[str, list[dict]] = {}
        n = 0
        for r in rows_iter:
            d = r.asDict() if hasattr(r, "asDict") else dict(r)
            by_label.setdefault(d["label"], []).append(
                {"node_id": d["node_id"], "name": d.get("name")}
            )
            n += 1
        for label in sorted(by_label):
            self._send(NODE_CYPHER.format(label=label), by_label[label])
        return n

    def write_edges(self, rows_iter) -> int:
        by_type: dict[str, list[dict]] = {}
        n = 0
        for r in rows_iter:
            d = r.asDict() if hasattr(r, "asDict") else dict(r)
            by_type.setdefault(d["edge_type"], []).append(
                {"src": d["src"], "dst": d["dst"], "example": d.get("example")}
            )
            n += 1
        for et in sorted(by_type):
            self._send(EDGE_CYPHER.format(edge_type=et), by_type[et])
        return n


def write_graph_live(
    nodes: DataFrame,
    edges: DataFrame,
    transport_factory,
    batch_size: int = 500,
    max_retries: int = 3,
    backoff_s: float = 0.5,
) -> None:
    """Stream the graph through per-partition transports. Nodes strictly
    before edges (edge MERGE MATCHes its endpoints — same ordering the
    reference enforces by writing node CSVs first). ``transport_factory``
    must be picklable; it is invoked once per partition ON THE EXECUTOR
    and must return a ``transport(cypher, rows)`` callable."""

    def run_nodes(rows):
        GraphBatcher(transport_factory(), batch_size, max_retries, backoff_s).write_nodes(rows)

    def run_edges(rows):
        GraphBatcher(transport_factory(), batch_size, max_retries, backoff_s).write_edges(rows)

    nodes.foreachPartition(run_nodes)
    edges.foreachPartition(run_edges)


# ---------------------------------------------------------------------------
# In-container proof targets (no Bolt wire library in the sandbox)
# ---------------------------------------------------------------------------

class JsonlCaptureTransport:
    """Executor-side wire capture: every (cypher, rows) call appends one
    JSON line to a per-partition file under ``dir_``. Picklable; safe for
    concurrent partitions (unique file per instance)."""

    def __init__(self, dir_: str):
        self.dir = dir_
        self._path = None

    def __call__(self, cypher: str, rows: list[dict]) -> None:
        if self._path is None:
            os.makedirs(self.dir, exist_ok=True)
            self._path = os.path.join(
                self.dir, f"calls-{os.getpid()}-{uuid.uuid4().hex[:8]}.jsonl"
            )
        with open(self._path, "a") as f:
            f.write(json.dumps({"cypher": cypher, "rows": rows}) + "\n")


def read_captured_calls(dir_: str) -> list[tuple[str, list[dict]]]:
    out = []
    for name in sorted(os.listdir(dir_)):
        if name.endswith(".jsonl"):
            with open(os.path.join(dir_, name)) as f:
                for line in f:
                    d = json.loads(line)
                    out.append((d["cypher"], d["rows"]))
    return out


class FakeGraphServer:
    """In-process MERGE interpreter for the exact statements this module
    emits: the oracle for idempotency and first-writer-wins semantics.
    Replaying the same batches any number of times must leave ``nodes``
    and ``edges`` unchanged — Cypher MERGE's contract."""

    _NODE_RE = re.compile(r"MERGE \(n:`([^`]+)` \{node_id: row\.node_id\}\)")
    _EDGE_RE = re.compile(r"MERGE \(a\)-\[r:`([^`]+)`\]->\(b\)")

    def __init__(self):
        self.nodes: dict[str, dict] = {}  # node_id -> {label, name}
        self.edges: dict[tuple, dict] = {}  # (src, dst, type) -> {example}

    def __call__(self, cypher: str, rows: list[dict]) -> None:
        m = self._NODE_RE.search(cypher)
        if m:
            label = m.group(1)
            for r in rows:
                if r["node_id"] not in self.nodes:  # ON CREATE only
                    self.nodes[r["node_id"]] = {"label": label, "name": r["name"]}
            return
        m = self._EDGE_RE.search(cypher)
        if m:
            et = m.group(1)
            for r in rows:
                if r["src"] not in self.nodes or r["dst"] not in self.nodes:
                    raise TransientGraphError(
                        f"edge endpoint missing: {r['src']} -> {r['dst']}"
                    )
                key = (r["src"], r["dst"], et)
                if key not in self.edges:
                    self.edges[key] = {"example": r["example"]}
            return
        raise ValueError(f"unrecognized cypher: {cypher}")
