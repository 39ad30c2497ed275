"""Index-served interactive search (round-4 task 1).

The reference serves EVERY vector/hybrid search through its persisted HNSW
index (vector/index.rs:325-373, hybrid.rs:118-127); the distributed
analogue is the persisted LSH signature index. These tests pin:

- recall ≥ 0.95 of the index-served top-k vs the exact full-scan path,
- identical scores for the hits both paths agree on (the probe rescores
  with the same exact cosine),
- the auto-switch: small corpora keep the exact scan even when an index
  is present (same pattern as gate.LSH_ABOVE_INCOMING),
- partition pruning: the probe's index scan carries a PartitionFilter on
  the bucket column — only probed buckets are read,
- hybrid_search end-to-end through the index path (schema + blend intact).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import make_edge, make_node
from cortex_spark.embed import encode_py
from cortex_spark.hybrid import hybrid_search, vector_search
from cortex_spark.linker.index import N_BUCKET_PARTS, LshIndexStore

QUERY = "graph memory retention and decay policies"
DIM = 32


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """300 nodes clustered at varying distances from the query embedding +
    a persisted LSH index over them."""
    rng = np.random.default_rng(17)
    q = np.array(encode_py(QUERY, DIM, 42))
    q /= np.linalg.norm(q)
    rows = []
    for i in range(300):
        v = q + (0.15 + 1.5 * i / 300) * rng.standard_normal(DIM)
        v /= np.linalg.norm(v)
        rows.append(make_node(f"n{i:03d}", embedding=[float(x) for x in v]))
    from conftest import NODE_COLS

    nodes = spark.createDataFrame(rows, NODE_COLS).cache()
    root = tmp_path_factory.mktemp("idx")
    store = LshIndexStore(str(root / "lsh"), spark, dim=DIM)
    store.append(nodes)
    return nodes, store


def test_index_search_recall_and_scores_vs_brute(spark, corpus):
    nodes, store = corpus
    brute = vector_search(nodes, QUERY, k=10, embed_dim=DIM)
    served = vector_search(nodes, QUERY, k=10, embed_dim=DIM, index=store, use_index=True)
    b = {r["node_id"]: r["vector_score"] for r in brute.collect()}
    s = {r["node_id"]: r["vector_score"] for r in served.collect()}
    assert len(b) == 10
    recall = len(set(b) & set(s)) / len(b)
    assert recall >= 0.95, f"index-served recall {recall} < 0.95"
    for nid in set(b) & set(s):
        assert abs(b[nid] - s[nid]) < 1e-6  # same exact cosine rescore


def test_index_present_but_small_corpus_stays_exact(spark, corpus):
    """Auto-switch: 300 live rows < INDEX_ABOVE_CORPUS ⇒ the exact scan
    runs even though an index was passed — bit-identical to no-index."""
    nodes, store = corpus
    no_idx = [tuple(r) for r in vector_search(nodes, QUERY, k=10, embed_dim=DIM).collect()]
    auto = [
        tuple(r)
        for r in vector_search(nodes, QUERY, k=10, embed_dim=DIM, index=store).collect()
    ]
    assert auto == no_idx


def test_auto_switch_reads_meta_hint_without_count_job(spark, corpus, monkeypatch):
    """Round-5 task: path pick is driver-side metadata. With a corpus-size
    hint in the index meta, vector_search must NOT launch the bounded
    limit+count job — we pin that by making DataFrame.count raise during
    plan construction. A large hint routes to the index (a live node absent
    from the index can't appear); a small hint keeps the exact scan."""
    import pyspark.sql as pysql

    nodes, store = corpus
    # a live node the index has never seen, placed exactly at the query
    # vector so the brute path must rank it #1
    q = encode_py(QUERY, DIM, 42)
    extra = spark.createDataFrame(
        [make_node("zz_unindexed", embedding=[float(x) for x in q])],
        nodes.schema,
    )
    live = nodes.unionByName(extra)

    real_count = pysql.DataFrame.count

    def boom(self):
        raise AssertionError("path selection launched a count job")

    # large hint ⇒ indexed path, no count job during construction
    meta = store.meta()
    meta["rows_indexed"] = 20_000
    store._write_meta(meta)
    monkeypatch.setattr(pysql.DataFrame, "count", boom)
    served = vector_search(live, QUERY, k=10, embed_dim=DIM, index=store)
    monkeypatch.setattr(pysql.DataFrame, "count", real_count)
    got = [r["node_id"] for r in served.collect()]
    assert "zz_unindexed" not in got  # index-served: unindexed node invisible

    # small hint ⇒ exact scan (still no count job), unindexed node visible
    meta["rows_indexed"] = 301
    store._write_meta(meta)
    monkeypatch.setattr(pysql.DataFrame, "count", boom)
    brute = vector_search(live, QUERY, k=10, embed_dim=DIM, index=store)
    monkeypatch.setattr(pysql.DataFrame, "count", real_count)
    assert [r["node_id"] for r in brute.collect()][0] == "zz_unindexed"
    # restore the real meta for the other module-scoped tests
    meta["rows_indexed"] = 300
    store._write_meta(meta)


def test_index_search_applies_filters_and_tombstones(spark, corpus):
    nodes, store = corpus
    # tombstone + exclude the two top brute hits; the served path must not
    # return them (stale index entries drop at the live-join)
    top2 = [r["node_id"] for r in vector_search(nodes, QUERY, k=2, embed_dim=DIM).collect()]
    live = nodes.withColumn(
        "deleted", F.when(F.col("node_id") == top2[0], F.lit(True)).otherwise(F.col("deleted"))
    )
    served = vector_search(
        live, QUERY, k=10, embed_dim=DIM, index=store, use_index=True,
        exclude_ids=[top2[1]],
    )
    got = [r["node_id"] for r in served.collect()]
    assert top2[0] not in got and top2[1] not in got and len(got) == 10


def test_probe_scan_prunes_bucket_partitions(spark, corpus):
    nodes, store = corpus
    qdf = nodes.limit(1).select("node_id", "embedding")
    plan = store.probe(qdf, k=5)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [bucket" in plan.replace("PartitionFilters: [isnotnull(bucket", "PartitionFilters: [bucket"), plan
    # the probed-bucket count is strictly below the partition fan-out
    import re as _re

    m = _re.search(r"bucket#\d+L? IN \(([^)]*)\)", plan)
    assert m, plan
    assert 0 < len(m.group(1).split(",")) < N_BUCKET_PARTS


def test_hybrid_search_through_index(spark, corpus, edges_df_factory):
    nodes, store = corpus
    top = [r["node_id"] for r in vector_search(nodes, QUERY, k=3, embed_dim=DIM).collect()]
    edges = edges_df_factory(
        [make_edge(top[0], top[1], "relates_to"), make_edge(top[1], top[2], "relates_to")]
    )
    brute = hybrid_search(nodes, edges, QUERY, anchors=[top[0]], limit=5, embed_dim=DIM)
    served = hybrid_search(
        nodes, edges, QUERY, anchors=[top[0]], limit=5, embed_dim=DIM,
        index=store, use_index=True,
    )
    assert served.columns == brute.columns == [
        "node_id", "kind", "title", "vector_score", "graph_score", "combined_score"
    ]
    b = [(r["node_id"], round(r["combined_score"], 6)) for r in brute.collect()]
    s = [(r["node_id"], round(r["combined_score"], 6)) for r in served.collect()]
    # over-fetched index candidates cover the brute top-5 here (recall 1.0
    # on this clustered corpus) ⇒ identical blended ranking
    assert s == b
