from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cortex_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cortex-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


NODE_COLS = (
    "node_id string, kind string, title string, body string, "
    "metadata map<string,string>, tags array<string>, embedding array<float>, "
    "source_agent string, source_session string, source_channel string, "
    "importance float, access_count bigint, last_accessed_at timestamp, "
    "created_at timestamp, updated_at timestamp, deleted boolean"
)

EDGE_COLS = (
    "edge_id string, src string, dst string, relation string, weight float, "
    "provenance struct<ptype:string, detail:string, score:float>, "
    "created_at timestamp, updated_at timestamp"
)


def make_node(
    node_id: str,
    kind: str = "fact",
    title: str = "t",
    body: str = "b",
    tags: list[str] | None = None,
    embedding: list[float] | None = None,
    source_agent: str = "a1",
    source_session: str | None = None,
    importance: float = 0.5,
    access_count: int = 0,
    created_at: str = "2026-01-01 00:00:00",
    last_accessed_at: str = "2026-01-01 00:00:00",
    deleted: bool = False,
    metadata: dict | None = None,
):
    return (
        node_id, kind, title, body, metadata or {}, tags or [], embedding,
        source_agent, source_session, "test", float(importance), access_count,
        ts(last_accessed_at), ts(created_at), ts(created_at), deleted,
    )


def make_edge(
    src: str,
    dst: str,
    relation: str = "related_to",
    weight: float = 0.5,
    ptype: str = "manual",
    created_at: str = "2026-01-01 00:00:00",
    updated_at: str | None = None,
):
    return (
        f"{src}-{dst}-{relation}", src, dst, relation, float(weight),
        (ptype, None, None), ts(created_at), ts(updated_at or created_at),
    )


@pytest.fixture()
def nodes_df_factory(spark):
    def make(rows):
        return spark.createDataFrame(rows, NODE_COLS)

    return make


@pytest.fixture()
def edges_df_factory(spark):
    def make(rows):
        return spark.createDataFrame(rows, EDGE_COLS)

    return make
