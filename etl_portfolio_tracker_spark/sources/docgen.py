"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): a
deterministic synthetic-corpus generator — `spark.read.format
("docgen").option("rows", N).load()` yields the documents-table
schema without touching disk.

Why a generator source and not a parquet fixture: scale probes want
10×/100× corpora on demand; generating rows inside the executors
means the "input" is CPU, not I/O, and partition-parallel by
construction (each InputPartition derives its rows from its own index
— no coordination, no shuffle, arbitrarily many partitions).

Determinism: every row is a pure function of (seed, doc_id) through
md5 — same rows in any partitioning, any engine, any run; the text is
drawn from a fixed vocabulary so downstream text operators (shingles,
tokens, language-ID) see realistic token statistics.

This is the S-family "pluggable connector" surface (SURVEY §2.1) on
the newest API: batch `DataSourceReader` with explicit
`InputPartition`s. A production connector (REST cursor, message bus,
proprietary store) swaps the row loop; the partition-planning and
schema contract stay identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition,
    SimpleDataSourceStreamReader)

VOCAB = ("key agg row scan slow fast table value part hash merge batch "
         "spark the line sort window join shuffle plan stage task core "
         "broadcast filter column schema codec page group stripe index").split()

DOCGEN_SCHEMA = "doc_id bigint, text string, source string, n_chars bigint"


def _doc_text(seed: int, doc_id: int) -> str:
    """8-40 vocab words, all md5-derived — pure f(seed, doc_id)."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 8 + h[0] % 33
    words = []
    x = int.from_bytes(h, "big")
    for i in range(n_words):
        if i % 10 == 0:                       # refresh entropy
            x = int.from_bytes(hashlib.md5(
                f"{seed}:{doc_id}:{i}".encode()).digest(), "big")
        words.append(VOCAB[x % len(VOCAB)])
        x //= len(VOCAB)
    return " ".join(words)


class DocGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.n_sources = int(options.get("sources", 20))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        # contiguous doc_id range per partition — deterministic and
        # disjoint regardless of scheduling order
        pid = partition.value
        lo = pid * self.n_rows // self.n_parts
        hi = (pid + 1) * self.n_rows // self.n_parts
        for doc_id in range(lo, hi):
            text = _doc_text(self.seed, doc_id)
            yield (doc_id, text, f"src{doc_id % self.n_sources}", len(text))


class DocGenSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (Spark 4
    `simpleStreamReader`): the same deterministic corpus arrives as
    micro-batches of `rowsPerBatch` docs until `rows` total, then the
    source goes quiet (empty batches). Offsets are plain dicts
    ({"offset": next_doc_id}) checkpointed by the engine;
    `readBetweenOffsets` replays any committed range exactly —
    identical rows to the batch reader because every row is a pure
    function of (seed, doc_id). This is the ingest-connector contract
    (S1 streaming form): swap the generator loop for a cursor/queue
    client and the offset/replay plumbing stays."""

    def __init__(self, options):
        self.total = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.n_sources = int(options.get("sources", 20))
        self.seed = int(options.get("seed", 7))

    def initialOffset(self):
        return {"offset": 0}

    def _rows(self, lo: int, hi: int):
        # materialized list, not a generator: the engine's prefetch
        # cache copies the returned batch (generators can't pickle)
        return [(doc_id, (t := _doc_text(self.seed, doc_id)),
                 f"src{doc_id % self.n_sources}", len(t))
                for doc_id in range(lo, hi)]

    def read(self, start):
        lo = start["offset"]
        hi = min(lo + self.per_batch, self.total)
        return self._rows(lo, hi), {"offset": hi}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["offset"], end["offset"])


class DocGenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "docgen"

    def schema(self):
        return DOCGEN_SCHEMA

    def reader(self, schema):
        return DocGenReader(self.options)

    def simpleStreamReader(self, schema):
        return DocGenSimpleStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration; after this,
    spark.read.format("docgen") works in the session."""
    spark.dataSource.register(DocGenDataSource)
