"""Custom Python DataSource (the Spark 4 connector API,
``pyspark.sql.datasource``): a deterministic synthetic-corpus
generator registered as a real ``spark.read.format(...)`` source.

This is the API corner a user extends to ingest from systems Spark
has no built-in connector for (internal services, bespoke stores) —
partition planning, per-partition readers, options plumbing. The
generator here is md5-keyed and therefore exactly replayable by a
SQL oracle, so the driver's value-hash check verifies the whole
connector path: partition split → per-partition Python iterator →
Arrow conversion → DataFrame.

Scale shape: ``numPartitions`` contiguous id ranges read
independently (no driver materialization, no skew — ranges are
equal-width); generation is per-row Python inside the reader, which
is the nature of a connector (the data comes FROM Python) — not a
UDF-on-the-hot-path violation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

# 16 words — one per md5 nibble; the SQL oracle indexes the same list
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
]

N_WORDS = 8


def synth_text(doc_id: int) -> str:
    """Words 0..7 = VOCAB[nibble j of md5(doc_id)] — deterministic,
    engine-portable (md5 of the decimal string)."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return " ".join(VOCAB[int(h[j], 16)] for j in range(N_WORDS))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self):
        if self.n_rows <= 0:
            # an EMPTY partition list means "no partitioning" to Spark,
            # which then calls read(None) — AttributeError inside the
            # Python worker (r10 review, execution-confirmed); one
            # empty range yields a clean empty frame instead
            return [_RangePartition(0, 0)]
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, synth_text(i))


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus").option("n_rows", N)``
    after ``spark.dataSource.register(SyntheticCorpusDataSource)``."""

    @classmethod
    def name(cls):
        return "synthetic_corpus"

    def schema(self):
        return StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )

    def reader(self, schema):
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticCorpusStreamReader(self.options)


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same connector (``spark.readStream
    .format("synthetic_corpus")``): micro-batches of ``batch_rows``
    ids until ``n_rows``, then an empty tail forever — the bounded
    replay of an unbounded feed. Offsets are plain dicts
    ({"pos": next_id}), so a restarted query resumes exactly;
    ``readBetweenOffsets`` regenerates any offset range verbatim
    (the md5 generator is pure), which is what makes the source
    exactly-once replayable from the checkpoint with no external
    state. Content is identical to the batch reader's, so the SAME
    SQL oracle verifies the streaming path end-to-end."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch_rows, self.n_rows)
        rows = [(i, synth_text(i)) for i in range(pos, end)]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            (i, synth_text(i))
            for i in range(int(start["pos"]), int(end["pos"]))
        )
