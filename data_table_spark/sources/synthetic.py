"""Synthetic-corpus generator as a Spark 4 Python DataSource
(pyspark.sql.datasource) — `spark.read.format("synthetic_corpus")`.

Why a data source and not a DataFrame builder: generation happens
EXECUTOR-side, one InputPartition per slice, so a 10-billion-document
load test never materializes anything on the driver and scales with the
cluster exactly like a parquet scan (the reference has no generator;
this extends the source surface the same way streaming extends the
relational surface). Rows are a pure function of (seed, doc_id) via
sha256 — the same options always produce byte-identical corpora, on any
partition count, which is what makes generated load tests reproducible
and lets tests assert determinism.

Options: ``rows`` (total documents, default 1000), ``partitions``
(parallelism, default 8), ``seed`` (default 42).

Usage::

    from data_table_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_corpus")
          .option("rows", 100000).option("seed", 7).load())

The emitted schema mirrors the testdata ``documents`` table
(doc_id/text/lang/source/n_chars) so every corpus operator in
operators/pipeline.py and operators/textstats.py runs on generated
corpora unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu"
).split()
_LANGS = ("en", "de", "fr", "es")
_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _digest(seed: int, doc_id: int, salt: int) -> int:
    h = hashlib.sha256(f"{seed}:{doc_id}:{salt}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def _make_doc(seed: int, doc_id: int) -> tuple:
    d0 = _digest(seed, doc_id, 0)
    n_words = 5 + d0 % 40
    words = [
        _WORDS[_digest(seed, doc_id, 1 + i) % len(_WORDS)]
        for i in range(n_words)
    ]
    text = " ".join(words)
    lang = _LANGS[d0 % len(_LANGS)]
    source = f"gen{d0 % 10}"
    return (doc_id, text, lang, source, len(text))


class _CorpusPartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))
        self.lo = 0             # inclusive pushed lower bound
        self.hi = self.rows     # exclusive pushed upper bound

    def partitions(self) -> list[InputPartition]:
        lo, hi = self.lo, min(self.hi, self.rows)
        if hi <= lo:  # empty corpus/range: one empty slice
            return [_CorpusPartition(0, 0, self.seed)]
        per = -(-(hi - lo) // self.num_partitions)  # ceil division
        return [
            _CorpusPartition(s, min(s + per, hi), self.seed)
            for s in range(lo, hi, per)
        ]

    def read(self, partition: _CorpusPartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _make_doc(partition.seed, doc_id)


class SyntheticCorpusPushdownReader(SyntheticCorpusReader):
    """The ``option("pushdown", "true")`` flavor — doc_id-range FILTER
    PUSHDOWN via Spark 4.1 ``pushFilters``: comparison filters on
    doc_id narrow the generated id range BEFORE partition planning, so
    ``.filter("doc_id >= N")`` prunes whole InputPartitions instead of
    generating-then-discarding — the Python-data-source analogue of
    parquet partition pruning, and the difference between O(selected)
    and O(corpus) work on a generated 10-billion-row load test.
    Handled filters are consumed (not yielded back); everything else —
    other columns, OR-trees Spark never offers — stays Spark-side per
    the contract. A SEPARATE subclass because merely DEFINING
    pushFilters makes Spark reject the source wherever
    ``spark.sql.python.filterPushdown.enabled`` is false (the raw
    driver session) — the default reader must stay flag-agnostic."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            v = getattr(f, "value", None)
            if (
                getattr(f, "attribute", None) == ("doc_id",)
                and isinstance(v, int)
            ):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                    continue
            yield f  # unsupported: Spark evaluates it post-scan


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the synthetic corpus — the Spark 4 Python
    SimpleDataSourceStreamReader surface (`spark.readStream.format(
    "synthetic_corpus")`): each micro-batch emits the next
    ``batch_rows`` documents, offsets are plain doc_id watermarks, and
    rows remain the SAME pure function of (seed, doc_id) as the batch
    reader — so a streamed corpus capped at ``rows`` equals the batch
    corpus row-for-row (asserted in tests), and replay after restart
    (readBetweenOffsets) regenerates byte-identical batches instead of
    relying on a buffer. The source exhausts at ``rows``, so
    processAllAvailable()/availableNow terminate."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = max(1, int(options.get("batch_rows", 100)))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        s = int(start["next"])
        e = min(s + self.batch_rows, self.rows)
        return (
            iter([_make_doc(self.seed, i) for i in range(s, e)]),
            {"next": max(e, s)},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for i in range(int(start["next"]), int(end["next"])):
            yield _make_doc(self.seed, i)


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticCorpusReader:
        if str(self.options.get("pushdown", "")).lower() == "true":
            return SyntheticCorpusPushdownReader(self.options)
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticCorpusStreamReader:
        return SyntheticCorpusStreamReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(SyntheticCorpusDataSource)
