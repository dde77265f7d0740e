"""Custom Spark DataSource for the rendered transcript-file format —
``spark.read.format("transcript_text")`` over a directory of the text
exports the reference produces (TITLE:/URL: headers, comment line, blank
line, body — export_transcript.py:70-78), giving the archive's rendered
output a first-class, parallel, catalog-visible read path.

This uses Spark 4's Python DataSource API (pyspark.sql.datasource): the
reader lists files once on the driver, then each InputPartition parses
ONE file on an executor — so a million-file archive reads with full
cluster parallelism, schema projection works like any other source, and
downstream Catalyst treats it as a normal relation. Compare
sources/transcript_files.py, which stages parsed rows through
``createDataFrame`` on the driver — still the right tool for a small
inbox; this source is the scale path for reading back an entire
rendered archive.

Format contract (mirrors sinks/render_text.py): parse is header-order
tolerant, ignores ``#`` comment lines, and treats everything after the
first blank line as the body verbatim (bodies may contain lines that
look like headers — only pre-blank lines are header territory).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def parse_transcript_text(name: str, text: str) -> tuple:
    """Parse one rendered export. Header zone = lines before the first
    blank line; TITLE:/URL: extracted there, '#' lines ignored; the body
    is everything after the blank line, verbatim."""
    title, url = "", ""
    lines = text.split("\n")
    body_start = len(lines)
    for i, line in enumerate(lines):
        if line == "":
            body_start = i + 1
            break
        if line.startswith("TITLE: "):
            title = line[len("TITLE: "):]
        elif line.startswith("URL: "):
            url = line[len("URL: "):]
    body = "\n".join(lines[body_start:])
    return (name, title, url, body)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TranscriptTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("transcript_text source requires a path")

    def partitions(self):
        # one partition per file: the unit of parallelism AND of retry
        return [
            _FilePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".txt")
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            text = f.read()
        yield parse_transcript_text(os.path.basename(partition.path), text)


class TranscriptTextStreamReader(SimpleDataSourceStreamReader):
    """STREAMING read path for the same format —
    ``spark.readStream.format("transcript_text").load(dir)``: each
    micro-batch picks up files not seen by any earlier batch, so a
    rendered-archive directory becomes a live inbox with exactly-once
    file accounting (the offset IS the seen-file set, checkpointed by
    the engine; ``readBetweenOffsets`` makes post-crash replay
    deterministic). This is the Spark 4 Python streaming-source
    surface; the simple-reader variant reads on the driver per batch —
    right for inbox rates. Production notes: at archive scale, swap
    the ever-growing filename-list offset for a (sequence-number,
    mtime-watermark) offset, and the driver-side read for the
    partition-based ``DataSourceStreamReader`` so file parses fan out
    to executors like the batch reader's InputPartitions."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("transcript_text source requires a path")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _listing(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.path) if f.endswith(".txt")
        )

    def _rows(self, names: list[str]) -> list[tuple]:
        # MATERIALIZED list, not a generator: the engine pickles the
        # batch for prefetch/replay, and generators don't pickle.
        out = []
        for name in names:
            with open(os.path.join(self.path, name), encoding="utf-8") as fh:
                out.append(parse_transcript_text(name, fh.read()))
        return out

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in self._listing() if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        new = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return self._rows(new)

    def commit(self, end: dict) -> None:
        pass  # no source-side cleanup: files remain the system of record


class TranscriptTextDataSource(DataSource):
    """``spark.dataSource.register(TranscriptTextDataSource)`` then
    ``spark.read.format("transcript_text").load(dir)`` (batch) or
    ``spark.readStream.format("transcript_text").load(dir)`` (stream)."""

    @classmethod
    def name(cls) -> str:
        return "transcript_text"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> TranscriptTextReader:
        return TranscriptTextReader(self.options)

    def simpleStreamReader(self, schema) -> TranscriptTextStreamReader:
        return TranscriptTextStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration on a session."""
    spark.dataSource.register(TranscriptTextDataSource)
