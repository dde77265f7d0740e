"""Custom Python DataSource (sources/transcript_datasource.py): format
tolerance on hostile content and partition-per-file parallelism."""

from __future__ import annotations

import os

from youtube_scraper_db_spark.sources.transcript_datasource import (
    TranscriptTextReader,
    parse_transcript_text,
    register,
)


def test_parse_hostile_bodies():
    # body containing header-lookalikes and its own blank lines survives
    text = (
        "TITLE: A \"quoted\" title\n"
        "URL: https://www.youtube.com/watch?v=x1\n"
        "# Transcript exported from the archive\n"
        "\n"
        "TITLE: this is body text, not a header\n"
        "\n"
        "second paragraph"
    )
    name, title, url, body = parse_transcript_text("f.txt", text)
    assert title == 'A "quoted" title'
    assert url.endswith("v=x1")
    assert body == "TITLE: this is body text, not a header\n\nsecond paragraph"


def test_parse_headerless_and_empty():
    assert parse_transcript_text("f.txt", "") == ("f.txt", "", "", "")
    # no blank line at all → everything is header zone, body empty
    name, title, url, body = parse_transcript_text("f.txt", "TITLE: t\nURL: u")
    assert (title, url, body) == ("t", "u", "")


def test_reader_one_partition_per_file(tmp_path):
    for i in range(5):
        (tmp_path / f"d{i}.txt").write_text(f"TITLE: t{i}\n\nbody{i}")
    (tmp_path / "ignored.json").write_text("{}")
    reader = TranscriptTextReader({"path": str(tmp_path)})
    parts = reader.partitions()
    assert len(parts) == 5  # .json filtered out, one partition per .txt
    rows = [r for p in parts for r in reader.read(p)]
    assert sorted(r[1] for r in rows) == [f"t{i}" for i in range(5)]


def test_end_to_end_read(spark, tmp_path):
    (tmp_path / "a.txt").write_text(
        "TITLE: Alpha\nURL: https://www.youtube.com/watch?v=a1\n\nhello world"
    )
    register(spark)
    df = spark.read.format("transcript_text").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].title == "Alpha" and rows[0].body == "hello world"
    # schema projection works like any relation
    assert df.select("url").collect()[0].url.endswith("v=a1")


def test_stream_reader_incremental_offsets(tmp_path):
    """The SimpleDataSourceStreamReader tracks the seen-file set as its
    offset: new files appear exactly once in subsequent reads, an
    unchanged directory yields an empty batch, and readBetweenOffsets
    replays exactly the delta (the post-crash contract)."""
    from youtube_scraper_db_spark.sources.transcript_datasource import (
        TranscriptTextStreamReader,
    )

    def put(name, body):
        (tmp_path / name).write_text(
            f"TITLE: {name}\nURL: u\n\n{body}", encoding="utf-8"
        )

    r = TranscriptTextStreamReader({"path": str(tmp_path)})
    start = r.initialOffset()
    put("a.txt", "A")
    put("b.txt", "B")
    rows1, off1 = r.read(start)
    assert sorted(x[0] for x in rows1) == ["a.txt", "b.txt"]
    rows_empty, off_same = r.read(off1)
    assert rows_empty == [] and off_same == off1
    put("c.txt", "C")
    rows2, off2 = r.read(off1)
    assert [x[0] for x in rows2] == ["c.txt"]
    assert sorted(off2["seen"]) == ["a.txt", "b.txt", "c.txt"]
    # replay between checkpointed offsets is exactly the delta
    replay = r.readBetweenOffsets(off1, off2)
    assert [x[0] for x in replay] == ["c.txt"]
    assert r.readBetweenOffsets(start, off1) == rows1
