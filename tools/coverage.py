"""Print the SURVEY.md §2 operator-inventory coverage map: which registry
query (and its oracle status) exercises each operator id, and which ids
are covered by the test suite instead (file/network edges that cannot run
against parquet testdata).

Usage: python tools/coverage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_scraper_db_spark.registry import REGISTRY  # noqa: E402

#: inventory sizes per SURVEY.md §2 sections.
SECTIONS = {"S": 18, "P": 13, "J": 10, "A": 10, "W": 3, "O": 8, "E": 4, "F": 17, "T": 5}

#: operators with no parquet-expressible query — covered by pytest.
TEST_COVERED = {
    "S2": "tests/test_sources_sinks.py::test_read_playlists_json",
    "S3": "out-of-engine connector (SURVEY §2.1): driver-side rows → createDataFrame",
    "S5": "driver-side network I/O (SURVEY §2.1), not a dataflow operator",
    "S9": "tests/test_sources_sinks.py::test_read_transcript_files",
    "T5": "tests/test_streaming_pipeline.py::test_inbox_stream_drains_once",
}


def main() -> None:
    covered: dict[str, list[tuple[str, bool]]] = {}
    for s in REGISTRY:
        for tok in s.operators.split():
            covered.setdefault(tok, []).append((s.name, s.oracle is not None))

    missing = []
    for prefix, n in SECTIONS.items():
        for i in range(1, n + 1):
            op = f"{prefix}{i}"
            if op in covered:
                entries = ", ".join(
                    f"{name}[{'oracle' if has_o else 'rows-only'}]"
                    for name, has_o in covered[op]
                )
                print(f"{op:>4}  {entries}")
            elif op in TEST_COVERED:
                print(f"{op:>4}  (tests) {TEST_COVERED[op]}")
            else:
                missing.append(op)
                print(f"{op:>4}  MISSING")
    extra = sorted(t for t in covered if t not in
                   {f"{p}{i}" for p, n in SECTIONS.items() for i in range(1, n + 1)})
    print("\nextension operators:", ", ".join(extra))
    print(f"\n{len(REGISTRY)} registry queries; missing inventory ids: {missing or 'none'}")


if __name__ == "__main__":
    main()
