#!/usr/bin/env python
"""Generate the pinned expected table for the `log_redacted_lines` contract row.

R8 process = trim∘redact (LogRedactionUtil.java:394-400) is a text→text tree
walk with no SQL-expressible oracle, so rounds 1-3 left it a rows-only driver
check. This pin upgrades it to a full rows+schema+hash row:

- line SELECTION is recomputed by DuckDB from the raw pages table with the
  same bounded/ignore predicates every other oracle uses (independent of the
  Spark route operators);
- the TRANSFORM is the pure-Python `process_log_message` — the same function
  that is byte-golden-tested against the reference's own test corpus and
  sha256-digest-pinned over 18,879 real Atlas log lines
  (tests/test_golden_report.py), so pinning its output is a regression lock,
  not a circular check.

Any semantic change to redact/trim MUST regenerate the pins (pytest
test_redacted_pin_fresh fails until it is rerun):

    python scripts/pin_redacted.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def selection_sql(sf: float) -> str:
    """DuckDB query for the kept (bounded, non-ignored) lines — the same
    predicates as log_oracle.base_ctes, without the parse CTEs."""
    from mongo_log_parser_spark.contracts.log_oracle import should_ignore_sql
    from mongo_log_parser_spark.functions.prefilter import MAX_LINE_CHARS
    from mongo_log_parser_spark.sources import datagen

    glob = datagen.pages_glob(sf)
    return (
        f"SELECT url, text FROM read_parquet('{glob}') "
        f"WHERE length(text) <= {MAX_LINE_CHARS} AND NOT {should_ignore_sql()}"
    )


def build_pin(sf: float):
    """Returns a pyarrow table (url, processed) for the scale factor."""
    import duckdb
    import pyarrow as pa

    from mongo_log_parser_spark.functions.redact import process_log_message
    from mongo_log_parser_spark.sources import datagen

    datagen.ensure_pages(sf)
    rel = duckdb.sql(selection_sql(sf))
    urls, texts = [], []
    while True:
        batch = rel.fetchmany(10000)
        if not batch:
            break
        for url, text in batch:
            urls.append(url)
            texts.append(process_log_message(text))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "processed": pa.array(texts, pa.string())})


def main() -> None:
    import pyarrow.parquet as pq

    from mongo_log_parser_spark.contracts import pins

    for sf in (0.001, 0.01):
        t = build_pin(sf)
        path = pins.pin_path(sf)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(t, path, compression="zstd")
        print(f"sf{sf}: {t.num_rows} rows -> {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
