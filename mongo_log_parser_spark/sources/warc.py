"""WARC source — Common-Crawl-style ingest (ISO 28500, WARC/1.1).

The pipeline's input table (url, warc_ts, html, ...) is what a web corpus
looks like AFTER ingest; Common Crawl itself ships WARC segment files. This
module closes that gap: `read_warc` turns a directory of .warc / .warc.gz
files into the pages-table shape, so a user can point the engine at raw
crawl output.

Spark-first shape: `binaryFile` scan (one task per segment file — Common
Crawl's ~1 GiB-per-file layout means corpus-scale parallelism comes from
the file count, exactly like a parquet table's part files) feeding a
mapInPandas stage that parses records with a pure-stdlib WARC reader and
streams Arrow batches out. Gzip is sniffed per file (magic bytes), so
mixed .warc/.warc.gz directories work; a malformed file raises with the
failing byte offset rather than silently dropping records.

No external WARC library is used; the record grammar implemented here is
the public ISO 28500 one (version line, CRLF header block, Content-Length
payload, CRLF CRLF separator).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def format_warc_date(dt: datetime) -> str:
    """WARC-Date with microsecond fraction (WARC/1.1 allows fractional
    seconds; second-resolution WARC/1.0 dates parse too)."""
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def parse_warc_date(s: str) -> datetime:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)


def write_record(out: io.BytesIO, url: str, ts: datetime, payload: bytes,
                 record_id: str) -> None:
    header = (
        "WARC/1.1\r\n"
        "WARC-Type: resource\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {format_warc_date(ts)}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        "Content-Type: text/html\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    )
    out.write(header.encode("utf-8"))
    out.write(payload)
    out.write(b"\r\n\r\n")


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, payload) per record; headers keys are lowercased."""
    if data[:2] == b"\x1f\x8b":  # gzip magic — .warc.gz segment
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC: no version line at byte {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError(f"malformed WARC: truncated payload at byte {body_start}")
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of .warc/.warc.gz files → DataFrame
    (url, warc_ts, html) matching the pages-table column shape."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )

    def parse_files(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                urls, tss, payloads = [], [], []
                for headers, payload in iter_warc_records(bytes(blob)):
                    if headers.get("warc-type") != "resource":
                        continue  # warcinfo/request/metadata records
                    urls.append(headers["warc-target-uri"])
                    tss.append(parse_warc_date(headers["warc-date"]))
                    payloads.append(payload)
                yield pd.DataFrame({
                    "url": pd.Series(urls, dtype="string"),
                    "warc_ts": pd.Series(tss, dtype="datetime64[us, UTC]"),
                    "html": pd.Series(payloads, dtype=object),
                })

    return files.mapInPandas(parse_files, schema=WARC_SCHEMA)
