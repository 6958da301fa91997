"""WARC source: Common-Crawl's on-disk format → the pages table.

The north-rule input is "Iceberg table of Common-Crawl-style web pages"
(BASELINE.json input_hint) — but the crawl itself lands as WARC: ~64k
files per monthly crawl, each ~1 GB of concatenated (usually per-record
gzipped) WARC records.  The very first job of a real deployment turns WARC
into that columnar pages table; this module is that job.  The reference
has no crawl ingestion at all (its sources are pd.read_csv —
single_sample_multi_field_demo.py:107); this is a beyond-reference
training-pipeline component (SURVEY.md §6).

Spark-first shape:

* ``binaryFile`` scan — one row per WARC file.  That IS the right
  parallelism: gzip is not splittable, so one file = one task is exactly
  how every production WARC reader (Sparkcc, warcio+EMR) schedules; a
  monthly crawl's 64k files saturate any executor fleet,
* ``mapInPandas`` parses each file's bytes into records — Arrow-batched,
  one Python hop per file, emitting (url, warc_ts, html, ...) rows,
* downstream, ``repartition`` by url hash (or write bucketed —
  ``sources/bucketed.py``) before heavy per-doc work, since record counts
  per file vary; the parse itself needs no shuffle.

Honest-parsing notes: handles WARC/1.0 and 1.1, multi-member gzip
(Common Crawl's per-record members — stdlib ``gzip`` reads concatenated
members transparently), response/request/metadata record types, and HTTP
response payloads (headers stripped, body kept as the ``html`` bytes).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_RECORD_SCHEMA = (
    "url string, warc_ts timestamp, html binary, warc_type string, "
    "record_id string, source_file string"
)

_CRLF = b"\r\n"


def parse_warc_bytes(data: bytes, source_file: str = "") -> list[dict[str, Any]]:
    """Parse one WARC file's (decompressed) bytes into record dicts.

    Pure function of bytes → rows, so it is unit-testable off-Spark and the
    Spark path is a thin Arrow wrapper around it."""
    rows: list[dict[str, Any]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # seek the next record marker (tolerates stray bytes between records)
        marker = data.find(b"WARC/", pos)
        if marker < 0:
            break
        head_end = data.find(_CRLF + _CRLF, marker)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[marker:head_end].split(_CRLF)
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        rtype = headers.get("warc-type", "")
        body = payload
        if rtype == "response" and payload[:5] == b"HTTP/":
            http_end = payload.find(_CRLF + _CRLF)
            body = payload[http_end + 4 :] if http_end >= 0 else b""
        ts = headers.get("warc-date")
        rows.append(
            {
                "url": headers.get("warc-target-uri"),
                "warc_ts": pd.Timestamp(ts).tz_localize(None)
                if ts and pd.Timestamp(ts).tzinfo
                else (pd.Timestamp(ts) if ts else None),
                "html": body,
                "warc_type": rtype,
                "record_id": headers.get("warc-record-id"),
                "source_file": source_file,
            }
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` (``*.warc`` / ``*.warc.gz``) as a
    DataFrame with WARC_RECORD_SCHEMA."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "warc_ts", "html", "warc_type", "record_id", "source_file",
        ]
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                rows.extend(parse_warc_bytes(data, source_file=str(fpath)))
            out = pd.DataFrame(rows, columns=cols)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return files.mapInPandas(parse, WARC_RECORD_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Project response records onto the pages-table shape
    (url, warc_ts, html, text=NULL, lang=NULL — text/lang come from the
    extract + langid stages downstream)."""
    from pyspark.sql import functions as F

    return records.filter(F.col("warc_type") == "response").select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
