"""Schemas for the log pipeline.

LOG_SCHEMA is the single permissive `from_json` schema for the MongoDB-4.4
structured log envelope (reference record model: LogParserTask.java:88-356,
SlowQuery.java:3-29). Design notes:

- Polymorphic / arbitrary-keyed subtrees are declared ``StringType`` so Spark
  captures their **raw JSON text** (verified Spark 4 behavior): `command.filter`,
  `command.q`, `command.query`, `command.pipeline`, `command.$readPreference`,
  `attr.originatingCommand`. They are cheaply sub-parsed only where needed —
  this is the Spark analog of the reference's two-tier fast-extract
  (LogParser.java:1300-1332) and keeps the hot path inside whole-stage codegen.
- Dynamic command-key dispatch (find/aggregate/…/_shardsvr*/admin ops,
  LogParserTask.java:802-953) uses `json_object_keys` over the raw command
  text, not per-row Python.
- `aggregate: 1` (db-level) coerces to the string "1", matching the
  reference's `!coll.equals("1")` guard (LogParserTask.java:816-820).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType())


def _l(name: str) -> StructField:
    return StructField(name, LongType())


def _b(name: str) -> StructField:
    return StructField(name, BooleanType())


PAGES_FIELDS = ["url", "warc_ts", "html", "text", "lang"]

COMMAND_SCHEMA = StructType([
    _s("find"), _s("aggregate"), _s("findAndModify"), _s("update"), _s("insert"),
    _s("delete"), _s("getMore"), _s("collection"), _s("count"), _s("distinct"),
    _s("filter"), _s("q"), _s("query"), _s("pipeline"), _s("$readPreference"),
    _s("$db"),
])

STORAGE_SCHEMA = StructType([
    _l("bytesRead"), _l("bytesWritten"),
    StructField("data", StructType([_l("bytesRead"), _l("bytesWritten")])),
])

ERROR_SCHEMA = StructType([_l("code"), _s("codeName"), _s("errmsg")])

DOC_SCHEMA = StructType([
    StructField("driver", StructType([_s("name"), _s("version")])),
    StructField("os", StructType([_s("type"), _s("name")])),
    _s("platform"),
    StructField("mongos", StructType([_s("version")])),
])

ATTR_SCHEMA = StructType([
    _s("type"), _s("ns"), _s("namespace"), _s("msg"),
    _l("durationMillis"), _l("keysExamined"), _l("docsExamined"), _l("nreturned"),
    _l("nMatched"), _l("nModified"), _l("nUpserted"), _l("ndeleted"), _l("ninserted"),
    _l("numDeleted"), _l("reslen"), _l("nShards"), _l("writeConflicts"),
    _s("queryHash"), _s("planCacheKey"), _s("planSummary"), _l("planningTimeMicros"),
    _b("replanned"), _s("replanReason"), _b("fromMultiPlanner"),
    _s("appName"), _s("remote"),
    _l("ok"), _l("errCode"), _s("errName"), _s("errMsg"),
    StructField("error", ERROR_SCHEMA),
    StructField("storage", STORAGE_SCHEMA),
    StructField("command", COMMAND_SCHEMA),
    _s("originatingCommand"),  # raw JSON subtree
    StructField("parameters", StructType([_l("txnRetryCounter")])),
    _s("terminationCause"), _s("commitType"),
    _l("commitDurationMicros"), _l("timeActiveMicros"), _l("timeInactiveMicros"),
    _s("user"), _s("db"), _s("mechanism"),
    _l("connectionId"), _l("opId"),
    StructField("negotiatedCompressors", ArrayType(StringType())),
    StructField("doc", DOC_SCHEMA),
])

LOG_SCHEMA = StructType([
    StructField("t", StructType([StructField("$date", StringType())])),
    _s("s"), _s("c"), _l("id"), _s("ctx"), _s("msg"),
    StructField("attr", ATTR_SCHEMA),
])

# $readPreference sub-parse (it may also be a bare string — handled in extract)
READ_PREF_SCHEMA = StructType([
    _s("mode"),
    StructField("tags", StringType()),  # raw JSON: array of tag objects
])

ORIGINATING_SCHEMA = StructType([
    _s("filter"), _s("pipeline"), _s("$readPreference"),
])
