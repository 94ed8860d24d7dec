"""E3-E20 — operation dispatch and field extraction as column expressions.

Re-expresses the reference's imperative per-row extraction
(LogParserTask.java:155-1038) as one `when`-cascade + coalesce-chain Project.
Every branch cites the reference site it mirrors; ORDER IS LOAD-BEARING
(first match wins, SURVEY.md §7.3.7).

Input: the parsed DataFrame from parse.parse_lines (columns j/a/cmd_keys/...).
Output of extract_ops(): one row per main-accumulator operation (the SlowQuery
analog), with columns:

  url, warc_ts, lang, host, ts, ctx, text, db, coll, op, op_stat,
  duration_ms, keys_examined, docs_examined, nreturned, reslen,
  bytes_read, bytes_written, write_conflicts, n_shards,
  query_hash, plan_cache_key, plan_summary, planning_us,
  replanned, replan_reason, from_multi_planner,
  app_name, remote, read_pref, read_pref_tags, node_type,
  raw_filter, is_error, is_change_stream

Known deliberate divergence (documented per SURVEY.md §7.3): the reference
skips the collection-name override when the command value is a non-string
(instanceof String check); the synthetic grammar only emits string values
(except `aggregate: 1` / getMore cursor ids, both handled), so the column
expression treats the captured value as a string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType, StructField, StructType

from .parse import ns_coll, ns_db

# isAdministrativeOperation, LogParserTask.java:950-958
ADMIN_OPS = [
    "drop", "dropDatabase", "dropIndexes", "createIndexes", "collMod",
    "renameCollection", "validate", "compact", "reIndex", "explain",
    "currentOp", "killOp", "fsync", "eval", "listCollections",
    "planCacheClear", "configureFailPoint", "killCursors",
    "abortTransaction", "commitTransaction", "startTransaction",
]

# command-op dispatch order, LogParserTask.java:802-919 (first match wins)
_CMD_DISPATCH = [
    # (key, op_type_string, op_stat, collection_source)
    ("find", "find", "find", "find"),
    ("aggregate", "aggregate", "aggregate", "aggregate"),
    ("findAndModify", "findAndModify", "findAndModify", "findAndModify"),
    ("update", "update", "update", "update"),
    ("insert", "insert", "insert", "insert"),
    ("delete", "remove", "delete", "delete"),
    ("getMore", "getMore", "getMore", "collection"),
    ("count", "count", "count", "count"),
    ("distinct", "distinct", "distinct", "distinct"),
]

_PIPELINE_ELEM = ArrayType(StringType())  # each stage captured as raw JSON
_MATCH_STAGE = StructType([StructField("$match", StringType())])
_CHANGESTREAM_STAGE = StructType([StructField("$changeStream", StringType())])
_TAGS_TYPE = ArrayType(MapType(StringType(), StringType()))
_RP_STRUCT = StructType([StructField("mode", StringType()), StructField("tags", StringType())])
_ORIG_STRUCT = StructType([
    StructField("filter", StringType()), StructField("pipeline", StringType()),
    StructField("$readPreference", StringType()),
])


def _has(key: str) -> Column:
    return F.array_contains(F.col("cmd_keys"), key)


def is_error_expr(a: Column) -> Column:
    """F9 — attr.ok == 0 || attr.error != null (LogParserTask.java:563-579)."""
    return (a["ok"] == 0) | a["error"].isNotNull()


def _first_match_stage(pipeline_raw: Column) -> Column:
    """First `$match` stage of an aggregate pipeline (LogParserTask.java:485-510)."""
    stages = F.from_json(pipeline_raw, _PIPELINE_ELEM)
    matches = F.array_compact(
        F.transform(stages, lambda s: F.from_json(s, _MATCH_STAGE)["$match"])
    )
    return F.when(F.size(matches) > 0, matches[0])


def _has_changestream(pipeline_raw: Column) -> Column:
    """F10 — any pipeline stage with a `$changeStream` key (LogParserTask.java:870-890)."""
    stages = F.from_json(pipeline_raw, _PIPELINE_ELEM)
    return F.exists(stages, lambda s: F.from_json(s, _CHANGESTREAM_STAGE)["$changeStream"].isNotNull())


def _format_tags(tags_raw: Column) -> Column:
    """E13 tag formatting: `k: v, k2: v2` per tag, tags joined by `<br>`
    (LogParserTask.java:585-627). Key order = document order (deterministic
    replacement for org.json's hash order, SURVEY.md §7.3.4)."""
    tags = F.from_json(tags_raw, _TAGS_TYPE)
    fmt_one = lambda m: F.array_join(  # noqa: E731
        F.transform(F.map_entries(m), lambda e: F.concat(e["key"], F.lit(": "), e["value"])), ", ")
    return F.when(tags.isNotNull(), F.array_join(F.transform(tags, fmt_one), "<br>"))


def _node_type(tags_raw: Column) -> Column:
    """E14 — tag → analytics/voting classification (LogParserTask.java:632-693)."""
    tags = F.from_json(tags_raw, _TAGS_TYPE)
    classify = lambda m: (  # noqa: E731
        F.when((m["nodeType"] == "analytics") | (m["workloadType"] == "analytics")
               | (m["role"] == "analytics"), "analytics")
        .when((m["nodeType"] == "voting") | (m["workloadType"] == "operational"), "voting")
        .when(m["provider"].isNotNull() & m["region"].isNotNull(), "voting")
    )
    classified = F.array_compact(F.transform(tags, classify))
    return F.when(F.size(classified) > 0, classified[0]).otherwise(
        F.when(tags.isNotNull(), F.lit("")))


def extract_ops(parsed: DataFrame) -> DataFrame:
    """Dispatch every parsed line into the main-op row set (or drop it).

    Mirrors the three branches of LogParserTask.call():
      INDEX (155-200) → WRITE-with-type (204-262) → attr.command (264-344),
    including the always-exclude-config namespace filter (370-372).
    """
    a = F.col("a")
    cmd = a["command"]

    is_index = F.col("comp") == "INDEX"
    index_ttl = is_index & a["msg"].isNotNull() & a["msg"].contains("Deleted expired documents")
    index_other = is_index & ~F.coalesce(a["msg"].contains("Deleted expired documents"), F.lit(False)) \
        & a["namespace"].isNotNull()
    is_write = ~is_index & a["type"].isNotNull() & (F.col("comp") == "WRITE")
    is_command = ~is_index & ~is_write & F.col("cmd_keys").isNotNull() & a["ns"].isNotNull()

    # ---- op dispatch (E3-E6) ----
    first_other = F.array_compact(
        F.transform(
            F.col("cmd_keys"),
            lambda k: F.when(k.startswith("_shardsv") | k.isin(ADMIN_OPS), k),
        )
    )[0]

    op = F.when(index_ttl, "remove").when(index_other, "command")
    op_stat = (
        F.when(index_ttl, "ttl_delete")
        .when(index_other & a["msg"].contains("Index build"), "index_build")
        .when(index_other & a["msg"].contains("Index drop"), "index_drop")
        .when(index_other & a["msg"].isNotNull(), "index_other")
        .when(index_other, "index_maintenance")
    )
    # WRITE dispatch (E5, LogParserTask.java:960-981) — requires attr.ns
    write_ok = is_write & a["ns"].isNotNull()
    op = (
        op.when(write_ok & (a["type"] == "update"), "update_w")
        .when(write_ok & a["type"].isin("remove", "delete"), "remove")
        .when(write_ok & (a["type"] == "insert"), "insert")
        .when(write_ok, "command")
    )
    op_stat = (
        op_stat.when(write_ok & (a["type"] == "update"), "update_w")
        .when(write_ok & a["type"].isin("remove", "delete"), "delete_w")
        .when(write_ok & (a["type"] == "insert"), "insert_w")
        .when(write_ok, F.concat(F.lit("write_"), a["type"]))
    )
    coll_override = None
    for key, op_name, stat_name, coll_src in _CMD_DISPATCH:
        cond = is_command & _has(key)
        op = op.when(cond, op_name)
        op_stat = op_stat.when(cond, stat_name)
        src_val = cmd[coll_src]
        if key == "aggregate":
            src_val = F.when(src_val != "1", src_val)  # aggregate:1 = db-level
        coll_override = (F.when if coll_override is None else coll_override.when)(cond, src_val)
    other_cond = is_command & first_other.isNotNull()
    op = op.when(other_cond, "command")
    op_stat = op_stat.when(
        other_cond,
        F.when(first_other.startswith("_shardsv"), F.concat(F.lit("shard_"), first_other)).otherwise(first_other),
    )

    ns = F.when(is_index, a["namespace"]).when(is_write | is_command, a["ns"])
    db = ns_db(ns)
    coll = F.coalesce(F.when(is_command, coll_override), ns_coll(ns))

    # ---- measures ----
    # exec stats gate: docs/keys only when nreturned present (LogParserTask.java:984-988)
    gated_docs = F.when(a["nreturned"].isNotNull(), a["docsExamined"])
    gated_keys = F.when(a["nreturned"].isNotNull(), a["keysExamined"])
    # nreturned priority: ninserted > ndeleted > nModified > nUpserted > nreturned
    # (LogParserTask.java:990-1013, sequential overwrites)
    nret = F.coalesce(a["ninserted"], a["ndeleted"], a["nModified"], a["nUpserted"], a["nreturned"])
    nret = F.when(index_ttl, a["numDeleted"]).otherwise(F.when(~is_index, nret))
    bytes_read = F.when(~is_index, F.coalesce(a["storage"]["bytesRead"], a["storage"]["data"]["bytesRead"]))
    bytes_written = F.when(~is_index, F.coalesce(a["storage"]["bytesWritten"], a["storage"]["data"]["bytesWritten"]))

    # ---- read preference / filter / tags (E13) ----
    rp_raw = cmd["$readPreference"]
    rp_struct = F.from_json(rp_raw, _RP_STRUCT)
    orig = F.from_json(a["originatingCommand"], _ORIG_STRUCT)
    orig_rp = F.from_json(orig["$readPreference"], _RP_STRUCT)
    # reference falls back to originatingCommand whenever no mode was obtained
    # from the command (slowQuery.readPreference == null gate,
    # LogParserTask.java:523-545) — coalesce of the *resolved* values
    read_pref = F.coalesce(
        F.when(rp_raw.startswith("{"), rp_struct["mode"]).otherwise(rp_raw),
        F.when(orig["$readPreference"].startswith("{"), orig_rp["mode"]).otherwise(orig["$readPreference"]),
    )
    read_pref_tags = F.coalesce(_format_tags(rp_struct["tags"]), _format_tags(orig_rp["tags"]))
    node_type = _node_type(F.coalesce(rp_struct["tags"], orig_rp["tags"]))
    # sanitize source precedence: q > filter > first $match > originating filter
    # (sequential assignment, LogParserTask.java:468-558)
    raw_filter = F.coalesce(cmd["q"], cmd["filter"], _first_match_stage(cmd["pipeline"]), orig["filter"])

    is_cs = F.coalesce(
        (op == "getMore") & _has_changestream(orig["pipeline"]), F.lit(False)
    )

    common = ~is_index  # INDEX branch skips setCommonAttributes (LogParserTask.java:157-175)
    out = (
        parsed.withColumn("op", op)
        .withColumn("op_stat", op_stat)
        .withColumn(
            "branch",
            F.when(is_index, "index").when(write_ok, "write").otherwise("command"),
        )
        .withColumn("db", db)
        .withColumn("coll", coll)
        .withColumn("duration_ms", a["durationMillis"])
        .withColumn("keys_examined", F.when(common, gated_keys))
        .withColumn("docs_examined", F.when(common, gated_docs))
        .withColumn("nreturned", nret)
        .withColumn("reslen", F.when(common, a["reslen"]))
        .withColumn("bytes_read", bytes_read)
        .withColumn("bytes_written", bytes_written)
        .withColumn("write_conflicts", F.when(common, a["writeConflicts"]))
        .withColumn("n_shards", F.when(common, a["nShards"]))
        .withColumn("query_hash", F.when(common, a["queryHash"]))
        .withColumn("plan_cache_key", F.when(common, a["planCacheKey"]))
        .withColumn("plan_summary", F.when(common, a["planSummary"]))
        .withColumn("planning_us", F.when(common, a["planningTimeMicros"]))
        .withColumn("replanned", F.when(common, a["replanned"]))
        .withColumn("replan_reason", F.when(common, a["replanReason"]))
        .withColumn("from_multi_planner", F.when(common, a["fromMultiPlanner"]))
        .withColumn("app_name", F.when(common, a["appName"]))
        .withColumn("remote", F.when(common, a["remote"]))
        .withColumn("read_pref", F.when(is_command | write_ok, read_pref))
        .withColumn("read_pref_tags", F.when(is_command | write_ok, read_pref_tags))
        .withColumn("node_type", F.when(is_command | write_ok, node_type))
        .withColumn("raw_filter", F.when(is_command | write_ok, raw_filter))
        .withColumn("is_error", F.coalesce(is_error_expr(a), F.lit(False)))
        .withColumn("is_change_stream", is_cs)
        # namespace filter: null-db namespaces pass (Namespace regex non-match keeps
        # nulls), config db always excluded (LogParserTask.java:361-408)
        .withColumn("ns_pass", ns.isNotNull() & (db.isNull() | (db != "config")))
    )
    # keep every dispatched row; main-op consumers filter on ns_pass, while
    # op-type stats count WRITE/INDEX dispatches regardless (the reference
    # increments those stats before its namespace check — see aggregates.op_stats)
    return out.filter(F.col("op").isNotNull())


def ops(parsed: DataFrame) -> DataFrame:
    """Dispatched rows that pass the namespace filter — the main-op row set."""
    return extract_ops(parsed).filter(F.col("ns_pass"))
