"""Predicate fan-out router (F5-F11, SURVEY.md §3.1 Spark restatement).

Splits the pages stream into the reference's routed sub-streams:

  oversized   >1 MiB lines dropped whole by the bounded-line reader (S3)
  ignored     pre-parse ignore filter hits, with 12-way category (F7/K6)
  ttl_pre     TTL pre-pass rows — run BEFORE the ignore decision
              (LogParser.java:641-649), so TTLMonitor lines feed the TTL
              accumulator and are *also* counted as ignored
  kept        parsed lines entering the main pipeline
  errors      error-code side channel (up to 3 records per line)
  transactions, client_metadata, auth, conn_lifecycle
  ops         dispatched main-operation rows (extract.extract_ops)

Each stream is a lazy DataFrame off the same scan; Spark evaluates the cheap
contains() predicates once per consumed stream — at sink time the whole thing
is a single pass per sink with the parse amortized by caching (pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import prefilter
from ..functions.extract import extract_ops
from ..functions.parse import conn_id, parse_lines


def split_streams(pages: DataFrame) -> dict[str, DataFrame]:
    text = F.col("text")
    bounded = pages.filter(~prefilter.is_oversized(text))
    oversized = pages.filter(prefilter.is_oversized(text))

    ignored = bounded.filter(prefilter.should_ignore(text)).withColumn(
        "category", prefilter.ignored_category(text)
    )
    kept_raw = bounded.filter(~prefilter.should_ignore(text))
    kept = parse_lines(kept_raw)

    # TTL pre-pass (processTtlOperation, LogParser.java:938-970): parse,
    # require attr.namespace, namespace filter, take numDeleted/durationMillis
    ttl_raw = bounded.filter(prefilter.is_ttl_line(text))
    ttl_parsed = parse_lines(ttl_raw)
    ttl_pre = (
        ttl_parsed.filter(F.col("a.namespace").isNotNull())
        .select(
            "url", "warc_ts", "lang", "ts", "text",
            F.col("a.namespace").alias("ns"),
            F.col("a.numDeleted").alias("num_deleted"),
            F.col("a.durationMillis").alias("duration_ms"),
        )
        .withColumn("db", F.nullif(F.regexp_extract("ns", r"^(.*?)\.(.*)$", 1), F.lit("")))
        .withColumn("coll", F.nullif(F.regexp_extract("ns", r"^(.*?)\.(.*)$", 2), F.lit("")))
        .filter(F.col("db").isNull() | (F.col("db") != "config"))
    )

    return {
        "oversized": oversized,
        "ignored": ignored,
        "kept": kept,
        "ttl_pre": ttl_pre,
        "errors": error_records(kept),
        "transactions": transaction_records(kept),
        "client_metadata": client_metadata_records(kept),
        "auth": auth_records(kept),
        "conn_lifecycle": conn_lifecycle_records(kept),
        "ops": extract_ops(kept),
    }


def error_records(kept: DataFrame) -> DataFrame:
    """A7 source — processErrorCode (LogParserTask.java:1040-1117).

    One input line can emit up to three error records (explicit error object,
    ok:0 top-level, client-disconnect message) → explode an array of candidates.
    """
    a = F.col("a")
    err_obj = F.when(
        a["error"].isNotNull() & a["error"]["codeName"].isNotNull(),
        F.struct(
            a["error"]["codeName"].alias("code_name"),
            a["error"]["code"].alias("error_code"),
            a["error"]["errmsg"].alias("sample_message"),
        ),
    )
    ok0_name = F.coalesce(a["errName"], F.when(a["errCode"].isNotNull(), F.concat(F.lit("Error"), a["errCode"])))
    ok0 = F.when(
        (a["ok"] == 0) & ok0_name.isNotNull(),
        F.struct(
            ok0_name.alias("code_name"),
            a["errCode"].alias("error_code"),
            a["errMsg"].alias("sample_message"),
        ),
    )
    disc_msg = F.concat(
        F.lit("Interrupted operation as its client disconnected"),
        F.coalesce(F.concat(F.lit(" (opId: "), a["opId"].cast("string"), F.lit(")")), F.lit("")),
    )
    disconnect = F.when(
        F.col("msg") == "Interrupted operation as its client disconnected",
        F.struct(
            F.lit("InterruptedByClientDisconnect").alias("code_name"),
            F.lit(None).cast("long").alias("error_code"),
            disc_msg.alias("sample_message"),
        ),
    )
    recs = F.array_compact(F.array(err_obj, ok0, disconnect))
    return (
        kept.filter(a.isNotNull())
        .select("url", "ts_str", F.explode(recs).alias("e"))
        .select("url", "ts_str", "e.code_name", "e.error_code", "e.sample_message")
    )


def transaction_records(kept: DataFrame) -> DataFrame:
    """A8 source — processTransaction (LogParserTask.java:1119-1180).

    µs→ms conversion is Math.round(x/1000.0) per-row BEFORE aggregation
    (TransactionEntry.java:56-87) — reproduced as floor(x/1000 + 0.5)."""
    a = F.col("a")
    ms = lambda c: F.when(c.isNotNull(), F.floor(c / 1000.0 + 0.5)).cast("long")  # noqa: E731
    rows = kept.filter(
        (F.col("comp") == "TXN") & (F.col("msg") == "transaction") & a.isNotNull()
    ).select(
        "url", "ts",
        a["parameters"]["txnRetryCounter"].alias("txn_retry_counter"),
        a["terminationCause"].alias("termination_cause"),
        a["commitType"].alias("commit_type"),
        a["durationMillis"].alias("duration_ms"),
        ms(a["commitDurationMicros"]).alias("commit_ms"),
        ms(a["timeActiveMicros"]).alias("active_ms"),
        ms(a["timeInactiveMicros"]).alias("inactive_ms"),
    )
    # "at least one meaningful field" gate (LogParserTask.java:1163-1166)
    return rows.filter(
        F.col("txn_retry_counter").isNotNull()
        | F.col("termination_cause").isNotNull()
        | F.col("commit_type").isNotNull()
        | F.col("duration_ms").isNotNull()
    )


def client_metadata_records(kept: DataFrame) -> DataFrame:
    """A11 probe side — processClientMetadata (LogParserTask.java:1225-1320)."""
    a = F.col("a")
    rows = kept.filter(
        (F.col("comp") == "NETWORK") & (F.col("msg") == "client metadata") & a.isNotNull()
    ).select(
        "url", "ts_str",
        F.col("ctx"),
        conn_id(F.col("ctx")).alias("conn_id"),
        a["remote"].alias("remote"),
        a["doc"]["driver"]["name"].alias("driver"),
        a["doc"]["driver"]["version"].alias("version"),
        a["doc"]["os"]["type"].alias("os_type"),
        a["doc"]["os"]["name"].alias("os_name"),
        a["doc"]["platform"].alias("platform"),
        F.coalesce(
            F.array_join(F.array_sort(a["negotiatedCompressors"]), ","), F.lit("")
        ).alias("compressors"),
        "text",
    )
    # only meaningful driver info accumulates (LogParserTask.java:1297-1303)
    return rows.filter(F.col("driver").isNotNull() | F.col("version").isNotNull())


def auth_records(kept: DataFrame) -> DataFrame:
    """J1 build side — processAccessMessage (LogParserTask.java:1182-1223)."""
    a = F.col("a")
    return (
        kept.filter(
            (F.col("comp") == "ACCESS") & (F.col("msg") == "Successfully authenticated") & a.isNotNull()
        )
        .select(
            "url", "ts_str", F.col("ctx"),
            conn_id(F.col("ctx")).alias("conn_id"),
            a["user"].alias("username"),
            a["db"].alias("auth_db"),
            a["mechanism"].alias("mechanism"),
            "text",
        )
        .filter(F.col("ctx").isNotNull() & F.col("username").isNotNull())
    )


def conn_lifecycle_records(kept: DataFrame) -> DataFrame:
    """J2 source — processConnectionLifecycle (LogParserTask.java:1322-1376).

    Emits (conn_id, kind ∈ {start,end}, epoch_ms). The reference requires a
    parseable $date (timestamp > 0)."""
    a = F.col("a")
    epoch_ms = (F.unix_timestamp(F.col("ts")) * 1000 + F.date_format("ts", "SSS").cast("long"))
    start = kept.filter(
        (F.col("msg") == "Connection accepted") & a["connectionId"].isNotNull() & F.col("ts").isNotNull()
    ).select(
        "url", a["connectionId"].alias("conn_id"), F.lit("start").alias("kind"), epoch_ms.alias("epoch_ms")
    )
    end = kept.filter(
        (F.col("msg") == "Connection ended")
        & F.col("ctx").startswith("conn")
        & conn_id(F.col("ctx")).isNotNull()
        & F.col("ts").isNotNull()
    ).select("url", conn_id(F.col("ctx")).alias("conn_id"), F.lit("end").alias("kind"), epoch_ms.alias("epoch_ms"))
    return start.unionByName(end)
