"""Predicate fan-out router (F5-F11, SURVEY.md §3.1 Spark restatement).

Splits the pages stream into the reference's routed sub-streams:

  oversized   >1 MiB lines dropped whole by the bounded-line reader (S3)
  ignored     pre-parse ignore filter hits, with 12-way category (F7/K6)
  ttl_pre     TTL pre-pass rows — run BEFORE the ignore decision
              (LogParser.java:641-649), so TTLMonitor lines feed the TTL
              accumulator and are *also* counted as ignored
  kept        parsed lines entering the main pipeline (flat schema, parse.py)
  errors      error-code side channel (up to 3 records per line)
  transactions, client_metadata, auth, conn_lifecycle
  ops         dispatched main-operation rows (extract.extract_ops)

Each stream is a lazy DataFrame off the same scan; pipeline.build persists
`kept`/`ops` so the Arrow parse runs once per materialization wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import prefilter
from ..functions.extract import extract_ops
from ..functions.parse import conn_id, ns_coll, ns_db, parse_lines


def split_streams(pages: DataFrame,
                  ignore_patterns: list[str] | None = None) -> dict[str, DataFrame]:
    text = F.col("text")
    bounded = pages.filter(~prefilter.is_oversized(text))
    oversized = pages.filter(prefilter.is_oversized(text))

    ignore = prefilter.should_ignore(text, ignore_patterns)
    ignored = bounded.filter(ignore).withColumn(
        "category", prefilter.ignored_category(text)
    )
    # html is never consumed downstream of the router — drop it before the
    # parse so the (cacheable) parsed stream doesn't carry the binary payload
    kept_raw = bounded.filter(~ignore).drop("html")
    kept = parse_lines(kept_raw)

    # TTL pre-pass (processTtlOperation, LogParser.java:938-970): parse,
    # require attr.namespace, namespace filter, take numDeleted/durationMillis
    ttl_raw = bounded.filter(prefilter.is_ttl_line(text)).drop("html")
    ttl_pre = ttl_pre_records(parse_lines(ttl_raw), pages.columns)

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


def ttl_pre_records(ttl_parsed: DataFrame, pages_columns: list[str]) -> DataFrame:
    """TTL pre-pass projection over already-parsed TTL lines (the shared tail
    of split_streams' ttl_pre and the routed-checkpoint derivation)."""
    shard_cols = [c for c in ("shard", "node") if c in pages_columns]
    return (
        ttl_parsed.filter(F.col("a_namespace").isNotNull())
        .select(
            "url", "warc_ts", "lang", "ts_str", "text", *shard_cols,
            F.col("a_namespace").alias("ns"),
            F.col("a_num_deleted").alias("num_deleted"),
            F.col("a_duration_ms").alias("duration_ms"),
        )
        .withColumn("db", ns_db(F.col("ns")))
        .withColumn("coll", ns_coll(F.col("ns")))
        .filter(F.col("db").isNull() | (F.col("db") != "config"))
    )


ROUTE_FLAG_COLS = ("is_ignored", "is_ttl", "category")


def routed_parse(pages: DataFrame,
                 ignore_patterns: list[str] | None = None) -> DataFrame:
    """ONE-scan routed parse (guide §2.4: remove shuffles/passes outright —
    here the removed cost is three extra full scans of the raw text column).

    split_streams() hands each consumer a lazy view over the raw scan, so a
    materializing pipeline paid four decompressions of `text` per wave: the
    kept parse, the TTL pre-pass parse, and the ignored/ignored-sample
    predicate scans. This operator computes the routing predicates ONCE (JVM,
    whole-stage codegen — identical expressions to split_streams), then runs
    the Arrow parse over every bounded line with parse skipped for
    ignored-non-TTL rows (they emit null parse fields, exactly the
    unparseable-line path). Output = parsed schema + ROUTE_FLAG_COLS, from
    which pipeline.build derives kept / ignored / ttl_pre with column-pruned
    scans of one checkpoint instead of re-reading the raw table.

    Row/field equivalence with split_streams (oracle-checked downstream):
    - kept:   rows !is_ignored, parse fields from the same _parse_row
    - ignored: rows is_ignored, same first-match category expression
    - ttl:    rows is_ttl are always parsed (TTL lines are also counted as
              ignored — LogParser.java:641-649 — so the skip predicate is
              `ignore AND NOT ttl`)
    """
    text = F.col("text")
    ignore = prefilter.should_ignore(text, ignore_patterns)
    is_ttl = prefilter.is_ttl_line(text)
    flagged = (
        pages.filter(~prefilter.is_oversized(text))
        .drop("html")
        .withColumn("is_ignored", ignore)
        .withColumn("is_ttl", is_ttl)
        .withColumn("category", F.when(ignore, prefilter.ignored_category(text)))
        .withColumn("skip_parse", ignore & ~is_ttl)
    )
    return parse_lines(flagged, extra_cols=ROUTE_FLAG_COLS, skip_col="skip_parse")


def ignored_sample(ignored: DataFrame, rate: int = 100) -> DataFrame:
    """F8 — ignored-line sample sink (LogParser.java:980-982).

    The reference writes every 100th ignored line by a global arrival counter
    (thread-racy and order-dependent). The distributed restatement samples on
    a content hash: deterministic, reproducible at any cluster size, the same
    1-in-`rate` expected rate, and shuffle-free (a narrow filter — no global
    counter to serialize on)."""
    bucket = F.conv(F.substring(F.md5(F.col("url")), 1, 8), 16, 10).cast("long") % rate
    return ignored.filter(bucket == 0).select("url", "text", "category")


def error_records(kept: DataFrame) -> DataFrame:
    """A7 source — processErrorCode (LogParserTask.java:1040-1117).

    One input line can emit up to three error records (explicit error object,
    ok:0 top-level, client-disconnect message) → explode an array of candidates.
    """
    err_obj = F.when(
        F.col("has_error_obj") & F.col("err_code_name").isNotNull(),
        F.struct(
            F.col("err_code_name").alias("code_name"),
            F.col("err_code").alias("error_code"),
            F.col("err_errmsg").alias("sample_message"),
        ),
    )
    ok0_name = F.coalesce(
        F.col("a_err_name_top"),
        F.when(F.col("a_err_code_top").isNotNull(), F.concat(F.lit("Error"), F.col("a_err_code_top"))),
    )
    ok0 = F.when(
        (F.col("a_ok") == 0) & ok0_name.isNotNull(),
        F.struct(
            ok0_name.alias("code_name"),
            F.col("a_err_code_top").alias("error_code"),
            F.col("a_err_msg_top").alias("sample_message"),
        ),
    )
    disc_msg = F.concat(
        F.lit("Interrupted operation as its client disconnected"),
        F.coalesce(F.concat(F.lit(" (opId: "), F.col("a_opid").cast("string"), F.lit(")")), F.lit("")),
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
    shard_cols = [c for c in ("shard", "node") if c in kept.columns]
    return (
        kept.filter(F.col("has_attr"))
        .select("url", "ts_str", *shard_cols, F.explode(recs).alias("e"))
        .select("url", "ts_str", *shard_cols,
                "e.code_name", "e.error_code", "e.sample_message")
    )


def transaction_records(kept: DataFrame) -> DataFrame:
    """A8 source — processTransaction (LogParserTask.java:1119-1180).

    µs→ms conversion is Math.round(x/1000.0) per-row BEFORE aggregation
    (TransactionEntry.java:56-87) — reproduced as floor(x/1000 + 0.5)."""
    ms = lambda c: F.when(c.isNotNull(), F.floor(c / 1000.0 + 0.5)).cast("long")  # noqa: E731
    shard_cols = [c for c in ("shard", "node") if c in kept.columns]
    rows = kept.filter(
        (F.col("comp") == "TXN") & (F.col("msg") == "transaction") & F.col("has_attr")
    ).select(
        "url", "ts_str", *shard_cols,
        F.col("a_txn_retry_counter").alias("txn_retry_counter"),
        F.col("a_termination_cause").alias("termination_cause"),
        F.col("a_commit_type").alias("commit_type"),
        F.col("a_duration_ms").alias("duration_ms"),
        ms(F.col("a_commit_micros")).alias("commit_ms"),
        ms(F.col("a_active_micros")).alias("active_ms"),
        ms(F.col("a_inactive_micros")).alias("inactive_ms"),
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
    rows = kept.filter(
        (F.col("comp") == "NETWORK") & (F.col("msg") == "client metadata") & F.col("has_attr")
    ).select(
        "url", "ts_str", "ctx",
        conn_id(F.col("ctx")).alias("conn_id"),
        F.col("a_remote").alias("remote"),
        F.col("drv_name").alias("driver"),
        F.col("drv_version").alias("version"),
        "os_type", "os_name", "platform",
        F.coalesce(F.col("compressors"), F.lit("")).alias("compressors"),
        "text",
    )
    # only meaningful driver info accumulates (LogParserTask.java:1297-1303)
    return rows.filter(F.col("driver").isNotNull() | F.col("version").isNotNull())


def auth_records(kept: DataFrame) -> DataFrame:
    """J1 build side — processAccessMessage (LogParserTask.java:1182-1223)."""
    return (
        kept.filter(
            (F.col("comp") == "ACCESS") & (F.col("msg") == "Successfully authenticated") & F.col("has_attr")
        )
        .select(
            "url", "ts_str", "ctx",
            conn_id(F.col("ctx")).alias("conn_id"),
            F.col("a_user").alias("username"),
            F.col("a_db").alias("auth_db"),
            F.col("a_mechanism").alias("mechanism"),
            "text",
        )
        .filter(F.col("ctx").isNotNull() & F.col("username").isNotNull())
    )


def conn_lifecycle_records(kept: DataFrame) -> DataFrame:
    """J2 source — processConnectionLifecycle (LogParserTask.java:1322-1376).

    Emits (conn_id, kind ∈ {start,end}, epoch_ms). The reference requires a
    parseable $date (timestamp > 0). The to_timestamp parse happens only on
    this already-filtered ~4% subset (it costs ~25µs/row — see parse.py)."""
    ts = F.to_timestamp(F.col("ts_str"))
    epoch_ms = (F.unix_timestamp(ts) * 1000 + F.date_format(ts, "SSS").cast("long"))
    start = kept.filter(
        (F.col("msg") == "Connection accepted") & F.col("a_connection_id").isNotNull()
    ).filter(ts.isNotNull()).select(
        "url", F.col("a_connection_id").alias("conn_id"), F.lit("start").alias("kind"),
        epoch_ms.alias("epoch_ms"),
    )
    end = kept.filter(
        (F.col("msg") == "Connection ended")
        & F.col("ctx").startswith("conn")
        & conn_id(F.col("ctx")).isNotNull()
    ).filter(ts.isNotNull()).select(
        "url", conn_id(F.col("ctx")).alias("conn_id"), F.lit("end").alias("kind"),
        epoch_ms.alias("epoch_ms"),
    )
    return start.unionByName(end)
