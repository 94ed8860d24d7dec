"""E1/E2 — the vectorized parse stage.

One `from_json` pass over the raw line (JVM-side Jackson, whole-stage codegen)
replaces the reference's per-row `new JSONObject(line)` (LogParserTask.java:92).
Polymorphic subtrees land as raw-JSON strings (see schema.py) and dynamic
command keys come from `json_object_keys` — so the entire parse is expressed
without per-row Python, per the input_hint.

Scale note: the parse runs AFTER the contains-prefilter (prefilter.py) so the
~13% ignorable noise never pays Jackson cost, mirroring the reference's
cheap-predicate-first ordering (LogParser.java:645-649) — Catalyst cannot infer
UDF/parse cost, so the ordering is structural, as SURVEY.md §4 O1 prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import LOG_SCHEMA


def host_from_url(url: Column) -> Column:
    return F.regexp_extract(url, r"^https?://([^/]+)", 1)


def parse_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add `j` (parsed envelope struct), `a` (attr alias) and `cmd_keys`.

    `cmd_keys` is the document-order key list of attr.command — the dispatch
    source for the first-match op cascade (LogParserTask.java:802-953).
    """
    text = F.col(text_col)
    out = df.withColumn("j", F.from_json(text, LOG_SCHEMA)).withColumn(
        "cmd_keys", F.json_object_keys(F.get_json_object(text, "$.attr.command"))
    )
    return (
        out.withColumn("ts_str", F.col("j.t.`$date`"))
        .withColumn("ts", F.to_timestamp("ts_str"))
        .withColumn("comp", F.col("j.c"))
        .withColumn("ctx", F.col("j.ctx"))
        .withColumn("msg", F.col("j.msg"))
        .withColumn("a", F.col("j.attr"))
    )


def ns_db(ns: Column) -> Column:
    """Database name: non-greedy first-dot split, Namespace.java:15-23."""
    return F.nullif(F.regexp_extract(ns, r"^(.*?)\.(.*)$", 1), F.lit(""))


def ns_coll(ns: Column) -> Column:
    """Collection name: everything after the first dot."""
    return F.nullif(F.regexp_extract(ns, r"^(.*?)\.(.*)$", 2), F.lit(""))


def conn_id(ctx: Column) -> Column:
    """E16 — `"connNNN"` → long (TwoPassDriverStatsAccumulator.java:331-340)."""
    return F.nullif(F.regexp_extract(ctx, r"^conn(\d+)$", 1), F.lit("")).cast("long")
