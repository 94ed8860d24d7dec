"""Golden tests for the redact/trim transform (R1-R9).

Each case re-expresses an assertion from the reference's own test suite
(LogRedactionUtilTest.java — cited per test) so the Python transform is pinned
to the reference's observable behavior, not to its org.json serialization
accidents (SURVEY.md §7.3.1).
"""

from __future__ import annotations

import json

from mongo_log_parser_spark.functions.redact import (
    process_log_message,
    redact_log_message,
    sanitize_filter,
    trim_log_message,
)


def _r(payload: dict) -> dict:
    return json.loads(redact_log_message(json.dumps(payload), True))


def test_basic_user_data_redaction():
    # LogRedactionUtilTest.java:11-53
    res = _r({
        "msg": "Slow query", "s": "I", "c": "COMMAND",
        "t": {"$date": "2025-06-19T07:29:38.695+00:00"},
        "ctx": "conn224", "id": 51803,
        "attr": {"type": "command", "command": {
            "filter": {"accountId": "12345678901", "dataCenter": "REGION1",
                       "context": "/company/dept/subdept/region"},
            "find": "Events"}},
    })
    assert res["msg"] == "Slow query" and res["s"] == "I" and res["c"] == "COMMAND"
    assert res["ctx"] == "conn224" and res["id"] == 51803
    assert res["attr"]["type"] == "command"
    f = res["attr"]["command"]["filter"]
    assert f == {"accountId": "xxx", "dataCenter": "xxx", "context": "xxx"}
    assert res["attr"]["command"]["find"] == "Events"
    assert res["t"]["$date"] == "2025-06-19T07:29:38.695+00:00"


def test_client_field_preservation_with_atlas_host():
    # LogRedactionUtilTest.java:56-97
    res = _r({"attr": {"command": {"$client": {
        "mongos": {"host": "atlas-abcdef-shard-00-00.xyz123.mongodb.net",
                   "client": "192.168.254.8:29260", "version": "7.0.21"},
        "driver": {"name": "mongo-java-driver|legacy", "version": "4.11.2"},
        "os": {"name": "Linux", "type": "Linux", "version": "6.1.134", "architecture": "amd64"},
        "platform": "Java/Amazon.com Inc./11.0.27+6-LTS"}}}})
    c = res["attr"]["command"]["$client"]
    assert c["mongos"]["host"] == "atlas-xxx-shard-00-00.xxx.mongodb.net"
    assert c["mongos"]["client"] == "192.168.254.8:29260"
    assert c["mongos"]["version"] == "7.0.21"
    assert c["driver"] == {"name": "mongo-java-driver|legacy", "version": "4.11.2"}
    assert c["os"]["architecture"] == "amd64"
    assert c["platform"] == "Java/Amazon.com Inc./11.0.27+6-LTS"


def test_atlas_host_with_port():
    res = _r({"attr": {"command": {"$client": {"mongos": {
        "host": "atlas-abc123-shard-00-02.xyz.mongodb.net:27016"}}}}})
    assert res["attr"]["command"]["$client"]["mongos"]["host"] == \
        "atlas-xxx-shard-00-02.xxx.mongodb.net:27016"


def test_regular_expression_in_query():
    # LogRedactionUtilTest.java:100-130
    res = _r({"attr": {"command": {"filter": {"context": {
        "$regularExpression": {"pattern": "^\\/company\\/dept", "options": ""}}}}}})
    regex = res["attr"]["command"]["filter"]["context"]["$regularExpression"]
    assert regex["pattern"].startswith("^")
    assert "\\" in regex["pattern"]
    assert "xxx" in regex["pattern"]
    assert regex["options"] == ""


def test_long_regex_pattern_fully_redacted():
    res = _r({"attr": {"command": {"filter": {"c": {
        "$regularExpression": {"pattern": "averyveryverylongpattern12345", "options": "i"}}}}}})
    regex = res["attr"]["command"]["filter"]["c"]["$regularExpression"]
    assert regex["pattern"] == "xxx" and regex["options"] == "i"


def test_array_in_query_redacted():
    # LogRedactionUtilTest.java:135-161
    res = _r({"attr": {"command": {"filter": {"context": {"$in": [
        "/org/div/region_a/subdiv_a", "/org/div/region_b/subdiv_b", "/org/div/region_c/subdiv_c"]}}}}})
    assert res["attr"]["command"]["filter"]["context"]["$in"] == ["xxx", "xxx", "xxx"]


def test_date_preserved_in_query():
    # LogRedactionUtilTest.java:164-189
    res = _r({"attr": {"command": {"filter": {"timestamp": {"$gte": {
        "$date": "2025-06-18T16:00:00.000Z"}}}}}})
    assert res["attr"]["command"]["filter"]["timestamp"]["$gte"]["$date"] == \
        "2025-06-18T16:00:00.000Z"


def test_pipeline_redaction_preserves_collection():
    # LogRedactionUtilTest.java:192-227
    res = _r({"attr": {"command": {"aggregate": "Items", "pipeline": [
        {"$match": {"accountId": "98765432101", "context": "/sensitive/path"}},
        {"$project": {"accountId": 1, "publicField": 1}}]}}})
    match = res["attr"]["command"]["pipeline"][0]["$match"]
    assert match == {"accountId": "xxx", "context": "xxx"}
    assert res["attr"]["command"]["aggregate"] == "Items"
    # sort-direction 1 preserved (LogRedactionUtil.java:975-981)
    assert res["attr"]["command"]["pipeline"][1]["$project"] == \
        {"accountId": 1, "publicField": 1}


def test_read_concern_and_storage_preserved():
    # LogRedactionUtilTest.java:230-270
    res = _r({"attr": {"readConcern": {"level": "local", "provenance": "implicitDefault"},
                       "storage": {"data": {"timeReadingMicros": 999999, "bytesRead": 99999999}}}})
    assert res["attr"]["readConcern"] == {"level": "local", "provenance": "implicitDefault"}
    assert res["attr"]["storage"]["data"] == {"timeReadingMicros": 999999, "bytesRead": 99999999}


def test_performance_metrics_preserved():
    # LogRedactionUtilTest.java:273-303
    res = _r({"attr": {"durationMillis": 144, "cpuNanos": 1675054, "keysExamined": 100,
                       "docsExamined": 50, "nreturned": 25, "reslen": 587697,
                       "queryHash": "162B8C18", "planCacheKey": "ABC123"}})
    assert res["attr"] == {"durationMillis": 144, "cpuNanos": 1675054, "keysExamined": 100,
                           "docsExamined": 50, "nreturned": 25, "reslen": 587697,
                           "queryHash": "162B8C18", "planCacheKey": "ABC123"}


def test_redaction_disabled_returns_original():
    # LogRedactionUtilTest.java:306-323
    msg = '{"attr":{"command":{"filter":{"accountId":"11122233301"}}}}'
    assert redact_log_message(msg, False) == msg


def test_name_field_context_awareness():
    # LogRedactionUtilTest.java:326-356
    res = _r({"attr": {"command": {
        "$client": {"application": {"name": "mongosh 2.0.2"}},
        "filter": {"name": "John Doe"}}}})
    assert res["attr"]["command"]["$client"]["application"]["name"] == "mongosh 2.0.2"
    assert res["attr"]["command"]["filter"]["name"] == "xxx"


def test_replan_reason_preserved():
    # LogRedactionUtilTest.java:359-381
    res = _r({"attr": {"replanReason": "cached plan was pinned", "replanned": True,
                       "durationMillis": 459}})
    assert res["attr"] == {"replanReason": "cached plan was pinned", "replanned": True,
                           "durationMillis": 459}


def test_number_redaction_digits_to_nines():
    res = _r({"attr": {"command": {"filter": {"qty": 12345, "price": 2.5,
                                              "sort_asc": 1, "sort_desc": -1}}}})
    f = res["attr"]["command"]["filter"]
    assert f["qty"] == 99999
    assert f["price"] == 9.9
    assert f["sort_asc"] == 1 and f["sort_desc"] == -1  # sort keys preserved


def test_parse_failure_returns_original():
    assert redact_log_message("*** not json ***", True) == "*** not json ***"
    assert trim_log_message("*** not json ***") == "*** not json ***"


# ------------------------------------------------------------------ trim R7

def test_trim_removes_verbose_keys():
    # LogFilter.java:64-70 default ignore keys, incl. nested attr.command removal
    out = json.loads(trim_log_message(json.dumps({
        "t": {"$date": "x"}, "lsid": {"id": 1}, "$clusterTime": {"t": 1},
        "attr": {"command": {"find": "c", "lsid": {"id": 2}, "planningTimeMicros": 5},
                 "flowControl": {"acquireCount": 1}, "durationMillis": 7}})))
    assert "lsid" not in out and "$clusterTime" not in out
    assert "lsid" not in out["attr"]["command"]
    assert "planningTimeMicros" not in out["attr"]["command"]
    assert "flowControl" not in out["attr"]
    assert out["attr"]["durationMillis"] == 7


def test_trim_truncates_long_strings_but_preserves_ns():
    long = "a" * 50
    out = json.loads(trim_log_message(json.dumps(
        {"attr": {"ns": long, "planSummary": long, "other": long}})))
    assert out["attr"]["ns"] == long and out["attr"]["planSummary"] == long
    assert out["attr"]["other"] == "a" * 35 + "..."


def test_trim_truncates_long_arrays_but_preserves_pipeline():
    arr = [1, 2, 3, 4, 5]
    out = json.loads(trim_log_message(json.dumps(
        {"attr": {"command": {"pipeline": arr, "vals": arr, "$or": arr}}})))
    cmd = out["attr"]["command"]
    assert cmd["pipeline"] == arr and cmd["$or"] == arr
    assert cmd["vals"] == [1, "<truncated 4 elements>"]


def test_trim_drops_empty_objects():
    out = json.loads(trim_log_message(json.dumps({"attr": {"empty": {}, "keep": {"a": 1}}})))
    assert "empty" not in out["attr"] and out["attr"]["keep"] == {"a": 1}


def test_trim_is_idempotent():
    msg = json.dumps({"attr": {"other": "b" * 80, "vals": [1, 2, 3, 4, 5]}})
    once = trim_log_message(msg)
    assert trim_log_message(once) == once


def test_process_composes_trim_then_redact():
    # R8: trim removes lsid, then redaction hits the filter values
    msg = json.dumps({"attr": {"command": {"filter": {"u": "secret-user"}, "lsid": {"id": 9}},
                      "durationMillis": 3}})
    out = json.loads(process_log_message(msg, True))
    assert "lsid" not in out["attr"]["command"]
    assert out["attr"]["command"]["filter"]["u"] == "xxx"
    assert out["attr"]["durationMillis"] == 3


def test_sanitize_filter():
    # R9 (LogRedactionUtil.java:721-736)
    assert sanitize_filter({"uid": 12345, "name": "val"}, True) == '{"uid":99999,"name":"xxx"}'
    assert sanitize_filter({"uid": 12345}, False) == '{"uid":12345}'
    assert sanitize_filter(None, True) is None
    # reference quirk reproduced: sanitizeFilter walks from path "", so filter
    # keys that collide with top-level envelope preserve-paths (s, t, c, id,
    # ctx, msg) are preserved (LogRedactionUtil.java:731 + PRESERVE_PATHS:69)
    assert sanitize_filter({"s": "val"}, True) == '{"s":"val"}'


def test_udfs_on_spark(spark):
    from mongo_log_parser_spark.functions.redact import make_udfs

    udfs = make_udfs()
    df = spark.createDataFrame(
        [('{"attr":{"command":{"filter":{"a":"secret"}},"lsid":{"x":1},"durationMillis":5}}',)],
        "text string",
    )
    row = df.select(
        udfs["process"]("text").alias("p"), udfs["trim"]("text").alias("t")
    ).collect()[0]
    assert json.loads(row["p"])["attr"]["command"]["filter"]["a"] == "xxx"
    assert "lsid" not in json.loads(row["t"])["attr"]
    # byte-determinism: local function output == UDF output
    assert row["p"] == process_log_message(
        '{"attr":{"command":{"filter":{"a":"secret"}},"lsid":{"x":1},"durationMillis":5}}', True
    )


def test_redacted_pin_fresh():
    """The committed log_redacted_lines pins (contracts/pins/) must match a
    fresh recompute: DuckDB line selection + pure-Python process transform.
    Fails whenever redact/trim semantics change without re-running
    scripts/pin_redacted.py — the pin is the driver's hash oracle, so a stale
    pin would mask (or falsely flag) a behavior change."""
    import os
    import sys

    import pyarrow.parquet as pq

    from mongo_log_parser_spark.contracts import pins

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import pin_redacted

    for sf in (0.001, 0.01):
        stored = pq.read_table(pins.pin_path(sf))
        fresh = pin_redacted.build_pin(sf)
        assert stored.num_rows == fresh.num_rows, f"sf{sf}: row count drifted"
        assert stored.equals(fresh), f"sf{sf}: pin stale — rerun scripts/pin_redacted.py"
