"""Deterministic synthetic `pages` table generator.

Produces the Common-Crawl-style input table required by BASELINE.json's
input_hint — columns ``(url string, warc_ts timestamp, html binary,
text string, lang string)`` — where each row's ``text`` payload is one
MongoDB-4.4-style structured-JSON log line following the record grammar in
FIXTURES.md §2, so the reference's extraction semantics (LogParserTask.java:88-356,
LogParser.java:896-999) apply verbatim.

Everything is seeded (numpy PCG64, seed=42) and wall-clock-free, so the same
(sf, seed, GEN_VERSION) always yields byte-identical parquet — a requirement
for the DuckDB oracle comparison and for resumability tests.

Skew: hosts follow a Zipf-ish distribution with a dominant head host (~20% of
rows) over ~1000 hosts, and one dominant hot namespace, to exercise the
salting / AQE skew-join paths (SURVEY.md §7.3.5).
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta, timezone

import numpy as np

GEN_VERSION = "v1"
SEED = 42
BASE_ROWS = 6_000_000  # rows at sf=1.0 (sf0.001 → 6k, matching TESTDATA scale)
def _default_data_root() -> str:
    """Repo-relative `data/` when the package is on a real filesystem; when it
    is imported from a --py-files zip (spark-submit), __file__ points inside
    the archive and is not writable — fall back to $SPARK_GRAFT_DATA_DIR or
    cwd/data."""
    env = os.environ.get("SPARK_GRAFT_DATA_DIR")
    if env:
        return env
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(repo_root):
        return os.path.join(repo_root, "data")
    return os.path.join(os.getcwd(), "data")


DATA_ROOT = _default_data_root()

START_TS = datetime(2025, 7, 1, tzinfo=timezone.utc)
WINDOW = timedelta(days=30)

LANGS = ["en", "de", "fr", "es", "ja", "zh", "pt", "ru"]
LANG_WEIGHTS = np.array([0.42, 0.14, 0.11, 0.10, 0.08, 0.07, 0.05, 0.03])
# one lang ("ru") deliberately missing from the lookup → left-join null path
LANG_LOCALE = {
    "en": "en_US", "de": "de_DE", "fr": "fr_FR", "es": "es_ES",
    "ja": "ja_JP", "zh": "zh_CN", "pt": "pt_BR",
}
SITE_CLASSES = ["news", "blog", "shop", "docs", "spam"]

# (db, coll) namespace universe — includes config.* (always excluded by the
# namespace filter, LogParserTask.java:370-372) and a dominant hot namespace.
NAMESPACES = [
    ("appdb", "orders"),       # hot: ~35% of command traffic
    ("appdb", "users"),
    ("appdb", "sessions"),
    ("appdb", "inventory.items"),  # collection containing a dot → first-dot split matters
    ("shopdb", "carts"),
    ("shopdb", "products"),
    ("shopdb", "reviews"),
    ("userdb", "profiles"),
    ("userdb", "prefs"),
    ("metricsdb", "daily"),
    ("metricsdb", "hourly"),
    ("analytics", "clicks"),
    ("analytics", "pageviews"),
    ("billing", "invoices"),
    ("billing", "payments"),
    ("search", "queries"),
    ("search", "suggestions"),
    ("config", "system.sessions"),  # must be excluded from every aggregate
    ("config", "mongos"),
    ("catalog", "entries"),
]
NS_WEIGHTS = np.array(
    [0.35, 0.06, 0.05, 0.04, 0.05, 0.05, 0.04, 0.04, 0.03, 0.03,
     0.03, 0.03, 0.03, 0.03, 0.02, 0.02, 0.02, 0.03, 0.02, 0.03]
)

OPS = ["find", "aggregate", "update", "insert", "delete", "getMore",
       "count", "distinct", "findAndModify", "admin", "shard"]
OP_WEIGHTS = np.array([0.30, 0.15, 0.12, 0.10, 0.08, 0.10, 0.05, 0.04, 0.04, 0.015, 0.005])
ADMIN_CMDS = ["drop", "createIndexes", "collMod", "killCursors", "listCollections"]
SHARD_CMDS = ["_shardsvrMoveRange", "_shardsvrCommitChunkMigration"]

APPS = ["web-frontend", "batch-etl", "mobile-api", "admin-console", "recommender", "cron-jobs"]
PLAN_SUMMARIES = ["COLLSCAN", "IXSCAN { a: 1 }", "IXSCAN { b: -1 }"]
READ_PREF_MODES = ["secondaryPreferred", "secondary", "primary", "nearest"]
ERROR_POOL = [
    (11600, "InterruptedAtShutdown", "interrupted at shutdown"),
    (50, "MaxTimeMSExpired", "operation exceeded time limit"),
    (112, "WriteConflict", "WriteConflict error: this operation conflicted"),
    (13435, "NotPrimaryNoSecondaryOk", "not primary and secondaryOk=false"),
    (211, "KeyNotFound", "key not found in cache"),
    (8000, "AtlasError", "connection pool cleared"),
]
DRIVERS = [
    ("mongo-java-driver", "4.9.1", "Linux", "linux", "Java/17"),
    ("PyMongo", "4.3.3", "Linux", "linux", "CPython 3.11"),
    ("nodejs", "5.1.0", "Darwin", "macos", "Node.js v18"),
    ("mongo-go-driver", "1.11.2", "Linux", "linux", "go1.20"),
    ("NetworkInterfaceTL", "0.0.0", "Linux", "linux", "internal"),          # excluded (F11)
    ("MongoDB Internal Client", "6.0.6", "Linux", "linux", "internal"),     # excluded (F11)
]
USERS = ["svc_app", "svc_etl", "analyst", "admin_user"]
MECHS = ["SCRAM-SHA-256", "SCRAM-SHA-1"]

# line categories (FIXTURES.md §2 mix)
CATS = ["cmd", "write", "ttl", "txn", "meta", "auth", "conn_accept", "conn_end", "noise"]
CAT_WEIGHTS = np.array([0.55, 0.10, 0.05, 0.05, 0.05, 0.03, 0.02, 0.02, 0.13])

NOISE_KINDS = [
    "network", "access", "storage", "control", "health", "replication",
    "admin_db", "local_db", "config_db", "profiling", "ttl_monitor", "non_json", "other",
]


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _make_hosts(n_hosts: int = 1000) -> tuple[list[str], np.ndarray]:
    hosts = [f"site{i:04d}.example.{['com','org','net','io'][i % 4]}" for i in range(n_hosts)]
    # head-heavy: host 0 ≈ 20% of traffic, zipf-ish tail
    w = 1.0 / np.power(np.arange(1, n_hosts + 1), 1.2)
    w[0] = w.sum() * 0.25  # lift head to ~20% after renorm
    return hosts, w / w.sum()


def _iso(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ts.microsecond // 1000:03d}Z"


def _dumps(obj) -> str:
    return json.dumps(obj, separators=(",", ":"))


def _build_rows(n: int, rng: np.random.Generator):  # noqa: C901 — one grammar, one builder
    hosts, host_w = _make_hosts()
    host_idx = rng.choice(len(hosts), size=n, p=host_w)
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_WEIGHTS / LANG_WEIGHTS.sum())
    cat_idx = rng.choice(len(CATS), size=n, p=CAT_WEIGHTS / CAT_WEIGHTS.sum())
    ns_idx = rng.choice(len(NAMESPACES), size=n, p=NS_WEIGHTS / NS_WEIGHTS.sum())
    op_idx = rng.choice(len(OPS), size=n, p=OP_WEIGHTS / OP_WEIGHTS.sum())
    dur = np.maximum(1, rng.lognormal(4.0, 1.2, size=n)).astype(np.int64)
    keys_ex = np.maximum(0, rng.lognormal(5.0, 1.5, size=n)).astype(np.int64)
    docs_ex = (keys_ex * rng.uniform(1.0, 4.0, size=n)).astype(np.int64)
    nret = np.maximum(0, (keys_ex * rng.uniform(0.0, 0.5, size=n))).astype(np.int64)
    reslen = np.maximum(32, rng.lognormal(7.0, 1.0, size=n)).astype(np.int64)
    bytes_r = np.maximum(0, rng.lognormal(9.0, 1.5, size=n)).astype(np.int64)
    bytes_w = np.maximum(0, rng.lognormal(7.0, 1.5, size=n)).astype(np.int64)
    u01 = rng.uniform(size=(n, 8))
    planning = np.maximum(10, rng.lognormal(7.5, 1.0, size=n)).astype(np.int64)
    conn_pool = 1000 + rng.integers(0, max(50, n // 20), size=n)
    ts_jitter = rng.integers(0, 1000, size=n)

    step = WINDOW / n
    n_oversized = max(2, n // 3000)
    oversized_positions = set((np.arange(n_oversized) * (n // n_oversized) + 7) % n)

    urls, warc_ts, htmls, texts, langs = [], [], [], [], []
    for i in range(n):
        ts = START_TS + step * i + timedelta(milliseconds=int(ts_jitter[i]))
        iso = _iso(ts)
        cat = CATS[cat_idx[i]]
        cid = int(conn_pool[i])
        ctx = f"conn{cid}"
        db, coll = NAMESPACES[ns_idx[i]]
        ns = f"{db}.{coll}"

        if i in oversized_positions:
            # >1 MiB line: dropped whole by the bounded-line scan (S3)
            line = '{"t":{"$date":"%s"},"s":"I","c":"COMMAND","id":1,"ctx":"%s","msg":"Slow query","attr":{"pad":"%s"}}' % (
                iso, ctx, "x" * (1 * 1024 * 1024 + 100))
        elif cat == "cmd":
            line = _cmd_line(i, iso, ctx, db, coll, ns, op_idx[i], dur[i], keys_ex[i], docs_ex[i],
                             nret[i], reslen[i], bytes_r[i], bytes_w[i], planning[i], u01[i])
        elif cat == "write":
            line = _write_line(i, iso, ctx, ns, dur[i], keys_ex[i], docs_ex[i], nret[i], u01[i])
        elif cat == "ttl":
            ttl_ctx = "TTLMonitor" if u01[i][0] < 0.8 else ctx
            attr = {"msg": "Deleted expired documents", "namespace": ns,
                    "numDeleted": int(nret[i] % 500), "durationMillis": int(dur[i])}
            line = _dumps({"t": {"$date": iso}, "s": "I", "c": "INDEX", "id": 22543,
                           "ctx": ttl_ctx, "msg": "Deleted expired documents for collection", "attr": attr})
        elif cat == "txn":
            attr = {"parameters": {"txnRetryCounter": int(u01[i][0] * 3)},
                    "terminationCause": "committed" if u01[i][1] < 0.85 else "aborted",
                    "commitType": ["noShards", "singleShard", "twoPhaseCommit"][int(u01[i][2] * 3)],
                    "durationMillis": int(dur[i]),
                    "commitDurationMicros": int(dur[i] * 310),
                    "timeActiveMicros": int(dur[i] * 700),
                    "timeInactiveMicros": int(dur[i] * 130)}
            line = _dumps({"t": {"$date": iso}, "s": "I", "c": "TXN", "id": 51802,
                           "ctx": ctx, "msg": "transaction", "attr": attr})
        elif cat == "meta":
            d = DRIVERS[int(u01[i][0] * len(DRIVERS))]
            attr = {"remote": f"192.168.{cid % 256}.{(cid // 7) % 256}:{20000 + cid % 999}",
                    "negotiatedCompressors": ["snappy"] if u01[i][1] < 0.6 else [],
                    "doc": {"driver": {"name": d[0], "version": d[1]},
                            "os": {"type": d[2], "name": d[3]}, "platform": d[4]}}
            line = _dumps({"t": {"$date": iso}, "s": "I", "c": "NETWORK", "id": 51800,
                           "ctx": ctx, "msg": "client metadata", "attr": attr})
        elif cat == "auth":
            attr = {"user": USERS[int(u01[i][0] * len(USERS))], "db": "admin",
                    "mechanism": MECHS[int(u01[i][1] * len(MECHS))]}
            line = _dumps({"t": {"$date": iso}, "s": "I", "c": "ACCESS", "id": 20250,
                           "ctx": ctx, "msg": "Successfully authenticated", "attr": attr})
        elif cat == "conn_accept":
            attr = {"remote": f"192.168.{cid % 256}.{(cid // 7) % 256}:{20000 + cid % 999}",
                    "connectionId": cid}
            line = _dumps({"t": {"$date": iso}, "s": "I", "c": "NETWORK", "id": 22943,
                           "ctx": "listener", "msg": "Connection accepted", "attr": attr})
        elif cat == "conn_end":
            attr = {"remote": f"192.168.{cid % 256}.{(cid // 7) % 256}:{20000 + cid % 999}"}
            line = _dumps({"t": {"$date": iso}, "s": "I", "c": "NETWORK", "id": 22944,
                           "ctx": ctx, "msg": "Connection ended", "attr": attr})
        else:
            line = _noise_line(i, iso, ctx, u01[i])

        host = hosts[host_idx[i]]
        url = f"https://{host}/p/{i:09d}"
        urls.append(url)
        warc_ts.append(ts)
        texts.append(line)
        htmls.append(b"<html><body><pre>" + line.encode("utf-8") + b"</pre></body></html>")
        langs.append(LANGS[lang_idx[i]])
    return urls, warc_ts, htmls, texts, langs, hosts


def _cmd_line(i, iso, ctx, db, coll, ns, op_i, dur, keys, docs, nret, reslen, br, bw, planning, u):
    op = OPS[op_i]
    qh = _md5hex(f"{ns}|{op}|{i % 7}")[:8].upper()
    pck = _md5hex(f"pck|{ns}|{op}|{i % 5}")[:8].upper()
    plan = PLAN_SUMMARIES[int(u[2] * 3)]
    command: dict = {}
    if op == "find":
        command["find"] = coll
        command["filter"] = {"status": f"state-{i % 6}", "qty": {"$gt": int(u[3] * 100)}}
    elif op == "aggregate":
        # aggregate: 1 (number) means db-level aggregation → collection kept from ns
        command["aggregate"] = 1 if u[3] < 0.05 else coll
        command["pipeline"] = [{"$match": {"region": f"r{i % 4}"}}, {"$group": {"_id": "$k", "n": {"$sum": 1}}}]
    elif op == "getMore":
        command["getMore"] = 7000000000 + (i % 100000)
        command["collection"] = coll
        orig: dict = {"find": coll, "filter": {"uid": int(u[3] * 10000)}}
        if u[4] < 0.10:
            orig = {"aggregate": coll, "pipeline": [{"$changeStream": {}}, {"$match": {"operationType": "insert"}}]}
        command["originatingCommand_placeholder"] = None  # replaced below at attr level
    elif op == "admin":
        command[ADMIN_CMDS[i % len(ADMIN_CMDS)]] = coll
    elif op == "shard":
        command[SHARD_CMDS[i % len(SHARD_CMDS)]] = ns
    else:  # update/insert/delete/count/distinct/findAndModify
        command[op] = coll
        if op in ("update", "delete", "findAndModify"):
            command["q"] = {"uid": int(u[3] * 10000), "flag": bool(u[4] < 0.5)}
        elif op in ("count", "distinct"):
            command["query"] = {"cat": f"c{i % 9}"}
    if u[5] < 0.5 and op not in ("admin", "shard"):
        command["$readPreference"] = (
            {"mode": READ_PREF_MODES[int(u[6] * 4)],
             "tags": [({"nodeType": "analytics", "region": f"EU_{i % 3}"}
                       if u[7] < 0.3 else
                       {"workloadType": "operational", "region": f"EU_{i % 3}"})]}
            if u[6] < 0.8 else READ_PREF_MODES[int(u[7] * 4)]
        )
    command["$db"] = db

    attr: dict = {"type": "command", "ns": ns, "command": command,
                  "planSummary": plan, "queryHash": qh, "planCacheKey": pck,
                  "planningTimeMicros": int(planning),
                  "keysExamined": int(keys), "docsExamined": int(docs),
                  "nreturned": int(nret), "reslen": int(reslen),
                  "storage": {"data": {"bytesRead": int(br), "bytesWritten": int(bw)}},
                  "remote": f"10.1.{i % 200}.{i % 250}:27017",
                  "durationMillis": int(dur)}
    cmd_obj = attr["command"]
    if "originatingCommand_placeholder" in cmd_obj:
        del cmd_obj["originatingCommand_placeholder"]
        attr["originatingCommand"] = orig
    if u[0] < 0.9:
        attr["appName"] = APPS[i % len(APPS)]
    if u[1] < 0.15:
        attr["nShards"] = 1 + int(u[1] * 20) % 4
    if u[1] > 0.93:
        attr["writeConflicts"] = int(u[1] * 100) % 9 + 1
    if u[4] < 0.06:
        attr["replanned"] = True
        attr["replanReason"] = "cached plan was less efficient than expected" if u[5] < 0.7 else "plan was pruned"
        attr["fromMultiPlanner"] = True
    # error tail: 8% ok:0 + errCode/errName, 2% error object
    if u[7] < 0.08:
        code, name, msg = ERROR_POOL[i % len(ERROR_POOL)]
        attr["ok"] = 0
        attr["errCode"] = code
        attr["errName"] = name
        attr["errMsg"] = msg
    elif u[7] > 0.98:
        code, name, msg = ERROR_POOL[(i + 3) % len(ERROR_POOL)]
        attr["error"] = {"code": code, "codeName": name, "errmsg": msg}
    top_msg = "Slow query"
    if u[7] > 0.997:  # client-disconnect interruption (ErrorCode A7 special case)
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 20883, "ctx": ctx,
                       "msg": "Interrupted operation as its client disconnected",
                       "attr": {"opId": 600000 + i}})
    return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803,
                   "ctx": ctx, "msg": top_msg, "attr": attr})


def _write_line(i, iso, ctx, ns, dur, keys, docs, nret, u):
    wtype = ["update", "remove", "insert", "delete", "batch"][
        0 if u[2] < 0.45 else 1 if u[2] < 0.70 else 2 if u[2] < 0.90 else 3 if u[2] < 0.98 else 4]
    attr: dict = {"type": wtype, "ns": ns, "durationMillis": int(dur),
                  "keysExamined": int(keys), "docsExamined": int(docs)}
    if wtype == "update":
        attr["nMatched"] = int(nret)
        attr["nModified"] = int(nret)
        if u[3] < 0.1:
            attr["nUpserted"] = 1
    elif wtype in ("remove", "delete"):
        attr["ndeleted"] = int(nret)
    elif wtype == "insert":
        attr["ninserted"] = int(nret) + 1
    if u[4] < 0.2:
        attr["writeConflicts"] = 1 + int(u[4] * 10)
    if u[5] < 0.8:
        attr["appName"] = APPS[i % len(APPS)]
    return _dumps({"t": {"$date": iso}, "s": "I", "c": "WRITE", "id": 51803,
                   "ctx": ctx, "msg": "Slow query", "attr": attr})


def _noise_line(i, iso, ctx, u):
    kind = NOISE_KINDS[i % len(NOISE_KINDS)]
    if kind == "non_json":
        return f"*** mongod startup banner line {i} (not json) ***"
    if kind == "network":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "NETWORK", "id": 4915701,
                       "ctx": ctx, "msg": "Interrupted operation", "attr": {"x": 1}})
    if kind == "access":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "ACCESS", "id": 20436,
                       "ctx": ctx, "msg": "Checking authorization failed", "attr": {"x": 1}})
    if kind == "storage":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "STORAGE", "id": 22430,
                       "ctx": "WTCheckpointThread", "msg": "WiredTiger message", "attr": {"x": 1}})
    if kind == "control":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "CONTROL", "id": 20712,
                       "ctx": "LogicalSessionCacheReap", "msg": "Sessions collection is not set up", "attr": {"x": 1}})
    if kind == "health":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803, "ctx": ctx,
                       "msg": "Slow query",
                       "attr": {"command": {"hello": 1, "$db": "admin"}, "durationMillis": 0}})
    if kind == "replication":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "REPL", "id": 51803, "ctx": ctx,
                       "msg": "Slow query",
                       "attr": {"command": {"replSetHeartbeat": "rs0", "$db": "admin"}}})
    if kind == "admin_db":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803, "ctx": ctx,
                       "msg": "Slow query",
                       "attr": {"command": {"serverStatus": 1, "$db": "admin"}}})
    if kind == "local_db":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803, "ctx": ctx,
                       "msg": "Slow query",
                       "attr": {"command": {"getlasterror": 1, "$db": "local"}}})
    if kind == "config_db":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803, "ctx": ctx,
                       "msg": "Slow query",
                       "attr": {"command": {"getlasterror": 1, "$db": "config"}}})
    if kind == "profiling":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803, "ctx": ctx,
                       "msg": "Slow query",
                       "attr": {"command": {"getParameter": 1, "profile": 2}}})
    if kind == "ttl_monitor":
        return _dumps({"t": {"$date": iso}, "s": "I", "c": "INDEX", "id": 22530,
                       "ctx": "TTLMonitor", "msg": "TTL monitor scanning indexes", "attr": {"x": 1}})
    # other: matches an ignore pattern but no categorizer substring
    return _dumps({"t": {"$date": iso}, "s": "I", "c": "COMMAND", "id": 51803, "ctx": ctx,
                   "msg": "Slow query", "attr": {"command": {"endSessions": [], "$db2": "x"}}})


def pages_path(sf: float) -> str:
    """Directory of part-*.parquet files (multi-file layout, see n_files)."""
    return os.path.join(DATA_ROOT, "pages", GEN_VERSION, f"sf{sf}", "pages")


def pages_glob(sf: float) -> str:
    """Glob form of pages_path for DuckDB's read_parquet (needs a pattern,
    not a directory)."""
    return os.path.join(pages_path(sf), "*.parquet")


def _legacy_pages_file(sf: float) -> str:
    return os.path.join(DATA_ROOT, "pages", GEN_VERSION, f"sf{sf}", "pages.parquet")


def n_files(n_rows: int) -> int:
    """Part-file count: scan parallelism must come from the file layout (as a
    100 TB table's thousands of >=128 MiB files would provide), not from a
    tiny maxPartitionBytes override — each local part file is well under the
    default 128 MiB split size, so one file == one input partition."""
    return max(1, min(64, n_rows // 18750))


def lookup_path(name: str) -> str:
    return os.path.join(DATA_ROOT, "lookups", GEN_VERSION, f"{name}.parquet")


# ----------------------------------------------------------- media table
# Deterministic binary media payloads with REAL container headers, so the
# stdlib header decoder (functions/media.py sniff_decode) parses genuine
# bytes rather than a fake. Dims derive from the row index by fixed
# arithmetic, which lets the DuckDB oracle recompute the expected metadata
# independently of the decoder (contracts/data_oracle.py q_media_decode).

def _png_bytes(w: int, h: int, seed: int) -> bytes:
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes((seed + y + x) % 256 for x in range(w))
                   for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 1)) + chunk(b"IEND", b""))


def _jpeg_bytes(w: int, h: int, seed: int) -> bytes:
    import struct

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com_payload = bytes((seed + i) % 256 for i in range(32))
    com = b"\xff\xfe" + struct.pack(">H", 2 + len(com_payload)) + com_payload
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


def _gif_bytes(w: int, h: int, seed: int) -> bytes:
    import struct

    body = bytes((seed + i) % 256 for i in range(24))
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + body + b"\x3b"


def warc_path(sf: float) -> str:
    return os.path.join(DATA_ROOT, "warc", GEN_VERSION, f"sf{sf}", "segments")


def ensure_warc(sf: float) -> str:
    """Render the pages table as deterministic WARC/1.1 segment files (the
    Common-Crawl ingest format): same contiguous row slices as the parquet
    part files (n_files), even-indexed segments plain .warc, odd-indexed
    .warc.gz (mtime=0 so bytes are reproducible). Roundtrip contract:
    sources/warc.read_warc over this directory must reproduce
    (url, warc_ts, html) of the pages table exactly."""
    import gzip as _gzip

    import pyarrow.parquet as pq

    from .warc import write_record

    path = warc_path(sf)
    if os.path.isdir(path):
        return path
    table = pq.read_table(ensure_pages(sf), columns=["url", "warc_ts", "html"])
    n = table.num_rows
    k = n_files(n)
    per = -(-n // k)  # ceil — matches _write_parts slicing
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    import io as _io

    for i in range(k):
        sl = table.slice(i * per, per)
        if sl.num_rows == 0:
            break
        buf = _io.BytesIO()
        urls = sl.column("url").to_pylist()
        tss = sl.column("warc_ts").to_pylist()
        htmls = sl.column("html").to_pylist()
        for url, ts, html in zip(urls, tss, htmls):
            write_record(buf, url, ts, html, record_id=_md5hex(url))
        if i % 2 == 0:
            with open(os.path.join(tmp, f"seg-{i:05d}.warc"), "wb") as f:
                f.write(buf.getvalue())
        else:
            with open(os.path.join(tmp, f"seg-{i:05d}.warc.gz"), "wb") as f:
                with _gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                    gz.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def media_path(sf: float) -> str:
    return os.path.join(DATA_ROOT, "media", GEN_VERSION, f"sf{sf}", "media")


def media_glob(sf: float) -> str:
    return os.path.join(media_path(sf), "*.parquet")


def ensure_media(sf: float) -> str:
    """Generate (once, cached) the media table: (url, payload binary).

    Row i: kind = i%4 ∈ {png, jpeg, gif, opaque}; images carry real headers
    with width = 16 + (i*7)%113, height = 16 + (i*13)%97; every 4th row is an
    opaque non-container blob of 100 + i%50 bytes exercising the stub
    fallback. All arithmetic is mirrored by the DuckDB oracle."""
    import pyarrow as pa

    path = media_path(sf)
    if os.path.isdir(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = max(100, int(60_000 * sf))
    urls, payloads = [], []
    for i in range(n):
        w, h = 16 + (i * 7) % 113, 16 + (i * 13) % 97
        kind = i % 4
        if kind == 0:
            b = _png_bytes(w, h, i)
        elif kind == 1:
            b = _jpeg_bytes(w, h, i)
        elif kind == 2:
            b = _gif_bytes(w, h, i)
        else:
            b = bytes((i * 31 + j * 7) % 251 for j in range(100 + i % 50))
        urls.append(f"media://obj/{i:08d}")
        payloads.append(b)
    table = pa.table({"url": pa.array(urls, pa.string()),
                      "payload": pa.array(payloads, pa.binary())})
    _write_parts(table, path)
    return path


def _write_parts(table, path: str) -> None:
    """Write `table` as n_files(len) part files, atomically (tmp dir swap).
    Files hold contiguous row slices in order, so any reader that concatenates
    parts in filename order sees the exact single-file row order."""
    import pyarrow.parquet as pq

    n = table.num_rows
    k = n_files(n)
    per = -(-n // k)  # ceil
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    for i in range(k):
        sl = table.slice(i * per, per)
        if sl.num_rows == 0:
            break
        pq.write_table(sl, os.path.join(tmp, f"part-{i:05d}.parquet"),
                       row_group_size=per, compression="zstd")
    os.replace(tmp, path)


def ensure_pages(sf: float) -> str:
    """Generate (once, cached) the pages table for a scale factor.

    Returns the directory of part files. A pre-existing single-file layout
    (GEN_VERSION v1 rounds 1-3) is migrated in place by re-slicing — the rows,
    order, and bytes-per-row are identical; only the file layout changes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = pages_path(sf)
    if os.path.isdir(path):
        return path
    legacy = _legacy_pages_file(sf)
    if os.path.exists(legacy):
        _write_parts(pq.read_table(legacy), path)
        os.remove(legacy)
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = max(100, int(BASE_ROWS * sf))
    rng = np.random.default_rng(np.random.PCG64(SEED))
    urls, warc_ts, htmls, texts, langs, hosts = _build_rows(n, rng)
    table = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(warc_ts, pa.timestamp("us", tz="UTC")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    _write_parts(table, path)
    _ensure_lookups(hosts)
    return path


def _ensure_lookups(hosts: list[str]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ll = lookup_path("lang_locale")
    if not os.path.exists(ll):
        os.makedirs(os.path.dirname(ll), exist_ok=True)
        t = pa.table({"lang": list(LANG_LOCALE), "locale": list(LANG_LOCALE.values())})
        pq.write_table(t, ll + ".tmp")
        os.replace(ll + ".tmp", ll)
    hc = lookup_path("host_class")
    if not os.path.exists(hc):
        os.makedirs(os.path.dirname(hc), exist_ok=True)
        # a few hosts deliberately missing → left-join null path
        kept = [h for i, h in enumerate(hosts) if i % 23 != 0]
        classes = [SITE_CLASSES[int(_md5hex(h)[:4], 16) % len(SITE_CLASSES)] for h in kept]
        t = pa.table({"host": kept, "site_class": classes})
        pq.write_table(t, hc + ".tmp")
        os.replace(hc + ".tmp", hc)


if __name__ == "__main__":
    import sys
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    print(ensure_pages(sf))
