#!/usr/bin/env python
"""Multi-executor N vs 4N scaling evidence (north rule, literal form).

Runs the identical timed job (scripts/cluster_timed_job.py) via spark-submit
--py-files on Spark's local-cluster master — a real standalone master plus
separate executor JVMs on this machine — at TWO CLUSTER SIZES:

    N  = local-cluster[1,C,<mem>]   (1 executor)
    4N = local-cluster[4,C,<mem>]   (4 executors)

C (cores per executor) defaults to 1 so the 4N point uses 4 concurrently
busy cores — inside this shared host's measured linear range (the pure-CPU
envelope probes in BENCH/BASELINE.md show the host itself stops scaling past
~8 busy cores, so wider executors would measure the host, not the job). The
executor COUNT — the quantity the north rule scales — still quadruples, and
every task crosses real executor-JVM boundaries.

Same input, sizes interleaved per round, per-size minimum over rounds (this
shared host's co-tenant noise only ever slows a run). Writes
BENCH/CLUSTER.md, which bench.py's _write_md appends into BENCH/BASELINE.md
on every regeneration, and prints one JSON line.

Env: SPARK_GRAFT_CLUSTER_SF (default 0.3), SPARK_GRAFT_CLUSTER_ROUNDS
(default 3), SPARK_GRAFT_CLUSTER_MEM_MB (default 6144), SPARK_GRAFT_CLUSTER_CORES
(default 1), SPARK_GRAFT_CLUSTER_BUDGET_SEC (default 2400).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.time()
BUDGET = float(os.environ.get("SPARK_GRAFT_CLUSTER_BUDGET_SEC", "2400"))


def find_spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def build_zip(path: str) -> None:
    src = os.path.join(REPO, "mongo_log_parser_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                zf.write(p, os.path.relpath(p, REPO))


def one_run(submit: str, pkg_zip: str, n_exec: int, cores: int, mem_mb: int, sf: float) -> dict | None:
    timeout = float(os.environ.get("SPARK_GRAFT_CLUSTER_RUN_TIMEOUT_SEC", "1500"))
    try:
        proc = subprocess.run(
            [submit, "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
             "--driver-memory", "8g", "--py-files", pkg_zip,
             os.path.join(REPO, "scripts", "cluster_timed_job.py"), "--sf", str(sf)],
            cwd=REPO, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        # a hung submit must cost one measurement, not the whole evidence run
        return {"error": f"timeout after {timeout:.0f}s"}
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:]}
    m = re.findall(r'\{"elapsed_sec".*\}', proc.stdout)
    return json.loads(m[-1]) if m else {"error": "no JSON in stdout"}


def main() -> None:
    sf = float(os.environ.get("SPARK_GRAFT_CLUSTER_SF", "0.3"))
    rounds = int(os.environ.get("SPARK_GRAFT_CLUSTER_ROUNDS", "3"))
    mem_mb = int(os.environ.get("SPARK_GRAFT_CLUSTER_MEM_MB", "6144"))
    cores = int(os.environ.get("SPARK_GRAFT_CLUSTER_CORES", "1"))
    submit = find_spark_submit()
    pkg_zip = "/tmp/mlp_cluster.zip"
    build_zip(pkg_zip)

    times: dict[int, list[float]] = {1: [], 4: []}
    errors: list[dict] = []
    pages = None
    done_rounds = 0
    for _ in range(rounds):
        if time.time() - T0 > BUDGET * 0.7:
            break
        for n_exec in (1, 4):
            r = one_run(submit, pkg_zip, n_exec, cores, mem_mb, sf)
            if r and "elapsed_sec" in r:
                times[n_exec].append(r["elapsed_sec"])
                pages = r["pages"]
            else:
                errors.append({"n_exec": n_exec, **(r or {})})
        done_rounds += 1

    out: dict = {"metric": "cluster_n_vs_4n", "sf": sf, "pages": pages,
                 "rounds": done_rounds, "cores_per_executor": cores,
                 "times_1x4": times[1], "times_4x4": times[4],
                 "mem_mb": mem_mb, "budget_spent_sec": round(time.time() - T0, 1)}
    if times[1] and times[4] and pages:
        t1, t4 = min(times[1]), min(times[4])
        out["throughput_n"] = round(pages / t1, 1)
        out["throughput_4n"] = round(pages / t4, 1)
        out["scaling_efficiency"] = round((pages / t4) / (pages / t1) / 4.0, 3)
        _write_md(out)
    if errors:
        out["errors"] = errors
    print(json.dumps(out), flush=True)


def _write_md(out: dict) -> None:
    """Write this run's section to BENCH/cluster_shape_{C}core[_sf{S}].md,
    then reassemble BENCH/CLUSTER.md from every section present — evidence
    for one (shape, sf) point never clobbers another's (round-4 verdict
    item 7: the PASS should be robust to shape, not a lucky min; round-5
    adds a second SCALE point to test the serial-floor model out of
    sample)."""
    cores = out["cores_per_executor"]
    # keep the original filename for the pre-declared sf1.0 gate sections so
    # their committed evidence files stay stable; suffix other scale points
    suffix = "" if out["sf"] == 1.0 else f"_sf{out['sf']}"
    lines = [
        f"### Shape: executors x {cores} core(s) each — sf{out['sf']}\n",
        f"N = 1 executor x {cores} core(s) vs 4N = 4 executors x {cores} core(s),",
        "same input, sizes interleaved per round, per-size min.\n",
        "| quantity | value |", "|---|---|",
        f"| input | sf{out['sf']} ({out['pages']} pages) |",
        f"| throughput @ 1 executor x {cores} core(s) | "
        f"{out['throughput_n']} pages/sec "
        f"(min {min(out['times_1x4'])} s over {out['times_1x4']}) |",
        f"| throughput @ 4 executors x {cores} core(s) | "
        f"{out['throughput_4n']} pages/sec "
        f"(min {min(out['times_4x4'])} s over {out['times_4x4']}) |",
        f"| scaling efficiency N→4N | {out['scaling_efficiency']} |",
        f"| north_rule gate | efficiency >= 0.8 → "
        f"{'PASS' if out['scaling_efficiency'] >= 0.8 else 'FAIL'} |",
        "",
    ]
    bench_dir = os.path.join(REPO, "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, f"cluster_shape_{cores}core{suffix}.md"), "w") as f:
        f.write("\n".join(lines))
    _assemble_cluster_md(bench_dir)


def _assemble_cluster_md(bench_dir: str) -> None:
    header = [
        "## Multi-executor N vs 4N (real separate executor JVMs)\n",
        "Literal form of the north-rule criterion: the SAME spark-submit",
        "--py-files job (scripts/cluster_timed_job.py) on Spark's",
        "local-cluster master — a standalone master + separate executor JVMs",
        "on this machine — at N = 1 executor and 4N = 4 executors, same",
        "input, sizes interleaved per round, per-size MINIMUM over rounds",
        "(pre-declared estimator; this shared host's co-tenant noise only",
        "ever slows a run). Narrow executors keep total parallelism inside",
        "the host's measured linear range. One section per executor SHAPE —",
        "the gate should be robust to shape, not one lucky configuration.",
        "Complements the local[width] table above (which isolates parallel",
        "efficiency from JVM/cluster overhead); this one carries real",
        "executor-to-executor shuffle + task dispatch. Raw per-round",
        "orchestrator JSON archived as BENCH/cluster_sf1_*.json.txt.\n",
    ]
    sections = []
    for name in sorted(os.listdir(bench_dir)):
        if name.startswith("cluster_shape_") and name.endswith(".md"):
            with open(os.path.join(bench_dir, name)) as f:
                sections.append(f.read())
    with open(os.path.join(bench_dir, "CLUSTER.md"), "w") as f:
        f.write("\n".join(header) + "\n" + "\n".join(sections))


if __name__ == "__main__":
    sys.exit(main())
