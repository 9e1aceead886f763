"""Core-scaling probe at 10x fixture scale (r10, VERDICT task 9).

The r9 scaling block showed every headliner at sf0.1 running as fast or
faster on 8 cores than 32 — at that SF per-task overhead dominates and
nothing demonstrates the 100 TB parallelism story. This probe re-asks
the question at 10x the corpus (50k docs / 20k vecs from the partition-
parallel synthetic generator, other tables symlinked): the 10 heaviest
headliners, one fresh session per core count, warmed at sf0.001, timed
once per query. Ratio > 1 means 32 cores beat 8 (true parallel
speedup). Results go into BASELINE.md's scaling table.

Usage: python scripts/core_scaling_probe.py [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEAVIEST = [
    "q_curation_pipeline_v2",
    "q_dedup_blocking_recall",
    "q_sim_ann_ivfpq",
    "q_corpus_pipeline",
    "q_table_health_report",
    "q_dedup_prefix_filter",
    "q_pagerank",
    "q_triangle_count",
    "q_harmonic_centrality",
    "q_kcore_peel",
]

BASE_SF = "/root/testdata/sf0.1"
WORK = os.environ.get("SCALE_PROBE_DIR", "/tmp/core_scale_probe")

_CHILD = r"""
import json, sys, time
repo, sf_dir, warm_dir, cpus = sys.argv[1:5]
names = sys.argv[5:]
sys.path.insert(0, repo)
from healthcare_etl_spark.session import get_spark
from healthcare_etl_spark.plans.registry import get_queries
spark = get_spark(app_name="core-scale-probe", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
queries = get_queries()
for name in names:
    try:
        queries[name](spark, warm_dir).count()
    except Exception:
        pass
out = {}
for name in names:
    spark.sparkContext.setJobDescription(f"probe {cpus}c: {name}")
    t0 = time.perf_counter()
    try:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    except Exception as exc:
        out[name] = f"{type(exc).__name__}: {exc}"[:200]
print("PROBERESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    repo = str(Path(__file__).resolve().parent.parent)
    out_json = sys.argv[1] if len(sys.argv) > 1 else f"{repo}/plans/r10/core_scaling_x10.json"
    os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dspark.ui.showConsoleProgress=false")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

    from healthcare_etl_spark.session import get_spark
    from healthcare_etl_spark.sources.readers import TABLE_NAMES
    from healthcare_etl_spark.sources.synthetic import write_scale_corpus

    x10 = f"{WORK}/x10"
    if not os.path.exists(f"{x10}/documents.parquet"):
        spark = get_spark(app_name="scale-probe-gen", cpus="32")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        write_scale_corpus(spark, x10, n_docs=50_000, n_vecs=20_000, n_partitions=64)
        print(f"# generated x10 corpus in {time.perf_counter() - t0:.1f}s", flush=True)
        spark.stop()
        for t in TABLE_NAMES:
            dst = f"{x10}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{BASE_SF}/{t}.parquet", dst)

    results: dict[str, dict] = {}
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    for cpus in ("8", "32"):
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, repo, x10, "/root/testdata/sf0.001", cpus, *HEAVIEST],
            capture_output=True, text=True, env=env, cwd=repo, timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("PROBERESULT "):
                results[cpus] = json.loads(line[len("PROBERESULT "):])
                break
        else:
            raise RuntimeError(f"no PROBERESULT for {cpus} cores:\n{proc.stderr[-2000:]}")
        print(f"# {cpus} cores: {results[cpus]}", flush=True)

    print("| query | 8-core (s) | 32-core (s) | ratio t8/t32 |")
    print("|---|---|---|---|")
    table = {}
    for q in HEAVIEST:
        t8, t32 = results["8"].get(q), results["32"].get(q)
        ratio = (
            round(t8 / t32, 2)
            if isinstance(t8, (int, float)) and isinstance(t32, (int, float))
            else None
        )
        table[q] = {"t8": t8, "t32": t32, "ratio": ratio}
        print(f"| {q} | {t8} | {t32} | {ratio} |")
    Path(out_json).write_text(json.dumps(
        {"scale": "x10 (50k docs / 20k vecs)", "per_query": table}, indent=2
    ))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
