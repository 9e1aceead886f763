"""Build-time execution audit: for EVERY registered query, how long does
*constructing* the DataFrame take, and does the resulting plan carry
materialized subtrees (``Scan ExistingRDD`` = an eager localCheckpoint
executed at plan build)?

The r9 verdict flagged the "build-time-execution" class (a corpus-sized
job hidden inside DataFrame construction — q_decontaminate was the last
offender). This sweep makes the class measurable across the whole
surface: any query whose build runs seconds of work at sf0.1 either is
a driver-coordinated iterative algorithm (BPE, IRLS, greedy selection —
the build IS the computation, adjudicated), or an adjudicated
multi-consumer eager checkpoint, or a bug.

Usage:
    python scripts/build_audit.py [sf_dir] [out_json]
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "plans/r10/build_time_jobs_audit.json"

    from healthcare_etl_spark.plans.registry import get_queries
    from healthcare_etl_spark.session import get_spark

    spark = get_spark(app_name="build-audit", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    rows: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(sorted(qs)):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            build_s = round(time.perf_counter() - t0, 3)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            rows[name] = {
                "build_s": build_s,
                "n_rdd_scans": plan.count("Scan ExistingRDD"),
            }
        except Exception as exc:  # pragma: no cover - audit robustness
            rows[name] = {
                "build_s": round(time.perf_counter() - t0, 3),
                "error": f"{type(exc).__name__}: {exc}"[:200],
            }
        if (i + 1) % 50 == 0:
            print(f"# {i + 1}/{len(qs)} ({time.time() - t_start:.0f}s)", flush=True)
        # Release checkpointed blocks between queries (same hygiene as
        # bench.py / full_sweep.py, else the long-lived JVM accumulates).
        spark.catalog.clearCache()

    slow = sorted(rows.items(), key=lambda kv: -kv[1]["build_s"])[:30]
    print("slowest builds (s · ExistingRDD scans · query):")
    for name, r in slow:
        print(f"  {r['build_s']:7.3f}  {r.get('n_rdd_scans', '?'):>3}  {name}")
    total = round(sum(r["build_s"] for r in rows.values()), 1)
    n_ckpt = sum(1 for r in rows.values() if r.get("n_rdd_scans"))
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(rows),
        "n_with_rdd_scans": n_ckpt,
        "total_build_s": total,
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(summary))
    Path(out_json).write_text(json.dumps({"summary": summary, "rows": rows}, indent=1))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
