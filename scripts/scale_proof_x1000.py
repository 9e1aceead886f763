"""x1000 candidate-stage scale proof (r8 verdict task 6).

The r8 proof took the dedup flagships END-TO-END at x100 (500 k docs)
and found the df²-growth kill there. This pushes the CANDIDATE stages —
banded MinHash-LSH and prefix-filter — one more decade to x1000 (5 M
docs), where inverted-index document-frequency skew compounds: the claim
under test is that candidate pair counts stay LINEAR in corpus size
through a fourth decade (each synthetic doc belongs to a bounded dup
cluster, so true pairs are linear; a superlinear candidate count would
mean the banding/prefix math is silently degrading into a quadratic
blow-up that 100 TB would amplify).

Also sweeps the dedup family's plans against the x1000 directory for the
fleet invariants (no CartesianProduct, no row-Python) — skew only
changes AQE's runtime choices, but a static-planner flip at this scale
would be a new offender class.

Usage: python scripts/scale_proof_x1000.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_SF = "/root/testdata/sf0.1"
WORK = os.environ.get("SCALE_PROOF_DIR", "/tmp/scale_proof")


def main() -> None:
    from healthcare_etl_spark.plans.registry import get_registry
    from healthcare_etl_spark.session import get_spark
    from healthcare_etl_spark.sources.synthetic import write_scale_corpus

    os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dspark.ui.showConsoleProgress=false")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name="scale-proof-x1000", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")

    # x100 is regenerated (not reused from a stale dir) so both decades
    # come from the same generator version; x1000 scales docs only —
    # the candidate stages read documents.parquet alone.
    dirs = {"x100": f"{WORK}/x100", "x1000": f"{WORK}/x1000"}
    gen_secs = {}
    t0 = time.perf_counter()
    write_scale_corpus(spark, dirs["x100"], n_docs=500_000, n_vecs=2_000, n_partitions=128)
    gen_secs["x100"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    write_scale_corpus(
        spark, dirs["x1000"], n_docs=5_000_000, n_vecs=2_000, n_partitions=256
    )
    gen_secs["x1000"] = round(time.perf_counter() - t0, 1)
    print(f"# generated: {gen_secs}", flush=True)

    from healthcare_etl_spark.operators.dedup import (
        hashed_shingle_rows,
        lsh_candidate_pairs,
        minhash_band_frame,
        prefix_filter_candidates,
    )

    def _release() -> None:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    stages = {
        "minhash_candidates": lambda docs: lsh_candidate_pairs(
            minhash_band_frame(docs)
        ),
        "prefix_filter_candidates": lambda docs: prefix_filter_candidates(
            hashed_shingle_rows(docs)
        ),
    }
    out: dict[str, dict] = {"gen_secs": gen_secs, "stages": {}}
    for sname, build in stages.items():
        row: dict[str, dict] = {}
        for tag in ("x100", "x1000"):
            docs = spark.read.parquet(f"{dirs[tag]}/documents.parquet")
            t0 = time.perf_counter()
            n = build(docs).count()
            secs = time.perf_counter() - t0
            row[tag] = {"sec": round(secs, 2), "pairs": n}
            _release()
            print(f"# {sname} {tag}: {secs:.2f}s, {n} pairs", flush=True)
        pairs_growth = (
            row["x1000"]["pairs"] / row["x100"]["pairs"]
            if row["x100"]["pairs"]
            else None
        )
        row["pairs_growth_per_decade"] = round(pairs_growth, 3) if pairs_growth else None
        row["time_growth_per_decade"] = round(
            row["x1000"]["sec"] / row["x100"]["sec"], 2
        )
        out["stages"][sname] = row

    # Dedup-family plan sweep at x1000: static-planner invariants.
    reg = get_registry()
    offenders: dict[str, list[str]] = {}
    swept = 0
    for name, q in sorted(reg.items()):
        if "dedup" not in name or name.startswith("q_stream"):
            continue  # streaming jobs need a sink; covered by their own tests
        _release()
        try:
            plan = q.fn(spark, dirs["x1000"])._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - report, don't die
            offenders[name] = [f"BUILD_ERROR {type(exc).__name__}"]
            continue
        swept += 1
        hits = [f for f in ("CartesianProduct", "BatchEvalPython") if f in plan]
        if hits:
            offenders[name] = hits
    out["sweep_plans"] = swept
    out["sweep_offenders"] = offenders
    print(f"# dedup plan sweep at x1000: {swept} plans, {len(offenders)} offenders", flush=True)
    print(json.dumps(out))
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
