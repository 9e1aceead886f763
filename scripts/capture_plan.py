"""Capture ``explain("formatted")`` for named queries to files.

The optimization-round deliverable: plans/r09/<query>_{before,after}.txt
hold the formatted physical plan the judge checks claims against.

Usage:
    python scripts/capture_plan.py --suffix before --out-dir plans/r09 \
        [--sf-dir DIR] q_name [q_name ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out-dir", default="plans/r09")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    from healthcare_etl_spark.plans.registry import get_queries
    from healthcare_etl_spark.session import get_spark

    spark = get_spark(app_name="capture-plan", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    import contextlib
    import io

    for name in args.queries:
        df = queries[name](spark, args.sf_dir)
        # public API only (ADVICE r9): explain("formatted") via stdout
        # capture survives Spark Connect and PySpark minor upgrades.
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(text, encoding="utf-8")
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
