"""Dump `.explain("formatted")` for named registry queries to files.

Usage:
    python scripts/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named query (default:
the bench.py HEADLINE set). Queries whose fn materializes to a local
relation (the `_localized` lifecycle rows) produce a LocalTableScan
plan — the note at the top of those files says so; their interesting
plans are the internal verb plans, captured separately where a change
touches them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airline_data_pipeline_spark.queries.suite import registry  # noqa: E402
from airline_data_pipeline_spark.session import get_spark  # noqa: E402


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if os.environ.get("SPARK_GRAFT_NO_REUSE"):
        # reconstruct the pre-r15 derive-per-side plans via the seam
        from airline_data_pipeline_spark.operators import dedup, similarity

        dedup._reuse = lambda df: df
        similarity._reuse = lambda df: df
    spark = get_spark("dump_plans")
    reg = registry()
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        text = plan_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n{text}\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
