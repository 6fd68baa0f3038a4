"""Pre-flight for the driver's CORRECTNESS gate: run the EXACT driver
protocol (Spark query vs DuckDB oracle at sf0.01 — rows, schema,
value-hash) over the 50-row _CHECKED_WINDOW before the round closes,
so a rotation typo or an sf0.01-only divergence is caught in-session
instead of as a red driver row. The full parity suite
(tests/test_oracle_parity.py) covers all 179 queries at sf0.001;
this covers the window at the driver's SF.

Usage: python scripts/check_window_sf001.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from oracle_harness import compare, duckdb_connection

    from airline_data_pipeline_spark.queries.suite import (
        _CHECKED_WINDOW,
        registry,
    )
    from airline_data_pipeline_spark.session import get_spark

    spark = get_spark("window_check")
    reg = registry()
    con = duckdb_connection(sf_dir)
    failures: dict[str, str] = {}
    for name in _CHECKED_WINDOW:
        qd = reg[name]
        t0 = time.monotonic()
        try:
            if qd.oracle is None:
                # mirror test_oracle_parity's vacuity discipline: a
                # rows-only query returning 0 rows is a red flag, not
                # a pass (currently unreachable — every registry row
                # has an oracle — but the first rows-only window entry
                # must not get a green preflight on a vacuous result)
                n = qd.fn(spark, sf_dir).count()
                status = f"rows-only ({n} rows)"
                if n == 0:
                    failures[name] = "rows-only query returned 0 rows"
            else:
                ok, msg = compare(qd.fn(spark, sf_dir), con, qd.oracle)
                status = "MATCH" if ok else f"MISMATCH {msg}"
                if not ok:
                    failures[name] = msg
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            status = f"ERROR {type(exc).__name__}: {exc}"[:300]
            failures[name] = status
        print(f"{name}: {status} [{time.monotonic() - t0:.1f}s]", flush=True)
    print(f"\n{len(_CHECKED_WINDOW) - len(failures)}/{len(_CHECKED_WINDOW)} ok")
    if failures:
        print("FAILURES:", failures)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
