"""Capture ``explain("formatted")`` for declared registry queries.

Usage:
    python tools/capture_plans.py <out_dir> <suffix> [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` for each named registry query
(default: every query), built at sf0.01 (plan shape is scale-free; the
driver benches at sf0.1 but the physical plan is what we document).
The optimization judge checks plan claims in OPTIMIZATION_r12.md
against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = list(qs)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            text = explain_str(df)
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building {name}: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
