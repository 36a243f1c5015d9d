"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` via DuckDB. The comparison deliberately mirrors
the DRIVER's canonicalization path (VERDICT r4 #2), not exact Python
values: both sides go through pandas dataframes (``DataFrame.toPandas()``
on the Spark side, ``con.execute(...).df()`` on the DuckDB side), columns
are sorted by name, rows are sorted by all columns, and cells are
stringified dtype-aware. This is what makes selfcheck PREDICT the
driver's hash check: a DuckDB HUGEINT (bare ``sum(...)``) becomes
float64 ``"99111.0"`` in pandas while Spark's bigint stays int64
``"99111"`` — an exact-value compare would call that equal; the driver
does not, and now neither do we.

Array/map/struct-typed result columns are rejected loudly for any
oracle-backed query: the driver's ``_canon`` crashes on unhashable list
cells (``pandas.sort_values``), so such a query can never earn a green
driver row — posexplode it in the wrapper instead.

Queries without an oracle get a rows-only check (>= 0 rows, stable
schema).

Usage: python3 selfcheck.py [sf_dir] [query_name ...]
       python3 selfcheck.py --queue [sf_dir]

``--queue`` runs exactly the CURRENT ROTATION QUEUE — registry slots
31-50, the entries the next driver run will check for the first time —
so pre-driver validation of the rotation is one command and its green
list can land in COVERAGE verbatim (VERDICT r6 #8).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _cell(v):
    """Dtype-aware stringification of one pandas cell.

    int64 and float64 stringify differently on purpose (``7`` vs
    ``7.0``) — that asymmetry is exactly the driver-hash failure mode
    this mirror exists to catch.
    """
    if v is None:
        return "<NULL>"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(
            f"unhashable {type(v).__name__} cell — the driver's _canon "
            "crashes on array/map columns; posexplode in the wrapper"
        )
    try:
        if v != v:  # pandas NaT / Decimal NaN
            return "NaN"
    except Exception:
        pass
    return str(v)


def _canon(pdf):
    """Mirror the driver: sort columns by name, rows by all columns,
    then stringify every cell dtype-aware. Returns a list of tuples."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(
            drop=True
        )
    return [
        tuple(_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def _complex_cols(sdf):
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def main() -> int:
    args = sys.argv[1:]
    queue_mode = "--queue" in args
    if queue_mode:
        args = [a for a in args if a != "--queue"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # local-mode hardening (see tests/conftest.py): a block-removal
        # failure makes BlockManagerMasterEndpoint look up the
        # never-registered CoarseGrainedScheduler endpoint for the full
        # lookup timeout (120s default) per retry; in a ~30-min
        # single-JVM sweep that can starve the ask pool until executor
        # heartbeats fail and the context dies. Failing the lookup fast
        # loses nothing (it can never succeed in local mode).
        .config("spark.rpc.lookupTimeout", "10s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entry

    qs = entry.queries()
    if queue_mode:
        # the rotation queue = registry slots 31-50 (slots 1-30 are the
        # pinned qc suite; the driver checks the first 50 keys)
        only = set(list(qs)[30:50])
        print(f"rotation queue ({len(only)}): {sorted(only)}\n")
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            bad = _complex_cols(sdf)
            if bad and name in oracles:
                raise TypeError(
                    f"array/map/struct result column(s) {bad}: the "
                    "driver's _canon cannot hash these — posexplode or "
                    "stringify in the wrapper"
                )
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"PASS {name} (rows-only): {len(spdf)} rows, "
                f"cols={sorted(spdf.columns)} [{time.time()-t0:.1f}s]"
            )
            n_pass += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} "
                f"oracle={sorted(opdf.columns)}"
            )
        if not problems:
            try:
                srows, orows = _canon(spdf), _canon(opdf)
            except TypeError as e:
                srows, orows = None, None
                problems.append(f"canon error (driver would err): {e}")
            if srows is not None and srows != orows:
                diff = [
                    (s, o)
                    for s, o in zip(srows, orows)
                    if s != o
                ][:3]
                problems.append(f"canon values differ; first diffs={diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spdf)} rows match [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
