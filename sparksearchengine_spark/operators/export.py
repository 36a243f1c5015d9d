"""Deterministic shard export for training-data delivery.

The last stage of a curation pipeline writes the corpus as a fixed set of
shards a training job can stream (shard = unit of shuffling/checkpointing
in the data loader). Requirements at 100 TB:

* **Deterministic assignment** — shard(doc) is a pure function of the doc
  key (md5 bucket, same idiom as ``operators/sampling.py``): re-running
  the export, or re-running only failed partitions, reproduces byte-stable
  membership. ``repartition(n, key)``'s hashpartitioning would *also* be
  deterministic, but opaque to other engines — the md5 bucket is the
  portable contract (the DuckDB oracle mirrors it exactly).
* **One shuffle** — a single ``repartition(shard)`` colocates each shard
  into one task; ``sortWithinPartitions(key)`` makes file contents
  byte-ordered without a global sort.
* **Bounded files** — ``maxRecordsPerFile`` caps file size inside a shard
  (Spark splits automatically); shards stay addressable via the
  ``shard=N`` partition directory.

``shard_assignments`` is the pure/lazy half (testable, oracle-able);
``export_shards`` performs the write; ``shard_manifest`` reads the result
back into the (shard, files, rows) accounting a loader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.sampling import hash_bucket


def _seeded_key(key_col: str, shuffle_seed: int, seed_hash: str):
    """The seeded shuffle key as a Column: ``xxhash64(seed, key)``
    (fast, JVM-side, but engine-specific), or the PORTABLE md5 fold
    ``'{seed}:{key}'`` — other engines (the DuckDB oracle included) can
    reproduce the md5 path byte-for-byte, so it is the cross-engine
    contract; xxhash64 stays the default for speed.

    NULL keys: both md5 paths (seeded and unseeded) yield a NULL shard
    — NULL-key rows are visibly unassigned, never silently bucketed.
    The xxhash64 path differs by Spark semantics (hash functions SKIP
    null arguments, so ``xxhash64(seed, NULL) == xxhash64(seed)``, a
    constant): NULL keys all land in one valid shard. Pinned in
    ``tests/test_export.py``; pass non-null keys if the distinction
    matters."""
    if seed_hash == "xxhash64":
        return F.xxhash64(F.lit(int(shuffle_seed)), F.col(key_col))
    if seed_hash == "md5":
        # F.concat (not concat_ws): a NULL key must yield a NULL seeded
        # key, matching the unseeded md5(NULL) -> NULL path and the
        # DuckDB '{seed}:' || NULL -> NULL oracle — concat_ws SKIPS
        # NULLs and would hash every NULL-key row into the one shard of
        # the constant '{seed}' string (r10 ADVICE; the xxhash64 path
        # keeps Spark's skip-null semantics, see docstring).
        return F.concat(
            F.lit(f"{int(shuffle_seed)}:"),
            F.col(key_col).cast("string"),
        )
    raise ValueError(
        f"seed_hash must be 'xxhash64' or 'md5', got {seed_hash!r}"
    )


def shard_assignments(
    df: DataFrame,
    key_col: str = "doc_id",
    num_shards: int = 64,
    shard_col: str = "shard",
    shuffle_seed: int | None = None,
    seed_hash: str = "xxhash64",
) -> DataFrame:
    """df + a deterministic ``shard`` column in [0, num_shards).

    With ``shuffle_seed`` set, membership follows a seeded hash of the
    key instead of the bare key — the epoch-shuffle contract (see
    :func:`export_shards`). ``seed_hash`` picks the seeded function:
    ``xxhash64(seed, key)`` (default, fastest) or ``md5`` of
    ``'{seed}:{key}'`` — the portable form any engine can replicate
    (the md5-bucket idiom the unseeded path already uses, with the
    seed folded into the key string)."""
    key = (
        _seeded_key(key_col, shuffle_seed, seed_hash)
        if shuffle_seed is not None
        else F.col(key_col)
    )
    return df.withColumn(shard_col, hash_bucket(key, num_shards))


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    num_shards: int = 64,
    max_records_per_file: int | None = None,
    file_format: str = "parquet",
    shuffle_seed: int | None = None,
    seed_hash: str = "xxhash64",
) -> None:
    """Write ``df`` as ``path/shard=N/...`` with deterministic membership
    and within-file ordering by ``key_col``.

    ``partitionBy`` gives the shard-addressable layout; the explicit
    ``repartition(num_shards, shard)`` before it keeps the write at one
    task per shard instead of every task appending to every shard dir
    (the small-files failure mode of naive partitionBy at scale).

    ``shuffle_seed`` — epoch-shuffled training order: shard membership
    AND within-shard order follow ``xxhash64(seed, key)``, so reading
    shard 0..N-1 in file order yields a deterministic pseudo-random
    permutation of the corpus — a different one per seed, the same one
    on every re-run of a seed. This is the standard per-epoch global
    shuffle WITHOUT a global sort: the permutation is realized by the
    same one-shuffle-per-export plan (hash bucketing is the shuffle;
    ``sortWithinPartitions`` orders each shard independently).
    ``seed_hash='md5'`` makes membership AND order portable across
    engines (see :func:`shard_assignments`); within-shard order then
    follows the md5 hex of the seeded key."""
    out = shard_assignments(
        df, key_col, num_shards,
        shuffle_seed=shuffle_seed, seed_hash=seed_hash,
    )
    if shuffle_seed is not None:
        k = _seeded_key(key_col, shuffle_seed, seed_hash)
        order = k if seed_hash == "xxhash64" else F.md5(k)
    else:
        order = F.col(key_col)
    out = out.repartition(num_shards, F.col("shard")).sortWithinPartitions(
        F.col("shard"), order, F.col(key_col)
    )
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.format(file_format).save(path)


def shard_manifest(
    spark: SparkSession, path: str, file_format: str = "parquet"
) -> DataFrame:
    """(shard, n_files, n_rows) accounting of an exported layout, from the
    data itself (partition-discovery column + input_file_name). Pass the
    same ``file_format`` the export used — a json export cannot be
    manifested through a parquet read (r3 review)."""
    df = spark.read.format(file_format).load(path)
    return (
        df.select(
            F.col("shard").cast("long").alias("shard"),
            F.input_file_name().alias("_f"),
        )
        .groupBy("shard")
        .agg(
            F.count_distinct("_f").cast("long").alias("n_files"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
