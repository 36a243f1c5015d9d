"""Cache materialization helper — the stage-race guard (r10).

A persisted-but-not-yet-materialized DataFrame that is read by two or
more INDEPENDENT stages of one job is a race: the scheduler launches
ready stages concurrently, each stage finds cold cache partitions, and
each computes them from scratch — so the upstream pipeline runs once
PER BRANCH instead of once. Measured in r10 on the crawl path: a WARC
parse feeding ``domain_pagerank`` re-ran 1-3x per invocation depending
on stage timing (the 16 vs 48 s bench multiples), and the same class
was then found in the dedup gram tables, the phrase compiler's scored
postings, the spelling lattice, and the percolator registry.

:func:`materialize` is persist + ONE deterministic pass, so every later
read — same job or later — is a cache hit. Use it when the persisted
frame's FIRST consumer fans out into multiple plan branches; skip it
when the first consumer is a single-chain action (that action
materializes the cache for free — e.g. ``classification_metrics``'
totals collect, ``classifier_fit``'s n-count, ``dsir``'s sum collects).

The count costs one extra job over data the caller is about to read
anyway, and the cache boundary already blocks filter pushdown below it,
so nothing is lost that ``persist()`` had not already given up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["materialize", "ensure_checkpoint_dir", "make_pin"]


def materialize(df: DataFrame) -> DataFrame:
    """persist + one deterministic materialization pass (see module
    docstring for when this is required instead of bare persist)."""
    df = df.persist()
    df.count()
    return df


def ensure_checkpoint_dir(spark: SparkSession, path: str) -> str:
    """Set the session's reliable-checkpoint directory if none is set;
    return the effective directory (r11 verdict #5 — the cluster
    deployment surface for pinned frames).

    Why this matters: the iterative operators (``pagerank``, ``hits``,
    ``weakly_connected_components``) and the probe pin in
    ``rank_pages`` truncate lineage with ``_make_pin``, which uses a
    RELIABLE checkpoint (survives executor loss) only when the session
    has a checkpoint dir — otherwise it falls back to
    ``localCheckpoint``, whose blocks live in executor storage and die
    with a decommissioned executor, with a truncated plan that CANNOT
    recompute them. Fine on a single node; a latent job-killer on a
    dynamic-allocation cluster. Call this once at session setup with a
    fault-tolerant path (HDFS/object store) before running the graph
    operators.

    Lifecycle caveat (r11 ADVICE): reliable checkpoint files are
    auto-deleted on GC of the checkpointed plan ONLY when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — a conf
    that must be set BEFORE the SparkContext starts (the
    ContextCleaner reads it at construction) and defaults to false, in
    which case every pinned frame leaves files under the checkpoint
    dir until the dir itself is cleaned. Long-running sessions that
    call the graph operators repeatedly should either enable that conf
    at launch or point the dir at a location with TTL/lifecycle rules.

    An already-configured dir is NEVER overridden (the caller's
    cluster setup wins); the existing dir is returned instead.
    """
    sc = spark.sparkContext
    current = sc.getCheckpointDir()
    if current is not None:
        return current
    sc.setCheckpointDir(path)
    got = sc.getCheckpointDir()
    if got is None:  # pragma: no cover - defensive
        raise RuntimeError(f"setCheckpointDir({path!r}) did not stick")
    return got


_warned_no_ckpt_dir = False


def make_pin(spark: SparkSession):
    """Per-iteration / pre-probe lineage-truncation factory: reliable
    checkpoint when the session has a checkpoint dir (survives executor
    loss — the right choice for a 1000-executor run), else
    localCheckpoint (executor storage; fine for single-node and short
    jobs). THE pin rule for every iterative operator (pagerank, hits,
    weakly_connected_components, dedup connected components) and for
    pre-probe pins whose blocks the RETURNED lazy frame reads
    (rank_pages).

    The localCheckpoint fallback is LOUD (one RuntimeWarning per
    process): on the fallback path the pinned blocks die with a
    decommissioned executor and — the plan being truncated — cannot be
    recomputed. Cluster deployments call :func:`ensure_checkpoint_dir`
    at session setup (r11 verdict #5).

    Lifecycle (r11 ADVICE): the localCheckpoint branch's blocks are
    ContextCleaner-freed when the result drops; the RELIABLE branch's
    files are auto-deleted only under
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (set
    before SparkContext start; default false) — otherwise repeated
    graph-operator calls accumulate files under the checkpoint dir.
    See :func:`ensure_checkpoint_dir` for the deployment guidance.
    """
    has_ckpt_dir = spark.sparkContext.getCheckpointDir() is not None
    if not has_ckpt_dir:
        global _warned_no_ckpt_dir
        if not _warned_no_ckpt_dir:
            _warned_no_ckpt_dir = True
            import warnings

            warnings.warn(
                "no Spark checkpoint dir is set: iterative-operator "
                "pins (pagerank / weakly_connected_components / "
                "connected_components / rank_pages) fall back to "
                "localCheckpoint, whose blocks die with a "
                "decommissioned executor and cannot be recomputed — "
                "fine on a single node, a job-killer under dynamic "
                "allocation. Call ensure_checkpoint_dir(spark, "
                "'<fault-tolerant path>') at session setup for cluster "
                "runs. (Warned once per process.)",
                RuntimeWarning,
                stacklevel=3,
            )

    def _pin(frame: DataFrame, eager: bool = True) -> DataFrame:
        # ``eager=False`` (r12): the pin materializes with the NEXT
        # action that consumes the frame instead of paying its own job —
        # right for in-loop pins whose very next step is an action over
        # the pinned frame anyway (pagerank's per-iteration contribs
        # aggregate), halving the loop's job count. Only honored on the
        # localCheckpoint branch: a lazy RELIABLE checkpoint recomputes
        # the frame a second time to write the checkpoint files (the
        # classic uncached-rdd.checkpoint() double-compute), so with a
        # checkpoint dir set the pin stays eager — correctness-first on
        # the cluster path, the job saving is a single-node economics.
        if has_ckpt_dir:
            return frame.checkpoint(eager=True)
        return frame.localCheckpoint(eager=eager)

    return _pin
