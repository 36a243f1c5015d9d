"""Document chunking: token-window passage splitting with overlap.

Training pipelines rarely feed whole documents; they feed fixed-budget
passages (context-window packing, retrieval corpora, embedding inputs).
This operator splits each doc's analyzer token stream into windows of
``max_tokens`` advancing by ``max_tokens - overlap``, keeping full
lineage (doc_id, chunk_id) so dedup/decontam verdicts made at doc level
propagate to chunks by join.

Scale shape: one ``posexplode`` over a per-row computed array — a pure
scan-stage generate, zero shuffles, linear output size. The chunk count
formula is closed-form (no loop): a doc of L tokens yields
``1 + ceil(max(L - max_tokens, 0) / stride)`` chunks, so the LAST chunk
is the only one shorter than ``max_tokens`` and no trailing chunk is a
strict subrange of its predecessor.

``chunk_text`` is the space-join of analyzer tokens — normalized text
(lowercased, punctuation folded), NOT a substring of the original; the
contract is token-budget fidelity, not byte fidelity, and it keeps the
operator engine-portable (the DuckDB oracle reproduces it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    shard_col: str | None = None,
    id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing: lay chunks end-to-end and cut packs of
    ``budget`` tokens (GPT-style packing — chunks may straddle a pack
    boundary; the (pack_id, offset) pair tells the loader exactly where
    each chunk's tokens land).

    Adds ``offset`` (token position of the chunk's first token in the
    concatenated stream), ``pack_id`` (= offset // budget, the pack the
    chunk STARTS in), and ``pack_offset`` (offset within that pack).

    Layout order is (doc_id, chunk_id) — deterministic and
    engine-portable. The running sum windows over ``shard_col`` when
    given (each shard packs independently — the scale path: shards are
    the export unit, so packing parallelism = shard count and no global
    sort exists). With ``shard_col=None`` the GLOBAL running sum is
    computed distributed, never on one reducer, via
    ``prefix.distributed_prefix`` (range-partition on the id order,
    parallel per-partition running sums, prefix offsets added back --
    the textbook two-stage parallel prefix sum; the helper pins the
    partition assignment with a lazy localCheckpoint, whose storage
    blocks live until the returned DataFrame is garbage-collected). A
    long-lived session packing many frames globally should prefer
    ``shard_col`` (the scale path -- no checkpoint at all) or drop
    references to finished results promptly.
    """
    order = [F.col(c).asc() for c in id_cols]
    if shard_col is not None:
        w = Window.partitionBy(shard_col).orderBy(*order)
        out = chunks.withColumn(
            "offset",
            (F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)).cast("long"),
        )
    else:
        from sparksearchengine_spark.operators.prefix import (
            distributed_prefix,
        )

        out = (
            distributed_prefix(
                chunks, order=order, sum_cols={n_tokens_col: "_cum"}
            )
            .withColumn(
                "offset",
                (F.col("_cum") - F.col(n_tokens_col)).cast("long"),
            )
            .drop("_cum")
        )
    return out.withColumn(
        "pack_id", (F.col("offset") / budget).cast("long")
    ).withColumn(
        "pack_offset", (F.col("offset") % budget).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 0,
    analyzer: str = "simple",
) -> DataFrame:
    """(id_col, chunk_id, n_tokens, chunk_text) — one row per chunk,
    chunk_id 0-based in document order. Empty/null docs yield no rows."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    stride = max_tokens - overlap
    toks = analyzer_expr(F.col(text_col), analyzer)
    with_toks = df.select(F.col(id_col), toks.alias("_toks")).where(
        F.size("_toks") > 0
    )
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.size("_toks") - max_tokens, F.lit(0))
        / F.lit(float(stride))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_toks"), i * stride + 1, max_tokens),
    )
    return (
        with_toks.select(
            id_col, F.posexplode(chunks).alias("chunk_id", "_ctoks")
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("_ctoks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "_ctoks").alias("chunk_text"),
        )
    )


def split_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """Sentence segmentation: one row per sentence with its 0-based
    position — ``(id_col, sent_idx, sentence)``. The RAG-chunking
    primitive below token windows: retrieval passages split on sentence
    boundaries keep answers intact where fixed token windows cut
    mid-claim.

    Boundary rule (deterministic, RE2/Java-portable — the same
    ``[.!?]`` class ``c4_filters`` counts sentences with): split AFTER
    a run of ``.!?`` that is followed by whitespace; trailing/leading
    whitespace trimmed; empties and fragments under ``min_chars``
    dropped. No abbreviation list — like the C4 rule set this trades
    "Mr. Smith" false splits for zero lookup state; at 100 TB the
    regex rides the scan (posexplode, no shuffle).

    RE2 (the oracle engine) has no lookbehind, so the boundary is
    marked with a capture-group rewrite to the \\x1e record separator
    and split on that — a literal \\x1e already in the text causes a
    spurious split (run ``clean_text`` first; it strips control chars).

    NULL text yields no rows (a doc with nothing to segment).
    """
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")
    # keep the terminator with its sentence: mark the boundary after
    # [.!?]+ (dropping the following whitespace), then split on the mark
    marked = F.regexp_replace(
        F.col(text_col), r"([.!?]+)\s+", "$1\x1e"
    )
    parts = F.split(marked, "\x1e")
    sents = F.filter(
        F.transform(parts, lambda s: F.trim(s)),
        lambda s: F.length(s) >= min_chars,
    )
    out = df.select(
        F.col(id_col), F.posexplode(sents).alias("sent_idx", "sentence")
    )
    return out
