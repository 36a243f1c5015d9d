"""sparksearchengine_spark — a PySpark-native full-text search & data-processing engine.

A from-scratch re-expression of the capabilities of the reference
`agile-lab-dev/sparksearchengine` (Scala, Spark 1.6 + embedded Lucene) on
modern Spark DataFrames: instead of per-partition Lucene inverted indexes,
the "index" is a set of ordinary DataFrames (postings / doclen / termstats)
that Catalyst can optimize, persist, broadcast and shuffle like any other
relation. Queries are small Python ASTs compiled to DataFrame plans; scoring
(BM25 / TF-IDF) is a plain column expression with corpus-global statistics
(the reference's "global IDF" mode, which it documents as the more correct
variant — reference SearchableRDD.scala:22-27).

Public surface:

    from sparksearchengine_spark import Corpus, TextOptions, Q, F_

    corpus = Corpus(df, id_col="doc_id",
                    text_cols={"text": TextOptions(analyzer="simple")})
    index  = corpus.build_index()
    hits   = index.search(Q.field("text").match_any("island", "sea"), k=10)
    top    = index.aggregating_search(q, k=10)          # driver-side list
    joined = index.query_join(other_df, text_col="query_text", k=5)
"""

from sparksearchengine_spark.functions.analyzers import (
    TextOptions,
    analyzer_expr,
    get_analyzer,
    register_analyzer,
    tokenize_py,
)
from sparksearchengine_spark.plans.ast import F_, Q, Query
from sparksearchengine_spark.plans.serde import query_from_json, query_to_json
from sparksearchengine_spark.operators.cache import ensure_checkpoint_dir
from sparksearchengine_spark.operators.index import (
    Corpus,
    SearchIndex,
    merge_indexes,
    upsert_index,
)

__all__ = [
    "Corpus",
    "ensure_checkpoint_dir",
    "SearchIndex",
    "TextOptions",
    "Q",
    "F_",
    "Query",
    "analyzer_expr",
    "get_analyzer",
    "register_analyzer",
    "tokenize_py",
    "merge_indexes",
    "upsert_index",
    "query_from_json",
    "query_to_json",
]

__version__ = "0.4.0"
