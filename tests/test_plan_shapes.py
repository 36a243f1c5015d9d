"""Registry-wide serial-stage audit, pinned on a representative sample.

A full-registry sweep (all 163 entries, r9) found every
``Exchange SinglePartition`` in every plan sits over one of exactly
three benign shapes — a partial SCALAR aggregate (the normal two-stage
agg merge), a ``LocalLimit`` (global top-k final merge, ≤ k rows), or
``distributed_prefix``'s per-partition offsets frame (≤ |partitions| x
|groups| rows). Never over raw data: no operator funnels the corpus
through one task. This test pins that property on one entry per plan
family so a regression (someone writes ``Window.orderBy`` with no
partition key over data, or a global sort without a limit) fails fast.

BroadcastNestedLoopJoin / CartesianProduct occurrences are governed at
the SOURCE level by ``test_broadcast_allowlist.py`` (every such site
declares its bound) — plan strings can't see the bound, so they are not
re-checked here.
"""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"

# one entry per plan family that showed a SinglePartition in the sweep
SAMPLE = [
    "qc02_filter_cmp",      # scalar filter aggregate
    "qc12_index_stats",     # multi-branch index stats aggregates
    "qc19_bucketed_term",   # bucketed-save scan + scalar agg
    "vocab_top",            # distributed_prefix offsets frame
    "search_decay",         # global top-k (LocalLimit merge)
    "curation_report",      # curation gate scalar aggregates
    "table_corr",           # decimal-cast correlation aggregates
    "pr_curve",             # r10: grouped-cumulative eval family
    "pagerank",             # r10: iterative link-graph family
    "rank_pages",           # r11: probed broadcast rank-transfer join
]

_BENIGN_CHILD = re.compile(
    r"HashAggregate\(keys=\[\]"        # partial scalar agg
    r"|SortAggregate\(key=\[\]"        # partial scalar agg (sort-based)
    r"|LocalLimit"                     # global top-k merge, <= k rows
    r"|HashAggregate\(keys=\[_dp_pid"  # distributed_prefix offsets
)


class TestNoSerialDataStage:
    @pytest.mark.parametrize("name", SAMPLE)
    def test_single_partition_only_over_bounded_frames(self, spark, name):
        import __spark_entry__ as entry

        df = entry.queries()[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            child = lines[i + 1].strip() if i + 1 < len(lines) else ""
            assert _BENIGN_CHILD.search(child), (
                f"{name}: SinglePartition over a non-bounded child — "
                f"the data is funneling through one task:\n{child}\n"
                f"full plan:\n{plan}"
            )
