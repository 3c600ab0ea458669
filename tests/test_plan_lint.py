"""Battery-wide plan lint: every declared query's physical plan is swept
for scale anti-patterns, with an exact allowlist per pattern.

The per-query pins in test_plans.py assert that specific queries keep
their intended shapes; this lint is the complement - a fence around the
WHOLE battery, so a new or edited query that introduces a cartesian
product, a partition-less window, or a single-partition exchange fails
here until its boundedness argument is written down in the allowlist.
(The allowlists are not exemptions from scrutiny: each entry carries the
reason the shape is bounded at 100 TB.)

Signals and why they matter at scale:
  - CartesianProduct: |A| x |B| work; never acceptable over corpus-sized
    inputs. (Broadcast 1-row/K-row crossJoins plan as
    BroadcastNestedLoopJoin, which is fine and not linted.)
  - Partition-less Window (windowspecdefinition with no partition
    columns): funnels every input row through ONE task - the
    graph_pagerank top-k defect VERDICT r11 found. Acceptable only over
    provably bounded inputs.
  - Exchange SinglePartition: fine below a partial aggregate (the merge
    sees one row per map partition) or over bounded frames, which is
    every current occurrence; the allowlist pins exactly where.
"""

import re

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()

# Partition-less windows, each over a bounded frame:
#   graph_pagerank       - rank over the 20-row TakeOrderedAndProject
#                          result (test_plans pins the Window sits above
#                          the TakeOrdered)
#   pipe_mixture_schedule - Hamilton remainder ranking over K = #domains
#                          rows (bounded by the domain vocabulary, never
#                          the corpus - same argument as the codebook
#                          collects)
GLOBAL_WINDOW_OK = {"graph_pagerank", "pipe_mixture_schedule"}

# Exchange SinglePartition sites, all one of:
#   (a) the merge step of a partially-aggregated global aggregate (input
#       = one row per map partition): q8, q19, scale_colstats, sim_mips
#       (global max-norm), sim_pca_gram, text_domain_shift, text_lm_score,
#       text_keywords, text_collocations (corpus-level totals),
#       pipe_temperature_mix, pipe_funnel, events_funnel_seq,
#       events_scaffold (stage-total scalars)
#   (b) a bounded-frame sort: pipe_mixture_schedule (K domain rows),
#       pipe_curriculum (per-partition count vector, bounded by
#       #partitions - operators/rank.py)
SINGLE_PARTITION_OK = {
    "events_funnel_seq",
    "events_scaffold",
    "pipe_curriculum",
    "pipe_funnel",
    "pipe_mixture_schedule",
    "pipe_temperature_mix",
    "q8",
    "q19",
    "scale_colstats",
    "sim_mips",
    "sim_pca_gram",
    "text_collocations",
    "text_domain_shift",
    "text_keywords",
    "text_lm_score",
}

# No declared query may plan a CartesianProduct, ever. (The bounded
# n_files^2 certificate in operators/compact.py rides a broadcast
# nested-loop join, not a cartesian.)
CARTESIAN_OK: set = set()


def _global_window(plan: str) -> bool:
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0].strip()
        if " ASC" in first or " DESC" in first:
            return True
    return False


@pytest.mark.parametrize("name", sorted(QUERIES, key=lambda n: (len(n), n)))
def test_plan_has_no_unexplained_scale_antipattern(name, spark):
    plan = (
        QUERIES[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    if "CartesianProduct" in plan and name not in CARTESIAN_OK:
        pytest.fail(f"{name}: CartesianProduct in plan")
    if _global_window(plan) and name not in GLOBAL_WINDOW_OK:
        pytest.fail(
            f"{name}: partition-less Window over un-allowlisted input "
            "(add to GLOBAL_WINDOW_OK only with a boundedness argument)"
        )
    if "Exchange SinglePartition" in plan and name not in SINGLE_PARTITION_OK:
        pytest.fail(
            f"{name}: Exchange SinglePartition outside the allowlist "
            "(fine below a partial agg or over a bounded frame - say which)"
        )
