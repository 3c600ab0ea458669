"""Battery-wide plan lint: every declared query's physical plan is swept
for scale anti-patterns, with an exact allowlist per pattern.

The per-query pins in test_plans.py assert that specific queries keep
their intended shapes; this lint is the complement - a fence around the
WHOLE battery, so a new or edited query that introduces a cartesian
product, a partition-less window, or a single-partition exchange fails
here until its boundedness argument is written down in the allowlist.
(The allowlists are not exemptions from scrutiny: each entry carries the
reason the shape is bounded at 100 TB, and the allowance is an exact
OCCURRENCE COUNT - an allowlisted query that grows a second instance of
the same pattern fails again.)

Signals and why they matter at scale:
  - CartesianProduct: |A| x |B| work; never acceptable over corpus-sized
    inputs. (Broadcast 1-row/K-row crossJoins plan as
    BroadcastNestedLoopJoin, which is fine and not linted.)
  - Partition-less Window (windowspecdefinition with no partition
    columns - ordered or not): funnels every input row through ONE
    task - the graph_pagerank top-k defect VERDICT r11 found.
    Acceptable only over provably bounded inputs.
  - Exchange SinglePartition: fine below a partial aggregate (the merge
    sees one row per map partition) or over bounded frames, which is
    every current occurrence; the allowlist pins exactly where.
"""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.test_plans import _plan

QUERIES = entry_mod.queries()

# name -> allowed count of partition-less windowspecdefinitions, each
# over a bounded frame:
#   graph_pagerank       - rank over the 20-row TakeOrderedAndProject
#                          result (test_plans pins the Window sits above
#                          the TakeOrdered)
#   pipe_mixture_schedule - Hamilton remainder ranking over K = #domains
#                          rows (bounded by the domain vocabulary, never
#                          the corpus - same argument as the codebook
#                          collects)
#   sim_hybrid_rrf       - lexical-leg rank over the HYBRID_TOPK(=20)-row
#                          TakeOrderedAndProject result (the graph_pagerank
#                          argument verbatim; the corpus-sized work is the
#                          two upstream legs, both single-pass reductions)
GLOBAL_WINDOW_OK = {
    "graph_pagerank": 1,
    "pipe_mixture_schedule": 1,
    "sim_hybrid_rrf": 1,
}

# name -> allowed count of Exchange SinglePartition sites, all one of:
#   (a) the merge step of a partially-aggregated global aggregate (input
#       = one row per map partition): q8, q19, scale_colstats, sim_mips
#       (global max-norm), sim_pca_gram, text_domain_shift, text_lm_score,
#       text_keywords, text_collocations (two corpus-total scalars),
#       pipe_temperature_mix (corpus total + weight normalizer),
#       pipe_funnel (one survivor-count scalar per funnel stage, 6),
#       events_funnel_seq (one scalar per funnel step, 3),
#       events_scaffold (stage-total scalar)
#   (b) a bounded-frame sort or its feeding scalar: pipe_mixture_schedule
#       (corpus total + leftover scalar + the K-domain-row remainder
#       ranking, K bounded by the domain vocabulary), pipe_curriculum
#       (per-partition count vector, bounded by #partitions -
#       operators/rank.py)
SINGLE_PARTITION_OK = {
    "events_funnel_seq": 3,
    "events_scaffold": 1,
    "pipe_curriculum": 1,
    "pipe_funnel": 6,
    "pipe_mixture_schedule": 4,
    "pipe_temperature_mix": 2,
    "q8": 1,
    "q19": 1,
    "scale_colstats": 1,
    "sim_mips": 1,
    "sim_pca_gram": 1,
    "text_collocations": 2,
    "text_domain_shift": 1,
    # NB family: the vocabulary-size scalar V (count_distinct over the
    # min_count-filtered model - merge sees one row per map partition;
    # case (a)). classify/eval inherit the same single scalar through
    # the broadcast model subtree.
    # pipe_dsir: the (tt, tr) corpus-total scalar pair - one merge over
    # the 256-row bucket-count aggregate (bounded by construction; the
    # DSIR hashing trick's whole point). Case (a)+(b).
    "pipe_dsir": 1,
    "text_nb_train": 1,
    "text_nb_classify": 1,
    "text_nb_eval": 1,
    # the trained curation funnel (r16): the stage counts land in ONE
    # labeled-union keyed aggregation (_funnel_report), so the plan has
    # ZERO single-partition exchanges - the NB scalar V and the LM
    # scalar V sit under the partial-agg class already allowlisted for
    # text_nb_classify / text_lm_score and are consumed via broadcast
    # before the count job runs. No entry needed; kept here as the
    # record of the r15->r16 change (was 8 scalar merges).
    "text_keywords": 1,
    "text_lm_score": 1,
    # pipe_refinedweb / pipe_token_attribution (r16): all stage counts
    # and token budgets land in _funnel_report's one labeled-union
    # keyed aggregation - zero single-partition exchanges (was 12
    # scalar merges each). No entries needed.
    # pipe_classifier_agreement: two scalar merges over BOUNDED frames -
    # tot (n/agree sums) reads the |labels|^2-row confusion matrix (a
    # lazy localCheckpoint, so the corpus-sized classify work sits below
    # the memo, not below these merges) and pe_num reads the
    # |labels|-row marginal equi-join. Case (b) both.
    "pipe_classifier_agreement": 2,
    # pipe_lr_agreement (r17): the identical two kappa-scalar merges
    # over the |labels|^2-row LR-vs-NB confusion checkpoint and its
    # |labels|-row marginals - pipe_classifier_agreement's argument
    # verbatim. (The corpus-sized LR scoring sits under the _lr_preds
    # session memo; the NB scalar V is the partial-agg class.) Case (b).
    "pipe_lr_agreement": 2,
}

# No declared query may plan a CartesianProduct, ever. (The bounded
# n_files^2 certificate in operators/compact.py rides a broadcast
# nested-loop join, not a cartesian.)
CARTESIAN_OK: dict = {}


def _split_top_level(args: str) -> list[str]:
    """Split a windowspecdefinition argument string on top-level commas
    (order/partition expressions may themselves contain commas, e.g.
    coalesce(a, b) ASC NULLS FIRST)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(args):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(args[start:i].strip())
            start = i + 1
    tail = args[start:].strip()
    if tail:
        parts.append(tail)
    return parts


def _n_global_windows(plan: str) -> int:
    """Count windowspecdefinitions with NO partition columns.

    Balanced-paren extraction (the naive regex stops at the first ')',
    which lets parenthesized order expressions escape). A spec's args
    are [partition cols...], [order specs... (suffix ASC/DESC ...)],
    specifiedwindowframe(...). Global = the first non-frame arg is an
    order spec, or there are no non-frame args at all (an unordered
    partition-less window - still a single-task funnel)."""
    n = 0
    marker = "windowspecdefinition("
    i = plan.find(marker)
    while i != -1:
        j, depth = i + len(marker), 1
        while j < len(plan) and depth:
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        args = [
            a
            for a in _split_top_level(plan[i + len(marker) : j - 1])
            if not a.startswith("specifiedwindowframe(")
        ]
        if not args or " ASC" in args[0] or " DESC" in args[0]:
            n += 1
        i = plan.find(marker, j)
    return n


@pytest.mark.parametrize("name", sorted(QUERIES, key=lambda n: (len(n), n)))
def test_plan_has_no_unexplained_scale_antipattern(name, spark):
    plan = _plan(QUERIES[name](spark, SF_SMOKE))
    n_cart = plan.count("CartesianProduct")
    if n_cart > CARTESIAN_OK.get(name, 0):
        pytest.fail(f"{name}: {n_cart} CartesianProduct(s) in plan")
    n_gw = _n_global_windows(plan)
    if n_gw > GLOBAL_WINDOW_OK.get(name, 0):
        pytest.fail(
            f"{name}: {n_gw} partition-less Window(s), allowed "
            f"{GLOBAL_WINDOW_OK.get(name, 0)} (raise GLOBAL_WINDOW_OK only "
            "with a boundedness argument)"
        )
    n_sp = plan.count("Exchange SinglePartition")
    if n_sp > SINGLE_PARTITION_OK.get(name, 0):
        pytest.fail(
            f"{name}: {n_sp} Exchange SinglePartition(s), allowed "
            f"{SINGLE_PARTITION_OK.get(name, 0)} (fine below a partial agg "
            "or over a bounded frame - say which)"
        )
