"""Plan-shape regression tests: the physical-plan properties the 100 TB
design rests on, asserted structurally so a refactor that silently
reintroduces a shuffle, breaks scan pruning, or drops a pushed filter fails
CI — the `.explain`-driven discipline as a test instead of a habit.

(Complements test_no_rowwise_python_in_plans / test_all_contract_plans_are
_arrow_only, which pin the no-per-row-Python invariant across every
contract query.)
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        entrymod.queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def _exchanges(plan: str) -> int:
    # count Exchange operators, not ReusedExchange references
    return len(re.findall(r"(?<!Reused)Exchange", plan))


def test_scan_speed_ops_have_zero_shuffles(spark):
    """Pure per-row operators must stay pure: any Exchange in these plans
    means someone added an aggregation/join to what should run at scan
    speed over 100 TB."""
    for name in ("text_pii_scrub", "text_quality_logreg", "emb_quantize",
                 "corpus_repetition", "text_quality", "text_fingerprint",
                 "text_readability", "ann_range_search",
                 "corpus_gopher_rules", "corpus_chunk_windows"):
        plan = _plan(spark, name)
        assert _exchanges(plan) == 0, (name, plan[:1200])


def test_bounded_shuffle_budgets(spark):
    """Shuffle-count budgets for the aggregation/join operators whose
    round-3 rewrites removed exchanges — a regression reintroduces them."""
    budgets = {
        "g4_cooccur": 2,        # groupBy(grp) + groupBy(a, b); was 4
        "corpus_dupe_ngrams": 4,  # shingle distinct, gram DF, join, doc agg
        "a1_group_sum": 1,
        "w1_turn_ordering": 1,
        "w3_sessionize": 1,     # both windows share one (user) shuffle
        "t3_ohlc_downsample": 2,  # window shuffle + reused-partitioning agg
        # both row_number windows and both aggs cluster by (a prefix of)
        # user_id — one exchange serves all four
        "w6_event_runs": 1,
        # the underlying unigram_logprob plan owns 6 exchanges (tokenize/
        # freq/total/join/doc-agg chain); tiering must add exactly ONE more
        # (the tier aggregate) — a pure projection cannot cost a shuffle
        "corpus_quality_tiers": 7,
        # bucket join + grid-split pair join + per-src top-k window
        "ann_knn_graph": 5,
        # backbone co-occurrence + degree/wedge/adjacency joins (each over
        # the small backbone edge set, but the count must not creep)
        "g8_common_neighbors": 15,
        # the peel runs eagerly at build time; the returned plan is one
        # degree aggregate over the checkpointed core edge table
        "g7_kcore": 1,
        # round-4 additions (all over the memoized flagship checkpoint or
        # the events scan): distinct + two per-key partials + two 2-row
        # final aggs (broadcast-joined) for cardinality; union-distinct +
        # conv self-join + pair agg for cooccur; first-seen agg + activity
        # distinct + join + cell agg for retention
        "kg_pred_cardinality": 6,  # (+1: the 2-row stats join plans sort-merge under AQE)
        "kg_entity_cooccur": 5,
        "w7_retention_cohorts": 5,
        # lag window (user shuffle) + pair groupBy + tiny normalize window
        "w8_transition_matrix": 3,
        # distinct + conflict groupBy over the memoized flagship checkpoint
        "kg_conflicts": 2,
        # late round-4 additions
        # session window (user) + day repartition for sweep + day agg
        "w9_peak_concurrency": 3,
        # (doc, token) partial + doc partial — both map-side combinable
        "text_word_entropy": 2,
        # one partial agg + the window over the (tiny) aggregate
        "corpus_length_hist": 2,
        # distinct + two kind joins + pattern agg over the memoized flagship
        "kg_schema_induce": 7,
        # ONE group fold (checkpointed, 3 consumers) + pair agg + marginal
        # agg + two marginal joins; was 21 before the shared-groups rewrite
        "g11_edge_lift": 7,
        # per-user moments partial agg + the fact-to-moments equi-join
        "w10_zscore_outliers": 2,
        # gram-df cap agg + size agg + shared-gram pair join + pair agg,
        # all over ONE checkpointed capped-gram table
        "corpus_containment": 4,
        # transcript window + provenance equi-join to the memoized flagship
        # checkpoint + the triple-key partial agg
        "kg_fact_recency": 6,
        # key assignment is a pure projection; ONE window shuffle per group
        "corpus_weighted_sample": 1,
        # one (type, week) partial agg + the lag window over the tiny agg
        "w11_week_over_week": 2,
        # (label, dim) centroid agg + keyed join + (vec, label) agg +
        # per-label top-k window over the per-vector aggregate
        "emb_outliers": 6,
        # first-occurrence agg + news agg + bucket agg + intra window over
        # the checkpointed doc table; the lone SinglePartition window runs
        # over the n_buckets-row aggregate only
        "corpus_vocab_growth": 4,
        # first-view agg + keyed join + first-purchase conditional agg
        "w12_time_to_convert": 3,
        # session-2 additions
        # pair distinct + day-dim distinct (broadcast) + count-distinct agg
        # (expands to partial/final under the distinct rewrite)
        "w13_rolling_active": 5,
        # ONE expand-based grouping-sets pass: all four cubes share it
        "a12_cube": 1,
        # per-customer partial agg + the 1-row broadcast ref date
        "w14_rfm": 3,
        # distinct + left-semi reverse join + two pred-keyed partials, all
        # over the memoized flagship checkpoint (triple-sized inputs)
        "kg_sym_preds": 6,
        # union-all degree agg + bucket agg; the share window runs over the
        # <=64-row bucket aggregate (flagship checkpoint upstream)
        "kg_degree_hist": 5,
        # one (user) lag-window shuffle + the percentile agg keyed by type
        "w15_interarrival": 2,
        # logprob substrate owns its chain; the cut adds only the 1-row
        # threshold agg (broadcast) + the final 3-row bucket agg
        "corpus_ccnet_cut": 15,
        # transcript window + provenance join + fact agg + the argmax
        # window over the (subj,pred)-grouped fact table
        "kg_current_facts": 18,
        # 1-row codebook aggregate (partial/final); the assignment itself
        # is a pure projection after the broadcast
        "emb_pq_codes": 2,
        # per-user partial agg + the rank window over the tiny aggregate
        "w16_gini": 2,
        # per-type median agg + broadcast-joined second percentile agg
        "a13_mad": 3,
        # plan reads the localCheckpointed alias-substrate entity table:
        # the filter/projection must stay shuffle-free
        "kg_alias_merge": 0,
        # these two inherit the full minhash banding + verify (+ CC loop)
        # chain; the budget pins that the added stage costs ~nothing
        "corpus_decon_fuzzy": 42,
        "corpus_dup_cluster_stats": 50,
        # CMS grid agg (partial/final after the explode) + exact top-20 +
        # the broadcast probe join
        "a14_countmin": 4,
        # one revenue partial agg + customer join + ONE window shuffle
        # shared by all five rank functions
        "w17_rank_family": 3,
        # the tolerance is a pure post-projection: same budget as t1's
        # one-shuffle union-window as-of
        "t7_asof_tolerance": 2,
        # (user, day) distinct + (user) window; both post-window aggs run
        # on the window's existing partitioning
        "w18_streaks": 2,
        # lag mark, change filter, and lead close all share ONE (user)
        # shuffle (same partitioning, same total order)
        "t6_scd2": 1,
        # one events scan + one user agg; bit-set distinct + its broadcast;
        # k_hit reuses the user partitioning, final join reuses it too
        "a15_bloom": 4,
        # embeds the emb_pq_codes encode (codebook single-row agg + its
        # broadcast) plus the 32-row LUT broadcast and 4 LUT hash joins —
        # every exchange here is a broadcast of a <=32-row table
        "ann_pq_adc": 10,
        # session-3 additions
        # the full ADC chain (10) + ONE broadcast of the 20-row shortlist
        # into the candidate join — the exact rerank adds no wide exchange
        "ann_rerank": 11,
        # same wedge topology as g8 minus the two degree re-joins (the
        # fixed-point weight rides the wedge rows): sym degree agg, capped
        # mid join, pair agg, adjacency anti-join
        "g13_linkpred_ra": 7,
        # distinct positives + broadcast kind dim + broadcast 64-bucket
        # pool + anti-join vs the positive set, all over the memoized
        # flagship checkpoint
        "kg_neg_samples": 6,
        # (source, tok) partial agg + the top-100 window; the moment agg
        # runs on the window's existing (source) partitioning
        "text_zipf_slope": 2,
        # ONE user-keyed equi-join carrying the 7-day range predicate +
        # the purchase-keyed partial agg
        "w19_attribution": 2,
        # IVF assignment window + probe/member broadcasts + the full ADC
        # chain — every exchange beyond the one assignment window shuffle
        # is a broadcast of a <=32-row table
        "ann_ivf_adc": 15,
        # the probe is a broadcast-literal bitmap projection (zero
        # shuffle); what remains: train-shingle distinct + the broadcast
        # of the checkpointed eval-gram table + the per-doc tally
        "corpus_decon_bloom": 3,
        # ivf assignment window + probe/query/exact-topk broadcasts + the
        # 10-row audit window; the three top-ks are TakeOrderedAndProject
        "ann_multiprobe_topk": 6,
        # two TakeOrderedAndProject top-10s + ONE 10-row broadcast join
        "emb_matryoshka": 1,
        # 3 unrolled iterations x (rank join + degree join + contribution
        # agg) over the checkpointed node/indicator tables — the rank table
        # shuffles each round, the edge exchange is AQE-reused
        "g14_ppr": 21,
        # assignment window + the (cent, dim) partial agg; the 8-row
        # centroid table broadcasts
        "emb_kmeans_step": 3,
        # triple distinct + (subj,obj) self-join + pair agg + antecedent
        # agg over the memoized flagship checkpoint
        "kg_rule_confidence": 8,
        # ONE map-side-combinable partial agg over the events scan
        "a16_group_skewness": 1,
        # the CC loop runs eagerly at build time; the returned plan is the
        # label aggregate + edge-label join + two component-sized aggs
        "g15_component_profile": 18,
        # exact top-10 TakeOrderedAndProject + two broadcasts (query
        # bucket, candidate ids)
        "ann_lsh_recall": 2,
        # ONE map-side-combinable partial agg over the events scan (the
        # a16 shape with a 4th decimal power sum riding along)
        "a17_group_kurtosis": 1,
        # label-prop loop runs eagerly (checkpointed); the returned plan:
        # degree agg over the two-sided union + label equi-joins on both
        # endpoints + e_in/d_tot partial aggs + the community left join,
        # all over the checkpointed canonical edge set; m broadcasts
        "g16_modularity": 9,
        # raw + target token-keyed partial aggs into the checkpointed
        # vocabulary table + the totals row + the token join + the
        # per-doc agg; the vocabulary and totals broadcast
        "corpus_dsir": 6,
        # ONE bounded-key (alphabet^2) partial agg + TakeOrderedAndProject
        "text_bpe_pairs": 1,
        # the (w1,w2) partial agg feeds the checkpoint; after it: two
        # vocabulary-sized slot aggs + their joins back + the broadcast
        # total + TakeOrderedAndProject
        "text_pmi_bigrams": 7,
        # ONE (user_id) stream-shard window + ONE map-side-combinable agg
        "w20_late_events": 2,
        # row projection is a zero-shuffle array fold; ONE 64-key dim agg
        # + the 64-row norm broadcast
        "emb_power_iter": 3,
        # ONE map-side-combinable partial agg (the two-variable moment set)
        "a18_group_corr": 1,
        # bigram + unigram vocab aggs into checkpoints, the three count
        # joins back onto the position stream, and the per-doc agg; the
        # scalar total broadcasts
        "corpus_bigram_logprob": 8,
        # predicate + scoring fuse into one scan; the only exchange is the
        # TakeOrderedAndProject top-k
        "ann_filtered_topk": 1,
        # the 5-row query set broadcasts; ONE (q_id) window shuffle ranks
        # all queries in a single pass
        "ann_batch_topk": 2,
        # ONE (user_id) window shuffle; the Horner folds are per-row array
        # expressions
        "w22_ema": 1,
        # assignment/cells/exact-top-10 run eagerly (checkpointed); per
        # probe level the plan carries ~8 exchanges, ALL of them tiny-
        # table broadcasts or single-row count aggs (cells broadcast,
        # 10-row hit join, two 1-row crossJoin broadcasts, two
        # SinglePartition aggs) x 3 levels — nothing data-sized shuffles
        "ann_recall_curve": 24,
        # two map-side-combinable partial aggs, same shuffle twice
        # ((user,type) then (user))
        "a19_user_entropy": 2,
    }
    for name, budget in budgets.items():
        plan = _plan(spark, name)
        got = _exchanges(plan)
        assert got <= budget, (name, got, budget, plan[:1500])


def test_point_lookup_pushes_filters_to_scan(spark):
    """J4's equality predicates must reach the parquet scan (PushedFilters),
    and the scan must not read every column (ReadSchema pruning)."""
    plan = _plan(spark, "j4_point_lookup")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), plan[:1500]


def test_projection_prunes_scan_columns(spark):
    """a1 groups one column and sums another: the lineitem scan must read
    only those two (ReadSchema column pruning), never the full 16-column
    row."""
    plan = _plan(spark, "a1_group_sum")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:1500]
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(cols) <= 3, cols


def test_small_topk_is_take_ordered_or_local(spark):
    """ann_cosine_topk must end in TakeOrderedAndProject (a top-k, never a
    global sort of the scored table)."""
    plan = _plan(spark, "ann_cosine_topk")
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Sort " not in plan  # no full sort operator


def test_broadcastable_dims_are_broadcast(spark):
    """The kernel-off distlink verify joins the norm dictionary twice; at
    oracle scale the dictionary must come in as a broadcast, not a shuffled
    SMJ (Catalyst sizes it; this pins that the plan still qualifies)."""
    plan = _plan(spark, "j1_edge_endpoint_join")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:1500]
