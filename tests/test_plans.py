"""Physical-plan pins: the scale-readiness properties of the headline
queries are assertions, not hopes. A change that drops a filter
pushdown, un-broadcasts a dimension join, or adds a shuffle fails
here before it melts a real cluster.

Counts are taken on the statically optimized plan; AQE only improves
them at runtime.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from s3_rds_bq_airflow_spark.plans import (
    assert_broadcast_joins,
    assert_max_shuffles,
    assert_pushed_filter,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
from s3_rds_bq_airflow_spark.plans.inspect import plan_nodes

QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def build(name):
        return QUERIES[name](spark, sf_dir)

    return build


def test_q6_full_pushdown_single_scan(q):
    """Every q6 predicate reaches the parquet reader; the single scan
    reads only the five needed columns."""
    df = q("q6_forecast_revenue")
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert_pushed_filter(df, col)
    assert_max_shuffles(df, 1)  # the single-partition final aggregate
    (schema,) = read_schemas(df)
    assert "l_extendedprice" in schema
    for unneeded in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert unneeded not in schema


def test_q1_prunes_and_pushes(q):
    df = q("q1_pricing_summary")
    assert_pushed_filter(df, "l_shipdate")
    assert_max_shuffles(df, 1)  # one partial->final agg exchange
    (schema,) = read_schemas(df)
    for unneeded in ("l_orderkey", "l_suppkey", "l_linenumber"):
        assert unneeded not in schema


def test_q5_broadcasts_dimensions(q):
    """The star join must broadcast the dimension side — the fact
    table is never shuffled for dimension enrichment."""
    df = q("q5_nation_revenue")
    assert_broadcast_joins(df, 3)
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "r_name")
    assert_max_shuffles(df, 2)


def test_q3_selective_join(q):
    df = q("q3_shipping_priority")
    assert_broadcast_joins(df, 1)
    for col in ("o_orderdate", "l_shipdate", "c_mktsegment"):
        assert_pushed_filter(df, col)


def test_topk_is_take_ordered_not_global_sort(q):
    """LIMIT k over ORDER BY must plan as TakeOrderedAndProject —
    per-partition top-k merged on the driver, zero shuffles — never a
    global sort."""
    df = q("q_topk_customers")
    nodes = plan_nodes(df)
    assert "TakeOrderedAndProject" in nodes
    assert "Sort" not in nodes
    assert shuffle_count(df) == 0


def test_dedup_latest_single_shuffle(q):
    """The W1 window dedup shuffles once on the partition key."""
    assert_max_shuffles(q("q_dedup_latest"), 1)


def test_merge_upsert_two_shuffles(q):
    """Full-outer merge: one shuffle per side, nothing downstream."""
    assert_max_shuffles(q("q_merge_upsert"), 2)


def test_windowed_agg_single_shuffle(q):
    """Tumbling/session windows aggregate with exactly one exchange."""
    assert_max_shuffles(q("q_tumbling_window"), 1)
    assert_max_shuffles(q("q_session_window"), 1)


def test_asof_join_single_shuffle(q):
    """The as-of composition must stay a one-shuffle union+window —
    if it ever degrades to a join-explode the count jumps."""
    assert_max_shuffles(q("q_asof_join"), 1)


def test_star_joins_broadcast_dimensions(q):
    """q7/q9 star shapes: all dimension joins broadcast, one shuffle
    total (the final aggregate)."""
    for name in ("q7_nation_volume", "q9_product_profit"):
        df = q(name)
        assert_broadcast_joins(df, 3)
        assert_max_shuffles(df, 1)


def test_correlated_shapes_bounded_shuffles(q):
    """The correlated-subquery rewrites stay bounded: per-part/
    per-supplier aggregates + join-backs never explode into extra
    exchanges."""
    assert_max_shuffles(q("q13_order_distribution"), 2)
    assert_max_shuffles(q("q15_top_supplier"), 3)
    assert_max_shuffles(q("q17_small_quantity"), 2)
    assert_max_shuffles(q("q2_min_cost_supplier"), 4)
    assert_max_shuffles(q("q_monthly_trend"), 2)
    assert_pushed_filter(q("q_monthly_trend"), "o_orderdate")


def test_pushdown_report_nonempty_across_catalog(q):
    """Filters declared next to scans stay pushed for the selective
    relational queries (spot inventory, not exhaustive)."""
    for name in ("q_semi_join", "q_anti_join", "q_union_distinct"):
        assert pushed_filters(q(name)), f"{name} lost all scan pushdown"


def test_no_cartesian_product_anywhere(spark, sf_dir):
    """Catalog-wide guards: (a) under the default conf, NO declared
    query may plan a CartesianProduct — every intentional cross join
    must broadcast its one-row/small side (BroadcastNestedLoopJoin);
    a cartesian of two distributed relations is never acceptable at
    scale. (b) With size-based auto-broadcast DISABLED (so the only
    BroadcastExchanges left are ones the code FORCED with a hint), no
    SF-SCALING relation may be broadcast without a bounding limit /
    aggregate / selective filter between scan and exchange — a forced
    whole-relation broadcast is the canonical 100 TB plan killer and
    no size estimate will save it, because the hint OVERRIDES the
    size check. Round 10 widened the guarded set beyond the five
    fact tables to part/supplier/customer: TPC-H scales those
    linearly with SF too (part is ~20B rows at 100 TB), so only the
    constant-cardinality nation (25) and region (5) may carry a
    broadcast hint. Auto-broadcasts at tiny SF are fine: real stats
    + AQE flip them to shuffle joins at scale."""
    from s3_rds_bq_airflow_spark.plans.inspect import (
        plan_nodes,
        unbounded_broadcast_tables,
    )

    facts = {
        "orders", "lineitem", "events", "documents", "embeddings",
        # SF-scaling dimensions — broadcastable only by SIZE, never by hint
        "part", "supplier", "customer",
    }
    # Documented exceptions: queries whose FORCED broadcast of an
    # SF-scaling relation is the declared design, with the reason.
    # Every entry must name a real (query, table) offender — the
    # staleness assert below keeps this an audit, not an archive.
    forced_broadcast_ok = {
        ("q_haversine_nearest", "supplier"): (
            "declared BRUTE-FORCE verification twin (r8 campaign "
            "adjudication): the cross product IS the semantics; the "
            "scale gear is q_nearest_supplier_bucketed"
        ),
        ("q_nearest_supplier", "supplier"): (
            "same brute verification twin as q_haversine_nearest "
            "(squared-degree metric variant)"
        ),
        ("q_nearest_supplier_bucketed", "supplier"): (
            "sparse-residue fallback ring only: lefts unresolved "
            "within one grid cell BNL against the dim; size the cell "
            "to the dim density so the residue input is ~empty — the "
            "hot path is the cell-id equi-join (plan-pinned in "
            "test_grid_nn_hot_path_is_equi_join)"
        ),
    }
    offenders = []
    names = [n for n in sorted(QUERIES) if not n.startswith("q_stream")]
    for name in names:  # streaming queries execute, no static plan here
        if "CartesianProduct" in plan_nodes(QUERIES[name](spark, sf_dir)):
            offenders.append(f"{name}: cartesian")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    seen_allowlisted = set()
    try:
        for name in names:
            bad = unbounded_broadcast_tables(QUERIES[name](spark, sf_dir)) & facts
            for table in sorted(bad):
                if (name, table) in forced_broadcast_ok:
                    seen_allowlisted.add((name, table))
                else:
                    offenders.append(f"{name}: forced unbounded fact broadcast {table}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert not offenders, offenders
    stale = set(forced_broadcast_ok) - seen_allowlisted
    assert not stale, f"stale forced-broadcast allowlist entries: {sorted(stale)}"


def test_grid_nn_hot_path_is_equi_join(q):
    """The bucketed NN's candidate join must compile to a HASH join on
    the cell-id expressions (broadcast here because the dim is small;
    shuffle-hash/SMJ on a big dim — either way an equi-join). The only
    permitted nested loop is the sparse-residue fallback against the
    broadcast right side."""
    nodes = plan_nodes(q("q_nearest_supplier_bucketed"))
    assert any("BroadcastHashJoin" in n or "ShuffledHashJoin" in n or
               "SortMergeJoin" in n for n in nodes)
    assert not any("CartesianProduct" in n for n in nodes)


def test_ivf_broadcasts_centroids_not_corpus(q):
    """IVF assignment/probe must broadcast only BOUNDED relations:
    corpus scans may feed a broadcast side, but only through a
    limit/top-k/aggregate (seed selection is a LIMIT-16, centroid
    update is a (cid,pos) aggregate) — never a full unbounded scan
    shipped to every executor. Checked structurally on the plan tree,
    not by node counting."""
    from s3_rds_bq_airflow_spark.plans.inspect import unbounded_broadcast_scans

    df = q("q_cosine_ann_ivf")
    nodes = plan_nodes(df)
    assert not any("CartesianProduct" in n for n in nodes)
    assert unbounded_broadcast_scans(df) == []
    # Centroid fit collects nothing to the driver; the plan stays lazy
    # until action. Sanity: the query still returns k rows.
    assert df.count() == 10


def test_histogram_state_single_shuffle(q):
    """Histogram state build is one (key, bin) aggregate; the merged
    two-slice query must stay bounded in exchanges (two partial
    states + one merge + the quantile window = no accidental
    per-value shuffles)."""
    df = q("q_histogram_quantiles")
    assert shuffle_count(df) <= 8


def test_minhash_lsh_candidates_are_banded_equi_join(spark, sf_dir):
    """The structural no-all-pairs guarantee for dedup at 100 TB
    (operators/dedup.py): LSH candidate generation must compile to an
    EQUI-join keyed on (band, sig) — never a CartesianProduct or a
    nested-loop join over the corpus. Auto-broadcast is disabled so
    the assertion is about join STRUCTURE, not tiny-SF size
    estimates."""
    from s3_rds_bq_airflow_spark.plans.inspect import formatted_plan, plan_nodes

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q_dedup_minhash_lsh"](spark, sf_dir)
        nodes = plan_nodes(df)
        assert "CartesianProduct" not in nodes, nodes
        assert "BroadcastNestedLoopJoin" not in nodes, nodes
        txt = formatted_plan(df)
        key_lines = [
            line
            for line in txt.splitlines()
            if line.strip().startswith("Left keys") and "band" in line and "sig" in line
        ]
        assert key_lines, "no join keyed on (band, sig) in plan:\n" + txt[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_prefilter_probe_is_pure_filter(q):
    """The bloom probe must be a codegen Filter over the fact scan —
    no join, no exchange, before the (broadcast) verification join.
    If the bitset ever degrades to an IN-subquery or position join,
    a shuffle appears on the fact side and this pin fails."""
    df = q("q_bloom_prefilter")
    nodes = plan_nodes(df)
    joins = [n for n in nodes if "Join" in n]
    # exactly one join in the whole plan: the broadcast verification
    # join of candidates vs build keys.
    assert len([n for n in joins if "BroadcastHashJoin" in n]) >= 1
    assert not any("SortMergeJoin" in n or "ShuffledHashJoin" in n for n in joins)
    # two key-sized exchanges only: the build-side keys distinct and
    # the final single-row aggregate — the FACT side contributes none.
    assert_max_shuffles(df, 2)


def test_asof_nearest_single_exchange(q):
    """Both direction windows must reuse ONE user_id hash exchange —
    a second exchange means the desc window lost the partitioning."""
    df = q("q_asof_nearest")
    assert_max_shuffles(df, 1)


def test_snapshot_diff_no_broadcast_of_fact(q):
    """Snapshot diff joins two same-sized snapshots: neither side may
    be broadcast (a fact-sized broadcast melts executors at scale)."""
    df = q("q_snapshot_diff")
    nodes = plan_nodes(df)
    assert any("SortMergeJoin" in n or "ShuffledHashJoin" in n for n in nodes)
    assert not any("BroadcastHashJoin" in n for n in nodes)


def test_bottomk_sample_is_take_ordered(q):
    """Bottom-k-by-hash must compile to TakeOrdered (per-partition
    local k + driver merge), never a global Sort."""
    nodes = plan_nodes(q("q_bottomk_sample"))
    assert any("TakeOrderedAndProject" in n for n in nodes)
    assert not any(n.strip().startswith("Sort ") and "global=true" in n for n in nodes)


def test_round6c_scale_pins(q):
    """Round-6c additions: shuffle budgets for the lean single-pass
    analytics (a regression that adds a shuffle to a one-aggregation
    audit fails here), and the broadcast/bounded shape of the
    retrieval ops."""
    assert_max_shuffles(q("q_k_anonymity"), 1)
    assert_max_shuffles(q("q_l_diversity"), 2)
    assert_max_shuffles(q("q_calibration_bins"), 1)
    assert_max_shuffles(q("q_diff_in_diff"), 1)
    assert_max_shuffles(q("q_partition_checksums"), 1)
    assert_max_shuffles(q("q_benford_audit"), 3)
    assert_max_shuffles(q("q_jackknife_ci"), 2)
    # q_gini_concentration moved from the 2-shuffle single-partition-
    # window plan to the range-bucket gear (round 7) — its pin now
    # lives in test_no_single_partition_window_in_rank_queries.
    assert_max_shuffles(q("q_path_analysis"), 2)
    assert_max_shuffles(q("q_knn_classify"), 2)
    assert_max_shuffles(q("q_dsir_select"), 2)


def test_round6c_no_allpairs_in_pair_ops(q, spark, sf_dir):
    """The pair-producing round-6c ops must candidate-generate via
    equi-joins (blocked / shingle / user-keyed), never a cartesian of
    two distributed relations."""
    for name in (
        "q_entity_resolution",
        "q_containment_dedup",
        "q_cooccurrence_recs",
        "q_mmr_rerank",
        "q_fuzzy_match_blocked",
    ):
        assert "CartesianProduct" not in plan_nodes(q(name)), name


def test_no_single_partition_window_in_rank_queries(q):
    """Round-7 pin: the dimension-wide concentration analytics rank
    through the range-bucket gear (operators/rangebucket) — no Window
    anywhere in their plans may be fed by an Exchange SinglePartition,
    because parts/customers grow linearly with the fact table and a
    single-task global sort stops being distributed at 100 TB. The
    extra exchanges the gear adds are bucket-stat-sized (<= n_buckets
    rows) except the per-bucket window shuffle, which is exactly the
    partitioned replacement for the single-partition funnel."""
    from s3_rds_bq_airflow_spark.plans import assert_no_single_partition_window

    for name in ("q_abc_analysis", "q_gini_concentration", "q_ks_drift"):
        assert_no_single_partition_window(q(name))


# Queries where a single-partition Window is DELIBERATE because the
# ranked relation is bounded by something other than the data volume.
# Every entry needs a reason; anything else in the catalog that ranks
# through Exchange SinglePartition fails the sweep below.
SINGLE_PARTITION_WINDOW_OK = {
    # Day-granular duration domain — bounded by the observation
    # calendar, not the row count (docstring: "value-domain-sized").
    "q_survival_table",
    # Daily series: one row per calendar day by construction.
    "q_cusum_changepoint",
    # Running min over the price-DISTINCT aggregate — the price value
    # domain (cents), not the part rows (verdict-adjudicated r6).
    "q_skyline_parts",
    # Cross-bin prefix sum over PER-BIN TOTALS in the rank-count
    # overlap gear (operators/temporal.interval_overlap_count_rank):
    # one row per occupied time bin — bounded by calendar/bin_seconds,
    # not the event count (round-9 sf10-campaign rewrite).
    "q_interval_overlap",
}


# Round-9 codification of the round-8 straggler lesson: every
# pair-producing self-join (detected in the plan by its
# `a.col < b.col` same-name join condition) must either salt its
# blocking key (the q_ngram_jaccard pattern — `_salt` in the equi
# keys) or appear here with a documented reason why the unsalted key
# cannot serialize per-block pair work: blocking-key cardinality
# scales with the data (each block stays small / blocks outnumber
# tasks), or the joined relation itself is bounded by construction.
# An unsalted pair join on a handful-cardinality key — lang, nation,
# segment, ... — funnels each block's QUADRATIC workload into one
# task (q_ngram_jaccard pre-fix: one 45-minute sf10 straggler while
# 31 cores idled) and fails the sweep below.
PAIR_JOIN_BLOCKING_OK = {
    # Banded signature buckets: key cardinality scales with the
    # corpus, per-bucket occupancy stays near-constant by design.
    "q_dedup_minhash_lsh": "(band, sig) minhash bucket — cardinality ~ corpus",
    "q_dedup_simhash": "15-bit band buckets (32768/band) — occupancy near-constant",
    "q_image_ahash_neardup": "(band, bval) aHash band bucket — cardinality ~ corpus",
    "q_embedding_neardup": "LSH hyperplane bucket — cardinality ~ corpus",
    "q_semantic_dedup": "LSH bucket — cardinality ~ corpus",
    "q_audio_constellation": "landmark hash — cardinality ~ corpus",
    # Token/fingerprint-valued keys: vocabulary-sized, with explicit
    # document-frequency caps bounding per-key occupancy.
    "q_setsim_join": "prefix-token hash — vocab-sized; PPJoin prefix filter bounds candidates",
    "q_winnow_overlap": "winnowing fingerprint — vocab-sized, df-capped",
    "q_fuzzy_match_blocked": "deletion variant key — vocab-sized, df<=64 cap",
    # Entity/graph keys whose cardinality scales with the data.
    "q_triangle_counts": "adjacency on src — cardinality = node count",
    "q_video_frame_dedup": "doc_id — cardinality ~ corpus; frames/doc bounded",
    "q_entity_resolution": "(noun, brand) over DISTINCT records — saturates at vocab cap",
    # Bucket-stat pair comparisons over a FIXED bucket range: the
    # joined relation is n_buckets rows (config-sized), not data.
    "q_ks_drift": "bucket-stat relation <= n_buckets rows",
    "q_gini_concentration": "bucket-stat relation <= n_buckets rows",
    "q_window_distribution": "bucket-stat relation <= n_buckets rows",
}


# Queries allowed to raise during the catalog plan sweep. EMPTY by
# design: every declared query currently builds a plannable DataFrame
# at the test SF. A query that starts throwing lands in the sweep's
# assertion (named), instead of silently dropping out of both audits.
EXPECTED_PLAN_SKIPS: set[str] = set()


def test_catalog_single_partition_window_allowlist(q, spark, sf_dir):
    """Catalog-wide sweep, one plan build per query, two audits:

    1. NO query outside the documented allowlist may rank the data
       through an Exchange SinglePartition -> Window funnel — the
       regression net behind the range-bucket gear. A future query
       (or a Catalyst-visible rewrite of an old one) that
       reintroduces a global ORDER BY window over a data-linked
       relation fails here, at plan time, before it melts a
       1000-executor run.
    2. NO query anywhere may plan a row-at-a-time Python UDF
       (BatchEvalPython / PythonUDF outside Arrow). The engine's
       Python escape hatches are exclusively Arrow-batched
       (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) —
       a 10-100x throughput cliff separates the two.

    3. Every pair-producing self-join must salt its blocking key or
       carry a documented high-cardinality/bounded-domain reason in
       PAIR_JOIN_BLOCKING_OK (the round-8 straggler lesson as a
       regression net, round-9)."""
    from s3_rds_bq_airflow_spark.plans import single_partition_windows
    from s3_rds_bq_airflow_spark.plans.inspect import pair_self_joins, plan_nodes

    spw_offenders = {}
    udf_offenders = {}
    pair_offenders = {}
    skipped = set()
    for name in QUERIES:
        try:
            df = q(name)
            spw = single_partition_windows(df)
            nodes = plan_nodes(df)
            pairs = pair_self_joins(df)
        except Exception:
            # A query that stops planning must not silently drop out
            # of the audits (round-7 advisor finding): every skip is
            # asserted against the documented expected-skip set below
            # (currently EMPTY — all 262 catalog queries plan).
            skipped.add(name)
            continue
        if spw and name not in SINGLE_PARTITION_WINDOW_OK:
            spw_offenders[name] = spw
        if any("BatchEvalPython" in n for n in nodes):
            udf_offenders[name] = [n for n in nodes if "BatchEvalPython" in n]
        unsalted = [p for p in pairs if not p["salted"]]
        if unsalted and name not in PAIR_JOIN_BLOCKING_OK:
            pair_offenders[name] = [
                {"keys": p["keys"], "pair_cols": p["pair_cols"]} for p in unsalted
            ]
    assert skipped == EXPECTED_PLAN_SKIPS, (
        f"queries silently excluded from the plan audits: "
        f"{sorted(skipped ^ EXPECTED_PLAN_SKIPS)}"
    )
    assert not spw_offenders, (
        f"undocumented single-partition windows: {spw_offenders}"
    )
    assert not udf_offenders, (
        f"row-at-a-time Python UDFs in plans: {udf_offenders}"
    )
    assert not pair_offenders, (
        "unsalted pair self-joins with undocumented blocking keys "
        f"(salt them or add a reason to PAIR_JOIN_BLOCKING_OK): {pair_offenders}"
    )


def test_pair_join_detector_fires_on_unsalted_handful_key(spark, sf_dir):
    """The blocking-key sweep's detector must actually see the
    anti-pattern it polices: an UNSALTED pair self-join blocked on a
    handful-cardinality key (the exact pre-fix q_ngram_jaccard /
    q_label_propagation shape) is detected and reported unsalted;
    the salted q_label_propagation edge build is detected AND
    salted. The LPA result plan itself is lineage-cut by the
    operator's localCheckpoint, so the fixture's edge frame is the
    audit surface."""
    from pyspark.sql import functions as F

    from s3_rds_bq_airflow_spark.plans.inspect import pair_self_joins
    from s3_rds_bq_airflow_spark.queries._util import t
    from s3_rds_bq_airflow_spark.queries.clusterq import lpa_clique_fixture

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    bad = (
        c.alias("a")
        .join(
            c.alias("b"),
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(F.col("a.c_custkey"), F.col("b.c_custkey").alias("other"))
    )
    hits = pair_self_joins(bad)
    assert hits and not hits[0]["salted"]
    assert hits[0]["pair_cols"] == ["c_custkey"]
    assert "c_nationkey" in hits[0]["keys"]

    _, edges = lpa_clique_fixture(spark, sf_dir)
    lpa_hits = pair_self_joins(edges)
    assert lpa_hits and all(h["salted"] for h in lpa_hits), (
        "the q_label_propagation edge build lost its salt"
    )
