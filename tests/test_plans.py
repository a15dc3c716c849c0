"""Physical-plan assertions (100 TB posture): predicate pushdown reaches
the parquet scan, projections prune the read schema, small dimensions
broadcast, and aggregates keep map-side partial aggregation. These pin
the plan properties BASELINE.json's north star asks for, so a refactor
that silently regresses them fails CI, not the cluster."""

from __future__ import annotations

import pytest

from sync_cosmos_db_spark.queries import get_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = get_queries()[name](spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    # projection pruning: the scan must not read the join keys q1 ignores
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_small_dimension_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_part_brand")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_migrate_classify_is_single_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "migrate_classify_counts")
    # one join, target side pruned to the merge key + hash inputs
    assert plan.count("Join") >= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_exact_content")
    # two HashAggregates (partial + final) around one exchange: the
    # shuffle carries (digest, min_id, count) partials, not documents
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_count_pushdown_no_row_materialization(spark, sf_dir):
    plan = _plan(spark, sf_dir, "count_lineitem")
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # count(*) must not read any data columns
    assert "struct<>" in read_schema


def test_global_topk_plans_take_ordered(spark, sf_dir):
    """Global rank<=k windows never get the WindowGroupLimit rewrite
    (InferWindowGroupLimit skips empty partition specs), so the two
    global-top-k queries were rewritten (round 9) to orderBy+limit —
    TakeOrderedAndProject, a distributed map-side top-k — with the
    rank window running only over the surviving <=k rows."""
    for name in ("wilson_return_rate_parts", "diversified_topk_docs"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


# Queries whose plans are ALLOWED a BroadcastNestedLoopJoin. Every
# other registered query must plan equi-joins (hash/sort-merge/
# broadcast-hash) only — a BNLJ elsewhere means a join lost its equi
# condition and would go quadratic at scale.
BNLJ_ALLOWED = {
    # X3 exact baseline: corpus scanned once against the BROADCAST
    # query set — the nested loop is the point (small side is tiny by
    # contract, now enforced by similarity.MAX_BRUTE_FORCE_QUERIES).
    "sim_topk_bruteforce",
    # X70 evaluation probe: the same deliberate corpus×query-set exact
    # scoring, run twice (full-dim and truncated) to measure recall —
    # a measurement harness over a bounded query set, not a data path.
    "truncation_recall_16d",
    # X2 exact n² baseline (labeled; the scale path is
    # dedup_embedding_lsh which plans an equi-join on buckets).
    "dedup_embedding_cosine",
    # X2 containment oracle: embeds the SAME labeled n² exact baseline
    # as one side of the lsh ⊆ exact check.
    "dedup_embedding_lsh_containment",
    # O21: joins two single-row count aggregates — a 1×1 BNLJ.
    "verify_counts",
    # X73: the contingency-cell table (≤ |A|·|B| rows) crossJoins the
    # BROADCAST single-row (n, n_a, n_b) aggregate — linear in cells.
    "chi2_orders_status_priority",
    # X62: chains three single-row stage aggregates — 1×1 BNLJs.
    "web_pipeline_stats",
    # TPC-H scalar-subquery shapes: an N×1 BNLJ against a BROADCAST
    # single-row aggregate (the decorrelated HAVING/MAX/AVG threshold)
    # — linear in N, the canonical Spark form of a scalar subquery.
    "q11_important_stock",
    "q15_top_supplier",
    "q22_dormant_customers",
    # X79/X80: the ≤20-row (resp. ≤9-row) bucket/digit count table
    # crossJoins its BROADCAST single-row total aggregate — linear in
    # buckets/digits.
    "drift_orders_price_halves",
    "benford_order_prices",
    # X82: the per-customer spend table crossJoins the BROADCAST
    # single-row decile-boundary aggregate (N×1, the same decorrelated
    # scalar-subquery shape as q11/q15/q22) — linear in customers.
    "revenue_decile_profile",
    # X94: events crossJoin the BROADCAST single-row max-ts watermark
    # (N×1 scalar-subquery shape) — linear in events.
    "ttl_expiry_events",
    # X99: the single-row forecast aggregate crossJoins the single-row
    # actual-count aggregate — a 1×1 BNLJ (verify_counts shape).
    "join_cardinality_forecast",
    # X103: the per-customer RFM table crossJoins the BROADCAST
    # single-row max-orderdate anchor (N×1 scalar-subquery shape).
    "rfm_segment_counts",
    # X111: the single-row point-estimate aggregate crossJoins the
    # single-row CI aggregate — a 1×1 BNLJ (verify_counts shape).
    "bootstrap_ci_order_price",
    # X115: anchors crossJoin the BROADCAST single-row id-domain-size
    # aggregate (N×1 scalar-subquery shape); the label lookup itself
    # is an id-keyed equi-join.
    "negative_samples_embeddings",
    # X132: each FK audit crossJoins two single-row count aggregates
    # — 1×1 BNLJs (verify_counts shape), four of them unioned.
    "ri_orphan_audit",
    # X121/X135: the period-collapsed series (one row per day)
    # crossJoins its BROADCAST single-row total/mean/denominator
    # aggregate — N×1 on a period-sized N.
    "changepoint_daily_revenue",
    "acf_daily_events",
    # X138: the per-group decile table (|groups| rows) crossJoins the
    # BROADCAST single-row global-decile aggregate.
    "quantile_align_doc_lengths",
    # X140: (group, token) counts crossJoin the BROADCAST single-row
    # corpus-total aggregate (N×1 scalar-subquery shape).
    "source_kl_documents",
    # X143: the period-collapsed series crossJoins its BROADCAST
    # single-row (μ, K, H) aggregate — N×1 on a period-sized N.
    "cusum_daily_revenue",
    # X146: the (a, b) contingency cells crossJoin the BROADCAST
    # single-row total aggregate (the X73 chi² shape).
    "mutual_info_priority_status",
    # X150: (doc, token) tf rows crossJoin the BROADCAST single-row
    # corpus-size aggregate (N×1 scalar-subquery shape).
    "tfidf_keywords_documents",
    # X151: ranked rows crossJoin the BROADCAST single-row total-count
    # aggregate before the order-statistic equi-joins.
    "quantile_normalize_doc_lengths",
    # X154: the per-group table crossJoins the BROADCAST ≤5-row bucket
    # domain (dense-grid zero fill) and the 1-row global total.
    "t_closeness_customers",
    # X162: per-type aggregates crossJoin the BROADCAST single-row
    # global high-water-mark aggregate (the X94 TTL shape).
    "ingest_lag_by_type",
    # X165: two single-row corpus aggregates crossJoin — a 1×1 BNLJ
    # (verify_counts shape).
    "corpus_datacard_documents",
    # X174: the per-key last-event table crossJoins the BROADCAST
    # single-row high-water-mark aggregate (the X94 TTL shape).
    "inactivity_profile_events",
    # X175: the per-category table crossJoins the BROADCAST single-row
    # (good_tot, bad_tot) aggregate (the X73 chi-square shape).
    "woe_orderpriority_returned",
    # X184: the ≤10-row bin table crossJoins the BROADCAST single-row
    # (n, obar, brier) global aggregate (the X73 shape).
    "brier_decomposition_events",
    # X178: the |labels|²-row confusion table crossJoins the BROADCAST
    # single-row grand-total aggregate (the X73 shape).
    "cohens_kappa_events",
    # X253: the |metrics|-row stats table crossJoins the BROADCAST
    # 4-row arm-size grid — constant-size both sides.
    "mde_table_events",
    # X246: the fact table range-joins a BROADCAST 4-row
    # intervalized effective-dated rate table — N×4, linear.
    "effective_rate_revenue",
    # X231: same woe_encoding crossJoin as X175, fed equi-depth
    # decile categories (≤10-row table × 1-row totals).
    "woe_price_deciles",
    # X225: the project_days-row horizon grid crossJoins the
    # BROADCAST single-row OLS-fit aggregate (the X73 shape).
    "retention_fit_users",
    # X262: four single-row aggregates (n_a, n_b, n_set_bits,
    # fp_count) crossJoin into the one-row calibration report — all
    # 1×1 BNLJ (verify_counts shape).
    "bloom_fpr_calibration",
    # X256: the ranked table crossJoins the BROADCAST single-row
    # |sources| count aggregate (the X151 total-count shape).
    "curriculum_interleave_documents",
    # X257: the |groups|-row table crossJoins the BROADCAST
    # single-row normalizing-sum aggregate (the X151 shape).
    "mixture_temperature_weights",
    # X263: the per-unit table crossJoins the BROADCAST single-row
    # (ΣX, ΣY, n) totals aggregate (the X151 shape).
    "jackknife_ratio_orders",
    # X266: the |brands|-row table crossJoins the BROADCAST
    # single-row (α, β) prior aggregate (the X73 shape).
    "eb_shrunk_return_rates",
    # X267: the |sources|-row totals table crossJoins the BROADCAST
    # 20-row top-words dim (dense-grid zero fill, the X154 shape).
    "stylometry_delta_sources",
    # X271: four single-row aggregates (n1, n2, m, n_true) crossJoin
    # into the one-row estimate (verify_counts shape).
    "capture_recapture_users",
    # X273: the |nations|-row effect table crossJoins the BROADCAST
    # single-row pooled-effect aggregate (the X73 shape).
    "meta_effect_nations",
    # X275: the BROADCAST |death-times|-row dim range-joins the user
    # survival table — N×|times|, linear (the X246 shape).
    "logrank_survival_arms",
    # X276: the 50-row permutation-diff table crossJoins the
    # BROADCAST single-row observed-diff aggregate (the X73 shape).
    "permutation_test_orders",
    # X279: the single-row H aggregate crossJoins the BROADCAST
    # single-row tie-correction aggregate (verify_counts shape).
    "kruskal_wallis_priority_price",
    # X280: the |days|-row daily collapse crossJoins the BROADCAST
    # single-row (d0, n, s, q) stats aggregate (the X73 shape).
    "periodicity_scan_daily_revenue",
    # X281: the daily collapse and the 10-row lag table each
    # crossJoin a BROADCAST single-row aggregate (the X73 shape).
    "ljung_box_daily_revenue",
    # X284: the orders scan crossJoins the BROADCAST 1-row global
    # median, and the 5-row group table the 1-row margins (X73 shape).
    "mood_median_priority",
    # X285: the |digit-buckets|-row count table crossJoins the
    # BROADCAST single-row per-arm totals aggregate (the X73 shape).
    "hellinger_arm_price_digits",
}


def test_no_cartesian_product_in_any_query(spark, sf_dir):
    """Sweep every registered query's physical plan: nothing may plan a
    true CartesianProduct (unbroadcast quadratic join), and a
    BroadcastNestedLoopJoin may appear only on the explicit allowlist
    of intentional broadcast-scoring / 1×1-aggregate queries above.
    Also serves as a plans-without-error smoke for the whole
    registry."""
    skip = {"stream_stateful_user_totals"}  # executes a stream to build
    for name, fn in sorted(get_queries().items()):
        if name in skip:
            continue
        plan = spark._jvm.PythonSQLUtils.explainString(
            fn(spark, sf_dir)._jdf.queryExecution(), "formatted")
        assert "CartesianProduct" not in plan, name
        if name not in BNLJ_ALLOWED:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_quantile_normalize_no_global_sort(spark, sf_dir):
    """X151 (round-6 verdict item 2) — the exact global index must come
    from the two-phase distributed scan, never an unpartitioned
    ``Window.orderBy`` that moves the whole table through ONE task: no
    Sort node in the physical plan may feed off an
    ``Exchange SinglePartition`` (the 1-row global-count aggregates
    keep theirs — those exchanges feed HashAggregate, not Sort)."""
    from sync_cosmos_db_spark.queries import get_queries

    df = get_queries()["quantile_normalize_doc_lengths"](spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for above, below in zip(lines, lines[1:]):
        if "Exchange SinglePartition" in below:
            assert "Sort" not in above, (
                "single-partition global sort:\n" + above + "\n" + below)


def test_dynamic_partition_pruning_on_partitioned_layout(spark, sf_dir,
                                                         tmp_path):
    """A10 — joining the hive-partitioned layout (X89) on its
    partition column against a selectively-filtered dimension must
    plan a dynamicpruning subquery: at 100 TB the fact scan reads
    only the partitions the dim filter survives, decided at RUNTIME."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.session import load_table
    from sync_cosmos_db_spark.sinks import write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_dpp")
    write_partitioned(docs, path, ["lang"])
    fact = spark.read.parquet(path)
    dim = (spark.createDataFrame([("en", 1), ("de", 2), ("fr", 3)],
                                 "lang string, w int")
           .filter(F.col("w") == 1))
    plan = (fact.join(dim, "lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "dynamicpruning" in plan.lower()
