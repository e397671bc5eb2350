"""§2.B Relational core — scan/project/filter/join/agg/sort/set operators.

All declarative DataFrame API (or SQL entry for subquery forms) so
Catalyst supplies pushdown, pruning, join selection, AQE re-planning and
whole-stage codegen (SURVEY.md §4). No RDDs, no collect-loops.

Scale notes per operator family:
- joins: dimension sides carry explicit ``F.broadcast`` hints where the
  dim is guaranteed small (region/nation/customer-at-dim-role); fact-fact
  joins shuffle on the join key and AQE handles skew.
- aggregations: partial (map-side) aggregation is automatic; decimal
  casts (functions.determinism) keep parallel sums order-independent.
- top-k: ``orderBy + limit`` compiles to TakeOrderedAndProject — no full
  global sort materialization; per-group top-k uses a window over the
  group partitioning (single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_staging_engine_spark.functions.determinism import (
    as_long,
    dec_sum,
    dec_sum_expr,
    duck_round,
    safe_corr,
)
from data_lake_staging_engine_spark.registry import query
from data_lake_staging_engine_spark.sources import load, register_views


# --------------------------------------------------------------------------
# Projection / filter / distinct
# --------------------------------------------------------------------------

@query(
    "b01_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2) AS disc_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge
    FROM lineitem
    """,
)
def b01_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        duck_round(disc, 2).alias("disc_price"),
        duck_round(disc * (1 + F.col("l_tax")), 2).alias("charge"),
    )


@query(
    "b02_filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F','P') AND o_totalprice BETWEEN 50000 AND 150000)
       OR (o_orderpriority LIKE '1-%' AND o_totalprice < 25000)
    """,
)
def b02_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pred = (
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 150000)
    ) | (F.col("o_orderpriority").like("1-%") & (F.col("o_totalprice") < 25000))
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@query(
    "b03_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def b03_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------

@query(
    "b10_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def b10_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@query(
    "b11_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def b11_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "b12_join_right_full",
    oracle="""
    SELECT 'right' AS variant, l.l_orderkey AS left_key, o.o_orderkey AS right_key
    FROM (SELECT * FROM lineitem WHERE l_quantity > 49) l
    RIGHT JOIN (SELECT * FROM orders WHERE o_orderkey < 2000) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'full' AS variant, c.c_custkey AS left_key, o.o_orderkey AS right_key
    FROM (SELECT * FROM customer WHERE c_custkey < 750) c
    FULL JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
      ON c.c_custkey = o.o_custkey
    """,
)
def b12_join_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49)
        .select("l_orderkey")
    )
    o_small = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey")
    )
    right = li.join(o_small, li.l_orderkey == o_small.o_orderkey, "right").select(
        F.lit("right").alias("variant"),
        li.l_orderkey.alias("left_key"),
        o_small.o_orderkey.alias("right_key"),
    )
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 750)
        .select("c_custkey")
    )
    o_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey")
    )
    full = c.join(o_f, c.c_custkey == o_f.o_custkey, "full").select(
        F.lit("full").alias("variant"),
        c.c_custkey.alias("left_key"),
        o_f.o_orderkey.alias("right_key"),
    )
    return right.unionByName(full)


@query(
    "b13_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def b13_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "b14_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def b14_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "b15_join_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def b15_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain star join with explicit broadcast hints.

    At 100 TB the fact side (customer here; any fact generally) streams
    through map-side hash joins against the broadcast dims — zero
    shuffles before the final aggregation."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal").alias("sum_bal"),
        )
    )


@query(
    "b16_join_theta",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, o.o_totalprice, c.c_acctbal
    FROM orders o JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 100 * c.c_acctbal
    """,
)
def b16_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 100 * c.c_acctbal)
    return o.join(c, cond).select(
        "o_orderkey", "c_custkey", "o_totalprice", "c_acctbal"
    )


@query(
    "b17_join_range_interval",
    oracle="""
    SELECT e1.event_id AS signup_id, e1.user_id,
           e2.event_id AS follow_id, e2.event_type AS follow_type
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'signup'
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    """,
)
def b17_join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join. Scale note: the equi-key (user_id) carries the
    shuffle; the range predicate is applied post-shuffle within matched
    keys, so this stays a hash join, not a cartesian."""
    e = load(spark, sf_dir, "events")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e1.event_type") == "signup")
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return e1.join(e2, cond).select(
        F.col("e1.event_id").alias("signup_id"),
        F.col("e1.user_id").alias("user_id"),
        F.col("e2.event_id").alias("follow_id"),
        F.col("e2.event_type").alias("follow_type"),
    )


@query(
    "b18_join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           e.event_id AS prev_id, e.event_type AS prev_type
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN events e ON p.user_id = e.user_id AND p.ts > e.ts
    """,
)
def b18_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark support — SURVEY.md §2 b18).

    Technique: because the probe side ('purchase' rows) is a subset of
    the build side (all events), a single window pass per user gives
    each row its latest STRICTLY-earlier predecessor — exactly DuckDB's
    ``ASOF JOIN ... ON p.ts > e.ts`` match. The frame is RANGE over
    ``unix_micros(ts)`` ending at -1 µs, NOT ``lag()`` over a row
    ordering: on a (user_id, ts) duplicate, lag returns the tied row and
    silently violates the strict inequality — the exact defect SURVEY §7
    hard-list #2 warned about, surfaced by the round-9 time-hostile
    corpus (spark=172 vs oracle=166 on injected purchase/click ties) and
    pinned in tests/test_time_hostile.py::
    test_b18_strict_inequality_on_ties. Among several strictly-earlier
    rows tied at the match timestamp the pick is DETERMINISTIC (ADVICE
    r09): ``max(struct(ts_micros, event_id, event_type))`` over the
    frame takes the greatest (ts, event_id) pair, so a hash-compare
    sweep can never flake on engine partition order. DuckDB's ASOF pick
    on tied build rows remains unspecified, so hash-tier parity still
    relies on the fixtures'/corpora's singleton matched timestamp —
    but with a deterministic Spark side, a future tied corpus fails
    loudly and reproducibly instead of intermittently.

    Scale: one shuffle on user_id, sequential scan per partition — the
    same cost profile as a sort-merge as-of join; no cross product. For
    a general as-of (probe table disjoint from build table), union the
    two tagged inputs and apply the same ``last(build_col) OVER (RANGE
    ... -1 µs)`` per key — same plan shape.
    """
    e = load(spark, sf_dir, "events")
    # JOIN-key equality semantics, not window-grouping semantics: a
    # NULL user_id matches NOTHING in DuckDB's ASOF equality, but
    # window partitionBy would group all NULL keys into one ordinary
    # partition and happily match them to each other — the round-9
    # null-key corpus read spark=200 vs oracle=182 without this
    # filter. Every window-emulated join must exclude NULL keys
    # explicitly (tests/test_time_hostile.py pins it); the filter
    # pushes to the scan.
    e = e.filter(F.col("user_id").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max(
        F.struct(
            F.unix_micros("ts").alias("m"),
            F.col("event_id").alias("prev_id"),
            F.col("event_type").alias("prev_type"),
        )
    ).over(w)
    with_prev = e.select(
        "event_id",
        "user_id",
        "event_type",
        prev.getField("prev_id").alias("prev_id"),
        prev.getField("prev_type").alias("prev_type"),
    )
    return (
        with_prev.filter(
            (F.col("event_type") == "purchase") & F.col("prev_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "prev_id",
            "prev_type",
        )
    )


@query(
    "b19_join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def b19_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------

@query(
    "b20_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b20_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q1-shape aggregation (= ``entry()``).

    Partial aggregation is map-side; the decimal casts make the parallel
    sum order-independent so the result is bit-stable at any parallelism
    (see functions.determinism)."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qty_sum = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        duck_round(qty_sum, 2).alias("sum_qty"),
        dec_sum("l_extendedprice").alias("sum_base_price"),
        dec_sum_expr(disc, scale=4, round_to=2).alias("sum_disc_price"),
        duck_round(qty_sum / F.count(F.lit(1)), 4).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "b21_agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
    """,
)
def b21_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@query(
    "b22_agg_countdistinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def b22_agg_countdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query("b23_agg_approx_cd", oracle=None)  # approximate — rows-only tier (§5.4)
def b23_agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — the 100 TB path for distinct counts (no
    exact-distinct shuffle explosion). Approximate => never hash-matches
    a different engine's sketch; rows-only tier by design.

    Hash-tier upgrade probed and rejected (VERDICT r07 #7, round 8): at
    rsd=0.01 the estimate is deterministic but already off-exact at
    fixture scale (151 vs 150 distinct at sf0.01, 1507 vs 1500 at
    sf0.1), and an rsd small enough to force the exact linear-counting
    regime (0.001 => ~1.08M registers) inflates the aggregation buffer
    to a ~170 MiB task binary — the wrong trade everywhere. The
    estimator's accuracy and determinism ARE pinned engine-side by
    tests/test_properties.py::test_b23_hll_tolerance_and_determinism."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


@query(
    "b24_agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def b24_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            as_long(F.grouping("l_returnflag")).alias("g_flag"),
            as_long(F.grouping("l_linestatus")).alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
        )
    )


@query(
    "b25_agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def b25_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            as_long(F.grouping("o_orderstatus")).alias("g_status"),
            as_long(F.grouping("o_orderpriority")).alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
            "sum_price",
        )
    )


@query(
    "b26_agg_grouping_sets",
    oracle="""
    SELECT COALESCE(lang, 'ALL') AS g_lang, COALESCE(source, 'ALL') AS g_source,
           GROUPING(lang) AS gf_lang, GROUPING(source) AS gf_source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
    FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def b26_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((lang), (source), ()) with grouping()
    markers separating key-NULL from subtotal-NULL.

    Portability note (round-8 fuzz finding): on EMPTY input Spark's
    grouping-sets expansion emits ZERO rows for every set — including
    the pure () set, where ANSI/DuckDB emit one global row. Parity
    holds on any non-empty relation (randomized NULL-key coverage in
    tests/test_fuzz_parity.py::test_fuzz_grouping_sets_nulls; the
    divergence itself is pinned by
    test_grouping_sets_empty_input_divergence)."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT COALESCE(lang, 'ALL') AS g_lang, COALESCE(source, 'ALL') AS g_source,
               CAST(GROUPING(lang) AS BIGINT) AS gf_lang,
               CAST(GROUPING(source) AS BIGINT) AS gf_source,
               COUNT(*) AS n_docs,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
        FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


@query(
    "b27_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def b27_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-group hardening (round-9 fuzz find): under ANSI mode
    (the Spark 4 default, so also the driver's vanilla session)
    ``F.corr`` THROWS DIVIDE_BY_ZERO whenever a group's variance is
    zero (constant column, n >= 2), where DuckDB's corr returns NULL.
    The fixture groups are large and non-constant, so this was latent —
    but a 100 TB engine cannot throw on a degenerate group.
    ``safe_corr`` (functions.determinism) is the NULL- and ANSI-aligned
    twin: try_divide for DuckDB's NULL cases, marginals masked to the
    pairwise-complete row set.  stddev/var need no guard (NULL at n=1
    both engines).  Fuzzed on the contract-shaped domain incl. constant
    columns and one-sided nulls by
    tests/test_fuzz_parity.py::test_fuzz_stats_contract_domain."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        duck_round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        duck_round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        duck_round(
            safe_corr("l_quantity", "l_extendedprice"), 6
        ).alias("corr_qty_price"),
    )


@query(
    "b28_agg_percentile",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75
    FROM events GROUP BY event_type
    """,
)
def b28_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — same definition as
    DuckDB quantile_cont). At 100 TB prefer approx_percentile; the exact
    form is the correctness anchor.

    Pairing fuzzed in tests/test_fuzz_parity.py (round 9): identical on
    arbitrary finite doubles EXCEPT mixed-zero multisets {0.0, -0.0},
    where Spark emits -0.0 and DuckDB +0.0 — a pinned divergence
    (test_percentile_mixed_zero_divergence_pin); no fixture column
    carries -0.0."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        duck_round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        duck_round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        duck_round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
    )


@query(
    "b29_agg_collect_sorted",
    oracle="""
    SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types_sorted
    FROM events GROUP BY user_id
    """,
)
def b29_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is order-nondeterministic => sort_array canonicalizes;
    emitted as a joined string (flattened-scalar rule, §5.4 item 7)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_list("event_type")), ",").alias(
            "types_sorted"
        )
    )


@query(
    "b30_agg_minmax_by",
    oracle="""
    WITH ranked AS (
        SELECT p_brand, p_name, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_name DESC) AS rmax,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice ASC, p_name ASC) AS rmin
        FROM part)
    SELECT p_brand,
           MAX(CASE WHEN rmax = 1 THEN p_name END) AS top_name,
           MAX(p_retailprice) AS top_price,
           MAX(CASE WHEN rmin = 1 THEN p_name END) AS bottom_name
    FROM ranked GROUP BY p_brand
    """,
)
def b30_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin with composite (price, name) ordering — fixture has
    retail-price ties within brands, so the bare argmax would be
    nondeterministic [probed]."""
    p = load(spark, sf_dir, "part")
    key = F.struct(F.col("p_retailprice"), F.col("p_name"))
    return p.groupBy("p_brand").agg(
        F.max_by("p_name", key).alias("top_name"),
        F.max("p_retailprice").alias("top_price"),
        F.min_by("p_name", key).alias("bottom_name"),
    )


@query(
    "b31_agg_salted_skew",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def b31_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys, result identical
    to a plain GROUP BY (the oracle proves it).

    ``events.event_type`` has a handful of values over 100k+ rows — the
    worst-case skew shape: a plain groupBy sends each key's entire
    volume to ONE reducer. Salting splits every key into 32 subkeys
    (deterministic hash of the row id), aggregates partials per
    (key, salt), then combines the 32 partials per key — reducer fan-in
    drops from O(rows-per-key) to 32, at the cost of one extra (tiny)
    shuffle. Decimal partials keep the two-phase sum bit-equal to the
    one-phase oracle sum regardless of combine order.

    Spark's map-side partial aggregation + AQE skew handling cover most
    real cases; explicit salting is the technique for when a single
    reduce key still exceeds an executor (100 TB posture)."""
    e = load(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(32)).alias("salt")
    partial = (
        e.select("event_type", salt, "value")
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        duck_round(F.sum("pv").cast("double"), 2).alias("total_value"),
    )


@query(
    "b32_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def b32_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts per priority with one column
    per status. Explicit pivot values keep the plan single-pass (no
    distinct-values pre-query) and the output schema static — required
    at scale AND for schema-stable verification. Absent cells are
    coalesced to 0 to match SQL's FILTER counts."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"{s.lower()}_cnt")
            for s in ("F", "O", "P")
        ],
    )


@query(
    "b33_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
    FROM part
    """,
)
def b33_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): numeric part attributes to
    (key, metric, value) rows — the normalization step feeding
    metric-generic pipelines. Pure narrow transform (each input row
    emits its melted rows map-side; no shuffle)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "b34_sample_systematic",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def b34_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% systematic sample: keep rows whose key-digest
    prefix falls under the cut ('1a' hex = 26/256 ~ 10.2%). Unlike
    TABLESAMPLE/rand(), the digest rule is engine- and run-stable
    (md5 hex compares identically everywhere), reproducible at any
    scale, and trivially stratifiable by switching the hashed key —
    the data-selection primitive for training-corpus subsampling."""
    o = load(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    return o.filter(bucket < "1a").select("o_orderkey", "o_totalprice")


@query(
    "b35_join_salted_skew",
    oracle="""
    WITH dim AS (SELECT DISTINCT event_type,
                        upper(event_type) AS type_label
                 FROM events)
    SELECT e.event_type, d.type_label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY 1, 2
    """,
)
def b35_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for skewed keys: the fact side joins a tiny dim on
    ``event_type`` — a handful of values over 100k+ rows, the shape
    where a shuffle join sends each key's entire volume to one reducer.
    Salting appends a deterministic fact-side salt (``pmod(xxhash64)``)
    and replicates the dim across all 16 salt values (explode), so the
    join key becomes (event_type, salt) and fan-in per reducer drops
    16x. Result is identical to the plain join (oracle proves it).

    At this dim size a broadcast join (b15) is strictly better — the
    technique matters when BOTH sides are too big to broadcast and one
    key dominates; AQE skew-split covers post-shuffle skew, salting
    covers it at the key level."""
    e = load(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_label", F.upper("event_type"))
    )
    n_salts = 16
    salted_fact = e.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return (
        salted_fact.join(salted_dim, ["event_type", "salt"])
        .groupBy("event_type", "type_label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Sort / top-k
# --------------------------------------------------------------------------

@query(
    "b40_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def b40_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject (per-partition
    heap + driver merge of k rows) — no full sort at 100 TB."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "b41_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 3
    """,
)
def b41_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            as_long(F.row_number().over(w)).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Set operations / subqueries
# --------------------------------------------------------------------------

@query(
    "b50_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 250000
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice < 50000
    """,
)
def b50_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    a = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 250000))
    b = o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000))
    return a.unionByName(b)


@query(
    "b51_intersect",
    oracle="""
    SELECT o_custkey AS k FROM orders
    INTERSECT
    SELECT user_id AS k FROM events
    """,
)
def b51_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    e = load(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return o.intersect(e)


@query(
    "b52_except",
    oracle="""
    SELECT o_custkey AS k FROM orders
    EXCEPT ALL
    SELECT user_id AS k FROM events
    """,
)
def b52_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    e = load(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return o.exceptAll(e)


@query(
    "b53_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def b53_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "b54_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def b54_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


@query(
    "b55_subquery_corr_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey
                    AND l.l_shipdate > TIMESTAMP '2000-06-01 00:00:00')
    """,
)
def b55_subquery_corr_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey
                        AND l.l_shipdate > TIMESTAMP '2000-06-01 00:00:00')
        """
    )


@query(
    "b36_histogram",
    oracle="""
    WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
               FROM orders)
    SELECT CAST(CASE WHEN hi = lo THEN 0
                     ELSE LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)), 19)
                END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders, b
    GROUP BY 1
    """,
)
def b36_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bucket histogram of order totals. Bucketing is
    plain arithmetic (floor of the scaled offset, top edge clamped into
    the last bucket) rather than width_bucket(), so both engines run
    the identical IEEE expression. The min/max bounds are one tiny
    aggregate broadcast into the bucketing scan — two passes total,
    both full-scan-shaped, no row-level shuffle beyond the 20-group
    aggregation.

    Degenerate-range guard (round-9 sweep): a constant column makes
    hi == lo, where the unguarded divide THROWS under ANSI on the Spark
    side and the engines disagree on the fallthrough (DuckDB NULL/0 ->
    NULL bucket, Spark least(NULL, 19) -> 19) — the same CASE lands all
    rows in bucket 0 on BOTH engines, matching g18's quantizer
    precedent."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(20)
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width), F.lit(19)
        )
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "b37_null_ordering",
    oracle="""
    SELECT c.c_custkey AS left_key, o.o_orderkey AS right_key
    FROM (SELECT * FROM customer WHERE c_custkey < 750) c
    FULL JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
    ORDER BY right_key DESC NULLS LAST, left_key ASC NULLS FIRST
    LIMIT 20
    """,
)
def b37_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL-ordering under LIMIT: engines disagree on default
    NULL placement (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST), and
    the driver's hash is order-insensitive EXCEPT where LIMIT selects
    rows — so every nullable sort under a LIMIT must pin NULLS
    FIRST/LAST explicitly on both sides (§5.4 item 3 extended to
    nullable keys). Full-join output supplies genuine NULL keys; the
    two-level order is total (non-null right keys unique; NULL-right
    rows distinguished by unique left keys)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 750)
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey", "o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full")
        .select(
            F.col("c_custkey").alias("left_key"),
            F.col("o_orderkey").alias("right_key"),
        )
        .orderBy(
            F.col("right_key").desc_nulls_last(),
            F.col("left_key").asc_nulls_first(),
        )
        .limit(20)
    )


@query(
    "b38_sql_cte_chain",
    oracle="""
    WITH cust_spend AS (
        SELECT c.c_custkey, c.c_nationkey,
               ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS spend
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_nationkey
    ),
    nation_top AS (
        SELECT n.n_regionkey, cs.c_custkey, cs.spend,
               row_number() OVER (PARTITION BY n.n_regionkey
                                  ORDER BY cs.spend DESC, cs.c_custkey) AS rk
        FROM cust_spend cs JOIN nation n ON cs.c_nationkey = n.n_nationkey
    )
    SELECT r.r_name, nt.c_custkey AS top_customer, nt.spend
    FROM nation_top nt JOIN region r ON nt.n_regionkey = r.r_regionkey
    WHERE nt.rk = 1
    """,
)
def b38_sql_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point (SURVEY §3.2 EP3) with a chained-CTE analytic:
    top spender per region through two CTE stages and a window — the
    exact SQL text runs on Spark over the registered views, proving the
    SQL surface end-to-end (same Catalyst pipeline as the DataFrame
    queries after parsing)."""
    register_views(spark, sf_dir, "customer", "orders", "nation", "region")
    return spark.sql(
        """
        WITH cust_spend AS (
            SELECT c.c_custkey, c.c_nationkey,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS spend_raw
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_nationkey
        ),
        scaled AS (
            SELECT c_custkey, c_nationkey, spend_raw,
                   ABS(spend_raw * 100.0) AS y
            FROM cust_spend
        ),
        rounded AS (
            -- exact std::round mirror (see functions.determinism.duck_round):
            -- split the integer part BEFORE the fraction compare — the old
            -- FLOOR(y + 0.5) form rounds up one ulp below a half-integer —
            -- and return the input itself at zero so the sign of -0.0
            -- survives (round-9 sweep of the round-8 fix into SQL text).
            -- The CAST AS DOUBLE before /100.0 is load-bearing: a SQL
            -- 100.0 literal is DECIMAL, and decimal division would both
            -- drop -0.0 and leave the division outside double semantics
            -- (tests/test_fuzz_parity.py::test_sql_text_round_mirror_
            -- boundary_pin caught exactly that).
            SELECT c_custkey, c_nationkey,
                   CASE WHEN spend_raw = 0 THEN spend_raw
                        WHEN spend_raw < 0
                        THEN -(CAST(FLOOR(y) + (CASE WHEN y - FLOOR(y) >= 0.5
                                                THEN 1 ELSE 0 END) AS DOUBLE)
                               / 100.0)
                        ELSE CAST(FLOOR(y) + (CASE WHEN y - FLOOR(y) >= 0.5
                                              THEN 1 ELSE 0 END) AS DOUBLE)
                             / 100.0
                   END AS spend
            FROM scaled
        ),
        nation_top AS (
            SELECT n.n_regionkey, cs.c_custkey, cs.spend,
                   row_number() OVER (PARTITION BY n.n_regionkey
                                      ORDER BY cs.spend DESC, cs.c_custkey) AS rk
            FROM rounded cs JOIN nation n ON cs.c_nationkey = n.n_nationkey
        )
        SELECT r.r_name, nation_top.c_custkey AS top_customer, nation_top.spend
        FROM nation_top JOIN region r ON nation_top.n_regionkey = r.r_regionkey
        WHERE nation_top.rk = 1
        """
    )


@query(
    "b42_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    """,
)
def b42_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 / modern-SQL surface): the parser derives
    the grouping keys from the non-aggregate select items, so the plan
    is IDENTICAL to an explicit b20-style groupBy — same partial
    (map-side) aggregation, same single key shuffle. The decimal cast
    keeps the parallel quantity sum order-independent (determinism
    helpers rationale); scale posture is b20's."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        """
    )


@query(
    "b56_join_lateral",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.n_orders, t.max_price
    FROM customer c,
    LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                    MAX(o.o_totalprice) AS max_price
             FROM orders o WHERE o.o_custkey = c.c_custkey) t
    """,
)
def b56_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.2+ lateral join surface):
    a per-customer aggregate over orders expressed as a correlated
    derived table. The ungrouped aggregate subquery yields exactly one
    row per outer row (NULL max / zero count for order-less customers),
    so the lateral is an implicit LEFT-ish semantics both engines share.
    Catalyst decorrelates this into a plain aggregate-then-outer-join —
    one shuffle on o_custkey then a key join, NOT a per-row subquery
    execution — so the 100 TB plan is the same as writing the
    groupBy+join by hand; lateral is sugar the optimizer removes."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.n_orders, t.max_price
        FROM customer c,
        LATERAL (SELECT COUNT(*) AS n_orders, MAX(o.o_totalprice) AS max_price
                 FROM orders o WHERE o.o_custkey = c.c_custkey) t
        """
    )
