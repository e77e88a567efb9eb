"""Round-6 queries: runtime-filter joins, entity resolution, market
basket analysis, corpus selection, regression, data-quality and
anti-entropy surfaces (SURVEY.md §2 extensions + the pyspark guide's
"runtime filter" / "blocked similarity join" patterns).

Every query is DataFrame-native (no Python UDFs anywhere) and carries a
FULL value-hash DuckDB oracle. Float output columns are either pure
reads (min/max of stored values), integer-ratio divisions (BIGINT /
BIGINT → binary64, bit-identical in both engines), or integer-cents
sums — the repo-wide determinism rules (functions/money.py,
functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import cents, sql_sum_money, sum_money
from ..functions.text import portable_hash64, sql_portable_hash64, sql_token_count, token_count
from ..sources.catalog import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Runtime-filter join: Bloom pre-filter built from first principles
# --------------------------------------------------------------------------
BLOOM_BITS = 16_384  # m: 256 64-bit words — broadcastable at any dim size
BLOOM_K = 3  # hash functions
BLOOM_PRICE_MIN = 450_000.0  # ~p90 of o_totalprice → ~10% selective dim


def _bloom_positions(key: F.Column) -> list[F.Column]:
    """k bit positions via seeded native xxhash64 on the RAW key — no
    string cast, no md5: the Bloom internals never face the oracle
    (false positives are removed by the exact verify join), so the
    engine-specific hash is free to be the fast codegen one. This is
    the one place the portable-md5 rule (functions/text.py) does NOT
    apply."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(BLOOM_BITS))
        for i in range(BLOOM_K)
    ]


@register(
    "bloom_prefilter_semi_join",
    # The oracle is the EXACT semi-join: the Bloom stage only pre-filters
    # (false positives are removed by the exact verify join), so a single
    # dropped or phantom row means the filter bits are wrong.
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > {BLOOM_PRICE_MIN}
    )
    GROUP BY l_returnflag
    """,
    tags=("runtime-filter", "bloom", "semi-join"),
    bench=True,
)
def bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pre-filter for a selective semi-join, built
    from first principles with JVM aggregates (Spark 4.1 does not expose
    `bloom_filter_agg`/`might_contain` in the SQL registry).

    Build side: dim keys → k=3 bit positions (seeded native xxhash64 on
    the raw key — pure codegen, no string cast) → groupBy word →
    `bit_or(1 << bit)` → folded to ONE row as a word→bits map: a FIXED
    16 Kbit broadcast value no matter how many dim keys there are.
    Probe side: lineitem crossJoins the broadcast 1-row bitmap once and
    tests all 3 bits with `element_at` in a single codegen'd
    projection; survivors THEN pay an exact semi-join that removes
    Bloom false positives. At 100 TB the dim key set may be too big to broadcast
    raw, but the Bloom bitmap never grows — survivors (~selectivity +
    FP rate) are the only rows that pay the shuffled exact join.
    SUM(l_quantity) is deterministic: quantities are integral, so the
    double sum is exact integer arithmetic in binary64."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    keys = orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN).select("o_orderkey")

    positions = keys.select(
        F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("p")
    )
    words = (
        positions.select(
            F.expr("p DIV 64").alias("w"), F.pmod(F.col("p"), F.lit(64)).alias("b")
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(1L, CAST(b AS INT))")).alias("bits"))
    )

    # Fold the 256-word bitmap into ONE row (a word→bits map): a single
    # broadcast value instead of k joinable tables, so the probe pays
    # one crossJoin(broadcast) and tests all k bits in one projection.
    bitmap = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bf")
    )
    probe = li.select("l_orderkey", "l_returnflag", "l_quantity").crossJoin(
        F.broadcast(bitmap)
    )
    for i, pos in enumerate(_bloom_positions(F.col("l_orderkey"))):
        probe = probe.withColumn(f"_p{i}", pos).filter(
            F.coalesce(
                F.element_at(F.col("bf"), F.expr(f"_p{i} DIV 64")), F.lit(0)
            ).bitwiseAND(F.expr(f"shiftleft(1L, CAST(_p{i} % 64 AS INT))"))
            != 0
        )
    exact = probe.join(keys, probe.l_orderkey == keys.o_orderkey, "left_semi")
    return exact.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"), F.sum("l_quantity").alias("sum_qty")
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events WHERE ts IS NOT NULL
    ), c AS (
      SELECT src, dst, COUNT(*) AS n FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n,
           CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS src_total,
           CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS DOUBLE) AS prob
    FROM c
    """,
    tags=("sequence", "markov", "window"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    P(next=dst | cur=src). One shuffle on user_id for the lead() window
    (map-side combinable count after), then a tiny window over the
    |types|² matrix. The probability is BIGINT/BIGINT division — IEEE
    binary64, bit-identical across engines. Order within a user is total
    ((ts, event_id) — event_id is unique), so lead() is deterministic.
    NULL event time is excluded on both engines (Spark sorts NULLS
    FIRST, DuckDB NULLS LAST — the sequence would differ)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("src")
    out = pairs.withColumn("src_total", F.sum("n").over(wt))
    return out.withColumn(
        "prob", F.col("n").cast("double") / F.col("src_total").cast("double")
    )


# --------------------------------------------------------------------------
# Entity resolution: blocked Levenshtein near-dup pairs
# --------------------------------------------------------------------------
LEV_MAX = 3


@register(
    "part_name_near_dup",
    oracle=f"""
    SELECT a.p_brand AS brand,
           a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= {LEV_MAX}
     AND levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
    """,
    tags=("entity-resolution", "levenshtein", "blocked-join"),
)
def part_name_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked string-similarity self-join (entity resolution): part
    names within edit distance {LEV_MAX}, candidate pairs generated ONLY
    inside a brand block (equi-join on p_brand → hash join, quadratic
    cost bounded per block) with a length-band pre-filter (|len diff| ≤
    max dist is a necessary condition for edit distance — cheap and cuts
    the expensive levenshtein calls before they run). At 100 TB the
    block key widens (brand, size, name-prefix) to keep blocks bounded —
    the plan shape (equi-join on block key + cheap-then-expensive filter
    chain) is the scalable one."""
    part = _t(spark, sf_dir, "part")
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
    )
    joined = a.join(b, "brand").filter(
        (F.col("partkey_a") < F.col("partkey_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= LEV_MAX
        )
        & (F.levenshtein("name_a", "name_b") <= LEV_MAX)
    )
    return joined.select(
        "brand",
        "partkey_a",
        "partkey_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    )


# --------------------------------------------------------------------------
# Corpus selection under a token budget (two-phase global cumsum)
# --------------------------------------------------------------------------
SELECT_BUCKETS = 16


@register(
    "docs_token_budget_select",
    # Oracle uses the naive single-partition global window — proving the
    # two-phase distributed plan computes the identical selection.
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {sql_token_count('text')} AS tok,
             (10000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
               // greatest(length(text), 1) AS quality_bp
      FROM documents
    ), tot AS (
      SELECT CAST(SUM(tok) AS BIGINT) // 2 AS budget FROM t
    ), c AS (
      SELECT doc_id, tok, quality_bp,
             CAST(SUM(tok) OVER (ORDER BY quality_bp DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      FROM t
    )
    SELECT doc_id, CAST(tok AS BIGINT) AS tok, CAST(quality_bp AS BIGINT) AS quality_bp, cum_tok
    FROM c, tot WHERE cum_tok <= budget
    """,
    tags=("llm", "corpus-selection", "two-phase", "global-window"),
    bench=True,
)
def docs_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus selection under a token budget: take documents in
    quality order (integer basis-point alpha ratio — exact in both
    engines) until the cumulative token count reaches half the corpus.

    The naive plan is `SUM(tok) OVER (ORDER BY quality DESC)` — a
    single-partition global window that collapses 100 TB onto one
    reducer. This is the two-phase shape instead (same trick as
    docs_global_index, corpus_queries.py): range-repartition by the sort
    key so partition ids follow global sort order, per-partition window
    cumsum, tiny prefix-sum over the per-partition totals broadcast back
    as offsets. The oracle is the naive global window — the two plans
    must agree row-for-row."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("tok"),
        F.expr(
            "(10000 * length(regexp_replace(text, '[^A-Za-z]', ''))) "
            "DIV greatest(length(text), 1)"
        ).alias("quality_bp"),
    )
    budget = t.agg((F.sum("tok") / 2).cast("long").alias("budget"))
    ranged = t.repartitionByRange(
        SELECT_BUCKETS, F.desc("quality_bp"), F.asc("doc_id")
    ).withColumn("pid", F.spark_partition_id())
    totals = ranged.groupBy("pid").agg(F.sum("tok").alias("ptot"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(woff), F.lit(0)).alias("off")
    )
    win = (
        Window.partitionBy("pid")
        .orderBy(F.desc("quality_bp"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        ranged.join(F.broadcast(offsets), "pid")
        .withColumn("cum_tok", F.col("off") + F.sum("tok").over(win))
        .crossJoin(F.broadcast(budget))
        .filter(F.col("cum_tok") <= F.col("budget"))
    )
    return cum.select("doc_id", "tok", "quality_bp", "cum_tok")


# --------------------------------------------------------------------------
# Market-basket co-occurrence with lift
# --------------------------------------------------------------------------
MIN_SUPPORT = 2


@register(
    "basket_cooccurrence_lift",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    part_n AS (SELECT l_partkey, COUNT(*) AS n_part FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT}
    )
    SELECT p.part_a, p.part_b, p.n_ab,
           pa.n_part AS n_a, pb.n_part AS n_b,
           CAST(p.n_ab * o.n AS DOUBLE) / CAST(pa.n_part * pb.n_part AS DOUBLE) AS lift
    FROM pairs p
    JOIN part_n pa ON pa.l_partkey = p.part_a
    JOIN part_n pb ON pb.l_partkey = p.part_b
    CROSS JOIN n_orders o
    """,
    tags=("market-basket", "cooccurrence", "self-join"),
    bench=True,
)
def basket_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order,
    with support and lift. Pairs come from per-order SORTED item
    arrays expanded by a higher-order nested transform — basket size
    (≤13 lines in the testdata) bounds the per-row fanout, NOT table
    size, so at 100 TB the same plan holds. The array form replaces
    the earlier distinct + self-join-on-orderkey, which shuffled the
    item set three times (distinct, join re-partition, pair agg); this
    plan shuffles twice — groupBy(orderkey) with map-side combine
    builds baskets, the pair aggregate counts them — and the basket
    subtree is reused (ReusedExchange) by the per-part counts and the
    order total, so lineitem is scanned once. Measured same-session at
    sf0.1: the pairs core runs 1.81s vs the join form's 2.42s (25%
    less), end-to-end ~equal locally (basket build dominates); the
    dropped exchange is the part that compounds on a real cluster,
    where every shuffle is network. Lift is an exact BIGINT product ratio
    ((n_ab·N) / (n_a·n_b)) so the double division is bit-identical
    across engines. The per-part counts join back AQE-sized (they
    scale with the part dim, so no forced broadcast — the planner
    broadcasts while |parts| ≪ |pairs| fits and shuffles on part key
    at larger dims; r7 VERDICT item 3)."""
    # NULL-key guard (ADVICE r5): groupBy would form a basket for a NULL
    # orderkey (one giant pseudo-basket) where the oracle's self-join
    # and COUNT(DISTINCT l_orderkey) both exclude NULLs. The ingest
    # contract keeps keys NOT NULL, so this filter is a no-op today —
    # it makes the plan's NULL semantics match the oracle by
    # construction instead of by data contract.
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    n_orders = baskets.agg(F.count("*").alias("n"))
    part_n = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_part"))
    )
    # sorted array → ascending (part_a, part_b) pairs without a join:
    # two chained Generates. r13 (VERDICT r12 item 6, guide §1.2
    # per-task work): the previous form materialized the WHOLE pair
    # list per basket as an array of structs (flatten of nested
    # transforms — k(k-1)/2 struct allocations plus the flattened
    # array) before exploding it; this one explodes part_a first and
    # streams each pair row out of a per-element filtered slice, so
    # the only per-element allocation is the tail array. parts is
    # sorted+distinct (collect_set), so "later elements" ≡ "greater
    # values" and the pair multiset is unchanged.
    pairs = (
        baskets.select(F.explode("parts").alias("part_a"), "parts")
        .select(
            "part_a",
            F.explode(
                F.filter("parts", lambda y: y > F.col("part_a"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPPORT)
    )
    pa = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    pb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    out = (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n_orders))
    )
    return out.select(
        "part_a",
        "part_b",
        "n_ab",
        "n_a",
        "n_b",
        (
            (F.col("n_ab") * F.col("n")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# Streaming: stream-static enrichment
# --------------------------------------------------------------------------
@register(
    "streaming_static_enrich",
    # Hash-checked against the BATCH join: the streaming runtime must
    # enrich every micro-batch against the same static dim and reach the
    # identical per-segment totals.
    oracle=f"""
    SELECT c.c_mktsegment AS segment, e.event_type,
           COUNT(*) AS n, {sql_sum_money('e.value')} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "stream-static-join"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the events stream joins a static
    customer dimension (sized by the planner per micro-batch — AQE
    broadcasts it when it fits in executor memory and shuffles when it
    doesn't, since customer scales with sf; the static side is re-read
    per micro-batch, picking up dim updates) and aggregates per
    (segment, event_type).
    Runs on the Structured Streaming runtime to completion and is
    hash-checked against the batch twin. Money via integer cents inside
    the streaming agg (repo determinism rule)."""
    import os
    import uuid

    from ..streaming.incremental import stream_events
    from .pipeline_queries import record_stream_plan

    events = stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    enriched = events.join(cust, "user_id")
    agg = enriched.groupBy("segment", "event_type").agg(
        F.count("*").alias("n"), sum_money(F.col("value")).alias("sum_value")
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
        record_stream_plan(q)
    finally:
        q.stop()
    return spark.table(name)


# --------------------------------------------------------------------------
# Data-quality expectations suite
# --------------------------------------------------------------------------
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "data_expectations_check",
    oracle=f"""
    SELECT 'orders_fk_customer' AS rule, 'orders' AS table_name,
           COUNT(*) AS n_checked,
           COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_qty_range', 'lineitem', COUNT(*),
           COUNT(*) FILTER (WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
    FROM lineitem
    UNION ALL
    SELECT 'events_value_finite_nonneg', 'events', COUNT(*),
           COUNT(*) FILTER (WHERE value IS NULL OR value < 0
                            OR isnan(value) OR isinf(value))
    FROM events
    UNION ALL
    SELECT 'events_ts_present', 'events', COUNT(*),
           COUNT(*) FILTER (WHERE ts IS NULL)
    FROM events
    UNION ALL
    SELECT 'events_type_domain', 'events', COUNT(*),
           COUNT(*) FILTER (WHERE event_type IS NULL
                            OR event_type NOT IN {EVENT_TYPES!r})
    FROM events
    UNION ALL
    SELECT 'customer_key_unique', 'customer', COUNT(*),
           COUNT(*) - COUNT(DISTINCT c_custkey)
    FROM customer
    UNION ALL
    SELECT 'events_key_unique', 'events', COUNT(*),
           COUNT(*) - COUNT(DISTINCT event_id)
    FROM events
    UNION ALL
    SELECT 'documents_key_unique', 'documents', COUNT(*),
           COUNT(*) - COUNT(DISTINCT doc_id)
    FROM documents
    UNION ALL
    SELECT 'embeddings_key_unique', 'embeddings', COUNT(*),
           COUNT(*) - COUNT(DISTINCT vec_id)
    FROM embeddings
    UNION ALL
    SELECT 'documents_nonempty', 'documents', COUNT(*),
           COUNT(*) FILTER (WHERE text IS NULL OR length(trim(text)) = 0)
    FROM documents
    """,
    tags=("data-quality", "expectations"),
)
def data_expectations_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ/Great-
    Expectations shape, DataFrame-native): each rule is one map-side-
    combinable aggregation over its table — null/range/domain checks are
    conditional counts in a single scan, uniqueness is count vs distinct
    count, referential integrity is a left join + null count. Every rule
    emits (rule, table, n_checked, n_violations); the suite is a
    union of 1-row aggregates, so adding rules never adds shuffles of
    data rows."""

    def rule(name: str, table: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("rule"),
            F.lit(table).alias("table_name"),
            F.col("n_checked"),
            F.col("n_violations"),
        )

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    docs = _t(spark, sf_dir, "documents")

    fk = orders.join(
        cust.select("c_custkey"),
        orders.o_custkey == cust.c_custkey,
        "left",
    ).agg(
        F.count("*").alias("n_checked"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_violations"),
    )
    qty = li.agg(
        F.count("*").alias("n_checked"),
        F.count(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            )
        ).alias("n_violations"),
    )
    # NaN/Inf join the value rule: a NaN value would THROW in the money
    # lane's cents() cast under ANSI mode — the expectation makes the
    # finiteness contract auditable at ingest (same division of labor
    # as emb_vector_audit for the ANN lane). ts presence likewise gates
    # the time-ordered operators, which exclude NULL event time.
    val = ev.agg(
        F.count("*").alias("n_checked"),
        F.count(
            F.when(
                F.col("value").isNull()
                | (F.col("value") < 0)
                | F.isnan(F.col("value"))
                | (F.col("value") == float("inf"))
                | (F.col("value") == float("-inf")),
                1,
            )
        ).alias("n_violations"),
    )
    ts_present = ev.agg(
        F.count("*").alias("n_checked"),
        F.count(F.when(F.col("ts").isNull(), 1)).alias("n_violations"),
    )
    dom = ev.agg(
        F.count("*").alias("n_checked"),
        F.count(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(*EVENT_TYPES),
                1,
            )
        ).alias("n_violations"),
    )
    def key_unique(df: DataFrame, key: str) -> DataFrame:
        # PK uniqueness per fact/dim table: the total orders the
        # time-ordered operators rely on ((ts, event_id) etc.) assume
        # it; an at-least-once feed violates exactly this.
        return df.agg(
            F.count("*").alias("n_checked"),
            (F.count("*") - F.countDistinct(key)).alias("n_violations"),
        )

    uniq = key_unique(cust, "c_custkey")
    nonempty = docs.agg(
        F.count("*").alias("n_checked"),
        F.count(
            F.when(
                F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0), 1
            )
        ).alias("n_violations"),
    )
    return (
        rule("orders_fk_customer", "orders", fk)
        .unionAll(rule("lineitem_qty_range", "lineitem", qty))
        .unionAll(rule("events_value_finite_nonneg", "events", val))
        .unionAll(rule("events_ts_present", "events", ts_present))
        .unionAll(rule("events_type_domain", "events", dom))
        .unionAll(rule("customer_key_unique", "customer", uniq))
        .unionAll(rule("events_key_unique", "events",
                       key_unique(_t(spark, sf_dir, "events"), "event_id")))
        .unionAll(rule("documents_key_unique", "documents",
                       key_unique(docs, "doc_id")))
        .unionAll(rule("embeddings_key_unique", "embeddings",
                       key_unique(_t(spark, sf_dir, "embeddings"), "vec_id")))
        .unionAll(rule("documents_nonempty", "documents", nonempty))
    )


# --------------------------------------------------------------------------
# Embedding int8 scalar quantization (per-vector min-max)
# --------------------------------------------------------------------------
@register(
    "emb_int8_quantize",
    oracle="""
    WITH d AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
      FROM embeddings
    ), m AS (
      SELECT vec_id, dv, list_min(dv) AS mn, list_max(dv) AS mx FROM d
    )
    SELECT vec_id, CAST(len(dv) AS BIGINT) AS n_dims, mn, mx,
           CAST(list_sum(list_transform(dv, x ->
             CASE WHEN mx = mn THEN 0
                  ELSE CAST(round((x - mn) / (mx - mn) * 255) AS BIGINT) END
           )) AS BIGINT) AS sum_codes
    FROM m
    """,
    tags=("embedding", "quantization", "higher-order"),
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max scalar quantization of embeddings to 8-bit
    codes (the standard ANN memory-compression step), entirely with
    JVM higher-order array functions — transform/array_min/aggregate,
    no Python in the path, no shuffle at all (pure per-row map; at
    100 TB this is scan-bound). Determinism: float32 values widen to
    binary64 EXACTLY before any arithmetic, and both engines then do
    identical IEEE ops + round-half-up on non-negative scaled values;
    the emitted checksum (sum of codes) is integer. mn/mx are pure
    reads (comparison only), so the doubles are bit-identical too."""
    emb = _t(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = emb.select("vec_id", dv.alias("dv"))
    m = d.select(
        "vec_id",
        "dv",
        F.array_min("dv").alias("mn"),
        F.array_max("dv").alias("mx"),
    )
    codes = F.transform(
        F.col("dv"),
        lambda x: F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
            F.round((x - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255).cast("long")
        ),
    )
    return m.select(
        "vec_id",
        F.size("dv").cast("long").alias("n_dims"),
        "mn",
        "mx",
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("sum_codes"),
    )


# --------------------------------------------------------------------------
# Grouped ordinary-least-squares trend (exact integer sufficient stats)
# --------------------------------------------------------------------------
TREND_EPOCH = "2024-01-01"


@register(
    "user_trend_slope",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             datediff('day', DATE '{TREND_EPOCH}', CAST(ts AS DATE)) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ), s AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM p GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents
    FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
    """,
    tags=("regression", "grouped-ols", "trend"),
)
def user_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of spend over time — the closed-form slope
    from integer sufficient statistics (n, Σx, Σy, Σxy, Σx²): ONE
    map-side-combinable groupBy, no window, no iteration. All sums are
    exact BIGINTs (day index × integer cents), so the final ratios are
    single bit-deterministic binary64 divisions. The same five sufficient
    statistics support intercept, R², and covariance at no extra pass —
    this is how grouped regression should run at 100 TB (never per-group
    fitting loops)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit(TREND_EPOCH).cast("date")
        ).cast("long").alias("x"),
        cents(F.col("value")).alias("y"),
    )
    s = p.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        s.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            "n",
            (
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / den.cast("double")
            ).alias("slope_cents_per_day"),
            (
                (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast(
                    "double"
                )
                / den.cast("double")
            ).alias("intercept_cents"),
        )
    )


# --------------------------------------------------------------------------
# Anti-entropy: order-insensitive per-table key checksums
# --------------------------------------------------------------------------
CHECKSUM_MOD = 1_000_003
CHECKSUM_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _sql_checksum_select(table: str, keys: tuple[str, ...]) -> str:
    key_exprs = ", ".join(f"CAST({k} AS VARCHAR)" for k in keys)
    h = sql_portable_hash64(f"concat_ws('|', '{table}', {key_exprs})")
    return (
        f"SELECT '{table}' AS table_name, COUNT(*) AS n_rows, "
        f"CAST(SUM({h} % {CHECKSUM_MOD}) AS BIGINT) AS checksum FROM {table}"
    )


@register(
    "table_key_checksums",
    oracle="\nUNION ALL\n".join(
        _sql_checksum_select(t, ks) for t, ks in CHECKSUM_KEYS.items()
    ),
    tags=("anti-entropy", "checksum", "replication"),
)
def table_key_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum of every table's key set — the
    anti-entropy primitive replica sync / migration verification needs:
    two sides compare (n_rows, checksum) per table and only diff tables
    that disagree. Checksum = Σ (portable_hash64(table|key) mod p), a
    commutative mod-sum: map-side combinable single aggregate per table,
    no shuffle of data rows, no row-order sensitivity, no driver-side
    iteration. Keys only (not floats/timestamps) so the hashed string
    rendering is identical in both engines."""
    out: DataFrame | None = None
    for table, keys in CHECKSUM_KEYS.items():
        df = _t(spark, sf_dir, table)
        key_cols = [F.col(k).cast("string") for k in keys]
        h = portable_hash64(F.concat_ws("|", F.lit(table), *key_cols))
        agg = df.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.pmod(h, F.lit(CHECKSUM_MOD))).alias("checksum"),
        ).select(
            F.lit(table).alias("table_name"), F.col("n_rows"), F.col("checksum")
        )
        out = agg if out is None else out.unionAll(agg)
    assert out is not None
    return out


# --------------------------------------------------------------------------
# Graph analytics: triangle counting with degree orientation
# --------------------------------------------------------------------------
@register(
    "copurchase_triangle_count",
    # Oracle counts triangles on the SIMPLE id-orientation — the count
    # is orientation-invariant, so the degree-oriented distributed plan
    # must produce the identical number despite a different join tree.
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT}
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*) FROM edges e1
              JOIN edges e2 ON e1.v = e2.u
              JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
    tags=("graph", "triangle-count", "degree-orientation"),
)
def copurchase_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on the co-purchase graph (edges =
    part pairs bought together in ≥{MIN_SUPPORT} orders) using DEGREE
    ORIENTATION — every edge points from its lower-(degree, id) endpoint
    to the higher one, so wedge fanout per node is bounded by
    out-degree ≈ O(√m) on any graph (arboricity bound) instead of the
    raw degree: the classic fix for the hub-explosion that kills the
    naive id-oriented join at scale. Each triangle appears exactly once
    (its minimum vertex in the total order is the wedge center), so the
    count equals the oracle's id-oriented count. Two equi-joins
    (wedge-build on center, wedge-close on (x, y)) — no cross products,
    map-side combinable final count."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPPORT)
        .select("u", "v")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ranked = edges.join(du, "u").join(dv, "v")
    u_first = F.struct(F.col("deg_u"), F.col("u")) < F.struct(
        F.col("deg_v"), F.col("v")
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_dst"),
    )
    w1 = oriented.select("src", F.col("dst").alias("x"), F.col("deg_dst").alias("dx"))
    w2 = oriented.select("src", F.col("dst").alias("y"), F.col("deg_dst").alias("dy"))
    wedges = w1.join(w2, "src").filter(
        F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    )
    closing = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return n_edges.crossJoin(F.broadcast(n_tri))


# --------------------------------------------------------------------------
# Rolling EWMA smoothing (dyadic-exact weights)
# --------------------------------------------------------------------------
EWMA_WINDOW = 8  # weights 1/2^j, j = 0..7 — all dyadic, all exact


@register(
    "user_value_ewma",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS y,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    )
    SELECT t.user_id, t.rn, COUNT(*) AS n_window,
           SUM(s.y / CAST((1 << (t.rn - s.rn)) AS DOUBLE))
             / SUM(1.0 / CAST((1 << (t.rn - s.rn)) AS DOUBLE)) AS ewma_cents
    FROM seq t JOIN seq s
      ON s.user_id IS NOT DISTINCT FROM t.user_id AND s.rn BETWEEN t.rn - {EWMA_WINDOW - 1} AND t.rn
    GROUP BY 1, 2
    """,
    tags=("timeseries", "ewma", "window-frame", "higher-order"),
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exponentially-weighted moving average per user (α = ½,
    {EWMA_WINDOW}-row window) in ONE shuffle: a window frame collects
    the trailing values in frame order and a JVM higher-order fold
    applies positional weights — no self-join (the oracle's shape),
    no second exchange. Exactness: y is integer cents and every weight
    is 1/2^j, so all terms are dyadic rationals exactly representable
    in binary64 — sums are order-independent and the final single
    division is bit-identical across engines (the same dyadic-exactness
    rule as the Tukey/percentile queries).

    NULL policy (pinned by tests/test_null_events_parity.py): a
    NULL-value event contributes nothing and occupies no window slot
    (collect_list would silently skip it on Spark while the oracle
    counted its weight — filter both sides instead); a NULL user_id is
    a real series (the oracle joins null-safely); NULL event time is
    excluded (frame order would differ across engines)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-(EWMA_WINDOW - 1), 0)
    seq = ev.select(
        "user_id",
        cents(F.col("value")).alias("y"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.collect_list(cents(F.col("value"))).over(frame).alias("fr"),
    )
    num = (
        "aggregate(transform(fr, (e, i) -> e / CAST(shiftleft(1L, "
        "size(fr) - 1 - i) AS DOUBLE)), CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    den = (
        "aggregate(transform(fr, (e, i) -> 1.0 / CAST(shiftleft(1L, "
        "size(fr) - 1 - i) AS DOUBLE)), CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    return seq.select(
        "user_id",
        "rn",
        F.size("fr").cast("long").alias("n_window"),
        F.expr(f"({num}) / ({den})").alias("ewma_cents"),
    )


# --------------------------------------------------------------------------
# Iterative graph centrality: integer-exact PageRank (unrolled)
# --------------------------------------------------------------------------
PR_ITERS = 3
PR_MASS0 = 1_000_000_000_000  # starting integer mass per node


def _pagerank_oracle() -> str:
    """Unrolled integer PageRank SQL (the emb_kmeans_refine precedent:
    a bounded iterative algorithm is still oracle-able by unrolling)."""
    base = f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges0 AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT}
    ),
    edges AS (SELECT u, v FROM edges0 UNION ALL SELECT v AS u, u AS v FROM edges0),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM edges GROUP BY 1),
    r0 AS (SELECT node, CAST({PR_MASS0} AS BIGINT) AS mass FROM nodes)"""
    for i in range(PR_ITERS):
        base += f""",
    s{i + 1} AS (
      SELECT e.v AS node,
             CAST(SUM((r.mass * 17 // 20) // d.d) AS BIGINT) AS got
      FROM edges e
      JOIN r{i} r ON r.node = e.u JOIN deg d ON d.node = e.u
      GROUP BY 1
    ),
    r{i + 1} AS (
      SELECT n.node,
             CAST(r.mass - (r.mass * 17 // 20) + coalesce(s.got, 0) AS BIGINT) AS mass
      FROM nodes n
      JOIN r{i} r ON r.node = n.node LEFT JOIN s{i + 1} s ON s.node = n.node
    )"""
    return base + f"\n    SELECT node, mass FROM r{PR_ITERS}"


@register(
    "copurchase_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "iterative", "integer-exact"),
)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph ({PR_ITERS} unrolled
    iterations, damping 17/20) in INTEGER mass arithmetic: each node
    starts with 10^12 units; per step it keeps `mass - mass·17//20`
    and sends `(mass·17//20) // deg` to each neighbor (the division
    remainders are deterministically dropped — the same dust on both
    engines). Integer sums are order-independent, so the whole
    iterative computation is bit-exact cross-engine — the float
    formulation would diverge in final-ulp summation order. Per
    iteration: one equi-join keyed on the sending node + one
    map-side-combinable groupBy on the receiving node; hot receivers
    are AQE-skew-split territory, and unbounded iteration counts move
    to a Pregel loop with the same per-step plan."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges0 = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPPORT)
        .select("u", "v")
    )
    edges = edges0.unionAll(
        edges0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = edges.select(F.col("u").alias("node")).distinct()
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    r = nodes.withColumn("mass", F.lit(PR_MASS0).cast("long"))
    for _ in range(PR_ITERS):
        sending = (
            edges.join(r.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                F.expr("(mass * 17 DIV 20) DIV d").alias("sent"),
            )
        )
        got = sending.groupBy("node").agg(F.sum("sent").alias("got"))
        r = (
            r.join(got, "node", "left")
            .select(
                "node",
                (
                    F.col("mass")
                    - F.expr("mass * 17 DIV 20")
                    + F.coalesce(F.col("got"), F.lit(0))
                ).alias("mass"),
            )
        )
    return r


# --------------------------------------------------------------------------
# Robust rolling statistics: sliding-window median (exact)
# --------------------------------------------------------------------------
MEDIAN_WINDOW = 7


@register(
    "user_value_rolling_median",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS y,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    )
    SELECT user_id, rn,
           median(y) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN {MEDIAN_WINDOW - 1} PRECEDING
                           AND CURRENT ROW) AS rolling_median_cents
    FROM seq
    """,
    tags=("timeseries", "rolling-median", "robust", "window-frame"),
)
def user_value_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (robust alternative to the rolling mean — a
    single outlier can't move it) over a {MEDIAN_WINDOW}-row trailing
    window, in ONE shuffle: the frame's values are collected in-frame,
    sorted with the JVM `array_sort`, and the midpoint extracted —
    sorting ≤{MEDIAN_WINDOW} elements per row is O(1) work, NOT a
    per-group global sort. Exactness: integer cents; the even-count
    midpoint (a+b)/2 is a dyadic rational, bit-equal to DuckDB's
    interpolated windowed median.

    NULL policy (same as user_value_ewma, pinned by
    tests/test_null_events_parity.py): NULL-value events occupy no
    window slot — collect_list would silently skip them while
    row_number counted them, shifting every later frame; NULL event
    time is excluded (frame order would differ across engines)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-(MEDIAN_WINDOW - 1), 0)
    seq = ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.array_sort(F.collect_list(cents(F.col("value"))).over(frame)).alias("fr"),
    )
    m = F.size("fr")
    odd = F.element_at("fr", ((m + 1) / 2).cast("int")).cast("double")
    even = (
        F.element_at("fr", (m / 2).cast("int"))
        + F.element_at("fr", (m / 2).cast("int") + 1)
    ).cast("double") / 2.0
    return seq.select(
        "user_id",
        "rn",
        F.when(m % 2 == 1, odd).otherwise(even).alias("rolling_median_cents"),
    )


# --------------------------------------------------------------------------
# Sequence mining: event trigram path distribution
# --------------------------------------------------------------------------
@register(
    "event_trigram_paths",
    oracle="""
    WITH t AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events WHERE ts IS NOT NULL
    )
    SELECT e1, e2, e3, COUNT(*) AS n
    FROM t WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
    """,
    tags=("sequence", "path-mining", "window"),
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order sequence mining: the distribution of length-3
    event-type paths per user (the behavioral-funnel complement of
    `event_transition_matrix`'s first-order chain). One shuffle on
    user_id computes both leads in a single Window operator; the
    output is at most |types|³ rows, so the count agg is map-side
    trivial. (ts, event_id) is a total order, so the paths are
    deterministic; NULL event time is excluded on both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        t.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Skyline (Pareto frontier) — two-phase, sort-based
# --------------------------------------------------------------------------
SKYLINE_BUCKETS = 16


def _skyline_filter(df: DataFrame, *, pid: str | None) -> DataFrame:
    """One skyline pass (minimize price_c, maximize size) over `df`,
    scoped to `pid` partitions when given, global otherwise: a point is
    dominated iff a strictly-cheaper point has size ≥ its own
    (range-frame running max) or an equal-priced point has size > its
    own (price-group max). Sort-based O(n log n), never the quadratic
    NOT-EXISTS self-join."""
    pkeys = [pid] if pid else []
    w_cheaper = (
        Window.partitionBy(*pkeys)
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy(*pkeys, "price_c")
    return (
        df.withColumn("m_cheaper", F.max("size").over(w_cheaper))
        .withColumn("m_equal", F.max("size").over(w_equal))
        .filter(
            (F.col("m_cheaper").isNull() | (F.col("m_cheaper") < F.col("size")))
            & (F.col("m_equal") <= F.col("size"))
        )
        .drop("m_cheaper", "m_equal")
    )


@register(
    "part_price_size_skyline",
    # The oracle is the quadratic NOT-EXISTS definition of Pareto
    # dominance — the sort-based two-phase plan must select the exact
    # same frontier.
    oracle="""
    WITH p AS (
      SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS size
      FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT p_partkey, price_c, size
    FROM p a WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE (b.price_c <= a.price_c AND b.size >= a.size)
        AND (b.price_c < a.price_c OR b.size > a.size))
    """,
    tags=("skyline", "pareto", "two-phase"),
)
def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto frontier (minimize retail price, maximize size)
    as a TWO-PHASE sort-based plan: range-repartition by price, run the
    local window skyline per partition (dominated points are dominated
    globally — Pareto dominance is transitive, so dropping them early
    is safe), then re-run the same window filter globally over the
    survivors. The survivor set is the union of per-partition
    frontiers — typically orders of magnitude smaller than the input —
    so the one global-ordered window runs on a bounded set instead of
    collapsing 100 TB onto a single reducer; the oracle is the
    textbook quadratic NOT-EXISTS, which the sorted plan must
    reproduce exactly (integer cents make the sort keys exact).

    NULL policy: a part with a NULL coordinate cannot be compared for
    dominance (the NOT-EXISTS form would admit it vacuously — every
    comparison is NULL); both sides require both coordinates
    (tests/test_null_tpch_parity.py)."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
    )
    p = part.select(
        "p_partkey",
        cents(F.col("p_retailprice")).alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    ranged = p.repartitionByRange(
        SKYLINE_BUCKETS, F.asc("price_c"), F.asc("p_partkey")
    ).withColumn("pid", F.spark_partition_id())
    local = _skyline_filter(ranged, pid="pid").drop("pid")
    return _skyline_filter(local, pid=None)


# --------------------------------------------------------------------------
# Tolerant CSV ingestion: PERMISSIVE parse with corrupt-record capture
# --------------------------------------------------------------------------
# Both corrupt lines fail on a column the query SELECTS: under CSV
# column pruning (default on) the parser never touches unused columns,
# so an extra-columns row or a bad value in a pruned column is silently
# ADMITTED — malformed-ness is only detected on the projected schema.
CSV_CORRUPT_LINES = ("abc,Y", "def,Q")


@register(
    "csv_malformed_tolerant_read",
    # Oracle computes from clean parquet + the KNOWN injected corrupt
    # count: equality proves the PERMISSIVE reader admits every good
    # row, quarantines exactly the bad ones, and never lets a corrupt
    # row's partially-parsed fields leak into aggregates.
    oracle=f"""
    SELECT COUNT(*) AS n_good,
           CAST({len(CSV_CORRUPT_LINES)} AS BIGINT) AS n_corrupt,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem WHERE l_linenumber = 1
    """,
    tags=("S4", "csv", "permissive", "data-quality"),
)
def csv_malformed_tolerant_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row tolerant CSV ingestion (the real-world crawl-data
    path): stage good rows to CSV, inject known-bad lines, read back
    PERMISSIVE with a corrupt-record column, and aggregate
    good/quarantined counts. Two subtleties the query encodes:
    (1) aggregates filter on the corrupt FLAG, not field nullability —
    a partially-parseable corrupt row still carries parsed leading
    fields that would otherwise leak into sums; (2) under CSV column
    pruning (default on) corruption is only detected on the PROJECTED
    columns — a bad value in a pruned column is silently admitted, so
    quarantine-counting queries must project every column they want
    validated (the corrupt lines here fail on a selected column)."""
    import os
    import tempfile

    from pyspark.sql import types as T

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    slice_df = li.select("l_orderkey", "l_returnflag")
    tmp = getattr(csv_malformed_tolerant_read, "_staging_dir", None)
    if tmp is None:
        tmp = tempfile.mkdtemp(prefix="csv_tolerant_")
        csv_malformed_tolerant_read._staging_dir = tmp
    stage = os.path.join(tmp, "stage")
    slice_df.write.mode("overwrite").csv(stage, header=True)
    # deterministic corrupt shard (header line first: header=True skips
    # the first line of EVERY file, not just the first file)
    with open(os.path.join(stage, "zz_corrupt.csv"), "w") as f:
        f.write("l_orderkey,l_returnflag\n")
        for line in CSV_CORRUPT_LINES:
            f.write(line + "\n")
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("_corrupt_record", T.StringType(), True),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(os.path.join(stage, "*.csv"))
    )
    ok = F.col("_corrupt_record").isNull()
    return back.agg(
        F.count(F.when(ok, 1)).alias("n_good"),
        F.count(F.when(~ok, 1)).alias("n_corrupt"),
        F.sum(F.when(ok, F.col("l_orderkey"))).alias("key_sum"),
    )


# --------------------------------------------------------------------------
# Semi-structured data: Spark 4 VariantType extraction
# --------------------------------------------------------------------------
@register(
    "variant_props_histogram",
    # json_valid + TRY_CAST: see json_extract_props — the oracle must
    # degrade to NULL on malformed/non-integer props exactly like
    # try_parse_json + try_variant_get, not error.
    oracle="""
    WITH k AS (
      SELECT TRY_CAST(CASE WHEN json_valid(props)
                           THEN json_extract_string(props, '$.k') END
                      AS BIGINT) AS kv
      FROM events
    )
    SELECT kv // 10 AS bucket, COUNT(*) AS n,
           CAST(SUM(kv) AS BIGINT) AS k_sum,
           MIN(kv) AS k_min, MAX(kv) AS k_max
    FROM k WHERE kv IS NOT NULL GROUP BY 1
    """,
    tags=("variant", "semi-structured", "spark4"),
)
def variant_props_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type: the
    JSON column is parsed ONCE into a binary variant (`try_parse_json`) and
    fields come out with `try_variant_get` — the encoded form is
    O(fields) to probe, versus `get_json_object` re-running a full
    Jackson parse per extraction (the `json_extract_props` twin shows
    that older path). On a wide semi-structured table the variant
    column is also the shredding-friendly storage form. Aggregation:
    decade histogram of k with exact integer sums."""
    ev = _t(spark, sf_dir, "events")
    # try_parse_json: plain parse_json THROWS on malformed JSON — one
    # junk props row in a regenerated feed would kill the scan;
    # try_variant_get already NULLs missing keys and uncastable values.
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return (
        ev.select(k.alias("kv"))
        .filter(F.col("kv").isNotNull())
        .groupBy(F.expr("kv DIV 10").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("kv").alias("k_sum"),
            F.min("kv").alias("k_min"),
            F.max("kv").alias("k_max"),
        )
    )


# --------------------------------------------------------------------------
# ABC / Pareto revenue classification (integer cumulative shares)
# --------------------------------------------------------------------------
ABC_BUCKETS = 16


@register(
    "customer_abc_classes",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(revenue_c) AS BIGINT) AS t FROM rev
    ), c AS (
      SELECT custkey, revenue_c,
             CAST(SUM(revenue_c) OVER (ORDER BY revenue_c DESC, custkey
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
      FROM rev
    )
    SELECT custkey, revenue_c, cum_c,
           CASE WHEN cum_c * 100 <= 80 * t THEN 'A'
                WHEN cum_c * 100 <= 95 * t THEN 'B'
                ELSE 'C' END AS abc
    FROM c, tot
    """,
    tags=("abc", "pareto", "two-phase", "global-window"),
)
def customer_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) customer classification: A = customers covering the
    first 80% of cumulative revenue, B to 95%, C the tail — the classic
    inventory/CRM analysis. Class boundaries are INTEGER comparisons
    (cum·100 ≤ 80·total on cents) so no float share ever exists to
    diverge. The global revenue-ordered cumsum uses the same two-phase
    shape as docs_token_budget_select (range-repartition by sort key →
    per-partition window → broadcast prefix offsets) instead of the
    oracle's single-partition global window."""
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(cents(F.col("o_totalprice"))).alias("revenue_c")
    )
    tot = rev.agg(F.sum("revenue_c").alias("t"))
    ranged = rev.repartitionByRange(
        ABC_BUCKETS, F.desc("revenue_c"), F.asc("custkey")
    ).withColumn("pid", F.spark_partition_id())
    totals = ranged.groupBy("pid").agg(F.sum("revenue_c").alias("ptot"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(woff), F.lit(0)).alias("off")
    )
    win = (
        Window.partitionBy("pid")
        .orderBy(F.desc("revenue_c"), F.asc("custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        ranged.join(F.broadcast(offsets), "pid")
        .withColumn("cum_c", F.col("off") + F.sum("revenue_c").over(win))
        .crossJoin(F.broadcast(tot))
    )
    return cum.select(
        "custkey",
        "revenue_c",
        "cum_c",
        F.when(F.col("cum_c") * 100 <= 80 * F.col("t"), "A")
        .when(F.col("cum_c") * 100 <= 95 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc"),
    )
