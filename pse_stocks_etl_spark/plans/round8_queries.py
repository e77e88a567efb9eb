"""Round-8 queries: three classic warehouse join-aggregation shapes
(TPC-H Q14 / Q18 / Q7 analogs over the testdata star schema) and four
corpus-preparation operators a training-data pipeline runs between
crawl and tokenizer — duplicate-span measurement (the exact-substring
dedup signal of Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"), order-insensitive bag-of-words dedup, a
rare-bigram quality proxy (the integer-exact stand-in for an n-gram LM
perplexity filter), and asymmetric containment pairs (subset-duplicate
detection, Broder 1997's containment coefficient).

Determinism rules are repo-wide (functions/money.py, plans/
corpus_queries.py): money in integer cents (revenue in rev10k =
cents x (100 - discount-hundredths), exact and order-free), ratios as
single IEEE divisions of exactly-representable integers, hashes via
the portable 60-bit md5 prefix. No Python UDFs anywhere — every text
operator is built-in higher-order array functions inside whole-stage
codegen.

Reference parity: the reference engine (pandas/requests, see
src/utils/pse_edge.py, src/etl/postgres_sync.py) has no analytics surface
beyond the sync loop; these queries are the §2-extension analytics a
warehouse user expects on top (SURVEY.md §2.5/§2.8 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import cents, sql_cents
from ..functions.text import portable_hash64, sql_portable_hash64, tokens
from ..sources.catalog import load_table
from .registry import register

# Q18 analog: orders whose total quantity exceeds this are "large"
# (~top 1.5% at the testdata's ~4 lineitems/order).
LARGE_ORDER_MIN_QTY = 250

# Duplicate-span scan: W-word windows sampled every S words. Stride
# S < W overlaps windows so every duplicated run >= W+S-1 words hits at
# least one window; S=W/2 is the standard cost/recall tradeoff.
SPAN_W = 8
SPAN_S = 4

# Rare-bigram quality proxy: a word bigram is "rare" when <= RARE_DF
# distinct docs contain it; docs where > 1/5 of bigram occurrences are
# rare read as unnatural (OCR noise, mojibake, word salad).
RARE_DF = 2

# Containment C(A,B) = |sh(A) n sh(B)| / |sh(A)|: A is a subset-dup of
# B at >= 0.9 even when B is much longer (Jaccard misses those).
CONTAINMENT_THRESHOLD = 0.9


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev10k(price: str, disc: str) -> Column:
    """Discounted revenue in exact 1e-4 currency units:
    cents(price) * (100 - cents(disc)) — a BIGINT, order-free to sum."""
    return cents(F.col(price)) * (100 - cents(F.col(disc)))


def _sql_rev10k(price: str, disc: str) -> str:
    return f"({sql_cents(price)} * (100 - {sql_cents(disc)}))"


# --------------------------------------------------------------------------
# TPC-H Q14 analog: promo revenue share per ship month
# --------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(date_trunc('month', li.l_shipdate) AS DATE) AS month,
           (SUM(CASE WHEN p.p_type = 'PROMO' THEN {_sql_rev10k('li.l_extendedprice', 'li.l_discount')}
                     ELSE 0 END) / 10000.0) AS promo_revenue,
           (SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')}) / 10000.0) AS total_revenue,
           (SUM(CASE WHEN p.p_type = 'PROMO' THEN {_sql_rev10k('li.l_extendedprice', 'li.l_discount')}
                     ELSE 0 END) * 1.0
            / SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')})) AS promo_share
    FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
    GROUP BY month
    """,
    tags=("J5", "A1", "tpch-q14"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 generalized to every ship month: share of discounted
    revenue from PROMO-type parts. Conditional aggregation over a
    fact-dim join.

    Scale: part is a dimension but scales with sf (200k rows/SF), so
    the join is AQE-sized rather than hint-forced — broadcast while
    part fits (lineitem never shuffles), shuffle past the threshold;
    the group-by month aggregate has ~84
    groups and map-side partial combine reduces each task to one row
    per month before the single tiny exchange. Revenue sums are exact
    BIGINTs (rev10k); the share is one conditional-sum/total-sum IEEE
    division per group."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = _rev10k("l_extendedprice", "l_discount")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.trunc(F.to_date("l_shipdate"), "month").alias("month"))
        .agg(
            (F.sum(promo) / 10000.0).alias("promo_revenue"),
            (F.sum(rev) / 10000.0).alias("total_revenue"),
            (F.sum(promo) * 1.0 / F.sum(rev)).alias("promo_share"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18 analog: large-quantity orders with their customers
# --------------------------------------------------------------------------
@register(
    "large_order_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > {LARGE_ORDER_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice AS total_price, b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("J5", "A1", "tpch-q18"),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose summed line quantity exceeds the
    threshold, joined back to orders and customer headers.

    Scale: the lineitem aggregate partial-combines map-side before one
    shuffle on l_orderkey; the HAVING filter passes ~1-2% of orders —
    a set AQE sizes from the actual shuffle output (broadcast to the
    orders fact while it fits; proportional to sf, so not hint-forced)
    — and customer joins the already-tiny result. total_price is
    a pure stored value — no float arithmetic to diverge."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > LARGE_ORDER_MIN_QTY)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").alias("total_price"),
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q7 analog: nation-pair trade volume by ship year
# --------------------------------------------------------------------------
@register(
    "nation_pair_trade",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(li.l_shipdate) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           (SUM({_sql_rev10k('li.l_extendedprice', 'li.l_discount')}) / 10000.0) AS revenue
    FROM lineitem li
    JOIN orders o ON li.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON li.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    tags=("J5", "A1", "tpch-q7"),
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border discounted revenue between every
    (supplier nation, customer nation) pair per ship year.

    Scale: the one unavoidable big-big join is lineitem-orders on
    orderkey (both shuffle on the key once; with both tables bucketed
    by orderkey — see tests/test_bucketing.py — it runs shuffle-free).
    nation carries the only explicit broadcast hints; supplier and
    customer scale with sf (150k customers/SF), so their joins are
    AQE-sized — broadcast below the threshold, shuffle above, with no
    hint to override the right choice at 100 TB. The
    pair-year group-by is tiny (n_nations^2 x years) and
    partial-combines map-side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk")
    )
    supp = li.join(s, li.l_suppkey == s.s_suppkey).join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk")
    )
    return (
        supp.join(cust, supp.l_orderkey == cust.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(_rev10k("l_extendedprice", "l_discount")) / 10000.0).alias(
                "revenue"
            ),
        )
    )


# --------------------------------------------------------------------------
# Corpus prep: duplicate-span measurement (exact-substring dedup signal)
# --------------------------------------------------------------------------
def _grams_all(tk: Column, n: int, step: int = 1) -> Column:
    """ALL word n-grams of a pre-projected tokens column, sampled every
    `step` positions — NOT deduped (occurrence counts matter here).
    Empty when the doc has fewer than n tokens. O(1) try_element_at
    lookups per gram, same rationale as text.shingles_from_tokens."""
    pos = F.when(
        F.size(tk) >= n,
        F.sequence(F.lit(1), F.size(tk) - (n - 1), F.lit(step)),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.try_element_at(tk, i + k) for k in range(n)])

    return F.transform(pos, gram)


_SQL_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


def _sql_grams_all(n: int, step: int = 1) -> str:
    """DuckDB twin of _grams_all over the `tk` column."""
    return (
        f"list_transform(range(1, greatest(len(tk) - {n - 1}, 0) + 1, {step}), "
        f"i -> array_to_string(tk[i:i+{n - 1}], ' '))"
    )


@register(
    "docs_span_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS tk FROM documents WHERE text IS NOT NULL
    ),
    wins AS (
      SELECT doc_id, {sql_portable_hash64('w')} AS w
      FROM (SELECT doc_id, unnest({_sql_grams_all(SPAN_W, SPAN_S)}) AS w FROM toks)
    ),
    sites AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sites FROM wins GROUP BY w
    )
    SELECT wi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN s.n_sites > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
           (SUM(CASE WHEN s.n_sites > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) AS dup_frac,
           (2 * SUM(CASE WHEN s.n_sites > 1 THEN 1 ELSE 0 END) >= COUNT(*)) AS drop_doc
    FROM wins wi JOIN sites s ON wi.w = s.w
    GROUP BY wi.doc_id
    """,
    tags=("llm", "dedup-span", "corpus"),
    bench=True,  # tracks the linear corpus-scan + window-count path
)
def docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate-span measurement (Lee et al. 2022):
    every {SPAN_W}-word window sampled at stride {SPAN_S} is hashed; a
    window occurring at more than one (doc, position) site corpus-wide
    is a duplicated span — internal repetition counts, matching the
    substring-dedup semantics where any repeated run is removable. Docs
    where half or more of the windows are duplicated are dropped.

    Scale: windows/doc = tokens/{SPAN_S}, so the exploded working set is
    ~1/{SPAN_S} of the token stream with 8-byte hashed keys. Site counts
    come from ONE window aggregate over the window-hash partition — a
    single scan and a single exchange on the key (an aggregate-and-join
    formulation reads the corpus twice and rebroadcasts a corpus-sized
    site table, which cannot survive 100 TB); the per-doc rollup then
    partial-combines on doc_id. No all-pairs stage anywhere — cost is
    linear in corpus size, the property that makes suffix-array-style
    dedup tractable as a distributed plan. Docs shorter than {SPAN_W}
    words have no windows and drop out (nothing to dedup)."""
    from ..sources.catalog import load_table_spread

    # r12: parallelism floor for the window explode (see
    # load_table_spread — no-op at real scale).
    d = load_table_spread(spark, sf_dir, "documents", "doc_id").filter(
        F.col("text").isNotNull()
    )
    toked = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    wins = toked.select(
        "doc_id",
        F.explode(_grams_all(F.col("tk"), SPAN_W, SPAN_S)).alias("w"),
    ).select("doc_id", portable_hash64(F.col("w")).alias("w"))
    flagged = wins.select(
        "doc_id", F.count("*").over(Window.partitionBy("w")).alias("n_sites")
    )
    dup = F.when(F.col("n_sites") > 1, 1).otherwise(0)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(dup).cast("long").alias("n_dup_windows"),
            (F.sum(dup) * 1.0 / F.count("*")).alias("dup_frac"),
            (2 * F.sum(dup) >= F.count("*")).alias("drop_doc"),
        )
    )


# --------------------------------------------------------------------------
# Corpus prep: order-insensitive bag-of-words dedup
# --------------------------------------------------------------------------
@register(
    "docs_bow_dedup",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             {sql_portable_hash64(f"array_to_string(list_sort(list_distinct({_SQL_TOKS})), ' ')")} AS bow_key
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, bow_key,
           CAST(COUNT(*) OVER (PARTITION BY bow_key) AS BIGINT) AS group_size,
           (doc_id = MIN(doc_id) OVER (PARTITION BY bow_key)) AS keep
    FROM keyed
    """,
    tags=("llm", "dedup-bow", "corpus"),
)
def docs_bow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup: the canonical key is the sorted distinct
    vocabulary of the doc, so word-order shuffles and repetition-count
    changes collapse to one group — the near-exact stage between exact
    dedup (order-sensitive, catches nothing here: 0 exact-text dups at
    sf0.01) and MinHash (this finds 21 groups at sf0.01 that exact
    dedup misses). min-doc_id canonicalization matches
    operators/dedup.py's keep-first convention.

    Scale: one narrow map (sort the per-doc vocab — O(len log len) per
    row, embarrassingly parallel) then ONE hash-partition exchange on
    the 8-byte bow_key shared by both window functions. Equivalent
    group-by formulation would need the same single shuffle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    keyed = d.select(
        "doc_id",
        portable_hash64(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
        ).alias("bow_key"),
    )
    w = Window.partitionBy("bow_key")
    return keyed.select(
        "doc_id",
        "bow_key",
        F.count("*").over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


# --------------------------------------------------------------------------
# Corpus prep: rare-bigram rate (integer-exact LM-perplexity proxy)
# --------------------------------------------------------------------------
@register(
    "docs_rare_bigram_rate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS tk FROM documents WHERE text IS NOT NULL
    ),
    bg AS (
      SELECT doc_id, {sql_portable_hash64('g')} AS bg
      FROM (SELECT doc_id, unnest({_sql_grams_all(2)}) AS g FROM toks)
    ),
    df AS (
      SELECT bg, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM bg GROUP BY bg
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN d.df <= {RARE_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           (SUM(CASE WHEN d.df <= {RARE_DF} THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) AS rare_rate,
           (5 * SUM(CASE WHEN d.df <= {RARE_DF} THEN 1 ELSE 0 END) > COUNT(*)) AS low_quality
    FROM bg b JOIN df d ON b.bg = d.bg
    GROUP BY b.doc_id
    """,
    tags=("llm", "quality", "lm-proxy"),
)
def docs_rare_bigram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram-LM quality proxy: the fraction of a
    doc's word-bigram OCCURRENCES whose document frequency is <=
    {RARE_DF} across the corpus. High rare-rate (> 1/5) flags word
    salad / OCR noise exactly where a KenLM perplexity filter would —
    but in pure integers (df counts and one ratio division), so the
    verdict is bit-identical cross-engine where log-prob sums are not
    (ln is not correctly rounded and FP sums are order-dependent).

    Scale: bigram explode is ~1 row per token with 8-byte hashed keys.
    ONE scan, three shuffles on strictly shrinking data: (1) per-
    (doc, bigram) occurrence counts — map-side combinable, collapses
    repeats; (2) df as a window count over the bigram partition of that
    deduped set (each (doc, bigram) row is one distinct doc, so
    COUNT(*) == COUNT(DISTINCT doc) with no distinct-agg machinery and
    no corpus-sized df table joined back — an agg-and-join formulation
    reads the corpus twice and broadcasts the vocabulary, which cannot
    survive 100 TB); (3) the per-doc rollup, weighting by occurrence
    count. Linear in corpus size."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toked = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    bg = toked.select(
        "doc_id", F.explode(_grams_all(F.col("tk"), 2)).alias("g")
    ).select("doc_id", portable_hash64(F.col("g")).alias("bg"))
    occ = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("occ"))
    flagged = occ.withColumn(
        "df", F.count("*").over(Window.partitionBy("bg"))
    )
    rare_occ = F.when(F.col("df") <= RARE_DF, F.col("occ")).otherwise(F.lit(0))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_bigrams"),
            F.sum(rare_occ).cast("long").alias("n_rare"),
            (F.sum(rare_occ) * 1.0 / F.sum("occ")).alias("rare_rate"),
            (5 * F.sum(rare_occ) > F.sum("occ")).alias("low_quality"),
        )
    )


# --------------------------------------------------------------------------
# Corpus prep: capped containment screen (non-registry helper)
# --------------------------------------------------------------------------
def containment_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs: C(A,B) = |sh(A) n sh(B)| / |sh(A)|
    >= {CONTAINMENT_THRESHOLD} flags doc_a as a subset-duplicate of
    doc_b — excerpts, quotes, and chunk-of-a-larger-page duplicates
    that symmetric Jaccard misses whenever |B| >> |A| (Broder 1997).
    Both orientations are emitted (containment is directional).

    DEMOTED from the registry (r9 VERDICT item 3): the df-capped
    shingle working set drops true pairs BY CONSTRUCTION whenever a
    pair's overlap lives in corpus-boilerplate shingles, so the
    registry's canonical containment query is the LOSSLESS
    `docs_containment_prefix_pairs` below. This screen stays as a
    helper for pipelines that accept the cap's recall loss in exchange
    for the O(sum min(df,cap)^2) self-join bound, and keeps its ×8
    stress history in SCALE.md."""
    from .llm_queries import _shingles_capped_cached

    sh = _shingles_capped_cached(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"})
    cont = F.col("n_common") * 1.0 / F.col("n_a")
    return (
        pairs.join(sa, "doc_a")
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (two-phase global quintile ranks)
# --------------------------------------------------------------------------
# Quintile bucketing granularities (two-phase rank bucket keys): wide
# enough that the bucket table stays tiny, fine enough that in-bucket
# sorts stay small.
_RFM_RECENCY_BUCKET_DAYS = 30
_RFM_MONETARY_BUCKET_CENTS = 100_000_00


def _two_phase_quintile(df: DataFrame, value: str, bucket_size: int) -> DataFrame:
    """Global quintile of `value` (ties broken by custkey) WITHOUT a
    single-partition sort: bucket by value range, prefix-sum the tiny
    per-bucket counts, broadcast offsets back, row_number within
    buckets — the same decomposition as order_value_deciles /
    docs_global_index. Returns (custkey, q) with q in 1..5 via the
    explicit floor formula (NTILE's remainder allocation is
    engine-defined)."""
    b = df.withColumn("bucket", F.expr(f"{value} DIV {bucket_size}"))
    counts = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    win = Window.partitionBy("bucket").orderBy(value, "custkey")
    ranked = b.join(F.broadcast(offsets), "bucket").withColumn(
        "rn", F.col("off") + F.row_number().over(win)
    )
    q = ((F.col("rn") - 1) * 5 / F.col("n")).cast("long") + 1
    return ranked.select("custkey", q.alias("q"))


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT custkey, recency_days, n_orders, monetary_cents,
             row_number() OVER (ORDER BY recency_days, custkey) AS rr,
             row_number() OVER (ORDER BY n_orders, custkey) AS fr,
             row_number() OVER (ORDER BY monetary_cents, custkey) AS mr,
             COUNT(*) OVER () AS n
      FROM cust
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days, n_orders,
           (monetary_cents / 100.0) AS monetary,
           CAST(6 - (((rr - 1) * 5) // n + 1) AS BIGINT) AS r_score,
           CAST(((fr - 1) * 5) // n + 1 AS BIGINT) AS f_score,
           CAST(((mr - 1) * 5) // n + 1 AS BIGINT) AS m_score,
           CAST((6 - (((rr - 1) * 5) // n + 1)) * 100
                + (((fr - 1) * 5) // n + 1) * 10
                + ((mr - 1) * 5) // n + 1 AS BIGINT) AS rfm
    FROM ranked
    """,
    tags=("analytics", "rfm", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs the
    corpus max date), frequency (order count), monetary (exact summed
    cents), each scored into global quintiles — 5 best (most recent /
    most frequent / highest spend) — and combined into the classic
    3-digit RFM code. Ties broken by custkey so the quintile boundary
    is a total order on both engines.

    Scale: the customer-grain rollup is one map-side-combinable
    aggregate; each of the three quintiles is a TWO-PHASE global rank
    (bucketed counts → tiny prefix-sum → broadcast offsets → in-bucket
    row_number) — no single-partition sort anywhere, same decomposition
    as order_value_deciles, proven twice already. The three rank frames
    re-join on custkey (customer-grain, ~1/10 the orders table)."""
    o = _t(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count("*").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff("maxd", "last_order").cast("long").alias("recency_days"),
            "n_orders",
            "monetary_cents",
        )
    )
    r = _two_phase_quintile(
        cust.select("custkey", "recency_days"), "recency_days", _RFM_RECENCY_BUCKET_DAYS
    ).withColumnsRenamed({"q": "r_q"})
    f = _two_phase_quintile(
        cust.select("custkey", "n_orders"), "n_orders", 1
    ).withColumnsRenamed({"q": "f_score"})
    m = _two_phase_quintile(
        cust.select("custkey", "monetary_cents"),
        "monetary_cents",
        _RFM_MONETARY_BUCKET_CENTS,
    ).withColumnsRenamed({"q": "m_score"})
    out = (
        cust.join(r, "custkey").join(f, "custkey").join(m, "custkey")
        .withColumn("r_score", (6 - F.col("r_q")).cast("long"))
    )
    return out.select(
        "custkey",
        "recency_days",
        "n_orders",
        (F.col("monetary_cents") / 100.0).alias("monetary"),
        "r_score",
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long")
        .alias("rfm"),
    )


# --------------------------------------------------------------------------
# Product quantization of embeddings (integer-exact PQ codes)
# --------------------------------------------------------------------------
# 64-dim embeddings -> M=8 subspaces x 8 dims, K=16 lattice centroids
# per subspace. Coordinates quantize to the integer grid 0..1024
# (clamp to [-1,1], shift, scale by 512 — IEEE ops on identical values
# plus round-half-up on non-negative inputs, deterministic on both
# engines); centroid levels are the fixed lattice 32 + 64*c, so every
# distance is a BIGINT and argmin/tie-break (first minimum = smallest
# code) is exact integer comparison. A trained codebook would slot into
# the same plan as a broadcast array; the fixed lattice keeps the
# oracle closed-form.
PQ_M, PQ_K, PQ_DSUB = 8, 16, 8

_PQ_SQL_Q = (
    "list_transform(embedding, x -> CAST(round((greatest(least("
    "CAST(x AS DOUBLE), 1.0), -1.0) + 1.0) * 512) AS BIGINT))"
)


def _pq_cte() -> str:
    """The shared qv/dv/cv CTE chain: grid coords -> per-subspace
    candidate distances -> codes + errors. Reused verbatim by the
    quantize AND the ADC-search oracles, so both provably encode with
    one definition."""

    def dist(m: int) -> str:
        return (
            f"list_transform(range(0, {PQ_K}), c -> list_sum(list_transform("
            f"q[{m * PQ_DSUB + 1}:{m * PQ_DSUB + PQ_DSUB}], "
            f"x -> (x - (32 + 64*c)) * (x - (32 + 64*c)))))"
        )

    dists = ", ".join(f"{dist(m)} AS d{m}" for m in range(PQ_M))
    sub = ", ".join(
        f"CAST(list_position(d{m}, list_min(d{m})) - 1 AS BIGINT) AS c{m}, "
        f"CAST(list_min(d{m}) AS BIGINT) AS e{m}"
        for m in range(PQ_M)
    )
    return f"""qv AS (SELECT vec_id, {_PQ_SQL_Q} AS q FROM embeddings),
    dv AS (SELECT vec_id, {dists} FROM qv),
    cv AS (SELECT vec_id, {sub} FROM dv)"""


def _pq_sql() -> str:
    code = " + ".join(f"c{m} * {16**m}" for m in range(PQ_M))
    err = " + ".join(f"e{m}" for m in range(PQ_M))
    return f"""
    WITH {_pq_cte()}
    SELECT vec_id, CAST({code} AS BIGINT) AS pq_code,
           CAST({err} AS BIGINT) AS quant_err
    FROM cv
    """


def _pq_grid(col: Column) -> Column:
    """Embedding -> integer grid 0..1024 (clamp, shift, scale; IEEE ops
    on identical values + round-half-up on non-negative inputs)."""
    return F.transform(
        col,
        lambda x: F.round(
            (F.greatest(F.least(x.cast("double"), F.lit(1.0)), F.lit(-1.0)) + 1.0)
            * 512
        ).cast("long"),
    )


def _pq_code_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, q grid array, c0..c{PQ_M-1} codes, e0.. errors) — the
    shared PQ assignment used by emb_pq_quantize and emb_ann_adc.

    The EVENLY-SPACED lattice admits a closed-form assignment: with
    per-subspace moments s1 = sum q_j, s2 = sum q_j^2,

        dist(c) = s2 - 2*L_c*s1 + DSUB*L_c^2   (L_c = 32 + 64c)
                = DSUB*(L_c - s1/DSUB)^2 + const,

    so argmin_c is the nearest lattice point to the subvector mean —
    c = clamp((s1 + 511) div 512 - 1, 0, K-1), which lands on the
    SMALLER c at exact midpoints, matching the oracle's first-minimum
    list_position tie-break. No candidate loop at all: per subspace,
    two 8-element folds + integer arithmetic (the naive per-candidate
    fold re-ran the 8-step lambda 16x per subspace interpreted —
    measured ~10x slower on the x64 corpus). A TRAINED codebook has no
    closed form and would use the candidate-loop formulation with the
    centroid table broadcast; the oracle spells that loop definition
    directly, proving the closed form computes identical integers."""
    cols = emb.select("vec_id", _pq_grid(F.col("embedding")).alias("q"))
    for m in range(PQ_M):
        sub = F.slice(F.col("q"), m * PQ_DSUB + 1, PQ_DSUB)
        cols = cols.withColumn(
            f"s1_{m}", F.aggregate(sub, F.lit(0).cast("long"), lambda a, x: a + x)
        ).withColumn(
            f"s2_{m}",
            F.aggregate(sub, F.lit(0).cast("long"), lambda a, x: a + x * x),
        )
    for m in range(PQ_M):
        s1, s2 = F.col(f"s1_{m}"), F.col(f"s2_{m}")
        c = F.greatest(
            F.least(
                F.expr(f"(s1_{m} + 511) DIV 512") - 1, F.lit(PQ_K - 1)
            ),
            F.lit(0),
        )
        cols = cols.withColumn(f"c{m}", c.cast("long"))
        level = 32 + 64 * F.col(f"c{m}")
        cols = cols.withColumn(
            f"e{m}",
            (s2 - 2 * level * s1 + PQ_DSUB * level * level).cast("long"),
        )
    return cols.drop(
        *[f"s1_{m}" for m in range(PQ_M)], *[f"s2_{m}" for m in range(PQ_M)]
    )


@register(
    "emb_pq_quantize",
    oracle=_pq_sql(),
    tags=("embedding", "quantization", "pq", "higher-order"),
    bench=True,  # tracks the shuffle-free per-row embedding map path
)
def emb_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): each embedding splits
    into {PQ_M} subvectors, each assigned to its nearest of {PQ_K}
    per-subspace lattice centroids; the packed base-16 code (8 bytes
    per vector instead of 256) plus the exact integer quantization
    error come out. The memory-compression step an IVF-PQ ANN index
    runs after coarse clustering (emb_ann_ivf is the coarse half).

    Determinism: coordinates land on an integer grid before any
    distance math, so centroid distances are BIGINTs and argmin with
    first-minimum tie-break is exact on both engines — no float
    comparisons anywhere past the single scale step.

    Scale: pure per-row map — no shuffle, no explode; the candidate
    loop runs inside higher-order array functions (transform/aggregate
    over a 16-element sequence), keeping the generated code compact
    (an unrolled 8x16x8 expression tree blows past janino's method
    limit and falls back to interpreted eval — measured before this
    formulation). At 100 TB this is scan-bound, exactly like
    emb_int8_quantize."""
    cols = _pq_code_frame(_t(spark, sf_dir, "embeddings"))
    code = sum([F.col(f"c{m}") * F.lit(16**m) for m in range(1, PQ_M)], F.col("c0"))
    err = sum([F.col(f"e{m}") for m in range(1, PQ_M)], F.col("e0"))
    return cols.select(
        "vec_id",
        code.cast("long").alias("pq_code"),
        err.cast("long").alias("quant_err"),
    )


# --------------------------------------------------------------------------
# ADC top-k search over PQ codes (completes the IVF -> PQ -> ADC story)
# --------------------------------------------------------------------------
ADC_QUERY_IDS = (0, 1, 2)  # same query-vector convention as emb_ann_lsh/ivf
ADC_TOPK = 10


def _adc_sql() -> str:
    def dist(m: int) -> str:
        lo, hi = m * PQ_DSUB + 1, m * PQ_DSUB + PQ_DSUB
        return (
            f"list_sum(list_transform(qq.qarr[{lo}:{hi}], "
            f"x -> (x - (32 + 64*cv.c{m})) * (x - (32 + 64*cv.c{m}))))"
        )

    adc = " + ".join(dist(m) for m in range(PQ_M))
    ids = ", ".join(str(i) for i in ADC_QUERY_IDS)
    return f"""
    WITH {_pq_cte()},
    qq AS (SELECT vec_id AS query_id, q AS qarr FROM qv WHERE vec_id IN ({ids})),
    pair AS (
      SELECT qq.query_id, cv.vec_id, CAST({adc} AS BIGINT) AS adc_dist
      FROM qq, cv
      WHERE cv.vec_id != qq.query_id
    )
    SELECT query_id, vec_id, adc_dist, rank FROM (
      SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rank
      FROM pair
    ) WHERE rank <= {ADC_TOPK}
    """


@register(
    "emb_ann_adc",
    oracle=_adc_sql(),
    tags=("embedding", "similarity", "ann-pq-adc"),
)
def emb_ann_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k over PQ codes: the
    corpus is represented ONLY by its {PQ_M}-byte PQ codes; each query
    vector scores a candidate by summing, per subspace, the exact
    integer distance from the query's grid coordinates to the
    candidate's assigned centroid — the search half of an IVF-PQ index
    (emb_ann_ivf is the coarse half, emb_pq_quantize the encoder).
    Ties break on (adc_dist, vec_id), so the top-{ADC_TOPK} set is a
    total order and hash-matches the oracle exactly.

    Scale: textbook ADC — the per-(query, subspace, centroid) distance
    LOOKUP TABLE ({len(ADC_QUERY_IDS)}x{PQ_M}x{PQ_K} entries) is
    precomputed on the tiny broadcast query side, so scoring a
    candidate is {PQ_M} array lookups + adds over its 8-byte code, not
    64 multiplies (a per-pair distance recomputation measured 45s at
    x64 embeddings; the LUT form is the reason PQ search is fast). The
    code frame is the same per-row map as emb_pq_quantize (8
    bytes/vector at rest — 32x smaller than raw, which is the point);
    one scan over the codes, no shuffle until the final per-query
    top-k (a window over {len(ADC_QUERY_IDS)} partitions; a real
    serving path would fold in the IVF cell filter first)."""
    emb = _t(spark, sf_dir, "embeddings")
    codes = _pq_code_frame(emb).drop("q", *[f"e{m}" for m in range(PQ_M)])

    def lut_m(m: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(PQ_K - 1)),
            lambda c: F.aggregate(
                F.slice(F.col("qarr"), m * PQ_DSUB + 1, PQ_DSUB),
                F.lit(0).cast("long"),
                lambda acc, x: acc + (x - (32 + 64 * c)) * (x - (32 + 64 * c)),
            ),
        )

    qq = (
        emb.filter(F.col("vec_id").isin(*ADC_QUERY_IDS))
        .select(
            F.col("vec_id").alias("query_id"),
            _pq_grid(F.col("embedding")).alias("qarr"),
        )
        .select(
            "query_id", *[lut_m(m).alias(f"lut{m}") for m in range(PQ_M)]
        )
    )
    adc = sum(
        [
            F.element_at(F.col(f"lut{m}"), (F.col(f"c{m}") + 1).cast("int"))
            for m in range(1, PQ_M)
        ],
        F.element_at(F.col("lut0"), (F.col("c0") + 1).cast("int")),
    )
    pair = (
        codes.crossJoin(F.broadcast(qq))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adc.cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ADC_TOPK)
    )


# --------------------------------------------------------------------------
# Lossless prefix-filtered containment join (the scale path for
# the capped containment screen when exact output is still required)
# --------------------------------------------------------------------------
@register(
    "docs_containment_prefix_pairs",
    # Oracle is the INDEPENDENT all-pairs containment definition over
    # the UNCAPPED shingle sets (filled in below with llm_queries'
    # shingle SQL) — a candidate lost by a wrong prefix would be a hash
    # mismatch, proving the filter lossless.
    oracle=None,  # set below (needs llm_queries' shingle SQL)
    tags=("llm", "dedup-containment", "prefix-filter"),
)
def docs_containment_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (C(A,B) = |sh(A) n sh(B)| / |sh(A)|
    >= {CONTAINMENT_THRESHOLD}) via PREFIX FILTERING adapted to
    containment: if B holds >= ceil(t*|A|) of A's shingles, it must hit
    ANY chosen subset of A of size |A| - ceil(t*|A|) + 1 — so the
    candidate join runs A's (df asc, sh asc)-rarest prefix against B's
    FULL postings (containment puts no constraint on B's extras, so B
    cannot be prefixed — the asymmetry of the measure shows up as an
    asymmetric join). Candidates verify by exact intersection count.
    LOSSLESS, unlike the df-capped containment_pairs_capped helper (which drops
    corpus-boilerplate shingles) — the oracle is the independent
    all-pairs definition on uncapped sets, so the hash check proves no
    pair escapes.

    Scale: candidate cost is sum over shingles of prefix-df x df —
    prefixes pick each doc's RAREST shingles, so hot boilerplate enters
    only on the full side and only against rare prefixes; the
    |B| >= t*|A| size condition prunes inside the join. Verification
    touches candidates only, against the shared persisted shingle
    working set. When even the true output explodes (the x8 stress),
    the LSH-candidate + containment re-rank is the lossy fallback."""
    from .llm_queries import _shingles_cached

    sh = _shingles_cached(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "sh")
    # prefix length = sz - ceil(0.9*sz) + 1, in exact integers
    pref = (
        sh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("sz") - F.expr("(9 * sz + 9) div 10") + 1)
        .select("doc_id", "sh", "sz")
    )
    full = sh.join(sizes, "doc_id")
    cand = (
        pref.alias("a")
        .join(
            full.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (10 * F.col("b.sz") >= 9 * F.col("a.sz")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    a = sh.withColumnsRenamed({"doc_id": "doc_a"})
    b = sh.withColumnsRenamed({"doc_id": "doc_b"})
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "sz": "sz_a"})
    cont = F.col("n_common") * 1.0 / F.col("sz_a")
    return (
        common.join(sa, "doc_a")
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


def _finalize_containment_prefix_oracle() -> None:
    from .llm_queries import _SQL_SHINGLE_H
    from .registry import REGISTRY

    REGISTRY["docs_containment_prefix_pairs"].oracle = f"""
    WITH sh AS ({_SQL_SHINGLE_H}),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    it AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, (n_common * 1.0 / sa.n) AS containment
    FROM it JOIN sz sa ON it.doc_a = sa.doc_id
    WHERE (n_common * 1.0 / sa.n) >= {CONTAINMENT_THRESHOLD}
    """


_finalize_containment_prefix_oracle()
