"""Round-15 queries (round-8 second batch): the retrieval lane.

Six additions that complete stories the engine already half-told:

- `multimodal_gif_decode` — the third REAL compressed-image codec next
  to PNG (DEFLATE) and JPEG (Huffman+DCT): GIF's variable-width LZW
  with CLEAR/EOI control codes, KwKwK reconstruction, 9→12-bit code
  growth, table-overflow resets, and the four-pass interlace schedule
  (operators/multimodal.py::synth_gif / parse_gif). Position-weighted
  channel sums make a wrong de-interlace diverge even though plain
  sums are row-permutation blind.
- `docs_bm25_topk` — lexical retrieval over the corpus: Okapi BM25
  (k1=1.2, b=0.75) for a fixed query-term set, with the log-free
  rational idf (same monotone-substitution contract as
  docs_tfidf_top_terms) and dyadic fixed-point score summation so the
  cross-engine value hash is exact.
- `emb_hybrid_rrf` — hybrid retrieval: reciprocal-rank fusion
  (Cormack et al., SIGIR'09: score = sum_i 1/(60+rank_i)) of the BM25
  lexical ranking and a dense cosine ranking over the embeddings
  table, full-outer-joined on item id.
- `multimodal_gif_resize` — the transcode round-trip through the LZW
  codec: decode → nearest-neighbor resample of the index raster →
  re-encode (interlace mode preserved, so odd doc_ids exercise the
  interlaced WRITE path) → decode.
- `docs_bpe_encode` — the apply half of the BPE tokenizer story
  (docs_bpe_top_merges trains): a frozen 10-rule merge table applied
  as sentinel-wrapped literal replaces — leftmost non-overlapping
  replacement IS greedy BPE — with per-doc token counts and the
  chars-per-token compression ratio.
- `docs_bm25_index_increment` — the incremental-lane member: a new
  crawl shard merges into the standing BM25 index by pure integer
  algebra (postings union, df adds, totals add) and must reproduce
  the from-scratch ranking bit-for-bit (oracle = full rebuild).

Reference parity: the reference pipeline (src/etl/postgres_sync.py,
src/utils/pse_edge.py) has no retrieval surface; this lane is a
build-brief extension (similarity search + text analysis over the
documents/embeddings tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokens
from ..functions.vectors import cosine, sql_cosine, to_double_array
from ..sources.catalog import load_table
from .registry import register

# --------------------------------------------------------------------------
# Multimodal: REAL palette-image decode (GIF, variable-width LZW)
# --------------------------------------------------------------------------


@register(
    "multimodal_gif_decode",
    # FULL hash oracle for the LZW codec: the payload is a genuine
    # GIF89a (256-entry global color table, LZW sub-blocks, odd doc_ids
    # interlaced) and the decoder reconstructs every palette index.
    # Pixel index and palette channels are closed-form integer lattices
    # of (doc_id, x, y), so DuckDB recomputes the aggregates without
    # seeing a byte. The (1 + x + 7y)-weighted sums are row-position
    # sensitive: a de-interlace that permuted rows — invisible to the
    # plain sums — breaks them loudly.
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             5 + d.doc_id % 6 AS w, 4 + d.doc_id % 5 AS h,
             ux.x AS x, uy.y AS y,
             (11*d.doc_id + 37*ux.x + 59*uy.y) % 256 AS i
      FROM documents d,
           UNNEST(range(0, 5 + d.doc_id % 6)) AS ux(x),
           UNNEST(range(0, 4 + d.doc_id % 5)) AS uy(y)
    )
    SELECT doc_id,
           CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           (doc_id % 2 = 1) AS interlaced,
           CAST(SUM((7*i + 13) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((11*i + 5) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((13*i + 3) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((1 + x + 7*y) * ((7*i + 13) % 256)) AS BIGINT) AS wsum_r,
           CAST(SUM((1 + x + 7*y) * ((11*i + 5) % 256)) AS BIGINT) AS wsum_g,
           CAST(SUM((1 + x + 7*y) * ((13*i + 3) % 256)) AS BIGINT) AS wsum_b
    FROM px GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "image", "compressed", "gif"),
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image modality with a REAL LZW codec: synthesize a 256-color
    GIF89a per document executor-side (variable-width LZW, length-
    prefixed sub-blocks, four-pass interlace for odd doc_ids), then
    decode it back — magic, screen descriptor, color table, sub-block
    reassembly, LZW decode with code growth and KwKwK, de-interlace,
    palette lookup — via Arrow-batched mapInPandas
    (operators/multimodal.py::parse_gif). Completes the compressed-
    image trio (PNG/JPEG/GIF = DEFLATE/Huffman-DCT/LZW); MP4/H.264
    stays the one environment-bound integration point.

    Scale: identical plumbing to the other codec lanes — payload bytes
    live and die executor-side in Arrow batches, one map-only pass, no
    shuffle before the per-doc aggregate (which the decode itself
    computes per payload)."""
    from ..operators.multimodal import attach_gif, decode_gif

    docs = load_table(spark, sf_dir, "documents")
    return decode_gif(attach_gif(docs))


# --------------------------------------------------------------------------
# Lexical retrieval: Okapi BM25 over the documents corpus
# --------------------------------------------------------------------------
# The fixed "query" the engine retrieves against — literal terms shared
# verbatim with the oracle SQL (the retrieval twin of the fixed
# ANN_QUERY_IDS convention in llm_queries).
BM25_TERMS = ("spark", "merge", "window", "vector", "customer")
# Documentary constants: the plans and oracles inline the derived
# literals verbatim (2.2 = k1+1, 0.25 = 1-b, 0.75 = b) rather than
# computing them — float ARITHMETIC on parsed literals can round to a
# different double than PARSING the derived literal, and the parity
# contract needs both engines to parse identical tokens.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
# Dyadic fixed-point grid for the score sum: per-term scores are
# floor-scaled to multiples of 2^-20 BEFORE summation, so the per-doc
# sum is an exact integer total (order-independent across partitions)
# while keeping ~6 significant fractional digits of BM25 resolution.
_BM25_SCALE = 1 << 20

_SQL_TERMS = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _sql_bm25_docs() -> str:
    """Per-doc BM25 CTE body (doc_id, n_terms, score) — shared by the
    top-k query and the RRF fusion oracle. Every float literal and
    parenthesis mirrors the Spark expression tree token-for-token so
    the IEEE evaluation order is identical."""
    return f"""
    tk AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    t AS (SELECT doc_id, unnest(toks) AS term FROM tk),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
           WHERE term IN ({_SQL_TERMS}) GROUP BY doc_id, term),
    wdf AS (SELECT *, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
            FROM tf),
    sc AS (
      SELECT w.doc_id,
             CAST(FLOOR(
               (((tot.n_docs - w.df + 0.5) / (w.df + 0.5))
                * (w.tf * 2.2)
                / (w.tf + 1.2 * (0.25 + 0.75
                    * (CAST(d.dl AS DOUBLE)
                       / (CAST(tot.sum_dl AS DOUBLE) / tot.n_docs)))))
               * {float(_BM25_SCALE)}) AS BIGINT) AS s20
      FROM wdf w JOIN dl d ON w.doc_id = d.doc_id CROSS JOIN tot
    ),
    bm25 AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
             SUM(s20) / {float(_BM25_SCALE)} AS score
      FROM sc GROUP BY doc_id
    )"""


def _bm25_s20_expr() -> F.Column:
    """The quantized per-posting BM25 score over columns named
    (tf, df, dl, n_docs, sum_dl). Factored so the from-scratch plan
    and the index-increment plan evaluate the IDENTICAL expression
    tree — bit-identical IEEE results given identical integers."""
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    score = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / avgdl))
        )
    )
    return F.floor(score * F.lit(float(_BM25_SCALE))).cast("long")


def _bm25_fold_scores(scored: DataFrame) -> DataFrame:
    """(doc_id, s20) postings -> per-doc (doc_id, n_terms, score)."""
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"), F.sum("s20").alias("s20sum"))
        .select(
            "doc_id",
            "n_terms",
            (F.col("s20sum") / F.lit(float(_BM25_SCALE))).alias("score"),
        )
    )


def _bm25_doc_stats_frame(docs: DataFrame) -> DataFrame:
    """ONE tokenize pass -> per-doc stats (doc_id, dl, tf0..tf4): the
    document length plus one occurrence count per query term, counted
    with array filters over the SAME projected token column. This
    replaces the two-branch shape (a dl branch and an explode/postings
    branch, each re-scanning and re-tokenizing the corpus — Spark does
    not dedupe scans across DAG branches), and shrinks what flows
    onward to |terms|+2 longs per doc — the index-sized frame."""
    tk = docs.select("doc_id", tokens(F.col("text")).alias("__tk"))
    return tk.select(
        "doc_id",
        F.size("__tk").cast("long").alias("dl"),
        *[
            F.size(F.filter(F.col("__tk"), lambda x: x == F.lit(t)))
            .cast("long")
            .alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )


def _bm25_split_stats(stats: DataFrame):
    """Per-doc stats frame -> (dl, 1-row totals, query-term postings).
    The postings carry dl inline, so the scoring join on doc length
    disappears entirely."""
    dl = stats.select("doc_id", "dl")
    totals = stats.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        stats.select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"tf{i}").alias("tf"),
                        )
                        for i, t in enumerate(BM25_TERMS)
                    ]
                )
            ).alias("p"),
        )
        .select("doc_id", "dl", F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    return dl, totals, tf


def _bm25_postings(docs: DataFrame):
    """(dl frame, 1-row totals frame, query-term postings incl. dl)
    for a docs slice — the per-shard building block the increment plan
    merges."""
    return _bm25_split_stats(_bm25_doc_stats_frame(docs))


def _bm25_stats_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc stats frame persisted through the engine's shared
    working-set LRU (the shingle-cache pattern): ~7 longs per doc —
    index-sized, so at 100 TB the cache holds the INDEX, not the text,
    and totals/postings both read it without re-tokenizing."""
    from pyspark.storagelevel import StorageLevel

    from ..sources.catalog import load_table as _lt

    key = (spark.sparkContext.applicationId, sf_dir)
    return _BM25_STATS_CACHE.get_or_build(
        key,
        lambda: _bm25_doc_stats_frame(_lt(spark, sf_dir, "documents")).persist(
            StorageLevel.MEMORY_AND_DISK
        ),
    )


from .llm_queries import register_working_set_cache  # noqa: E402

# Reload-safe registration (dedupe by owner tag) via the shared helper.
_BM25_STATS_CACHE = register_working_set_cache(__name__, cap=2)


def _bm25_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 frame (doc_id, n_terms, score) for the fixed query
    terms — the Spark twin of _sql_bm25_docs().

    df deliberately does NOT use the tfidf query's window-over-term
    form: with a |terms|-ary query, PARTITION BY term funnels every
    posting through at most |terms| reducers — a hot query term (think
    a stopword) means billions of rows on one partition at 100 TB. The
    groupBy form map-side-combines to |terms| rows, which then
    broadcast back onto the postings (bounded by the frozen query-term
    list). tfidf keeps the window because its partition key is the
    UNBOUNDED term space — many partitions, none hot by construction
    of the collapsed frame."""
    _dl, totals, tf = _bm25_split_stats(_bm25_stats_cached(spark, sf_dir))
    dfm = tf.groupBy("term").agg(F.count("*").alias("df"))
    joined = tf.join(F.broadcast(dfm), "term").crossJoin(
        F.broadcast(totals)
    )  # dl rides the postings
    return _bm25_fold_scores(
        joined.select("doc_id", _bm25_s20_expr().alias("s20"))
    )


@register(
    "docs_bm25_topk",
    oracle=f"""
    WITH {_sql_bm25_docs()}
    SELECT doc_id, n_terms, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                AS BIGINT) AS rk
    FROM bm25
    ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOPK}
    """,
    tags=("llm", "retrieval", "bm25"),
    bench=True,
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (k1=1.2, b=0.75) for a fixed query-term
    set: top-{k} documents by summed per-term score. Two deliberate
    cross-engine substitutions, both documented monotone tricks:
    the idf is the LOG-FREE rational (N - df + 0.5)/(df + 0.5) — ln()
    is not correctly rounded across engine libms, and ln is monotone so
    the induced per-term ordering is unchanged — and per-term scores
    are floor-quantized to the dyadic 2^-20 grid before summation, so
    the per-doc sum is an exact integer total regardless of Spark's
    partition-dependent float-sum order.

    Scale: tokenize → explode → filter to the query terms (the filter
    lands BEFORE the (doc,term) hash-agg, so the shuffle carries only
    matching postings — at 100 TB with a 5-term query that is a tiny
    fraction of the corpus); df is a window on the collapsed postings
    frame (hot query terms are a per-partition count, no row blowup);
    the corpus totals broadcast as a 1-row dim; the final top-k is
    orderBy+limit — Spark's TakeOrderedAndProject, a per-partition
    heap + driver merge of {k} rows, NOT a global sort."""
    ranked = _bm25_docs(spark, sf_dir).orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    # row_number on the already-limited {k}-row frame: bounded input,
    # so the single-partition window is O(k), not a global sort.
    return ranked.withColumn("rk", F.row_number().over(w).cast("long"))


docs_bm25_topk.__doc__ = docs_bm25_topk.__doc__.format(k=BM25_TOPK)


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine
# --------------------------------------------------------------------------
RRF_K = 60  # the standard fusion constant (Cormack et al., SIGIR'09)
RRF_POOL = 20  # per-ranker candidate pool fed into the fusion
_RRF_QUERY_VEC_ID = 0  # dense query = embedding of vec_id 0 (doc 0)


def _sql_rrf() -> str:
    from .llm_queries import EMB_DIM

    cos = sql_cosine("q.embedding", "e.embedding", EMB_DIM)
    return f"""
    WITH {_sql_bm25_docs()},
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (
               ORDER BY score DESC, doc_id ASC) AS BIGINT) AS lex_rank
      FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT {RRF_POOL}
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC_ID}),
    cosd AS (
      SELECT e.vec_id, {cos} AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id != {_RRF_QUERY_VEC_ID}
    ),
    sem AS (
      SELECT vec_id, CAST(row_number() OVER (
               ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS sem_rank
      FROM cosd ORDER BY cos_sim DESC, vec_id ASC LIMIT {RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.vec_id) AS item_id,
             lex.lex_rank, sem.sem_rank,
             COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + lex.lex_rank), 0.0)
             + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + sem.sem_rank), 0.0)
               AS rrf_score
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.vec_id
    )
    SELECT item_id, lex_rank, sem_rank, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, item_id ASC)
                AS BIGINT) AS rk
    FROM fused
    """


@register(
    "emb_hybrid_rrf",
    oracle=_sql_rrf(),
    tags=("llm", "retrieval", "hybrid", "rrf"),
)
def emb_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical
    top-20 and the dense cosine top-20 (query = embedding of vec_id 0,
    the embeddings twin of doc 0) fused as
    score = sum over rankers of 1/(60 + rank) — rank-only fusion, so
    the two rankers' incomparable score scales never meet, which is
    why RRF is the default hybrid combiner in production retrieval
    stacks. Items surfaced by only one ranker contribute one term
    (COALESCE 0 for the other).

    Scale: each ranker ends in TakeOrderedAndProject (per-partition
    heap, driver merge of 20 rows), so the fusion join is a
    20x20-row full outer join — trivially local regardless of corpus
    size. The float sum is two terms in a fixed expression order, so
    the hash is deterministic without any quantization."""
    lex = (
        _bm25_docs(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_POOL)
    )
    lex = lex.withColumn(
        "lex_rank",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long"),
    ).select("doc_id", "lex_rank")

    e = load_table(spark, sf_dir, "embeddings")
    vec = to_double_array(F.col("embedding"))
    q = e.filter(F.col("vec_id") == _RRF_QUERY_VEC_ID).select(
        vec.alias("qvec")
    )
    scored = (
        e.select("vec_id", vec.alias("v"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != _RRF_QUERY_VEC_ID)
        .select("vec_id", cosine(F.col("qvec"), F.col("v")).alias("cos_sim"))
    )
    sem = scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(RRF_POOL)
    sem = sem.withColumn(
        "sem_rank",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("vec_id")))
        .cast("long"),
    ).select("vec_id", "sem_rank")

    fused = lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer").select(
        F.coalesce(lex["doc_id"], sem["vec_id"]).alias("item_id"),
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("item_id"))
    # <= 2*RRF_POOL rows reach this point: bounded single-partition window
    return fused.withColumn("rk", F.row_number().over(w).cast("long"))


# --------------------------------------------------------------------------
# Multimodal: GIF resize round-trip (decode -> resample -> re-encode)
# --------------------------------------------------------------------------
GIF_OUT_W, GIF_OUT_H = 4, 3  # out_h=3 makes the interlace row order
#                              [0,2,1] != natural, so the re-encode's
#                              interlaced WRITE path is non-trivial


@register(
    "multimodal_gif_resize",
    # Closed-form oracle for the full decode -> nearest-neighbor
    # resample -> LZW re-encode -> decode round-trip: the floor
    # mapping src=(dst*src_dim)//dst_dim is replayed in integer SQL on
    # the source lattice. Odd doc_ids re-encode INTERLACED, so the
    # encoder's pass-ordered write is covered, and the weighted sums
    # would catch a row permutation it introduced.
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id,
             ux.x AS x, uy.y AS y,
             (ux.x * (5 + d.doc_id % 6)) // {GIF_OUT_W} AS sx,
             (uy.y * (4 + d.doc_id % 5)) // {GIF_OUT_H} AS sy
      FROM documents d,
           UNNEST(range(0, {GIF_OUT_W})) AS ux(x),
           UNNEST(range(0, {GIF_OUT_H})) AS uy(y)
    ),
    ch AS (
      SELECT doc_id, x, y,
             (11*doc_id + 37*sx + 59*sy) % 256 AS i
      FROM px
    )
    SELECT doc_id,
           CAST({GIF_OUT_W} AS BIGINT) AS width,
           CAST({GIF_OUT_H} AS BIGINT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           (doc_id % 2 = 1) AS interlaced,
           CAST(SUM((7*i + 13) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((11*i + 5) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((13*i + 3) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((1 + x + 7*y) * ((7*i + 13) % 256)) AS BIGINT) AS wsum_r,
           CAST(SUM((1 + x + 7*y) * ((11*i + 5) % 256)) AS BIGINT) AS wsum_g,
           CAST(SUM((1 + x + 7*y) * ((13*i + 3) % 256)) AS BIGINT) AS wsum_b
    FROM ch GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "image", "compressed", "gif", "transcode"),
)
def multimodal_gif_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF thumbnail round-trip — the transcode sibling of
    multimodal_bmp_resize, through a COMPRESSED format: decode each
    GIF (LZW, de-interlace), nearest-neighbor resample the index
    raster, re-encode a valid GIF89a through the real LZW encoder
    (preserving interlace mode — odd doc_ids write the four-pass row
    order), decode the re-encoded stream, and report exact plain +
    position-weighted channel sums
    (operators/multimodal.py::resize_gif_nearest / _gif_encode).

    Scale: one Arrow-batched map-only pass; both codec directions run
    executor-side per payload, no shuffle — the thumbnail-generation
    shape of a multimodal ingest pipeline."""
    from ..operators.multimodal import attach_gif, resize_decode_gif

    docs = load_table(spark, sf_dir, "documents")
    return resize_decode_gif(attach_gif(docs), GIF_OUT_W, GIF_OUT_H)


# --------------------------------------------------------------------------
# BPE encode: apply a frozen merge list to the corpus
# --------------------------------------------------------------------------
# Frozen merge table, learned by running 10 REAL BPE training rounds
# (Sennrich et al. 2016: count adjacent symbol pairs weighted by word
# frequency, merge the argmax, repeat) on the sf0.01 corpus — then
# pinned as literals, exactly how production tokenizers ship their
# merges.txt. Merge 6 ('m','er') consumes merge 1's output, so
# sequential application order is load-bearing.
BPE_MERGES = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
)
_BPE_SEP = "\x01"  # symbol-boundary sentinel, absent from the corpus


def _sql_bpe_encoded(word_expr: str) -> str:
    """DuckDB expression: the word encoded as SEP-wrapped symbols with
    all BPE_MERGES applied. Each symbol is wrapped .sym. (dot = chr(1))
    so a merge is the literal replacement '.a..b.' -> '.ab.' — plain
    replace() is leftmost non-overlapping, which IS greedy BPE, and the
    wrapping keeps a match from spanning a symbol boundary (the naive
    'a<sep>b' pattern would merge 'ba|r' on the ('a','r') rule)."""
    s = f"chr(1) || array_to_string(string_split({word_expr}, ''), chr(1) || chr(1)) || chr(1)"
    for a, b in BPE_MERGES:
        s = f"replace({s}, chr(1) || '{a}' || chr(1) || chr(1) || '{b}' || chr(1), chr(1) || '{a}{b}' || chr(1))"
    return s


def _bpe_encoded(word: F.Column) -> F.Column:
    """Spark twin of _sql_bpe_encoded (same wrapping, same replaces)."""
    sep = F.lit(_BPE_SEP)
    s = F.concat(sep, F.array_join(F.split(word, ""), _BPE_SEP + _BPE_SEP), sep)
    for a, b in BPE_MERGES:
        s = F.replace(
            s,
            F.lit(f"{_BPE_SEP}{a}{_BPE_SEP}{_BPE_SEP}{b}{_BPE_SEP}"),
            F.lit(f"{_BPE_SEP}{a}{b}{_BPE_SEP}"),
        )
    return s


@register(
    "docs_bpe_encode",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents WHERE text IS NOT NULL
    ),
    enc AS (
      SELECT doc_id, len(w) AS n_chars,
             (len({_sql_bpe_encoded('w')})
              - len(replace({_sql_bpe_encoded('w')}, chr(1), ''))) // 2
               AS n_sym
      FROM w WHERE len(w) > 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_sym) AS DOUBLE) / SUM(n_chars) AS bpe_ratio
    FROM enc GROUP BY doc_id
    """,
    tags=("llm", "tokenizer", "bpe", "encode"),
)
def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the apply half of the tokenizer story
    (docs_bpe_top_merges is the train half): segment every word with
    the frozen 10-rule merge table and report per-doc token counts and
    the chars-per-token compression the vocabulary buys. The encoding
    is pure string algebra in codegen: each word becomes
    sentinel-wrapped symbols and each merge is one literal replace()
    — leftmost non-overlapping replacement IS greedy BPE, and the
    double-sentinel wrapping makes cross-symbol matches impossible
    (see _sql_bpe_encoded). Multi-level merges ('m'+'er') prove the
    rules compose sequentially, like a real tokenizer's merges.txt.

    Scale: explode(words) -> 10 chained replaces -> one (doc) hash-agg
    — all JVM-side whole-stage codegen, one map-side-combined shuffle
    on doc_id. At 100 TB this is the tokenize-and-count pass of a
    training-data pipeline, cost = the scan plus string work linear in
    corpus characters. The ratio is a single IEEE division of two
    exact integers (hash-safe)."""
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.length("w") > 0
    )
    enc = _bpe_encoded(F.col("w"))
    sym = w.select(
        "doc_id",
        F.length("w").alias("n_chars"),
        ((F.length(enc) - F.length(F.replace(enc, F.lit(_BPE_SEP), F.lit("")))) / 2)
        .cast("long")
        .alias("n_sym"),
    )
    return sym.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_sym").alias("n_bpe_tokens"),
        (F.sum("n_sym").cast("double") / F.sum("n_chars")).alias("bpe_ratio"),
    )


# --------------------------------------------------------------------------
# Incremental BM25 index maintenance: merge a new shard, re-rank
# --------------------------------------------------------------------------
_BM25_SHARD_MOD = 4  # doc_id % 4 == 3 is the "newly crawled" shard


@register(
    "docs_bm25_index_increment",
    # Oracle = the FROM-SCRATCH BM25 top-k over the full corpus (token-
    # identical to docs_bm25_topk's oracle) — the increment plan must
    # reproduce it bit-for-bit, the same contract as
    # emb_ann_ivfpq_increment (oracle = full rebuild). All merged
    # statistics are integers, so the algebraic merge is exact and the
    # shared scoring expression yields identical doubles.
    oracle=f"""
    WITH {_sql_bm25_docs()}
    SELECT doc_id, n_terms, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                AS BIGINT) AS rk
    FROM bm25
    ORDER BY score DESC, doc_id ASC LIMIT {BM25_TOPK}
    """,
    tags=("llm", "retrieval", "bm25", "incremental"),
)
def docs_bm25_index_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental retrieval-index maintenance — the BM25 member of the
    incremental lane (docs_incremental_dedup / emb_ann_ivfpq_increment
    / store_mv_refresh_increment): a standing index over the base
    corpus (postings, per-term df, corpus totals) absorbs a newly
    crawled shard (doc_id % {mod} == {shard}) by PURE ALGEBRA — shard
    postings union in (doc-disjoint, no collision), per-term df adds
    (full outer on term, COALESCE 0 for terms new to either side),
    corpus totals add — and the query re-ranks on the merged
    statistics. The base corpus enters ONLY through its three standing
    aggregates (postings, per-term df, totals) — algebraically
    separable, so in production they are a persisted index and the
    crawl shard is the only text scanned (this self-contained query
    materializes the base aggregates inline, like
    docs_incremental_dedup's bucket table).

    The result must equal docs_bm25_topk's from-scratch ranking
    bit-for-bit: every merged statistic is an exact integer, and the
    scoring expression is the SAME factored tree (_bm25_s20_expr), so
    the IEEE arithmetic is identical — the oracle is the from-scratch
    SQL, making the increment algebra the thing under test.

    Scale: df-merge shuffles at most |query terms| rows; the postings
    union is partition-preserving; the totals merge is two 1-row
    frames. BM25's global statistics (df, avgdl) are why naive
    incremental search engines go stale — this shape keeps them exact
    at shard-merge cost."""
    stats = _bm25_stats_cached(spark, sf_dir)
    is_shard = (F.col("doc_id") % _BM25_SHARD_MOD) == (_BM25_SHARD_MOD - 1)
    _bdl, base_tot, base_tf = _bm25_split_stats(stats.filter(~is_shard))
    _ndl, new_tot, new_tf = _bm25_split_stats(stats.filter(is_shard))

    # --- the merge: integers only, all exact -----------------------------
    totals = (
        base_tot.select(
            F.col("n_docs").alias("nb"), F.col("sum_dl").alias("sb")
        )
        .crossJoin(
            new_tot.select(
                F.col("n_docs").alias("nn"), F.col("sum_dl").alias("sn")
            )
        )
        .select(
            (F.col("nb") + F.col("nn")).alias("n_docs"),
            (F.col("sb") + F.col("sn")).alias("sum_dl"),
        )
    )
    df_base = base_tf.groupBy("term").agg(F.count("*").alias("df_b"))
    df_new = new_tf.groupBy("term").agg(F.count("*").alias("df_n"))
    df_merged = (
        df_base.join(df_new, "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("df_b"), F.lit(0))
                + F.coalesce(F.col("df_n"), F.lit(0))
            ).alias("df"),
        )
    )
    postings = base_tf.unionByName(new_tf)  # doc-disjoint by construction

    # postings carry dl inline (the single-scan stats shape), so the
    # scoring join on doc length is gone entirely; df_merged broadcasts
    # (bounded by the frozen term list) so the postings are never
    # shuffled on term — the same hot-term guard as _bm25_docs
    joined = postings.join(F.broadcast(df_merged), "term").crossJoin(
        F.broadcast(totals)
    )
    scored = _bm25_fold_scores(
        joined.select("doc_id", _bm25_s20_expr().alias("s20"))
    )
    ranked = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return ranked.withColumn("rk", F.row_number().over(w).cast("long"))


docs_bm25_index_increment.__doc__ = docs_bm25_index_increment.__doc__.format(
    mod=_BM25_SHARD_MOD, shard=_BM25_SHARD_MOD - 1
)
