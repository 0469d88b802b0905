"""BM25 retrieval over the document corpus — the search/attribution
member of the text-operator families: "which documents best answer
this query", the ranked-retrieval twin of the exact-match passage
search (operators/dedup.py:passage_search) and the containment
attribution (q188). Training-data pipelines use exactly this shape
for eval-set retrieval contamination ("is a benchmark answer
retrievable verbatim?"), RAG-corpus QA, and hard-negative mining.

Three surfaces, one scoring law:

- :func:`bm25_topk` — one-shot over a corpus frame (q194);
- :func:`incremental_term_postings` + :func:`bm25_index_query` — the
  maintained inverted-index estate: postings fold batch-by-batch at
  intake (one text pass per batch, history text never rescanned) and
  queries read ONLY the probed terms' directory slice (q195);
- :func:`forget_term_documents` — GDPR for the estate (q196): pure
  deletes, blind-retry convergent, after which every read equals the
  one-shot over the survivors.

Scoring is Lucene-shaped BM25 with the q139 fixed-point discipline:
each (query term, doc) contribution is computed with a DuckDB-
mirrorable float AST —

    idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

— then rounded to an exact int64 at 1e9 fixed point, so the per-doc
SUM is order-free and the oracle hash-exact; ranks order by the
fixed-point score (exact long) with doc-id tie-breaks, never by a
rounded double.

Scale shape: query terms BROADCAST; the corpus token pass filters to
them BEFORE any exchange, so the tf/df aggregates shuffle matched
postings only, never the corpus vocabulary; doc lengths come from
``F.size`` on the scan (no explode). The maintained index partitions
postings by tp = xxhash64(term) mod buckets (layout sidecar, the
GH_BUCKETS discipline), so point queries prune the postings scan to
the query terms' directory prefixes.

Reference anchor: none (beyond-reference tier — the reference's
engine is PostgreSQL, reference etl_pipeline.py:1-80 has no search
surface); nearest public analogue is Lucene/Elasticsearch BM25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import GH_BUCKETS, _persisted_buckets

_FP = 1e9  # fixed-point scale for per-term contributions (q139 rule)


def _query_terms(queries: DataFrame, query_id_col: str, query_col: str) -> DataFrame:
    """(query_id, term), distinct — repeated query terms score once
    (the Lucene default for qf=1)."""
    return (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokens(query_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


def _bm25_scores(
    tf: DataFrame,
    qterms: DataFrame,
    doclens: DataFrame,
    n_docs: int,
    sum_dl: int,
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """Shared scoring tail: (doc _id, term, tf) postings for the query
    terms → fixed-point BM25 → per-query top-k. ``tf`` must hold ONE
    row per (term, _id); the index reader dedupes its multiset before
    calling (the one-shot aggregate is distinct by construction)."""
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = float(sum_dl) / n_docs
    idf = F.log(
        1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .join(doclens, "_id")
        .select(
            "query_id",
            "_id",
            F.round(idf * norm * F.lit(_FP)).cast("long").alias("t_fp"),
        )
    )
    from pyspark.sql.window import Window

    scored = contrib.groupBy("query_id", "_id").agg(
        F.sum("t_fp").alias("s_fp")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s_fp"), F.col("_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "_id",
            "rank",
            F.round(F.col("s_fp") / F.lit(_FP), 6).alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """One-shot BM25 top-k: (query_id, doc_id, rank, score) for the
    ``k`` best documents per query, most-relevant first, exact ties
    broken by doc id. See the module docstring for the scoring law,
    the fixed-point exactness rule, and the scale shape."""
    base = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_t")
    )
    doclens = base.select(
        "_id", F.size("_t").cast("long").alias("dl")
    ).localCheckpoint(eager=True)
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    n_docs, sum_dl = int(stats["n"]), int(stats["s"])
    qterms = _query_terms(queries, query_id_col, query_col).localCheckpoint(
        eager=True
    )
    terms = qterms.select("term").distinct()
    tf = (
        base.select("_id", F.explode("_t").alias("term"))
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy("term", "_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    out = _bm25_scores(tf, qterms, doclens, n_docs, sum_dl, k1, b, k)
    return out.withColumnRenamed("_id", id_col)


def oracle_bm25_sql(
    queries: list[tuple[int, str]] | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    where: str = "TRUE",
    queries_from: str | None = None,
) -> str:
    """The DuckDB replay of :func:`bm25_topk` over the ``documents``
    view (optionally restricted by ``where`` — the q196 survivor
    form), with the SAME float AST and 1e9 fixed point, so the
    comparison is hash-exact. Query set: literal ``queries`` pairs,
    or ``queries_from`` — a SQL fragment selecting (query_id, query)
    — for corpus-derived query text (the q197 form)."""
    if queries_from is None:
        vals = ", ".join(f"({i}, '{q}')" for i, q in queries)
        q_cte = f"q(query_id, query) AS (VALUES {vals})"
    else:
        q_cte = f"q AS ({queries_from})"
    return f"""
WITH {q_cte},
toks AS (
    SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
    FROM documents WHERE {where}
),
dl AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS dl FROM toks),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
qt AS (
    SELECT DISTINCT query_id,
           UNNEST(regexp_split_to_array(query, '\\s+')) AS term
    FROM q
),
tf AS (
    SELECT x AS term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks, UNNEST(t) AS u(x)
    WHERE x IN (SELECT DISTINCT term FROM qt)
    GROUP BY 1, 2
),
dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
contrib AS (
    SELECT qt.query_id, tf.doc_id,
           CAST(ROUND(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * ((tf * {k1 + 1.0!r})
                  / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl / avgdl)))
               * {_FP!r}) AS BIGINT) AS t_fp
    FROM tf
    JOIN qt USING (term)
    JOIN dfc USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
),
scored AS (
    SELECT query_id, doc_id, SUM(t_fp) AS s_fp FROM contrib GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, doc_id, s_fp,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY s_fp DESC, doc_id) AS rank
    FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(rank AS BIGINT) AS rank,
       ROUND(s_fp / {_FP!r}, 6) AS score
FROM ranked WHERE rank <= {k}
"""


def _tp_of(term, buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(buckets)).cast("int")


def incremental_term_postings(
    new_docs: DataFrame,
    store,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_table: str = "term_postings",
    doclen_table: str = "doc_lengths",
    seen_table: str = "postings_seen_docs",
) -> int:
    """Maintain the inverted index batch-by-batch: after every fold,
    the postings/doc-length tables describe ALL documents ever seen,
    and :func:`bm25_index_query` over them equals :func:`bm25_topk`
    over the union corpus. Returns the number of new documents folded.

    Per fold: ONE text pass over the batch only (tokenize → per-doc
    term counts + lengths); history text is never rescanned and no
    history exchange exists at all — BM25's corpus statistics (df, N,
    avgdl) are pure sums over per-doc rows, so the fold is pure
    append (contrast the span fold's retroactive Cut 1/Cut 2: nothing
    here reopens old docs). Postings commit hive-partitioned by
    tp = xxhash64(term) mod buckets (modulus in the layout sidecar —
    the GH_BUCKETS discipline) so queries prune to their terms'
    prefixes.

    Crash matrix — postings FIRST, doc-lengths SECOND, seen-watermark
    LAST, each append idempotent-by-replay:

    - crash before postings: nothing durable, full replay.
    - crash after postings / after doc-lengths, before seen: the
      replay re-appends the batch, making the touched tables
      MULTISETS for it; every reader collapses duplicates by
      ``max`` over the key (replayed rows are byte-identical, so
      max = the value) — exact, duplicates cost storage in this one
      window, never correctness. A doc visible in postings but not
      yet in doc-lengths cannot mis-score a query meanwhile: the
      scoring join is INNER on doc-lengths... which would DROP the
      doc's postings rows silently — hence doc-length rows for the
      batch are derived from the SAME frame as its postings and the
      reader treats postings-without-length as the corruption it is
      and raises (:func:`bm25_index_query`).
    - a partially visible seen append replays the missing suffix.
    """
    fresh = new_docs.select(F.col(id_col).alias("_id")).distinct()
    if store.exists(seen_table):
        fresh = fresh.join(
            store.read(seen_table).select("_id"), "_id", "left_anti"
        )
    base = (
        new_docs.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))
        .join(fresh, "_id", "left_semi")
        .localCheckpoint(eager=True)
    )
    n_new = base.count()
    if n_new == 0:
        return 0
    buckets = (
        _persisted_buckets(store, postings_table)
        if store.exists(postings_table)
        else GH_BUCKETS
    )
    postings = (
        base.select("_id", F.explode("_t").alias("term"))
        .groupBy("term", "_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("tp", _tp_of(F.col("term"), buckets))
        .repartition("tp")
    )
    if not store.exists(postings_table):
        store.write_layout_meta(
            postings_table,
            {"bucket_col": "tp", "hash_col": "term", "buckets": buckets},
        )
    store.append(postings, postings_table, partition_by=["tp"])
    store.append(
        base.select("_id", F.size("_t").cast("long").alias("dl")),
        doclen_table,
    )
    store.append_new(fresh.select("_id"), seen_table, key="_id")
    return n_new


def _pruned_postings(
    store, postings_table: str, terms: DataFrame
) -> DataFrame:
    """The index read: postings for the probed terms, with the scan
    PRUNED to the terms' tp directory prefixes when the term set
    cannot saturate the directory tree (the Cut-1 heuristic), and
    crash-window duplicates collapsed by max-per-key (replayed rows
    are byte-identical). Factored out so the plan pin tests the
    operator's actual read path."""
    buckets = _persisted_buckets(store, postings_table)
    scan = store.read(postings_table)
    if terms.count() <= 16 * buckets:
        prefixes = [
            int(r["p"])
            for r in terms.select(_tp_of(F.col("term"), buckets).alias("p"))
            .distinct()
            .collect()
        ]
        scan = scan.filter(F.col("tp").isin(prefixes))
    return (
        scan.join(F.broadcast(terms), "term", "left_semi")
        .groupBy("term", "_id")
        .agg(F.max("tf").alias("tf"))
    )


def bm25_index_query(
    store,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    postings_table: str = "term_postings",
    doclen_table: str = "doc_lengths",
) -> DataFrame:
    """:func:`bm25_topk` answered from the maintained index —
    result-identical to the one-shot over every document ever folded
    (same postings, same statistics, same fixed-point law), which is
    what lets the q195 oracle be q194's SQL verbatim.

    Read shape: the postings scan PRUNES to the query terms' hash
    prefixes at the directory level (skipped past the coupon-
    collector saturation bound, the Cut-1 heuristic); corpus
    statistics come from the doc-length table (2 slim columns,
    O(docs-seen)); both reads collapse crash-window duplicates by
    max-per-key. Raises on a doc that has postings but no committed
    length row — that is index corruption, not a scorable state."""
    doclens = (
        store.read(doclen_table)
        .groupBy("_id")
        .agg(F.max("dl").alias("dl"))
        .localCheckpoint(eager=True)
    )
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    n_docs, sum_dl = int(stats["n"]), int(stats["s"])
    qterms = _query_terms(queries, query_id_col, query_col).localCheckpoint(
        eager=True
    )
    terms = qterms.select("term").distinct()
    tf = _pruned_postings(store, postings_table, terms).localCheckpoint(
        eager=True
    )
    orphans = tf.select("_id").distinct().join(doclens, "_id", "left_anti")
    if orphans.limit(1).count():
        raise RuntimeError(
            f"{postings_table} holds postings for docs with no committed "
            f"{doclen_table} row: a crashed fold must replay before "
            "queries can score (postings commit first; lengths second)"
        )
    out = _bm25_scores(tf, qterms, doclens, n_docs, sum_dl, k1, b, k)
    return out.withColumnRenamed("_id", id_col)


def forget_term_documents(
    store,
    ids: DataFrame,
    id_col: str = "doc_id",
    postings_table: str = "term_postings",
    doclen_table: str = "doc_lengths",
    seen_table: str = "postings_seen_docs",
) -> dict[str, int]:
    """Right-to-be-forgotten for the retrieval estate: purge the ids
    from the postings index, the doc-length table, and the seen
    watermark. PURE deletes — BM25 statistics (df, N, avgdl) are
    recomputed from surviving rows at every read, so unlike the span
    estate there is NO derived report to shrink retroactively: after
    the purge every query equals the one-shot over the survivors, by
    construction. Blind-retry convergent trivially (each delete is
    idempotent; any crash window leaves a subset of the deletes done
    and the retry re-runs them all). Layout-preserving on the
    tp-bucketed postings directories. Returns per-table bookkeeping."""
    ids = (
        ids.select(F.col(id_col).alias("_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out: dict[str, int] = {}
    for table in (postings_table, doclen_table, seen_table):
        if store.exists(table):
            store.delete_keys(table, ids, "_id")
            out[table] = 0
    return out


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher's RRF, the
    standard hybrid-retrieval combiner): fuse N per-query rankings —
    e.g. BM25 lexical (q194) and embedding-cosine semantic (q29) —
    into one list per query, scoring each item Σ 1/(c + rank) over
    the lists it appears in. Rank-based, so the component scores
    need no calibration against each other; c=60 is the paper's
    robust default.

    Inputs must carry (query_id, item_id, rank); an item missing
    from a list simply contributes no term (the standard convention).
    Exactness follows the q139 fixed-point rule: each term rounds to
    int64 at 1e9 before the order-free SUM, and the fused rank
    orders by the exact fixed-point score with item-id tie-breaks.
    Returns (query_id, item_id, rank, rrf_score), best first.

    Scale shape: each input is already a top-k frame (≤ queries × k
    rows), so the union/aggregate/window all run on bounded data —
    the heavy lifting happened in the component retrievals."""
    from functools import reduce

    from pyspark.sql.window import Window

    fp = [
        r.select(
            "query_id",
            "item_id",
            F.round(F.lit(_FP) / (F.lit(float(c)) + F.col("rank")))
            .cast("long")
            .alias("t_fp"),
        )
        for r in rankings
    ]
    scored = (
        reduce(lambda a, b: a.unionByName(b), fp)
        .groupBy("query_id", "item_id")
        .agg(F.sum("t_fp").alias("s_fp"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s_fp"), F.col("item_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "item_id",
            "rank",
            F.round(F.col("s_fp") / F.lit(_FP), 6).alias("rrf_score"),
        )
    )
