"""Property tests for the round-4 corpus operators (plans/corpus.py)
beyond the oracle-parity differentials: the semantic guarantees each
operator advertises, checked on planted inputs.

- winnowing: two documents sharing a long substring share fingerprints
  (the MOSS guarantee); disjoint documents don't.
- bloom semi-join: the prefilter keeps every true member (no false
  negatives) and actually filters (selectivity < 1 on the fixture).
- content-defined chunking: chunks reconstruct each document exactly,
  and an insertion at the front leaves the tail chunk set intact
  (boundary stability — the property fixed-size chunking lacks).
- quantization: dequantized values stay within half a quantization
  step of the originals; zero vectors stay zero.
- PageRank: on a planted star graph the hub outranks every spoke;
  ranks are reproducible (fixed-point integers — exact equality).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efiche_data_pipeline_spark.plans.corpus import (
    _CDC_MOD,
    q83_winnowing_fingerprints,
    q85_part_pagerank,
    q92_bloom_semi_join,
    q93_content_defined_chunks,
    q94_embedding_quantization,
)

from .conftest import SMOKE_SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _winnow_fps(spark, texts):
    """Raw fingerprint sets per doc (the q83 internals, kept distinct)."""
    import efiche_data_pipeline_spark.plans.corpus as corpus
    from pyspark.sql import Window as W

    from efiche_data_pipeline_spark.functions.hashing import portable_hash60
    from efiche_data_pipeline_spark.functions.text import word_ngrams

    docs = _docs(spark, texts)
    grams = docs.select(
        "doc_id", F.posexplode(word_ngrams("text", corpus._WINNOW_N)).alias(
            "pos", "gram"
        )
    )
    hashed = grams.select("doc_id", "pos", portable_hash60("gram").alias("h"))
    by_doc = W.partitionBy("doc_id")
    win = by_doc.orderBy("pos").rowsBetween(0, corpus._WINNOW_W - 1)
    kept = (
        hashed.withColumn("n", F.count(F.lit(1)).over(by_doc))
        .withColumn("wmin", F.min("h").over(win))
        .filter(F.col("pos") <= F.greatest(F.col("n") - corpus._WINNOW_W, F.lit(0)))
    )
    rows = kept.select("doc_id", "wmin").distinct().collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["wmin"])
    return out


def test_winnowing_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    a = "intro words here " + shared + " closing remarks follow now"
    b = "completely different opening " + shared + " and another ending"
    c = "nothing in common with either document at all whatsoever period"
    fps = _winnow_fps(spark, [a, b, c])
    assert fps[0] & fps[1], "docs sharing a 12-word substring must collide"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_winnowing_counts_consistent(spark):
    out = {
        r["doc_id"]: r
        for r in q83_winnowing_fingerprints(spark, SMOKE_SF_DIR).collect()
    }
    assert out, "fixture docs must produce fingerprints"
    for r in out.values():
        assert 1 <= r["n_fingerprints"] <= r["n_windows"]


def test_bloom_semi_join_matches_exact_and_filters(spark):
    got = q92_bloom_semi_join(spark, SMOKE_SF_DIR)
    from efiche_data_pipeline_spark.sources.catalog import load_table

    c = load_table(spark, SMOKE_SF_DIR, "customer")
    o = load_table(spark, SMOKE_SF_DIR, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    want = c.join(
        urgent, c["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_cdc_chunks_reconstruct_documents(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    docs = _docs(spark, texts)
    from pyspark.sql import Window as W

    from efiche_data_pipeline_spark.functions.hashing import portable_hash60
    from efiche_data_pipeline_spark.functions.text import tokens

    toks = docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    flag = (F.pmod(portable_hash60("tok"), F.lit(_CDC_MOD)) == 0).cast("long")
    prev = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, -1
    )
    chunks = (
        toks.withColumn(
            "chunk_id", F.coalesce(F.sum(flag).over(prev), F.lit(0)).cast("long")
        )
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text")
        )
        .collect()
    )
    rebuilt: dict[int, list[tuple[int, str]]] = {}
    for r in chunks:
        rebuilt.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, text in enumerate(texts):
        parts = [t for _, t in sorted(rebuilt[i])]
        assert " ".join(parts) == text


def test_cdc_boundary_stability_under_prefix_insertion(spark):
    base = (
        "row scan filter join hash merge sort window batch stream "
        "column value table query group order part line key agg"
    )
    edited = "inserted words at the front " + base
    docs = _docs(spark, [base, edited])
    import efiche_data_pipeline_spark.plans.corpus as corpus

    from pyspark.sql import Window as W

    from efiche_data_pipeline_spark.functions.hashing import portable_hash60
    from efiche_data_pipeline_spark.functions.text import tokens

    toks = docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    flag = (F.pmod(portable_hash60("tok"), F.lit(corpus._CDC_MOD)) == 0).cast(
        "long"
    )
    prev = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, -1
    )
    per_doc = (
        toks.withColumn(
            "chunk_id", F.coalesce(F.sum(flag).over(prev), F.lit(0)).cast("long")
        )
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("fp")
        )
        .collect()
    )
    sets: dict[int, set[str]] = {}
    for r in per_doc:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    # The edit only prepends words: every chunk after the first
    # boundary is untouched, so the shared-fingerprint overlap must
    # cover all but at most one chunk of the original.
    assert len(sets[0] & sets[1]) >= len(sets[0]) - 1


def test_quantization_error_bound_and_zero_vectors(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 0.125]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = F.transform("embedding", lambda x: x.cast("double"))
    base = df.select("vec_id", v.alias("v"))
    scale = F.array_max(F.transform("v", F.abs))
    with_scale = base.withColumn("scale", scale)
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            "v", lambda x: F.round(x * F.lit(127) / F.col("scale")).cast("int")
        ),
    ).otherwise(F.transform("v", lambda x: F.lit(0)))
    out = with_scale.withColumn("q", q).collect()
    for r in out:
        if r["scale"] == 0:
            assert all(x == 0 for x in r["q"])
            continue
        step = r["scale"] / 127.0
        for orig, qi in zip(r["v"], r["q"]):
            assert abs(orig - qi * step) <= step / 2 + 1e-12
            assert -127 <= qi <= 127


def test_quantization_query_shape(spark):
    out = q94_embedding_quantization(spark, SMOKE_SF_DIR).collect()
    assert out
    for r in out:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["q_scale"] >= 0


def test_pagerank_star_graph_hub_wins(spark):
    # Orders shaped so part 1 co-occurs with every spoke (star):
    # each order = (hub, spoke_i).
    rows = []
    for i, spoke in enumerate([2, 3, 4, 5, 6]):
        rows.append((100 + i, 1))
        rows.append((100 + i, spoke))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        ranks = {
            r["p_partkey"]: r["pagerank"]
            for r in q85_part_pagerank(spark, d).collect()
        }
    hub = ranks.pop(1)
    assert all(hub > v for v in ranks.values())
    # spokes are symmetric -> identical integer ranks
    assert len(set(ranks.values())) == 1


def test_pagerank_exactly_reproducible(spark):
    a = sorted(map(tuple, q85_part_pagerank(spark, SMOKE_SF_DIR).collect()))
    b = sorted(map(tuple, q85_part_pagerank(spark, SMOKE_SF_DIR).collect()))
    assert a == b


def test_kmv_merge_equals_direct_global_sketch(spark):
    """Mergeability: the estimate from merged per-group sketches must
    equal the estimate of a direct global sketch (same k)."""
    from efiche_data_pipeline_spark.operators.sketch import (
        kmv_bottom,
        kmv_distinct,
        kmv_merge,
    )

    rows = [(i % 7, f"v{i % 997}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, v string")
    merged = kmv_merge(kmv_bottom(df, ["g"], "v", k=32), k=32).collect()[0]
    direct = (
        kmv_distinct(df.select(F.lit(1).alias("one"), "v"), ["one"], "v", k=32)
        .collect()[0]["kmv_estimate"]
    )
    assert merged["kmv_estimate"] == direct


def test_kmv_merge_exact_below_k(spark):
    from efiche_data_pipeline_spark.operators.sketch import kmv_bottom, kmv_merge

    rows = [(i % 3, f"v{i % 10}") for i in range(300)]
    df = spark.createDataFrame(rows, "g int, v string")
    out = kmv_merge(kmv_bottom(df, ["g"], "v", k=64), k=64).collect()[0]
    assert out["kmv_estimate"] == 10  # < k distinct -> exact


def _partition_invariant(spark, sf_dir, fn, shuffles=(1, 5)):
    """Run fn against the fixture re-materialized at different input
    partition counts; results must be identical (the operators must
    not depend on physical layout)."""
    import os
    import shutil
    import tempfile

    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    for n in shuffles:
        d = tempfile.mkdtemp()
        try:
            for t in os.listdir(sf_dir):
                if not t.endswith(".parquet"):
                    continue
                src = os.path.join(sf_dir, t)
                spark.read.parquet(src).repartition(n).write.parquet(
                    os.path.join(d, t)
                )
            got = sorted(map(tuple, fn(spark, d).collect()))
            assert got == base, f"layout-dependent result at {n} partitions"
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_winnowing_partition_independent(spark):
    _partition_invariant(spark, SMOKE_SF_DIR, q83_winnowing_fingerprints)


def test_cdc_chunks_partition_independent(spark):
    _partition_invariant(spark, SMOKE_SF_DIR, q93_content_defined_chunks)


def test_pagerank_partition_independent(spark):
    _partition_invariant(spark, SMOKE_SF_DIR, q85_part_pagerank, shuffles=(3,))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "key"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=40),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cdc_chunks_reconstruct_any_corpus(spark, docs):
    """Hypothesis differential: for ANY corpus, the content-defined
    chunks concatenated in chunk order must reproduce each document
    exactly (no token lost, duplicated, or reordered)."""
    from pyspark.sql import Window as W

    from efiche_data_pipeline_spark.functions.hashing import portable_hash60
    from efiche_data_pipeline_spark.functions.text import tokens as tok_fn

    texts = [" ".join(ws) for ws in docs]
    frame = _docs(spark, texts)
    toks = frame.select("doc_id", F.posexplode(tok_fn("text")).alias("pos", "tok"))
    flag = (F.pmod(portable_hash60("tok"), F.lit(_CDC_MOD)) == 0).cast("long")
    prev = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, -1
    )
    chunks = (
        toks.withColumn(
            "chunk_id", F.coalesce(F.sum(flag).over(prev), F.lit(0)).cast("long")
        )
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text")
        )
        .collect()
    )
    rebuilt: dict[int, list[tuple[int, str]]] = {}
    for r in chunks:
        rebuilt.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, text in enumerate(texts):
        assert " ".join(t for _, t in sorted(rebuilt[i])) == text


def test_pagerank_releases_adjacency_cache(spark):
    """q85 must not leak its persisted adjacency into the caller's
    session (ADVICE r04): after the query function returns, no new
    cached RDD/DataFrame may remain."""
    spark.catalog.clearCache()
    df = q85_part_pagerank(spark, SMOKE_SF_DIR)
    jsc = spark.sparkContext._jsc.sc()
    # localCheckpoint RDDs report name 'MapPartitionsRDD' (the O(nodes)
    # result pin, released by the ContextCleaner on GC); a leaked
    # DataFrame persist reports its plan string as the name.
    cached = [
        info
        for info in jsc.getRDDStorageInfo()
        if info.numCachedPartitions() > 0
        and info.name() != "MapPartitionsRDD"
    ]
    assert cached == [], [c.name() for c in cached]
    assert df.count() > 0


def test_pagerank_configurable_iters_truncates_lineage(spark):
    """With iters > _PR_CKPT_EVERY the rank lineage must be truncated
    by localCheckpoint (plan stays bounded) and still produce a row
    per node, identical node set to the 3-iteration run."""
    base = q85_part_pagerank(spark, SMOKE_SF_DIR)
    deep = q85_part_pagerank(spark, SMOKE_SF_DIR, iters=9)
    assert sorted(r["p_partkey"] for r in deep.collect()) == sorted(
        r["p_partkey"] for r in base.collect()
    )


def test_q89_digitless_source_null_rate_matches_oracle(spark):
    """A source name with NO digits must yield NULL rate_ppm /
    n_sampled on BOTH sides (ADVICE r04: the oracle's plain CAST(''
    AS INTEGER) hard-failed in DuckDB while Spark returned NULL; the
    oracle now TRY_CASTs and mirrors SUM-of-NULL = NULL)."""
    import os
    import tempfile

    import duckdb
    import pandas as pd

    from efiche_data_pipeline_spark.plans.corpus import (
        ORACLES,
        q89_curriculum_mixture,
    )
    from .conftest import assert_frames_match

    docs = spark.createDataFrame(
        [(i, f"doc text {i}", "web", "en") for i in range(20)]
        + [(100 + i, f"other {i}", "crawl7", "en") for i in range(20)],
        "doc_id long, text string, source string, lang string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        got = q89_curriculum_mixture(spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet/*.parquet'"
        )
        want = con.execute(ORACLES["q89_curriculum_mixture"]).df()
        con.close()
    assert_frames_match(got, want, "q89_digitless")
    row = got.set_index("source").loc["web"]
    assert pd.isna(row["rate_ppm"]) and pd.isna(row["n_sampled"])


def test_bloom_bits_scale_with_ndv():
    from efiche_data_pipeline_spark.plans.corpus import (
        _BLOOM_MAX_BITS,
        _BLOOM_MIN_BITS,
        _bloom_bits_for_ndv,
    )

    assert _bloom_bits_for_ndv(1_000) == _BLOOM_MIN_BITS  # floor
    assert _bloom_bits_for_ndv(300_000) == 1 << 23  # 19 bits/key, pow2
    assert _bloom_bits_for_ndv(10_000_000) == _BLOOM_MAX_BITS  # cap


def test_bloom_prefilter_ndv_sizing_stays_selective_and_fn_free(spark):
    """~300k build keys SATURATE a fixed 256-Kbit bloom (2-hash FP
    ~ 80% — the r04 scale watch-item); NDV sizing keeps FP ~ 1%.
    Either way the filter must pass every true member (no false
    negatives — that is what keeps the exact verify join sound)."""
    from efiche_data_pipeline_spark.plans.corpus import (
        _BLOOM_MIN_BITS,
        _bloom_bits_for_ndv,
        bloom_prefilter,
    )

    n = 300_000
    build = spark.range(n).select(F.col("id").alias("k"))
    non_members = spark.range(n, 2 * n).select(F.col("id").alias("ck"))
    bits = _bloom_bits_for_ndv(n)
    assert bits > _BLOOM_MIN_BITS
    fp_sized = bloom_prefilter(non_members, "ck", build, bits).count() / n
    assert fp_sized < 0.05, fp_sized
    fp_fixed = (
        bloom_prefilter(non_members, "ck", build, _BLOOM_MIN_BITS).count() / n
    )
    assert fp_fixed > 0.5, fp_fixed  # the degradation NDV sizing fixes
    members = spark.range(0, n, 37).select(F.col("id").alias("ck"))
    assert (
        bloom_prefilter(members, "ck", build, bits).count() == members.count()
    )


def test_psi_drift_detects_planted_shift(spark):
    """PSI must be ~0 when both slices draw from one distribution and
    large when the current slice is shifted — the gate semantics."""
    import os
    import tempfile

    from efiche_data_pipeline_spark.plans.corpus import q107_orders_drift

    def orders(rows):
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp_ntz, "
            "o_orderpriority string",
        )

    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    same = [
        (i, 1, "O", float(100 + (i * 13) % 500), ts, "3-MEDIUM")
        for i in range(2000)
    ]
    # ref half keeps the price law; cur half (keys > split) shifts +1000
    shifted = [
        (i, 1, "O", float(100 + (i * 13) % 500) + (1000.0 if i >= 1000 else 0.0),
         ts, "3-MEDIUM")
        for i in range(2000)
    ]
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        orders(same).write.parquet(os.path.join(d1, "orders.parquet"))
        orders(shifted).write.parquet(os.path.join(d2, "orders.parquet"))
        calm = {
            r["column_name"]: r["psi"]
            for r in q107_orders_drift(spark, d1).collect()
        }
        drift = {
            r["column_name"]: r["psi"]
            for r in q107_orders_drift(spark, d2).collect()
        }
    assert calm["o_totalprice"] < 0.1  # same law -> stable
    assert drift["o_totalprice"] > 0.5  # shifted law -> alarm
    assert drift["o_orderpriority"] < 0.1  # untouched column stays calm
