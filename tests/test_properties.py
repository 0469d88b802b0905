"""Property-based tests (hypothesis): invariants that must hold for
ANY input, not just the fixtures — partition-layout invariance of the
exact money aggregation, as-of join equivalence to a per-key reference
implementation, and surrogate-key density under duplicates/skew."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.functions.numeric import money_sum
from efiche_data_pipeline_spark.operators.temporal import asof_join
from efiche_data_pipeline_spark.pipeline.warehouse import assign_surrogate_key

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

prices = st.lists(
    st.decimals(
        min_value="-99999.99", max_value="99999.99", places=2
    ).map(float),
    min_size=1,
    max_size=60,
)


@given(values=prices, parts=st.integers(min_value=1, max_value=7))
@SET
def test_money_sum_is_partition_invariant(spark, values, parts):
    """Exact decimal aggregation must not depend on physical layout —
    the property that makes parallel partials hash-match a
    single-threaded oracle."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    a = df.repartition(1).agg(money_sum("v").alias("s")).first().s
    b = df.repartition(parts).agg(money_sum("v").alias("s")).first().s
    assert a == b  # bit-exact, not approximately


@given(
    lefts=st.lists(st.integers(0, 100), min_size=1, max_size=25),
    rights=st.lists(st.tuples(st.integers(0, 100), st.integers(0, 999)),
                    min_size=0, max_size=25),
)
@SET
def test_asof_join_matches_reference(spark, lefts, rights):
    """asof_join == 'latest right with ts <= left ts' computed naively
    in Python, for arbitrary single-key event sets (including
    duplicate timestamps on either side)."""
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lefts)], "lid long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [(t, v) for t, v in rights], "ts long, v long"
    ).withColumn("ts", F.timestamp_seconds("ts")).withColumn("k", F.lit(1))
    left = left.withColumn("k", F.lit(1))

    got = {
        r.lid: r.v
        for r in asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    }
    for i, lt in enumerate(lefts):
        eligible = [(t, v) for t, v in rights if t <= lt]
        if not eligible:
            expected = None
        else:
            # latest ts wins; among equal ts the reference keeps the
            # one our sort order keeps (max v is not guaranteed), so
            # only assert the *timestamp* contract on ties
            best_t = max(t for t, _ in eligible)
            candidates = {v for t, v in eligible if t == best_t}
            assert got[i] in candidates, (i, lt, got[i], candidates)
            continue
        assert got[i] == expected, (i, lt, got[i], expected)


@given(
    keys=st.lists(st.integers(0, 20), min_size=1, max_size=80),
    buckets=st.integers(min_value=1, max_value=9),
)
@SET
def test_surrogate_keys_always_dense(spark, keys, buckets):
    """Keys are a permutation of 1..n for any input multiset (dupes,
    skew, single bucket) and any bucket count."""
    df = spark.createDataFrame([(k,) for k in keys], "nk long")
    out = [r.sk for r in assign_surrogate_key(df, "nk", "sk", buckets=buckets).collect()]
    assert sorted(out) == list(range(1, len(keys) + 1))


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@given(edges=edge_lists)
@SET
def test_dedup_components_matches_union_find(spark, edges):
    from efiche_data_pipeline_spark.operators.dedup import dedup_components

    # reference: plain union-find over the same undirected edges
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"] for r in dedup_components(pairs).collect()}
    assert got == expected


token_lists = st.lists(
    st.integers(min_value=0, max_value=9).map(lambda i: f"w{i}"),
    min_size=1,
    max_size=50,
)


@given(toks=token_lists, chunk=st.integers(2, 8), stride=st.integers(1, 8))
@SET
def test_chunking_covers_every_token(spark, toks, chunk, stride):
    """Sliding-window chunking invariant: with stride <= chunk, every
    token position falls inside at least one chunk, and every chunk is
    the exact token slice [start, start+chunk)."""
    if stride > chunk:
        stride = chunk  # gap-free configurations only
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    starts = F.sequence(F.lit(1), F.greatest(F.size(F.split("text", r"\s+")), F.lit(1)), F.lit(stride))
    out = (
        df.select("doc_id", F.split("text", r"\s+").alias("t"),
                  F.explode(starts).alias("s"))
        .select("s", F.concat_ws(" ", F.slice("t", F.col("s"), F.lit(chunk))).alias("c"))
        .collect()
    )
    covered = set()
    for r in out:
        s = r["s"]
        expect = " ".join(toks[s - 1 : s - 1 + chunk])
        assert r["c"] == expect
        covered.update(range(s - 1, min(s - 1 + chunk, len(toks))))
    assert covered == set(range(len(toks)))


id_len_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(rows=id_len_lists, bucket=st.integers(1, 50), budget=st.integers(1, 300))
@SET
def test_prefix_sum_and_packing_match_sequential(spark, rows, bucket, budget):
    """global_prefix_sum must equal the sequential exclusive cumsum for
    ANY ids/lengths/bucket size, and pack spans must tile the stream."""
    from efiche_data_pipeline_spark.operators.packing import (
        global_prefix_sum,
        pack_sequences,
    )

    df = spark.createDataFrame(rows, "id long, n long")
    got = {
        r.id: r.prefix
        for r in global_prefix_sum(df, "id", "n", bucket_size=bucket).collect()
    }
    acc, want = 0, {}
    for i, n in sorted(rows):
        want[i] = acc
        acc += n
    assert got == want

    packed = {
        r.id: (r.start_offset, r.pack_first, r.pack_last, r.n_packs)
        for r in pack_sequences(df, "id", "n", budget, bucket_size=bucket).collect()
    }
    for i, n in rows:
        start, first, last, span = packed[i]
        assert start == want[i]
        end = start + max(n, 1) - 1
        assert first == start // budget and last == end // budget
        assert span == last - first + 1


_CANON_ALPHABET = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs"),
        include_characters=" \t\n.,;é É",
    ),
    max_size=60,
)


@given(texts=st.lists(_CANON_ALPHABET, min_size=1, max_size=6))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_canonical_text_idempotent_and_case_insensitive(spark, texts):
    """canonical_text is a CLOSURE operator: applying it twice equals
    once (idempotency — the property that lets the canonical form be
    stored and re-canonicalized safely), and upper/lower variants of
    the same text canonicalize identically."""
    from efiche_data_pipeline_spark.functions.text import canonical_text

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        canonical_text("text").alias("c1"),
        canonical_text(canonical_text("text")).alias("c2"),
        canonical_text(F.upper("text")).alias("cu"),
    ).collect()
    by_id = dict(rows)
    for r in out:
        assert r["c2"] == r["c1"]  # idempotent
        # case-insensitivity holds for case-roundtrippable text (ß
        # uppercases to SS — one-way by Unicode design, excluded)
        t = by_id[r["doc_id"]]
        if t.upper().lower() == t.lower():
            assert r["cu"] == r["c1"]
        # canonical form never holds runs of spaces or edge spaces
        assert "  " not in r["c1"] and r["c1"] == r["c1"].strip()


def test_pack_manifest_tiles_exactly(spark):
    """q160's manifest invariants on a boundary-crossing fixture:
    per-doc slices sum to max(n_tokens, 1) with contiguous doc_off;
    per-pack slices tile [0, budget) contiguously (every pack but the
    last is exactly full); slice bounds never cross a pack edge."""
    import os
    import tempfile

    from efiche_data_pipeline_spark.plans.corpus import q160_pack_manifest

    # tokens: 1500, 1500 (crosses pack 0->1), 3000 (spans 2 edges),
    # 0 (placeholder slice), 100
    sizes = [1500, 1500, 3000, 0, 100]
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        m = sorted(
            tuple(r) for r in q160_pack_manifest(spark, d).collect()
        )  # (pack_id, doc_id, doc_off, pack_off, n_slice)
    budget = 2048
    total = sum(max(n, 1) for n in sizes)
    # per-doc: slices cover the doc contiguously
    for i, n in enumerate(sizes):
        sl = sorted((r[2], r[4]) for r in m if r[1] == i)
        assert sl[0][0] == 0 and sum(x[1] for x in sl) == max(n, 1)
        off = 0
        for doc_off, ln in sl:
            assert doc_off == off
            off += ln
    # per-pack: slices tile [0, budget) (last pack partial)
    n_packs = -(-total // budget)
    for p in range(n_packs):
        sl = sorted((r[3], r[4]) for r in m if r[0] == p)
        assert sl[0][0] == 0
        off = 0
        for pack_off, ln in sl:
            assert pack_off == off and ln >= 1
            off += ln
        assert off == (budget if p < n_packs - 1 else total - budget * p)


_bpe_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6),
    min_size=3,
    max_size=30,
)


@given(words=_bpe_words)
@SET
def test_bpe_encoding_is_lossless_segmentation(spark, words):
    """For ANY corpus and any learned merge table, every word's
    encoded symbols concatenate back to exactly word + '</w>' — BPE
    merges re-group characters but never create, drop, or reorder
    them (the invariant that makes the token count a true length
    measure). Checked on the training vocab AND on the apply_merges
    encoder over unseen words."""
    from efiche_data_pipeline_spark.operators.bpe import (
        END_OF_WORD,
        apply_merges,
        bpe_learn,
        word_vocab,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    vocab = word_vocab(docs)
    # learn as many merges as the corpus allows, capped small
    try:
        res = bpe_learn(vocab, 3)
    except RuntimeError:
        res = bpe_learn(vocab, 1)
    for r in res.vocab.collect():
        syms = r["seq"][1:-1].split(")(")
        assert "".join(syms) == r["word"] + END_OF_WORD
    merges = [
        (m["lhs"], m["rhs"]) for m in res.merges.orderBy("it").collect()
    ]
    unseen = spark.createDataFrame(
        [(w + "x",) for w in set(words)], "word string"
    )
    enc = unseen.select(
        "word", apply_merges(F.col("word"), merges).alias("seq")
    )
    for r in enc.collect():
        syms = r["seq"][1:-1].split(")(")
        assert "".join(syms) == r["word"] + END_OF_WORD


# ---- round-9 estate properties ---------------------------------------------

_span_corpus = st.lists(
    st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=8).map(
        " ".join
    ),
    min_size=2,
    max_size=6,
)


@given(texts=_span_corpus, mask=st.integers(min_value=0, max_value=63))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_forget_span_equals_survivor_one_shot(spark, texts, mask):
    """For ANY corpus and ANY forget subset: fold everything, forget
    the subset, and the maintained reports equal the one-shot
    duplicated_span_report over the survivors — the q177 invariant as
    an algebraic property (retroactive shrink included, since the
    tiny alphabet makes shared/unshared grams common)."""
    import shutil
    import tempfile

    from efiche_data_pipeline_spark.operators.dedup import (
        duplicated_span_report,
        forget_span_documents,
        incremental_duplicated_spans,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    gone_ids = [i for i in range(len(texts)) if (mask >> i) & 1]
    root = tempfile.mkdtemp(prefix="prop_spanforget_")
    try:
        store = Store(spark, root)
        incremental_duplicated_spans(docs, store, k=2, min_docs=2)
        forget_span_documents(
            store,
            spark.createDataFrame(
                [(i,) for i in gone_ids] or [(-1,)], "doc_id long"
            ),
            k=2,
            min_docs=2,
        )
        survivors = docs.filter(~F.col("doc_id").isin(gone_ids))
        got = sorted(
            tuple(r) for r in store.read("span_reports").collect()
        )
        want = sorted(
            tuple(r)
            for r in duplicated_span_report(
                survivors, k=2, min_docs=2
            ).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    texts=_span_corpus,
    needle_doc=st.integers(min_value=0, max_value=5),
    start=st.integers(min_value=0, max_value=6),
    length=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_passage_search_many_matches_brute_force(
    spark, texts, needle_doc, start, length
):
    """For ANY corpus and ANY token-slice needle (including sub-k
    needles, which bypass the index): the indexed multi-needle search
    equals the padded-locate brute force computed in Python."""
    import shutil
    import tempfile

    from efiche_data_pipeline_spark.operators.dedup import (
        incremental_duplicated_spans,
        passage_search_many,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = texts[needle_doc % len(texts)].split()
    needle = " ".join(toks[start % len(toks) :][:length]) or toks[0]
    passages = spark.createDataFrame(
        [(0, needle), (1, "zz qq xx")], "needle_id long, passage string"
    )
    root = tempfile.mkdtemp(prefix="prop_psmany_")
    try:
        store = Store(spark, root)
        incremental_duplicated_spans(docs, store, k=3, min_docs=2)
        got = sorted(
            (r["doc_id"], r["needle_id"], r["pos"])
            for r in passage_search_many(
                docs, passages, "doc_id", "text", k=3, store=store
            ).collect()
        )
        want = []
        for nid, p in ((0, needle), (1, "zz qq xx")):
            pad_n = " " + " ".join(p.split()) + " "
            for i, t in enumerate(texts):
                pad_t = " " + " ".join(t.split()) + " "
                pos = pad_t.find(pad_n)
                if pos >= 0:
                    want.append((i, nid, pos + 1))
        assert got == sorted(want)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**6),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    split=st.integers(min_value=0, max_value=19),
    k=st.integers(min_value=1, max_value=8),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ref_sample_fold_is_closed_under_batching(spark, ids, split, k):
    """The gate's bounded re-score sample: folding ANY batch split
    yields exactly the global bottom-k-by-id-hash draw (the KMV
    closure the q170 sampling mode rests on)."""
    import shutil
    import tempfile

    from efiche_data_pipeline_spark.functions.hashing import portable_hash60
    from efiche_data_pipeline_spark.operators.lm import _ref_sample_fold
    from efiche_data_pipeline_spark.pipeline.store import Store

    rows = [(i, f"text {i}") for i in sorted(ids)]
    cut = split % len(rows)
    b1, b2 = rows[: cut + 1], rows[cut + 1 :]
    root = tempfile.mkdtemp(prefix="prop_refsample_")
    try:
        store = Store(spark, root)
        for b in (b1, b2):
            if b:
                _ref_sample_fold(
                    store,
                    spark.createDataFrame(b, "doc_id long, text string"),
                    "doc_id",
                    "text",
                    k,
                    "gate_ref_docs",
                    "gate_ref_sample",
                )
        got = sorted(
            r["doc_id"]
            for r in store.read_version("gate_ref_sample").collect()
        )
        want = sorted(
            r["doc_id"]
            for r in spark.createDataFrame(rows, "doc_id long, text string")
            .withColumn("_h", portable_hash60(F.col("doc_id").cast("string")))
            .orderBy("_h", "doc_id")
            .limit(k)
            .collect()
        )
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    vecs=st.lists(
        st.lists(
            st.integers(-5, 5).map(float), min_size=3, max_size=3
        ).filter(lambda v: any(x != 0.0 for x in v)),
        min_size=1,
        max_size=18,
    ),
    n_bench=st.integers(0, 5),
    split=st.integers(0, 17),
)
@SET
def test_incremental_semantic_decontamination_closed_under_batching(
    spark, tmp_path_factory, vecs, n_bench, split
):
    """For ANY corpus × ANY benchmark subset × ANY batch split, the
    maintained flags table equals the one-shot screen — the pure-
    function-of-(vector, fixed-index) argument q181 rests on."""
    from hypothesis import assume

    from efiche_data_pipeline_spark.operators.similarity import (
        incremental_semantic_decontamination,
        seed_semantic_benchmark,
        semantic_decontamination,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    assume(len(vecs) > n_bench)  # a non-empty corpus side
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = df.filter(F.col("vec_id") < n_bench)
    corpus = df.filter(F.col("vec_id") >= n_bench)
    store = Store(
        spark, str(tmp_path_factory.mktemp("semdecon_prop"))
    )
    seed_semantic_benchmark(store, bench)
    b1 = corpus.filter(F.col("vec_id") <= split)
    b2 = corpus.filter(F.col("vec_id") > split)
    incremental_semantic_decontamination(b1, store, tau=0.9)
    incremental_semantic_decontamination(b2, store, tau=0.9)
    tup = lambda r: (r["vec_id"], r["max_bench_sim"], r["contaminated"])
    got = sorted(map(tup, store.read("semantic_decontam_flags").collect()))
    want = sorted(
        map(tup, semantic_decontamination(corpus, bench, tau=0.9).collect())
    )
    assert got == want


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    n_epochs=st.integers(1, 4),
)
@SET
def test_epoch_shuffle_is_always_a_permutation(spark, ids, n_epochs):
    """For ANY id set and epoch count: every epoch's positions are
    exactly 1..n, and the assignment replays the portable md5 rank."""
    import hashlib

    from efiche_data_pipeline_spark.operators.ranking import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        (r["epoch"], r["doc_id"]): r["position"]
        for r in epoch_shuffle(df, "doc_id", n_epochs).collect()
    }
    assert len(got) == len(ids) * n_epochs

    def h(e, i):
        return int(
            hashlib.md5(f"seed42#ep{e}#{i}".encode()).hexdigest()[:15], 16
        )

    for e in range(1, n_epochs + 1):
        order = sorted(ids, key=lambda i: (h(e, i), i))
        assert [got[(e, i)] for i in order] == list(
            range(1, len(ids) + 1)
        )


@given(
    texts=st.lists(
        st.text(
            alphabet="ab @.-c5", min_size=0, max_size=24
        ),
        min_size=1,
        max_size=12,
    ),
    split=st.integers(0, 11),
)
@SET
def test_incremental_pii_flags_closed_under_batching(
    spark, tmp_path_factory, texts, split
):
    """For ANY texts (an alphabet dense in regex-triggering chars) and
    ANY batch split, the maintained flags equal the one-shot report."""
    from efiche_data_pipeline_spark.operators.quality import (
        incremental_pii_flags,
        pii_report,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    store = Store(spark, str(tmp_path_factory.mktemp("pii_prop")))
    incremental_pii_flags(docs.filter(F.col("doc_id") <= split), store)
    incremental_pii_flags(docs.filter(F.col("doc_id") > split), store)
    tup = lambda r: tuple(r.asDict()[c] for c in sorted(r.asDict()))
    got = sorted(map(tup, store.read("pii_flags").collect()))
    want = sorted(map(tup, pii_report(docs).collect()))
    assert got == want


_HH_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["hot", "cold", "pepper", "stone", "x", "y", "z"]),
        min_size=0,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=14,
)


@given(
    texts=_HH_TEXTS,
    den=st.integers(2, 12),
    parts=st.integers(1, 5),
)
@SET
def test_heavy_hitters_match_exact_counts_at_tight_k(
    spark, texts, den, parts
):
    """For ANY corpus over a tiny (collision-heavy) vocabulary, ANY
    threshold and ANY partitioning, the two-pass Misra-Gries plan at
    the TIGHTEST admissible summary size (k = den — the worst margin
    the guarantee allows) equals the exact GROUP BY ... HAVING."""
    from efiche_data_pipeline_spark.functions.text import word_ngrams
    from efiche_data_pipeline_spark.operators.sketch import (
        heavy_hitter_ngrams,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).repartition(parts)
    truth = {
        (r["gram"], r["c"])
        for r in docs.select(
            F.explode(word_ngrams("text", 2)).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(c for _, c in truth)
    want = {(g, c) for g, c in truth if c * den >= n}
    got = {
        (r["gram"], r["n_occurrences"])
        for r in heavy_hitter_ngrams(docs, "text", den=den, k=den).collect()
    }
    assert got == want


@given(
    texts=_HH_TEXTS,
    split=st.integers(0, 13),
    mask=st.integers(0, 63),
)
@SET
def test_forget_ngram_equals_survivor_one_shot(
    spark, tmp_path_factory, texts, split, mask
):
    """For ANY corpus, ANY batch split and ANY forget subset, the
    maintained gram counts after forget_ngram_documents equal the
    fold over the survivors alone (read through the HH threshold at
    den=1, i.e. the full surviving count table)."""
    from efiche_data_pipeline_spark.operators.sketch import (
        forget_ngram_documents,
        incremental_ngram_counts,
        ngram_heavy_hitters,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    store = Store(spark, str(tmp_path_factory.mktemp("fng_prop")))
    incremental_ngram_counts(docs.filter(F.col("doc_id") <= split), store)
    incremental_ngram_counts(docs.filter(F.col("doc_id") > split), store)
    gone_ids = [i for i in range(len(texts)) if mask & (1 << (i % 6))]
    gone = docs.filter(F.col("doc_id").isin(gone_ids or [-1]))
    forget_ngram_documents(store, gone)
    survivors = docs.filter(~F.col("doc_id").isin(gone_ids or [-1]))
    twin = Store(spark, str(tmp_path_factory.mktemp("fng_twin")))
    incremental_ngram_counts(survivors, twin)
    read = lambda s: (
        {
            (r["gram"], r["n_occurrences"])
            for r in ngram_heavy_hitters(s, den=1).collect()
        }
        if s.current_version("ngram_counts") is not None
        else set()
    )
    assert read(store) == read(twin)


# ---------------------------------------------------------------------------
# r11: proximity scoring vs a pure-Python reference on ANY corpus, and
# the expectations audit vs a Python recount on ANY dirty frame.
# ---------------------------------------------------------------------------
_prox_words = st.sampled_from(["a", "b", "c", "d"])
_prox_docs = st.lists(
    st.lists(_prox_words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(
    texts=_prox_docs,
    qtext=st.lists(_prox_words, min_size=2, max_size=4).map(" ".join),
    slop=st.integers(1, 4),
)
@SET
def test_proximity_matches_python_reference(spark, texts, qtext, slop):
    """proximity_topk's pair counts equal a brute-force Python count of
    ordered in-window pairs for ANY small corpus/query/slop — pinning
    the blocked self-join (floor(pos/slop) keying) against the
    definition it optimizes."""
    from efiche_data_pipeline_spark.operators.retrieval import proximity_topk

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    qf = spark.createDataFrame([(0, qtext)], "query_id long, query string")
    got = {
        r["doc_id"]: r["pair_hits"]
        for r in proximity_topk(docs, qf, slop=slop, k=100).collect()
    }
    qtoks = qtext.split()
    want = {}
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        n = 0
        for t1, t2 in zip(qtoks, qtoks[1:]):
            for p1, w1 in enumerate(toks):
                if w1 != t1:
                    continue
                for p2 in range(p1 + 1, min(p1 + slop, len(toks) - 1) + 1):
                    if toks[p2] == t2:
                        n += 1
        if n:
            want[i] = n
    assert got == want


_exp_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 9)),
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        st.sampled_from(["F", "O", "X", "P"]),
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_exp_rows)
@SET
def test_expectations_match_python_recount(spark, rows):
    """Every rule kind's violation count equals a Python recount for
    ANY frame with NULLs, duplicates, range breaks, and bad set
    values."""
    from efiche_data_pipeline_spark.operators.expectations import (
        Rule,
        check_expectations,
    )

    df = spark.createDataFrame(rows, "id long, price double, status string")
    ref = spark.createDataFrame([(i,) for i in range(5)], "k long")
    out = {
        r["rule_id"]: r["n_violations"]
        for r in check_expectations(
            df,
            [
                Rule("nn", "not_null", "id"),
                Rule("uq", "unique", "id"),
                Rule("rg", "range", "price", lo=-10.0, hi=10.0),
                Rule("st", "in_set", "status", values=("F", "O")),
                Rule("rf", "ref", "id", ref=ref, ref_col="k"),
            ],
        ).collect()
    }
    ids = [r[0] for r in rows]
    nn_ids = [i for i in ids if i is not None]
    prices = [r[1] for r in rows if r[1] is not None]
    assert out["nn"] == sum(1 for i in ids if i is None)
    assert out["uq"] == len(nn_ids) - len(set(nn_ids))
    assert out["rg"] == sum(1 for p in prices if not (-10.0 <= p <= 10.0))
    assert out["st"] == sum(1 for r in rows if r[2] not in ("F", "O"))
    assert out["rf"] == sum(1 for i in nn_ids if i not in range(5))
