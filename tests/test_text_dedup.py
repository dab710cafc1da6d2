"""Text-analysis + dedup operator tests (sf0.001 documents table plus
synthetic edge-case frames). Cross-engine value parity is covered by the
oracle gate (tools/check_oracles.py); these tests pin behavioral invariants
and edge cases."""

import pytest
from pyspark.sql import Row, functions as F

from data_diff_spark.functions import text as TX
from data_diff_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def edge(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the cat sat on the mat"),   # exact dup of 1
            Row(doc_id=3, text="mat the on sat cat the"),   # same vocab, reordered
            Row(doc_id=4, text=""),                          # empty
            Row(doc_id=5, text="   "),                       # whitespace only
            Row(doc_id=6, text=None),                        # null
            Row(doc_id=7, text="ab"),                        # fewer tokens than n-gram
        ]
    )


def test_tokenize_edges(edge):
    rows = {
        r.doc_id: r
        for r in edge.select(
            "doc_id",
            TX.token_count(F.col("text")).alias("tc"),
            F.size(TX.word_ngrams(F.col("text"), 3)).alias("ng"),
        ).collect()
    }
    assert rows[1].tc == 6 and rows[1].ng == 4
    assert rows[4].tc == 0 and rows[4].ng == 0
    assert rows[5].tc == 0 and rows[5].ng == 0
    assert rows[7].tc == 1 and rows[7].ng == 0  # shorter than the n-gram: empty, not desc-sequence garbage


def test_fingerprints_distinguish_order(edge):
    rows = {
        r.doc_id: r
        for r in edge.select(
            "doc_id",
            TX.set_fingerprint(F.col("text")).alias("sfp"),
            TX.rolling_fingerprint(F.col("text")).alias("rfp"),
        ).collect()
    }
    # exact dup: both fingerprints equal
    assert rows[1].sfp == rows[2].sfp and rows[1].rfp == rows[2].rfp
    # reordered same vocabulary: set fingerprint collides (by design),
    # rolling fingerprint does not
    assert rows[1].sfp == rows[3].sfp
    assert rows[1].rfp != rows[3].rfp
    # empty and whitespace-only normalize identically
    assert rows[4].sfp == rows[5].sfp and rows[4].rfp == rows[5].rfp == 0


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="it's a test, isn't it?"),
            Row(doc_id=2, text="hello world"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text="abc123!!"),
        ]
    )
    got = {r.doc_id: r.n for r in df.select(
        "doc_id", TX.bpe_token_count(F.col("text")).alias("n")).collect()}
    # "it"+"'s"+" a"+" test"+","+" isn"+"'t"+" it"+"?" = 9
    assert got[1] == 9
    assert got[2] == 2
    assert got[3] == 0
    assert got[4] == 3  # "abc" + "123" + "!!"


def test_lang_id_picks_stopword_language(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat is in the house"),
            Row(doc_id=2, text="der Hund ist nicht ein Vogel und"),
            Row(doc_id=3, text="xyzzy qwerty plugh"),
        ]
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", TX.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_exact_dedup_collapses(edge):
    out = {r.canonical_id: r.n_copies for r in DD.exact_dedup(edge.filter("text is not null")).collect()}
    assert out[1] == 2          # docs 1 and 2 collapse
    assert out.get(3) == 1      # reordered text is distinct


def test_jaccard_pairs_threshold_and_symmetry(docs):
    pairs = DD.jaccard_pairs(docs, threshold=0.5).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert all(0.5 <= r.jaccard <= 1.0 for r in pairs)


def test_jaccard_viral_shingle_cap_fires_and_logs(spark, caplog):
    """A boilerplate shingle shared by more docs than max_shingle_freq is
    dropped BEFORE the inverted-index join (the 100 TB skew guard), the
    drop is logged, and jaccard stays exact over the pruned space."""
    import logging

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"common boiler plate u{i} v{i} w{i}") for i in range(6)]
    )
    # every pair shares exactly the one viral trigram: J = 1/7 without cap
    with caplog.at_level(logging.INFO, logger="data_diff_spark.operators.dedup"):
        uncapped = DD.jaccard_pairs(docs, threshold=0.1, max_shingle_freq=None).collect()
        capped = DD.jaccard_pairs(docs, threshold=0.1, max_shingle_freq=3).collect()
        default = DD.jaccard_pairs(docs, threshold=0.1).collect()
    assert len(uncapped) == 15
    assert capped == []  # viral shingle pruned -> nothing shared
    assert sorted((r.id_a, r.id_b) for r in default) == sorted(
        (r.id_a, r.id_b) for r in uncapped
    )  # default cap (100k) untriggered on 6 docs
    msgs = [r.message for r in caplog.records]
    assert any("dropping 1 shingle" in m for m in msgs), msgs
    assert any("no shingle exceeds" in m for m in msgs), msgs


def test_minhash_lsh_matches_exact(docs):
    exact = sorted((r.id_a, r.id_b) for r in DD.jaccard_pairs(docs, threshold=0.8).collect())
    lsh = sorted((r.id_a, r.id_b) for r in DD.minhash_lsh_dedup(docs, threshold=0.8).collect())
    assert lsh == exact


def test_minhash_arrow_fold_bit_parity(docs):
    """The Arrow segment-min signature fold (dedup._minhash_arrow, engaged
    by the n_rows dispatch) is the SAME integer math as the 128-expression
    SQL aggregate — every (doc, permutation) cell must match bit-for-bit.
    n_rows=10**9 forces the Arrow route on the small corpus; docs with no
    shingles are absent from BOTH (explode_nonnull feeds both paths)."""
    sql_rows = {r["id"]: tuple(r)[1:]
                for r in DD.minhash_signatures(docs).collect()}
    arrow_rows = {r["id"]: tuple(r)[1:]
                  for r in DD.minhash_signatures(docs, n_rows=10**9).collect()}
    assert sql_rows == arrow_rows
    assert len(sql_rows) > 0


def test_minhash_arrow_fold_multibatch_accumulator(spark, docs):
    """The per-batch accumulator in dedup._minhash_arrow must merge id
    groups that SPAN Arrow batch boundaries (an id's exploded rows land in
    one partition but split across sequential batches). Force many tiny
    batches so the cross-batch carry path actually runs, and require
    bit-parity with the SQL aggregate."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")  # exploded frame >> 7 rows/doc -> many batches
    try:
        sql_rows = {r["id"]: tuple(r)[1:]
                    for r in DD.minhash_signatures(docs).collect()}
        arrow_rows = {r["id"]: tuple(r)[1:]
                      for r in DD.minhash_signatures(
                          docs, n_rows=10**9).collect()}
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert sql_rows == arrow_rows
    assert len(sql_rows) > 0


def test_minhash_arrow_fold_string_ids(spark):
    """minhash_signatures is generic over id_col: a corpus with STRING doc
    ids plus an n_rows hint >= _MINHASH_ARROW_MIN_ROWS takes the Arrow
    route, which must preserve the caller's id type (it used to hard-code
    LongType and fail at Arrow conversion) and stay bit-par with SQL."""
    df = spark.createDataFrame(
        [Row(doc_id=f"doc-{i:03d}", text=f"alpha beta gamma delta token{i % 7} "
                                          f"epsilon zeta eta theta word{i % 5}")
         for i in range(40)]
    )
    sql_rows = {r["id"]: tuple(r)[1:]
                for r in DD.minhash_signatures(df).collect()}
    arrow_rows = {r["id"]: tuple(r)[1:]
                  for r in DD.minhash_signatures(df, n_rows=10**9).collect()}
    assert sql_rows == arrow_rows
    assert len(sql_rows) == 40
    assert all(isinstance(k, str) for k in arrow_rows)


def test_minhash_arrow_partial_fold_no_repartition(docs):
    """The Arrow fold's map-side-combine shape: the partial fold runs on
    the INPUT partitioning (no repartition/Exchange between the scan and
    MapInPandas), and the only shuffle is the k-column min merge of
    per-partition partials. A repartition-before-fold regression would
    reintroduce a document-length-dependent shuffle."""
    plan = DD.minhash_signatures(
        docs, n_rows=10**9)._jdf.queryExecution().executedPlan().toString()
    # two folds (merge above the shuffle, partial below it), exactly one
    # shuffle, and NOTHING between the scan and the partial fold — a
    # repartition-before-partial regression would reintroduce a
    # document-length-dependent shuffle
    assert plan.count("MapInPandas") == 2, plan
    assert plan.count("Exchange") == 1, plan
    deepest = plan.rfind("MapInPandas")
    assert "Exchange" not in plan[deepest:], (
        "Exchange below the partial fold — no longer map-side:\n" + plan)


def test_minhash_lsh_dedup_arrow_same_pairs(docs):
    """End-to-end: the dispatched operator emits the identical pair set."""
    base = sorted((r.id_a, r.id_b, round(r.jaccard, 12))
                  for r in DD.minhash_lsh_dedup(docs, threshold=0.8).collect())
    arrow = sorted((r.id_a, r.id_b, round(r.jaccard, 12))
                   for r in DD.minhash_lsh_dedup(
                       docs, threshold=0.8, n_rows=10**9).collect())
    assert arrow == base


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark shuffles data between stages for joins"),
            Row(doc_id=2, text="spark shuffles data between stages for joins"),
            Row(doc_id=3, text="completely different words entirely here now"),
        ]
    )
    out = DD.simhash_pairs(df, max_hamming=3)
    got = [(r.id_a, r.id_b, r.hamming) for r in out.collect()]
    assert got == [(1, 2, 0)]  # identical docs at distance 0; unrelated doc beyond 3


def test_hashed_vectors_preserve_similarity(spark, docs):
    """Near-dup documents (trigram J>=0.8) must have high hashed-vector
    cosine; empty text maps to the zero vector."""
    from pyspark.sql import Row as R

    hv = TX.hashed_vector(docs, dim=64).select(
        F.col("doc_id").alias("id"),
        F.transform("vector", lambda x: x.cast("double")).alias("embedding"),
    )
    pairs = DD.jaccard_pairs(docs, threshold=0.8)
    from data_diff_spark.operators.similarity import cosine_pairs_lsh

    # cosine over ALL pairs (threshold -2), then check the near-dup ones
    a = hv.alias("a"); b = hv.alias("b")
    from data_diff_spark.operators.similarity import quantize, _qdot, _qnorm

    qa = quantize(F.col("a.embedding")); qb = quantize(F.col("b.embedding"))
    joined = (
        pairs.join(a, pairs.id_a == F.col("a.id")).join(b, pairs.id_b == F.col("b.id"))
        .select((_qdot(qa, qb).cast("double") / (_qnorm(qa) * _qnorm(qb))).alias("cos"))
        .collect()
    )
    assert joined and all(r.cos > 0.8 for r in joined)

    z = TX.hashed_vector(spark.createDataFrame([R(doc_id=1, text="")]), dim=8).collect()[0]
    assert list(z.vector) == [0] * 8


def test_quality_filter_rules_and_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat is in the house and it is a good cat indeed today"),
            Row(doc_id=2, text="x"),          # too few tokens
            Row(doc_id=3, text=None),          # null -> 0 tokens, must NOT pass
            Row(doc_id=4, text=""),
        ]
    )
    out = {r.doc_id: (r.keep, r.reject_reason) for r in TX.quality_filter(
        df, min_tokens=5, min_quality=0.0).collect()}
    assert out[1] == (True, None)
    assert out[2] == (False, "too_few_tokens")
    assert out[3] == (False, "too_few_tokens")
    assert out[4] == (False, "too_few_tokens")


def test_dedup_ops_on_empty_and_singleton(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    one = spark.createDataFrame([Row(doc_id=1, text="just one document here")])
    for frame in (empty, one):
        assert DD.jaccard_pairs(frame, threshold=0.5).count() == 0
        assert DD.minhash_lsh_dedup(frame, threshold=0.5).count() == 0
        assert DD.simhash_pairs(frame, max_hamming=3).count() == 0
    assert DD.exact_dedup(one).count() == 1


def test_simhash_pair_completeness_vs_bruteforce(docs):
    """The chunk-join must find every pair the O(n^2) scan finds (pigeonhole
    guarantees completeness for max_hamming < chunks)."""
    sh = docs.select(F.col("doc_id").alias("id"), DD.simhash(F.col("text")).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    brute = sorted(
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    )
    fast = sorted((r.id_a, r.id_b) for r in DD.simhash_pairs(docs, max_hamming=3).collect())
    assert fast == brute


# --- connected components / cluster resolution -------------------------------

# Every test runs BOTH paths: the driver union-find fast path (edge lists
# under COMPONENTS_LOCAL_MAX_EDGES — what these tiny graphs hit by default)
# and the distributed pointer-jumping loop (forced by zeroing the gate).
both_cc_paths = pytest.mark.parametrize("local_max_edges", [None, 0],
                                        ids=["local", "distributed"])


def _force_cc(monkeypatch, local_max_edges):
    if local_max_edges is not None:
        monkeypatch.setattr(DD, "COMPONENTS_LOCAL_MAX_EDGES", local_max_edges)


@both_cc_paths
def test_components_chain_and_clique(spark, monkeypatch, local_max_edges):
    _force_cc(monkeypatch, local_max_edges)
    # chain 1-2-3-4-5 (diameter 4, forces >1 round) + clique {10,11,12} +
    # isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a int, id_b int",
    )
    got = {r["id"]: r["component"] for r in DD.components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


@both_cc_paths
def test_components_long_path_pointer_jumping(spark, monkeypatch, local_max_edges):
    _force_cc(monkeypatch, local_max_edges)
    # a 64-node path: naive min-propagation needs 63 rounds; pointer jumping
    # must converge well under the max_iter=50 guard (O(log d) ~ 7)
    n = 64
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a int, id_b int")
    got = DD.components(pairs)
    assert got.select("component").distinct().count() == 1
    assert got.count() == n + 1


@both_cc_paths
def test_components_fractional_ids_no_premature_termination(
    spark, monkeypatch, local_max_edges
):
    _force_cc(monkeypatch, local_max_edges)
    # ADVICE r3: double ids all < 0.5 cast to decimal(38,0) as 0, so the
    # integral sum witness would see an unchanged sum after round 1 and
    # terminate while the 64-node path still needs ~6 rounds — fractional
    # id types must use the join-based changed-count instead
    n = 64
    pairs = spark.createDataFrame(
        [(i / 1000.0, (i + 1) / 1000.0) for i in range(n - 1)],
        "id_a double, id_b double",
    )
    got = DD.components(pairs)
    assert got.count() == n
    assert got.select("component").distinct().count() == 1


@both_cc_paths
def test_components_string_ids_and_reversed_edges(spark, monkeypatch, local_max_edges):
    _force_cc(monkeypatch, local_max_edges)
    # min is lexicographic for string ids; edges may arrive in either order
    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_c", "doc_b"), ("zz", "yy")],
        "id_a string, id_b string",
    )
    got = {r["id"]: r["component"] for r in DD.components(pairs).collect()}
    assert got == {
        "doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
        "yy": "yy", "zz": "yy",
    }


def test_components_local_matches_distributed(spark, monkeypatch):
    # parity pin for the size-gated fast path: a pseudo-random graph mixing
    # paths, cliques and isolated pairs must produce the identical (id,
    # component) mapping through both code paths
    import random

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 40)]               # one long path
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    edges += [(rng.randrange(200, 260), rng.randrange(200, 260)) for _ in range(80)]
    edges = [e for e in edges if e[0] != e[1]]
    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    local = {(r["id"], r["component"]) for r in DD.components(pairs).collect()}
    monkeypatch.setattr(DD, "COMPONENTS_LOCAL_MAX_EDGES", 0)
    dist = {(r["id"], r["component"]) for r in DD.components(pairs).collect()}
    assert local == dist and local


def test_assign_clusters_covers_singletons(edge):
    pairs = edge.sparkSession.createDataFrame([(1, 2)], "id_a int, id_b int")
    out = DD.assign_clusters(edge, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got[1] == 1 and got[2] == 1
    for singleton in (3, 4, 5, 6, 7):
        assert got[singleton] == singleton
    assert out.count() == edge.count()  # no rows lost or duplicated


def test_dedup_resolve_keeps_best_per_cluster(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far away"),
            (2, "#### $$$$ 1234 !!!! ...."),  # same cluster, junk -> lower quality
            (3, "zzz"),                   # singleton
        ],
        "doc_id int, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
    out = {r["cluster_id"]: r for r in DD.dedup_resolve(df, pairs).collect()}
    assert set(out) == {1, 3}
    assert out[1]["kept_id"] == 1 and out[1]["n_members"] == 2
    assert out[3]["kept_id"] == 3 and out[3]["n_members"] == 1
    # deterministic tie-break: equal scores -> max id wins
    tie = spark.createDataFrame(
        [(5, "same text"), (6, "same text")], "doc_id int, text string"
    )
    tie_pairs = spark.createDataFrame([(5, 6)], "id_a int, id_b int")
    (row,) = DD.dedup_resolve(tie, tie_pairs).collect()
    assert row["kept_id"] == 6 and row["n_members"] == 2


class TestIncrementalLshIndex:
    """Persisted-index incremental dedup (dedup.py:lsh_index_write /
    minhash_lsh_incremental): the at-scale contract is pairs(old ∪ new) ==
    pairs(old) ∪ incremental(new vs index) — daily increments never re-pair
    the existing corpus."""

    @staticmethod
    def _corpus(spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    OLD = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),   # ~dup of 1
        (3, "completely different text about distributed query engines"),
        (4, "yet another unrelated document mentioning parquet files"),
    ]
    NEW = [
        (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        (11, "completely different text about distributed query planes"),  # ~3
        (12, "fresh content that matches nothing in the old corpus"),
        (13, "fresh content that matches nothing in the old corpusx"),  # ~12
    ]

    def _pairset(self, df):
        return {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b), round(r.jaccard, 9))
            for r in df.collect()
        }

    def test_union_invariant(self, spark, tmp_path):
        old = self._corpus(spark, self.OLD)
        new = self._corpus(spark, self.NEW)
        both = self._corpus(spark, self.OLD + self.NEW)
        idx = str(tmp_path / "idx")
        DD.lsh_index_write(old, idx, threshold=0.6)
        full = self._pairset(DD.minhash_lsh_dedup(both, threshold=0.6))
        old_pairs = self._pairset(DD.minhash_lsh_dedup(old, threshold=0.6))
        inc = self._pairset(DD.minhash_lsh_incremental(new, idx))
        assert old_pairs | inc == full
        # increments find old-new AND new-new pairs, never old-old ones
        assert any(a < 10 <= b for a, b, _ in inc)
        assert any(a >= 10 for a, b, _ in inc if b >= 10)
        assert not any(b < 10 for _, b, _ in inc)

    def test_append_chains_increments(self, spark, tmp_path):
        """After append=True, a SECOND increment sees the first one's docs."""
        old = self._corpus(spark, self.OLD)
        idx = str(tmp_path / "idx")
        DD.lsh_index_write(old, idx, threshold=0.6)
        first = self._corpus(spark, [self.NEW[0], self.NEW[2]])   # 10, 12
        DD.minhash_lsh_incremental(first, idx, append=True).collect()
        second = self._corpus(spark, [self.NEW[3]])               # 13 ~ 12
        inc2 = self._pairset(DD.minhash_lsh_incremental(second, idx))
        assert (12, 13) in {(a, b) for a, b, _ in inc2}

    def test_probing_sees_stored_corpus_only_through_index(self, spark, tmp_path):
        """The increment never scans the old corpus DataFrame — only the
        index tables. (API proof: old docs are not even passed in.)"""
        old = self._corpus(spark, self.OLD)
        idx = str(tmp_path / "idx")
        DD.lsh_index_write(old, idx, threshold=0.6)
        lone = self._corpus(spark, [(20, "the quick brown fox jumps over the lazy dog today")])
        inc = self._pairset(DD.minhash_lsh_incremental(lone, idx))
        # doc 1 is an exact dup (jaccard 1.0); doc 2's one-word change
        # shifts 3 of 8 shingles (jaccard ~0.45, below the 0.6 threshold)
        assert {(a, b) for a, b, _ in inc} == {(1, 20)}

    def test_union_invariant_on_sf_corpus(self, spark, docs, tmp_path):
        """The invariant on REAL corpus data (sf0.001 documents): index the
        even-id half, probe the odd-id half — union must equal the one-shot
        LSH pair set over the full corpus, including jaccard values."""
        old = docs.filter("doc_id % 2 = 0")
        new = docs.filter("doc_id % 2 = 1")
        idx = str(tmp_path / "sfidx")
        DD.lsh_index_write(old, idx, threshold=0.8)
        full = self._pairset(DD.minhash_lsh_dedup(docs, threshold=0.8))
        old_pairs = self._pairset(DD.minhash_lsh_dedup(old, threshold=0.8))
        inc = self._pairset(DD.minhash_lsh_incremental(new, idx))
        assert old_pairs | inc == full
        assert len(full) > 0


def test_hashed_vector_udf_path_bit_identical(spark, sf_dir):
    """The Arrow/numpy scatter-add fold (row-count gated) must produce the
    identical vectors as the SQL dim-fold — hashing stays JVM md5 in both,
    the fold is exact integer adds either way. Includes the empty-token
    row shape (zero vector) and a NULL-text row (zero vector on both
    paths — the numpy fold used to raise on np.asarray(None); r9
    ADVICE)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs = docs.unionByName(
        spark.createDataFrame(
            [(999999, "   "), (999998, None)], "doc_id long, text string")
    )
    sql = {r["doc_id"]: list(r["vector"])
           for r in TX.hashed_vector(docs).select("doc_id", "vector").collect()}
    udf = {r["doc_id"]: list(r["vector"])
           for r in TX.hashed_vector(docs, n_rows=10**6)
           .select("doc_id", "vector").collect()}
    assert sql == udf
    assert udf[999999] == [0] * 64
    assert udf[999998] == [0] * 64


def test_simhash_udf_path_bit_identical(spark, sf_dir):
    """The numpy bit-vote fold (row-count gated) must pack the identical
    simhash as the SQL vote folds, including the vote==0 tie (bit clear)
    and empty-token rows (sh == 0 under the all-clear packing) and a
    NULL-text row (sh == 0 on both paths; r9 ADVICE)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs = docs.unionByName(
        spark.createDataFrame(
            [(999999, "   "), (999998, None)], "doc_id long, text string")
    )
    sql = {r["doc_id"]: r["sh"]
           for r in DD.with_simhash(docs, "text").select("doc_id", "sh").collect()}
    udf = {r["doc_id"]: r["sh"]
           for r in DD.with_simhash(docs, "text", n_rows=10**6)
           .select("doc_id", "sh").collect()}
    assert sql == udf
    assert udf[999999] == 0
    assert udf[999998] == 0
