"""Deterministic sampling invariants: stability under repartitioning,
split disjointness/completeness, stratified exactness, salt decorrelation.
Cross-engine value parity is covered by the oracle gate."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.functions import sampling as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_stable_under_repartition(docs):
    a = sorted(r["doc_id"] for r in S.hash_sample(docs, 0.2, ["doc_id"]).select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in S.hash_sample(docs.repartition(13), 0.2, ["doc_id"]).select("doc_id").collect()
    )
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_fraction_roughly_holds(docs):
    n = docs.count()
    got = S.hash_sample(docs, 0.5, ["doc_id"]).count()
    assert 0.35 * n < got < 0.65 * n  # binomial tolerance at n=50..500


def test_hash_sample_nested_fractions(docs):
    # same salt: a 10% sample is a subset of a 30% sample (threshold nesting)
    small = {r["doc_id"] for r in S.hash_sample(docs, 0.1, ["doc_id"]).collect()}
    big = {r["doc_id"] for r in S.hash_sample(docs, 0.3, ["doc_id"]).collect()}
    assert small <= big


def test_salt_decorrelates(docs):
    a = {r["doc_id"] for r in S.hash_sample(docs, 0.3, ["doc_id"], salt="a").collect()}
    b = {r["doc_id"] for r in S.hash_sample(docs, 0.3, ["doc_id"], salt="b").collect()}
    assert a != b


def test_split_assign_disjoint_complete(docs):
    out = S.split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)


def test_split_assign_degenerate_single(docs):
    out = S.split_assign(docs, {"all": 1.0}, ["doc_id"])
    assert out.filter(F.col("split") != "all").count() == 0


def test_split_weights_validation(docs):
    with pytest.raises(ValueError):
        S.split_assign(docs, {}, ["doc_id"])
    with pytest.raises(ValueError):
        S.hash_sample(docs, 1.5, ["doc_id"])


def test_stratified_exact_n_and_deterministic(docs):
    out = S.stratified_sample(docs, ["lang"], 5, ["doc_id"])
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(5, avail[lang])
    again = S.stratified_sample(docs.repartition(7), ["lang"], 5, ["doc_id"])
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_stratified_plan_has_partial_group_limit(docs):
    # the rank must prune map-side: WindowGroupLimit[Partial] below the
    # exchange (SPARK-37099) so the shuffle carries <= n rows per stratum
    # per map partition
    plan = (
        S.stratified_sample(docs, ["lang"], 5, ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_mix_corpora_deterministic_and_tagged(spark, sf_dir):
    from data_diff_spark.functions.sampling import mix_corpora

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    mix = {"a": (docs, 0.5), "b": (docs.filter(F.col("lang") == "en"), 1.0)}
    r1 = sorted(map(tuple, mix_corpora(mix, ["doc_id"]).collect()))
    r2 = sorted(map(tuple, mix_corpora(
        {"a": (docs.repartition(7), 0.5), "b": (docs.filter(F.col("lang") == "en"), 1.0)},
        ["doc_id"]).collect()))
    assert r1 == r2  # stable under repartitioning
    srcs = {t[-1] for t in r1}
    assert srcs == {"a", "b"}
    n_a = sum(1 for t in r1 if t[-1] == "a")
    n_docs = docs.count()
    assert abs(n_a / n_docs - 0.5) < 0.15  # fraction roughly honored
    with pytest.raises(ValueError):
        mix_corpora({"x": (docs, 0.0)}, ["doc_id"])
    with pytest.raises(ValueError):
        mix_corpora({}, ["doc_id"])


# --- budgeted corpus selection ------------------------------------------------


def _budget_brute(rows, budget):
    kept, cum = set(), 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += t
        if cum <= budget:
            kept.add(i)
        else:
            break
    return kept


@pytest.fixture(scope="module")
def budget_rows():
    import random

    rng = random.Random(3)
    rows = [(i, rng.random(), rng.randrange(1, 50)) for i in range(2000)]
    # a 300-doc block of exactly tied scores: forces the id-range phase
    # when buckets are tiny (floor can never split equal scores)
    rows += [(10000 + i, 0.5, rng.randrange(1, 50)) for i in range(300)]
    return rows


@pytest.mark.parametrize("budget", [0, 17, 5000, 23456, 10**9])
@pytest.mark.parametrize(
    "shape", [(1024, 1 << 17), (4, 8)], ids=["default", "deep-refine+id-phase"]
)
def test_token_budget_matches_global_sort(spark, budget_rows, budget, shape):
    nb, mt = shape
    df = spark.createDataFrame(budget_rows, "doc_id long, s double, t long")
    got = S.select_by_token_budget(
        df, budget, score=F.col("s"), n_tokens=F.col("t"),
        n_buckets=nb, max_tail_rows=mt,
    )
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == _budget_brute(budget_rows, budget)
    got.sparkSession.catalog.clearCache()


def test_token_budget_exact_fit_and_totals(spark):
    rows = [(1, 0.9, 10), (2, 0.8, 10), (3, 0.7, 10), (4, 0.6, 10)]
    df = spark.createDataFrame(rows, "doc_id long, s double, t long")
    got = S.select_by_token_budget(df, 30, score=F.col("s"), n_tokens=F.col("t"))
    rs = {r["doc_id"]: r["n_tok"] for r in got.collect()}
    assert rs == {1: 10, 2: 10, 3: 10}  # exact fit keeps the boundary doc
    assert sum(rs.values()) <= 30
    got.sparkSession.catalog.clearCache()


def test_token_budget_string_ids_tie_fallback(spark):
    # non-numeric ids with tied scores: the documented fallback windows
    # the tied region in one task — result must still be the exact prefix
    rows = [(f"d{i:03d}", 0.5, 5) for i in range(40)] + [("aa", 0.9, 7)]
    df = spark.createDataFrame(rows, "doc_id string, s double, t long")
    got = S.select_by_token_budget(
        df, 33, score=F.col("s"), n_tokens=F.col("t"), n_buckets=4, max_tail_rows=2
    )
    ids = {r["doc_id"] for r in got.collect()}
    # aa (7) then d000..d004 (5 each): 7+25=32 <= 33, next would be 37
    assert ids == {"aa", "d000", "d001", "d002", "d003", "d004"}
    got.sparkSession.catalog.clearCache()

def test_token_budget_score_filter_is_fenced(docs):
    """r10 ADVICE: the old __nd__ select-then-drop barrier was pruned by
    ColumnPruning, so PushDownPredicate inlined the tokenization-heavy
    default score expression into the null-guard Filter — double-eval per
    row. The rand-rider fence (score consumed, nondeterministic, value-
    neutral) must keep the score expression OUT of the Filter: the
    optimized plan's tokenize split() appears exactly once (the Project),
    never in a Filter condition."""
    from data_diff_spark.functions.sampling import _budget_scored
    from data_diff_spark.functions.text import quality_score, token_count

    frame = _budget_scored(
        docs, "doc_id", quality_score(F.col("text")), token_count(F.col("text"))
    )
    plan = frame._jdf.queryExecution().optimizedPlan().toString()
    filters = [ln for ln in plan.splitlines() if ln.lstrip("+- ").startswith("Filter")]
    assert filters, plan
    assert all("split(" not in ln for ln in filters), filters
    # all tokenize sites live in the single Project (whole-stage codegen
    # CSEs the repeated subtrees there); the Filter reads the attribute
    assert sum(1 for ln in plan.splitlines()
               if "split(" in ln and ln.lstrip("+- ").startswith("Project")) == 1, plan


def test_token_budget_null_rows_do_not_crash(spark):
    """r9 ADVICE: a null score used to break the driver-side histogram
    sort (TypeError), a null token count broke the cumsum, and null TEXT
    made F.size(tokens(null)) return -1 — a negative n_tok breaking the
    monotone-prefix invariant. Contract now: null/NaN-score rows are not
    selectable; null/negative token counts clamp to 0."""
    rows = [(1, 0.9, 10), (2, None, 10), (3, 0.7, None), (4, 0.6, 10),
            (5, float("nan"), 3)]
    df = spark.createDataFrame(rows, "doc_id long, s double, t long")
    got = {r["doc_id"]: r["n_tok"]
           for r in S.select_by_token_budget(
               df, 15, score=F.col("s"), n_tokens=F.col("t")).collect()}
    # 1 (10) + 3 (clamped to 0) + 4 (10) would blow the budget at 4:
    # prefix = [1, 3] — doc 3's null count costs 0; 2 and 5 excluded
    assert got == {1: 10, 3: 0}
    # null TEXT through the default score/token expressions: no crash —
    # quality_score(null) is a small negative double (its case arms
    # coalesce), so the doc ranks worst, and its F.size(tokens(null)) = -1
    # clamps to 0 tokens instead of corrupting the cumsum
    docs = spark.createDataFrame(
        [(1, "good clean sentence here."), (2, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["n_tok"] for r in S.select_by_token_budget(docs, 10**6).collect()}
    assert set(out) == {1, 2} and out[2] == 0
    spark.catalog.clearCache()
