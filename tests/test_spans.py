"""Duplicate-span detection/removal (operators/spans.py) and
sorted-neighborhood pairs (operators/dedup.py:snm_pairs).

Hand-built corpora with known duplicated passages pin the semantics;
DuckDB replays pin cross-engine parity (the workload oracle does the same
at sf0.01 under the driver's gate).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.dedup import snm_pairs, snm_pairs_multi
from data_diff_spark.operators.spans import duplicate_spans, strip_duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words


class TestDuplicateSpans:
    def test_basic_shared_passage(self, spark):
        docs = _docs(
            spark,
            [
                (1, f"one two {SHARED} three four"),
                (2, f"x {SHARED} y z"),
                (3, "completely different words entirely here now ok fine"),
            ],
        )
        out = duplicate_spans(docs, k=8).orderBy("doc_id").collect()
        # the 8-word passage occurs in docs 1 and 2; doc 3 clean
        assert [(r.doc_id, r.span_start, r.span_end) for r in out] == [
            (1, 3, 10),
            (2, 2, 9),
        ]
        assert all(r.span_words == 8 for r in out)

    def test_long_span_merges_windows(self, spark):
        # a 12-word shared passage = five overlapping 8-grams -> ONE span
        long = SHARED + " iota kappa lambda mu"
        docs = _docs(
            spark,
            [(1, f"a b {long}"), (2, f"{long} tail words here")],
        )
        out = duplicate_spans(docs, k=8).orderBy("doc_id").collect()
        assert [(r.doc_id, r.span_start, r.span_end, r.span_words) for r in out] == [
            (1, 3, 14, 12),
            (2, 1, 12, 12),
        ]

    def test_disjoint_spans_stay_disjoint(self, spark):
        other = "red orange yellow green blue indigo violet ultraviolet"
        docs = _docs(
            spark,
            [
                (1, f"{SHARED} bridge word gap {other}"),
                (2, f"{SHARED} something else entirely padding up here"),
                (3, f"intro {other} outro"),
            ],
        )
        out = duplicate_spans(docs, k=8).filter(F.col("doc_id") == 1).orderBy(
            "span_start"
        ).collect()
        assert [(r.span_start, r.span_end) for r in out] == [(1, 8), (12, 19)]

    def test_within_doc_repeat_not_flagged_cross_doc(self, spark):
        # the same passage twice in ONE doc is not a cross-doc duplicate
        docs = _docs(
            spark,
            [
                (1, f"{SHARED} middle {SHARED}"),
                (2, "nothing in common with that document at all"),
            ],
        )
        assert duplicate_spans(docs, k=8).count() == 0

    def test_short_docs_ignored(self, spark):
        docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
        assert duplicate_spans(docs, k=8).count() == 0

    def test_strip_removes_exactly_spans(self, spark):
        docs = _docs(
            spark,
            [
                (1, f"one two {SHARED} three"),
                (2, f"{SHARED} x y"),
                (3, "untouched document stays word for word the same"),
            ],
        )
        sp = duplicate_spans(docs, k=8)
        out = {r.doc_id: r.text for r in strip_duplicate_spans(docs, sp).collect()}
        assert out[1] == "one two three"
        assert out[2] == "x y"
        assert out[3] == "untouched document stays word for word the same"

    def test_strip_fully_covered_doc_becomes_empty(self, spark):
        docs = _docs(spark, [(1, SHARED), (2, SHARED)])
        sp = duplicate_spans(docs, k=8)
        out = {r.doc_id: r.text for r in strip_duplicate_spans(docs, sp).collect()}
        assert out == {1: "", 2: ""}

    def test_duckdb_parity_sf(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_words)
            for r in duplicate_spans(docs, k=8).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from '{sf_dir}/documents.parquet'"
        )
        k = 8
        want = sorted(
            tuple(r)
            for r in con.execute(f"""
with w as (select doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') as ws from documents),
g as (select doc_id, i as pos, array_to_string(ws[i:i+{k - 1}],' ') as gram
      from w, unnest(range(1, len(ws)-{k}+2)) as t(i) where len(ws) >= {k}),
d as (select gram from g group by gram having count(distinct doc_id) > 1),
m as (select doc_id, pos, pos+{k}-1 as e from g where gram in (select gram from d)),
isl as (select doc_id, pos, e,
         case when pos > coalesce(max(e) over (partition by doc_id order by pos
              rows between unbounded preceding and 1 preceding), -1) + 1 then 1 else 0 end as brk
        from m),
isl2 as (select *, sum(brk) over (partition by doc_id order by pos
          rows between unbounded preceding and current row) as grp from isl)
select doc_id, min(pos), max(e), max(e)-min(pos)+1 from isl2 group by doc_id, grp
""").fetchall()
        )
        assert got == want


class TestSnmPairs:
    def test_adjacent_near_dups_found(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = _docs(
            spark,
            [
                (1, base),
                (2, base.replace("lazy", "hazy")),
                (3, "zzz totally unrelated text that sorts far away from it"),
            ],
        )
        out = snm_pairs(docs, window=2, max_edit_pct=20).collect()
        # "hazy" < "lazy" in sort order, so doc 2 is the earlier record
        assert [(r.id_a, r.id_b) for r in out] == [(2, 1)]
        assert out[0].edit_dist == 1

    def test_window_limits_comparisons(self, spark):
        # identical texts more than `window` apart in sort order are missed —
        # that is SNM's documented trade-off, pin it
        docs = _docs(
            spark,
            [
                (1, "mmm shared text body"),
                (2, "mmm a filler one"),
                (3, "mmm b filler two"),
                (4, "mmm shared text body"),
            ],
        )
        # sort order: doc2, doc3, doc1, doc4 -> 1 and 4 are adjacent
        got = {(r.id_a, r.id_b) for r in snm_pairs(docs, window=1, max_edit_pct=20).collect()}
        assert got == {(1, 4)}

    def test_pair_order_follows_sort_order(self, spark):
        docs = _docs(spark, [(9, "aaa one two three"), (3, "aab one two three")])
        out = snm_pairs(docs, window=4, max_edit_pct=20).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(9, 3)]

    def test_bucket_boundary_pairs_survive(self, spark):
        # prefix_len=2 puts 'aa*' and 'ab*' in different raw buckets; the
        # carry mechanism must still emit the cross-boundary pair
        rows = [(i, f"aa common body text number {i}") for i in range(6)]
        rows += [(10, "aa zz boundary doc here")]  # last of the aa bucket
        rows += [(11, "ab aa boundary doc here")]  # first of the ab bucket
        rows += [(i + 20, f"ab common body text number {i}") for i in range(6)]
        docs = _docs(spark, rows)
        got = {(r.id_a, r.id_b) for r in snm_pairs(docs, window=3, max_edit_pct=20).collect()}
        assert (10, 11) in got

    def test_tiny_buckets_merge(self, spark):
        # every doc a distinct prefix -> every raw bucket has 1 row <= window;
        # the census fold must merge them rather than lose pairs
        docs = _docs(
            spark,
            [
                (1, "qa same same same same"),
                (2, "qb same same same same"),
                (3, "qc same same same same"),
            ],
        )
        got = {(r.id_a, r.id_b) for r in snm_pairs(docs, window=2, max_edit_pct=20).collect()}
        assert got == {(1, 2), (2, 3), (1, 3)}

    def test_empty_input(self, spark):
        docs = _docs(spark, [])
        assert snm_pairs(docs).count() == 0

    def test_empty_input_schema_matches_nonempty(self, spark):
        """The empty-census path must emit id columns typed like the
        input's id_col (string here), not a hardcoded long (r4 advice)."""
        empty = spark.createDataFrame([], "doc_id string, text string")
        full = spark.createDataFrame(
            [("a", "xx same words here"), ("b", "xx same words here")],
            "doc_id string, text string",
        )
        got_empty = snm_pairs(empty)
        got_full = snm_pairs(full)
        assert got_empty.schema == got_full.schema
        assert got_empty.count() == 0
        assert {(r.id_a, r.id_b) for r in got_full.collect()} == {("a", "b")}

    def test_duckdb_parity_sf(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = sorted(
            (r.id_a, r.id_b, r.edit_dist, r.max_len)
            for r in snm_pairs(docs, window=4, max_edit_pct=20).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute("""
with s as (select doc_id, text, row_number() over (order by text, doc_id) as rn from documents),
p as (select a.doc_id as id_a, b.doc_id as id_b,
             levenshtein(a.text, b.text)::INT as edit_dist,
             greatest(length(a.text), length(b.text))::INT as max_len
      from s a join s b on b.rn > a.rn and b.rn <= a.rn + 4)
select * from p where edit_dist*100 <= 20*max_len
""").fetchall()
        )
        assert got == want


class TestSnmBucketRefinement:
    """r13 skew guard: census prefixes holding more than SNM_MAX_BUCKET_ROWS
    rows are subdivided with longer prefixes (order-preserving), so one hot
    opening phrase cannot become a single giant window partition. Values
    must be invariant: refined and unrefined plans emit the identical pair
    set (the refinement only changes bucket granularity; the carry design
    already proves cross-boundary pairs)."""

    def _hot_corpus(self, spark, n=60):
        # all docs share the 2-char prefix "aa" but split cleanly at 4
        # chars into 4 groups; neighbors inside a group are near-dups
        rows = []
        for g in range(4):
            for i in range(n // 4):
                rows.append((g * 100 + i,
                             f"aa{chr(99 + g)}{chr(99 + g)} shared body "
                             f"text number {i:02d}"))
        return _docs(spark, rows)

    def test_refined_pairs_match_unrefined(self, spark, monkeypatch):
        import data_diff_spark.operators.dedup as DD

        docs = self._hot_corpus(spark)
        base = sorted(tuple(r) for r in snm_pairs(
            docs, window=3, max_edit_pct=20).collect())
        monkeypatch.setattr(DD, "SNM_MAX_BUCKET_ROWS", 8)
        refined = sorted(tuple(r) for r in snm_pairs(
            docs, window=3, max_edit_pct=20).collect())
        assert refined == base
        assert len(refined) > 0

    def test_census_refines_hot_prefix(self, spark, monkeypatch):
        import data_diff_spark.operators.dedup as DD
        from data_diff_spark.operators.dedup import _snm_census
        from pyspark.sql import functions as F

        docs = self._hot_corpus(spark)
        keyed = docs.select("doc_id", F.col("text").alias("_k"))
        monkeypatch.setattr(DD, "SNM_MAX_BUCKET_ROWS", 8)
        census = _snm_census(keyed, 2, 3)
        # the hot "aa" prefix must be gone, replaced by longer children,
        # and the census must stay sorted (= key-range order) and sum to n
        assert all(p != "aa" for p, _ in census)
        assert any(len(p) > 2 for p, _ in census)
        assert [p for p, _ in census] == sorted(p for p, _ in census)
        assert sum(c for _, c in census) == docs.count()

    def test_unsplittable_identical_keys_terminate(self, spark, monkeypatch):
        """Keys identical through every refinement level must not loop or
        lose rows — they stay one (over-cap) bucket, documented residual."""
        import data_diff_spark.operators.dedup as DD

        rows = [(i, "aa same exact opening forever shared tail") for i in range(12)]
        rows += [(100 + i, f"zz unique {i} far away text") for i in range(3)]
        docs = _docs(spark, rows)
        monkeypatch.setattr(DD, "SNM_MAX_BUCKET_ROWS", 4)
        got = {(r.id_a, r.id_b) for r in snm_pairs(
            docs, window=2, max_edit_pct=20).collect()}
        # identical docs: every successor within the window matches
        want = {(i, j) for i in range(12) for j in (i + 1, i + 2) if j < 12}
        assert want <= got

    def test_refined_matches_naive_oracle(self, spark, monkeypatch):
        import data_diff_spark.operators.dedup as DD

        docs = self._hot_corpus(spark)
        rows = [(r.doc_id, r.text, r.text) for r in docs.collect()]
        want = _naive_snm(rows, lambda r: r[1], window=3, max_edit_pct=20)
        monkeypatch.setattr(DD, "SNM_MAX_BUCKET_ROWS", 8)
        got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.edit_dist,
                r.max_len)
               for r in snm_pairs(docs, window=3, max_edit_pct=20).collect()}
        assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _naive_snm(rows, key_fn, window, max_edit_pct):
    """Sort-and-scan oracle: full in-memory sort per pass, no bucketing."""
    order = sorted(rows, key=lambda r: (key_fn(r), r[0]))
    pairs = set()
    for i, (ida, _, ca) in enumerate(order):
        for j in range(i + 1, min(i + 1 + window, len(order))):
            idb, _, cb = order[j]
            d, ml = _lev(ca, cb), max(len(ca), len(cb))
            if d * 100 <= max_edit_pct * ml:
                pairs.add((min(ida, idb), max(ida, idb), d, ml))
    return pairs


class TestSnmPairsMulti:
    # corpus designed so pass 1 (sort by text) misses the pair that differs
    # in the first word, and pass 2 (sort by reversed text) recovers it
    ROWS = [
        (1, "apple banana cherry date elderberry"),
        (2, "apfle banana cherry date elderberry"),   # near-dup of 1, close prefix
        (3, "zebra banana cherry date elderberry"),   # near-dup of 1, far prefix
        (4, "quite different words entirely here now"),
        (5, "unrelated filler row sorts in between k"),
        (6, "more padding text to push sort distance"),
    ]

    def _df(self, spark):
        return (
            _docs(spark, self.ROWS)
            .withColumn("rtext", F.reverse("text"))
        )

    def test_second_pass_recovers_prefix_divergent_pair(self, spark):
        df = self._df(spark)
        one = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            for r in snm_pairs(df, window=2, max_edit_pct=20).collect()
        }
        multi = {
            (r.id_a, r.id_b)
            for r in snm_pairs_multi(
                df, ["text", "rtext"], compare_col="text", window=2, max_edit_pct=20
            ).collect()
        }
        # (1,3) differ only in the first word: sorted forward they sit 4
        # apart (2,1,6,4,5,3 — outside window 2); sorted by reversed text
        # (6,5,4,3,2,1) they are 2 apart and the second pass finds them
        assert (1, 3) not in one
        assert (1, 3) in multi
        assert one <= multi

    def test_matches_naive_union_oracle(self, spark):
        df = self._df(spark)
        rows = [(i, t, t) for i, t in self.ROWS]
        want = _naive_snm(rows, lambda r: r[1], 2, 25) | _naive_snm(
            [(i, t[::-1], t) for i, t, _ in rows], lambda r: r[1], 2, 25
        )
        got = {
            tuple(r)
            for r in snm_pairs_multi(
                df, ["text", "rtext"], compare_col="text", window=2, max_edit_pct=25
            ).collect()
        }
        assert got == want

    def test_union_invariant_at_sf(self, spark, sf_dir):
        """Multi-pass == canonicalized union of the single passes, on real
        corpus data (the pair-set union invariant, r4 verdict ask #8)."""
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("rtext", F.reverse("text"))
        )
        single = set()
        for sc in ("text", "rtext"):
            for r in snm_pairs(
                docs, sort_col=sc, compare_col="text", window=2
            ).collect():
                a, b = sorted((r.id_a, r.id_b))
                single.add((a, b, r.edit_dist, r.max_len))
        multi = {
            tuple(r)
            for r in snm_pairs_multi(docs, ["text", "rtext"], window=2).collect()
        }
        assert multi == single and len(multi) > 0

    def test_compare_col_defaults_keep_single_pass_semantics(self, spark):
        """compare_col=None must leave the original snm_pairs result
        byte-identical (the workload entry depends on it)."""
        df = self._df(spark)
        a = sorted(tuple(r) for r in snm_pairs(df, window=2).collect())
        b = sorted(
            tuple(r) for r in snm_pairs(df, window=2, compare_col="text").collect()
        )
        assert a == b


class TestInvariants:
    def test_snm_pair_set_invariant_under_bucketing(self, spark, sf_dir):
        """The prefix bucketing is an EXECUTION strategy: the pair set is
        defined by the total order + window alone, so any prefix_len
        (including 0 -> one bucket, the naive plan) must yield byte-
        identical results."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from data_diff_spark.operators.dedup import snm_pairs

        ref = None
        for plen in (1, 2, 4):
            got = sorted(
                tuple(r) for r in snm_pairs(docs, window=3, prefix_len=plen).collect()
            )
            if ref is None:
                ref = got
            assert got == ref, f"prefix_len={plen} changed the pair set"
        assert len(ref) > 0

    def test_span_coverage_nests_with_k(self, spark, sf_dir):
        """Every k=12-duplicated window contains only duplicated k=8
        windows, so the word positions covered at k=12 must be a subset
        of those covered at k=8 (larger k = stricter = less coverage)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from data_diff_spark.operators.spans import duplicate_spans

        def covered(k):
            out = {}
            for r in duplicate_spans(docs, k=k).collect():
                out.setdefault(r.doc_id, set()).update(
                    range(r.span_start, r.span_end + 1)
                )
            return out

        c8, c12 = covered(8), covered(12)
        assert sum(len(v) for v in c12.values()) > 0
        for doc, pos in c12.items():
            assert pos <= c8.get(doc, set()), doc

    def test_spans_disjoint_and_in_bounds(self, spark, sf_dir):
        from data_diff_spark.functions.text import token_count
        from data_diff_spark.operators.spans import duplicate_spans
        from pyspark.sql import functions as FF

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        lens = {r.doc_id: r.n for r in docs.select(
            "doc_id", token_count(FF.col("text")).alias("n")).collect()}
        per_doc = {}
        for r in duplicate_spans(docs, k=8).collect():
            assert 1 <= r.span_start <= r.span_end <= lens[r.doc_id]
            assert r.span_words == r.span_end - r.span_start + 1 >= 8
            per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        for doc, spans in per_doc.items():
            spans.sort()
            for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
                # maximal spans: disjoint AND non-adjacent (adjacency
                # would have merged)
                assert s2 > e1 + 1, (doc, spans)
