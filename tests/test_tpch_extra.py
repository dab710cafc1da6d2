"""Extra TPC-H shapes beyond the registry's Q1/Q3/Q4/Q5/Q8/Q10/Q17:
one ANSI SQL text executed by BOTH Spark and DuckDB, rows compared
exactly (decimal aggregation, cast to double at the end — the same
determinism discipline as the workload queries).

The driver's fixtures trim some TPC-H columns (no l_shipmode /
l_commitdate / p_container / c_phone), so Q6, Q7 and Q14 are faithful
while Q19/Q21/Q22 keep their characteristic SHAPES (disjunctive
multi-column predicates; doubly-correlated EXISTS + NOT EXISTS; NOT
EXISTS anti-join plus a scalar average subquery) over the available
columns."""

import duckdb
import pytest

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def both(spark, sf_dir):
    from data_diff_spark.workload import load_views

    load_views(spark, sf_dir)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    def run(sql):
        got = sorted(tuple(r) for r in spark.sql(sql).collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"row mismatch ({len(got)} vs {len(want)})"
        assert len(got) > 0
        return got

    return run


def test_q6_forecast_revenue(both):
    both("""
select cast(sum(cast(l_extendedprice * l_discount as decimal(38,4))) as double)
       as revenue
from lineitem
where l_shipdate >= date '1994-01-01' and l_shipdate < date '1995-01-01'
  and l_discount between 0.05 and 0.07 and l_quantity < 24
""")


def test_q7_volume_shipping(both):
    both("""
select supp_nation, cust_nation, l_year,
       cast(sum(cast(volume as decimal(38,4))) as double) as revenue
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         year(l_shipdate) as l_year,
         l_extendedprice * (1 - l_discount) as volume
  from supplier, lineitem, orders, customer, nation n1, nation n2
  where s_suppkey = l_suppkey and o_orderkey = l_orderkey
    and c_custkey = o_custkey and s_nationkey = n1.n_nationkey
    and c_nationkey = n2.n_nationkey
    and n1.n_name < n2.n_name  -- every distinct nation pair (the tiny
    -- synthetic fixture makes any single named pair empty)
    and l_shipdate between date '1995-01-01' and date '1996-12-31'
) shipping
group by supp_nation, cust_nation, l_year
""")


def test_q14_promotion_effect(both):
    both("""
select cast(100.0 * (
         cast(sum(cast(case when p_type like 'PROMO%'
             then l_extendedprice * (1 - l_discount) else 0 end as decimal(38,4))) as double)
       / cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(38,4))) as double)
       ) as double) as promo_revenue
       -- sums stay decimal (order-independent); the DIVISION runs on
       -- doubles because Spark and DuckDB disagree on decimal-division
       -- result scale, and IEEE double division is bit-identical
from lineitem, part
where l_partkey = p_partkey
  and l_shipdate >= date '1995-09-01' and l_shipdate < date '1995-10-01'
""")


def test_q19_shaped_disjunctive_join(both):
    # Q19's signature: an OR of multi-column conjunctions straddling the
    # join — planners must not fall back to a cartesian product
    both("""
select cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(38,4)))
       as double) as revenue
from lineitem, part
where p_partkey = l_partkey
  and ((p_brand = 'Brand#12' and p_size between 1 and 5
        and l_quantity between 1 and 11)
    or (p_brand = 'Brand#23' and p_size between 1 and 10
        and l_quantity between 10 and 20)
    or (p_brand = 'Brand#34' and p_size between 1 and 15
        and l_quantity between 20 and 30))
""")


def test_q21_shaped_double_correlation(both):
    # Q21's signature: EXISTS (another supplier served the same order)
    # AND NOT EXISTS (no third condition holds) — two correlated
    # subqueries Catalyst must decorrelate into semi/anti joins
    both("""
select s_name, count(*) as numwait
from supplier, lineitem l1, orders, nation
where s_suppkey = l1.l_suppkey and o_orderkey = l1.l_orderkey
  and o_orderstatus = 'F' and l1.l_returnflag = 'R'
  and exists (
    select 1 from lineitem l2
    where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey)
  and not exists (
    select 1 from lineitem l3
    where l3.l_orderkey = l1.l_orderkey and l3.l_suppkey <> l1.l_suppkey
      and l3.l_returnflag = 'R')
  and s_nationkey = n_nationkey and n_name = 'NATION_3'
group by s_name
""")


def test_q22_shaped_anti_join_with_scalar_subquery(both):
    # Q22's signature: a scalar AVG subquery as the filter bound plus a
    # NOT EXISTS anti-join against orders
    both("""
select c_mktsegment as cntrycode, count(*) as numcust,
       cast(sum(cast(c_acctbal as decimal(38,2))) as double) as totacctbal
from customer
where c_acctbal > (
    select avg(c_acctbal) from customer where c_acctbal > 0.00)
  and not exists (
    select 1 from orders where o_custkey = c_custkey and o_orderstatus = 'O')
group by c_mktsegment
""")


def test_q15_top_supplier_with_cte_and_max_subquery(both):
    # faithful Q15 over available columns: revenue view as a CTE, the
    # top supplier selected by a scalar MAX subquery over that same CTE
    both("""
with revenue as (
  select l_suppkey as supplier_no,
         cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(38,4)))
              as double) as total_revenue
  from lineitem
  where l_shipdate >= date '1996-01-01' and l_shipdate < date '1996-04-01'
  group by l_suppkey)
select s.s_suppkey, s.s_name, r.total_revenue
from supplier s join revenue r on s.s_suppkey = r.supplier_no
where r.total_revenue = (select max(total_revenue) from revenue)
order by s.s_suppkey
""")


def test_q18_large_volume_customer_in_subquery_with_having(both):
    # faithful Q18: IN over a HAVING-filtered aggregate subquery, then a
    # 3-way join re-aggregated per order
    both("""
select c.c_name, c.c_custkey, o.o_orderkey,
       cast(o.o_orderdate as date) as odate, o.o_totalprice,
       cast(sum(cast(l.l_quantity as decimal(38,4))) as double) as total_qty
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on o.o_orderkey = l.l_orderkey
where o.o_orderkey in (
  select l_orderkey from lineitem
  group by l_orderkey having sum(l_quantity) > 210)
group by c.c_name, c.c_custkey, o.o_orderkey, cast(o.o_orderdate as date),
         o.o_totalprice
order by o.o_totalprice desc, o.o_orderkey
""")


def test_q9_shaped_product_profit_by_nation_year(both):
    # Q9 shape without partsupp: profit = revenue minus a deterministic
    # cost proxy from part, aggregated by supplier nation x order year
    # through the full 6-way join chain
    both("""
select n.n_name as nation,
       cast(extract(year from o.o_orderdate) as int) as o_year,
       cast(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * 0.01 * l.l_quantity
                     as decimal(38,4))) as double) as sum_profit
from lineitem l
join part p on p.p_partkey = l.l_partkey
join supplier s on s.s_suppkey = l.l_suppkey
join orders o on o.o_orderkey = l.l_orderkey
join nation n on n.n_nationkey = s.s_nationkey
where p.p_name like '%a%'
group by n.n_name, cast(extract(year from o.o_orderdate) as int)
order by nation, o_year desc
""")


def test_q12_shaped_priority_classification(both):
    # Q12 shape without l_shipmode/commitdate: conditional two-branch
    # counts per shipping year, split on order priority
    both("""
select cast(extract(year from l.l_shipdate) as int) as ship_year,
       sum(case when o.o_orderpriority in ('1-URGENT', '2-HIGH')
                then 1 else 0 end) as high_line_count,
       sum(case when o.o_orderpriority not in ('1-URGENT', '2-HIGH')
                then 1 else 0 end) as low_line_count
from orders o join lineitem l on o.o_orderkey = l.l_orderkey
where l.l_shipdate >= date '1994-01-01' and l.l_shipdate < date '1996-01-01'
group by cast(extract(year from l.l_shipdate) as int)
order by ship_year
""")


def test_q13_order_count_distribution_left_join(both):
    # faithful Q13 minus the comment filter: LEFT join so zero-order
    # customers survive, then the distribution of counts of counts
    both("""
select c_count, count(*) as custdist from (
  select c.c_custkey, count(o.o_orderkey) as c_count
  from customer c left outer join orders o on c.c_custkey = o.o_custkey
  group by c.c_custkey) t
group by c_count
order by custdist desc, c_count desc
""")


def test_q2_shaped_correlated_min_cost_supplier(both):
    # Q2 shape without partsupp: per-part minimal observed unit price
    # from lineitem, the supplier(s) achieving it selected by a
    # CORRELATED scalar MIN subquery
    both("""
select p.p_partkey, s.s_suppkey, s.s_acctbal, n.n_name,
       cast(t.unit_price as double) as unit_price
from (select l_partkey, l_suppkey,
             min(cast(l_extendedprice / l_quantity as decimal(38,6))) as unit_price
      from lineitem where l_quantity > 0
      group by l_partkey, l_suppkey) t
join part p on p.p_partkey = t.l_partkey
join supplier s on s.s_suppkey = t.l_suppkey
join nation n on n.n_nationkey = s.s_nationkey
where p.p_size <= 5
  and t.unit_price = (
    select min(cast(l2.l_extendedprice / l2.l_quantity as decimal(38,6)))
    from lineitem l2 where l2.l_partkey = p.p_partkey and l2.l_quantity > 0)
order by s.s_acctbal desc, n.n_name, s.s_suppkey, p.p_partkey
""")


def test_q11_shaped_having_global_fraction_subquery(both):
    # Q11 shape without partsupp: per-supplier value sums kept only when
    # above a FRACTION of the global total (scalar subquery in HAVING)
    both("""
select l_suppkey,
       cast(sum(cast(l_extendedprice * l_quantity as decimal(38,4)))
            as double) as value
from lineitem
group by l_suppkey
having sum(cast(l_extendedprice * l_quantity as decimal(38,4))) > (
  select sum(cast(l_extendedprice * l_quantity as decimal(38,4))) * 0.002
  from lineitem)
order by value desc, l_suppkey
""")


def test_q16_shaped_supplier_count_not_in(both):
    # Q16 shape: distinct-supplier counts per part attribute triple,
    # suppliers excluded by a NOT IN subquery
    both("""
select p.p_brand, p.p_type, p.p_size,
       count(distinct l.l_suppkey) as supplier_cnt
from lineitem l join part p on p.p_partkey = l.l_partkey
where p.p_brand <> 'Brand#13'
  and l.l_suppkey not in (
    select s_suppkey from supplier where s_acctbal < -900)
group by p.p_brand, p.p_type, p.p_size
having count(distinct l.l_suppkey) >= 4
order by supplier_cnt desc, p.p_brand, p.p_type, p.p_size
""")


def test_q20_shaped_nested_in_with_correlated_half_sum(both):
    # Q20 shape without partsupp: suppliers shipping an outsized share
    # (>30%) of the corpus-wide quantity of some bolt part — nested IN +
    # a correlated scalar subquery on the inner aggregate
    both("""
select s.s_name, s.s_suppkey
from supplier s
where s.s_suppkey in (
  select l_suppkey from lineitem l
  join part p on p.p_partkey = l.l_partkey
  where p.p_name like '%bolt%'
  group by l_suppkey, l.l_partkey
  having sum(l_quantity) > (
    select sum(l2.l_quantity) * 0.3 from lineitem l2
    where l2.l_partkey = l.l_partkey))
order by s.s_suppkey
""")
