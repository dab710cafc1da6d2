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
