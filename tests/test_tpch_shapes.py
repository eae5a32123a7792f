"""Edge-case ground truth for the round-5 TPC-H-shaped queries
(Q13 customer_order_counts, Q22 idle_rich_customers, Q15 top_supplier,
Q19 brand_tier_revenue, Q3 shipping_priority, Q6 forecast_revenue,
Q17 small_qty_revenue, Q21 waiting_suppliers, Q8 nation_market_share).

Each test synthesizes a tiny table set that isolates a semantic the sf
tables cannot falsify — the Q13 zero-order bucket (every sf customer
has orders), strict > / < boundaries, argmax ties, the sole-late-
supplier exists/not-exists pair, the zero-market-share year — and
checks the engine against hand truth; where cheap, the DuckDB oracle
twin runs on the same files to pin twin equality on the edge data too.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet")


def _ts(s):
    return pd.Timestamp(s)


def _twin(tmp_path, name, tables):
    from crawler_ray.pipelines.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute("SET threads=2")
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(ORACLE_SQL[name]).df()


def test_customer_order_counts_zero_bucket(ray_session, tmp_path):
    """Customers with NO orders must land in the c_count=0 bucket —
    the sf tables never exercise it (every sf customer has orders)."""
    from crawler_ray.pipelines.queries import q_customer_order_counts

    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(1, 6, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(1, 6)],
            "c_nationkey": np.zeros(5, dtype=np.int64),
            "c_acctbal": np.zeros(5),
            "c_mktsegment": ["BUILDING"] * 5,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 5, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": np.ones(4),
            "o_orderdate": [_ts("1996-06-01")] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)

    got = q_customer_order_counts(str(tmp_path))
    # customers 3,4,5 placed zero orders; 2 placed one; 1 placed three
    assert list(map(tuple, got[["c_count", "custdist"]].to_numpy())) == [
        (0, 3),
        (1, 1),
        (3, 1),
    ]
    twin = _twin(tmp_path, "customer_order_counts", ["customer", "orders"])
    twin = twin.sort_values("c_count").reset_index(drop=True)
    assert list(map(tuple, twin.to_numpy())) == [(0, 3), (1, 1), (3, 1)]


def test_idle_rich_strict_avg_and_antijoin(ray_session, tmp_path):
    """Balance EXACTLY equal to the positive average is excluded
    (strict >); a rich customer with a post-cutoff order is removed by
    the anti-join; nations outside the subset never enter."""
    from crawler_ray.pipelines.queries import (
        Q22_NATIONS,
        Q22_SINCE,
        q_idle_rich_customers,
    )

    n0, n1 = Q22_NATIONS[0], Q22_NATIONS[1]
    out_nation = 20
    assert out_nation not in Q22_NATIONS
    # in-subset positive balances: 10, 20, 15, 15, 30 -> avg 18.00;
    # strictly rich: 20 (kept) and 30 (anti-joined away below)
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(1, 7, dtype=np.int64),
            "c_name": [f"c{i}" for i in range(1, 7)],
            "c_nationkey": np.array(
                [n0, n0, n1, n0, out_nation, n1], dtype=np.int64
            ),
            "c_acctbal": [10.0, 20.0, 15.0, 15.0, 100.0, 30.0],
            "c_mktsegment": ["BUILDING"] * 6,
        }
    )
    # customer 6 (bal 30, rich) placed an order AFTER the cutoff ->
    # anti-joined away; customer 2's order is BEFORE the cutoff -> kept
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.array([6, 2], dtype=np.int64),
            "o_orderstatus": ["F", "F"],
            "o_totalprice": np.ones(2),
            "o_orderdate": [
                _ts(Q22_SINCE) + pd.Timedelta(days=10),
                _ts(Q22_SINCE) - pd.Timedelta(days=10),
            ],
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)

    got = q_idle_rich_customers(str(tmp_path)).to_pandas()
    got = got.sort_values("cntrycode").reset_index(drop=True)
    # avg = (10+20+15+15+30)/5 = 18 — positives include c6's 30 even
    # though it is later anti-joined (the average is over ALL positive
    # balances in the nation subset, matching the SQL twin); rich:
    # c2 (20) and c6 (30); c6 removed by the anti-join
    assert list(map(tuple, got[["cntrycode", "numcust"]].to_numpy())) == [
        (n0, 1)
    ]
    assert int(got["totacctbal_cents"].iloc[0]) == 2000


def test_top_supplier_tie_returns_both(ray_session, tmp_path):
    """Two suppliers with bit-equal max revenue both win (the exact-
    integer argmax makes the tie-set deterministic); a lineitem outside
    the quarter is pruned at the scan."""
    from crawler_ray.pipelines.queries import Q15_DATE_LO, q_top_supplier

    lo = _ts(Q15_DATE_LO)
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, 5, dtype=np.int64),
            "l_partkey": np.ones(4, dtype=np.int64),
            "l_suppkey": np.array([1, 2, 3, 1], dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int64),
            "l_quantity": np.ones(4),
            "l_extendedprice": [100.0, 100.0, 50.0, 999.0],
            "l_discount": [0.05, 0.05, 0.0, 0.0],
            "l_tax": np.zeros(4),
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [
                lo,
                lo + pd.Timedelta(days=5),
                lo + pd.Timedelta(days=6),
                lo + pd.Timedelta(days=200),  # outside the quarter
            ],
        }
    )
    sup = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
            "s_name": ["alpha", "beta", "gamma"],
            "s_nationkey": np.zeros(3, dtype=np.int64),
            "s_acctbal": np.zeros(3),
        }
    )
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", sup)

    got = q_top_supplier(str(tmp_path)).sort_values("suppkey")
    assert list(got["suppkey"]) == [1, 2]
    assert set(got["s_name"]) == {"alpha", "beta"}
    assert (got["revenue_milli"] == 10000 * 95).all()


def test_top_supplier_empty_quarter(ray_session, tmp_path):
    """A quarter with no lineitems returns 0 rows (the SQL twin's
    shape), not a TypeError from int(None)."""
    from crawler_ray.pipelines.queries import Q15_DATE_HI, q_top_supplier

    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1], dtype=np.int64),
            "l_partkey": np.array([1], dtype=np.int64),
            "l_suppkey": np.array([1], dtype=np.int64),
            "l_linenumber": np.array([1], dtype=np.int64),
            "l_quantity": [1.0],
            "l_extendedprice": [100.0],
            "l_discount": [0.0],
            "l_tax": [0.0],
            "l_returnflag": ["N"],
            "l_linestatus": ["O"],
            "l_shipdate": [_ts(Q15_DATE_HI) + pd.Timedelta(days=30)],
        }
    )
    sup = pd.DataFrame(
        {
            "s_suppkey": np.array([1], dtype=np.int64),
            "s_name": ["alpha"],
            "s_nationkey": np.zeros(1, dtype=np.int64),
            "s_acctbal": np.zeros(1),
        }
    )
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", sup)

    got = q_top_supplier(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["suppkey", "s_name", "revenue_milli"]


def test_idle_rich_no_positive_balances(ray_session, tmp_path):
    """A nation subset whose customers all have non-positive balances
    returns 0 rows (the SQL twin's shape), not float(None)."""
    from crawler_ray.pipelines.queries import Q22_NATIONS, q_idle_rich_customers

    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["a", "b"],
            "c_nationkey": np.array(
                [Q22_NATIONS[0], Q22_NATIONS[1]], dtype=np.int64
            ),
            "c_acctbal": [-5.0, 0.0],
            "c_mktsegment": ["BUILDING"] * 2,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1], dtype=np.int64),
            "o_custkey": np.array([1], dtype=np.int64),
            "o_orderstatus": ["F"],
            "o_totalprice": [1.0],
            "o_orderdate": [_ts("1999-01-01")],
            "o_orderpriority": ["1-URGENT"],
        }
    )
    _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)

    got = q_idle_rich_customers(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["cntrycode", "numcust", "totacctbal_cents"]


def test_brand_tier_revenue_hand_truth(ray_session, tmp_path):
    """Per-tier (brand, size, quantity) conjunction: size out of range
    or quantity out of range excludes the row even when the brand
    matches; non-tier brands are pruned at the part scan."""
    from crawler_ray.pipelines.queries import Q19_TIERS, q_brand_tier_revenue

    b, slo, shi, qlo, qhi = Q19_TIERS[0]
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], dtype=np.int64),
            "p_name": ["x", "y", "z"],
            "p_brand": [b, b, "Brand#9"],
            "p_type": ["STANDARD"] * 3,
            "p_size": np.array([slo, shi + 1, slo], dtype=np.int64),
            "p_retailprice": np.ones(3),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, 5, dtype=np.int64),
            "l_partkey": np.array([1, 1, 2, 3], dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int64),
            # row 2: quantity just past the tier cap -> excluded
            "l_quantity": [float(qlo), float(qhi + 1), float(qlo), float(qlo)],
            "l_extendedprice": [10.0, 10.0, 10.0, 10.0],
            "l_discount": [0.1, 0.0, 0.0, 0.0],
            "l_tax": np.zeros(4),
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [_ts("1996-06-01")] * 4,
        }
    )
    _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)

    got = q_brand_tier_revenue(str(tmp_path))
    # only row 1 qualifies: part 1 (size ok), qty == qlo, 10% discount
    assert int(got["n_items"].iloc[0]) == 1
    assert int(got["revenue_milli"].iloc[0]) == 1000 * 90


def test_shipping_priority_tiebreak_and_cutoffs(ray_session, tmp_path):
    """Equal-revenue orders rank by orderkey at the cutoff; an order
    placed ON the date is excluded (<), a lineitem shipped ON the date
    is excluded (>); other segments never enter."""
    from crawler_ray.pipelines.queries import (
        Q3_DATE,
        Q3_SEGMENT,
        q_shipping_priority,
    )

    d = _ts(Q3_DATE)
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["a", "b"],
            "c_nationkey": np.zeros(2, dtype=np.int64),
            "c_acctbal": np.zeros(2),
            "c_mktsegment": [Q3_SEGMENT, "AUTOMOBILE"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([10, 11, 12, 13], dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "o_orderstatus": ["F"] * 4,
            "o_totalprice": np.ones(4),
            # order 12 placed ON the date -> excluded (strict <)
            "o_orderdate": [d - pd.Timedelta(days=9)] * 2 + [d] * 2,
            "o_orderpriority": ["2-HIGH", "5-LOW", "1-URGENT", "1-URGENT"],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([10, 11, 12, 13, 10], dtype=np.int64),
            "l_partkey": np.ones(5, dtype=np.int64),
            "l_suppkey": np.ones(5, dtype=np.int64),
            "l_linenumber": np.ones(5, dtype=np.int64),
            "l_quantity": np.ones(5),
            "l_extendedprice": [50.0, 50.0, 50.0, 50.0, 77.0],
            "l_discount": np.zeros(5),
            "l_tax": np.zeros(5),
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            # last row shipped ON the date -> excluded (strict >)
            "l_shipdate": [d + pd.Timedelta(days=1)] * 4 + [d],
        }
    )
    _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)

    got = q_shipping_priority(str(tmp_path))
    # orders 10 and 11 tie at 50.00 -> orderkey ascending breaks it;
    # 12 fails the orderdate cutoff, 13 the segment
    assert list(got["l_orderkey"]) == [10, 11]
    assert (got["revenue_milli"] == 500000).all()
    assert list(got["o_orderpriority"]) == ["2-HIGH", "5-LOW"]
    epoch_days = int((d - pd.Timedelta(days=9) - _ts("1970-01-01")).days)
    assert (got["odate_day"] == epoch_days).all()


def test_forecast_revenue_boundaries(ray_session, tmp_path):
    """Discount cents outside {5,6,7} and quantity == the cap are
    excluded; the year window is [lo, hi)."""
    from crawler_ray.pipelines.queries import (
        Q6_MAX_QTY,
        Q6_YEAR_HI,
        Q6_YEAR_LO,
        q_forecast_revenue,
    )

    lo, hi = _ts(Q6_YEAR_LO), _ts(Q6_YEAR_HI)
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, 7, dtype=np.int64),
            "l_partkey": np.ones(6, dtype=np.int64),
            "l_suppkey": np.ones(6, dtype=np.int64),
            "l_linenumber": np.ones(6, dtype=np.int64),
            "l_quantity": [1.0, 1.0, 1.0, 1.0, float(Q6_MAX_QTY), 1.0],
            "l_extendedprice": [100.0] * 6,
            # cents: 4 (out), 5 (in), 7 (in), 8 (out), 5 (qty out), 5 (date out)
            "l_discount": [0.04, 0.05, 0.07, 0.08, 0.05, 0.05],
            "l_tax": np.zeros(6),
            "l_returnflag": ["N"] * 6,
            "l_linestatus": ["O"] * 6,
            "l_shipdate": [lo] * 4 + [lo, hi],
        }
    )
    _write(tmp_path, "lineitem", li)

    got = q_forecast_revenue(str(tmp_path))
    assert int(got["n_items"].iloc[0]) == 2
    assert int(got["forecast_milli"].iloc[0]) == 10000 * 5 + 10000 * 7


def test_small_qty_strict_integer_boundary(ray_session, tmp_path):
    """qty exactly AT one fifth of the average is excluded — the
    5·qty·cnt < totq rewrite is strict, bit-for-bit with the twin."""
    from crawler_ray.pipelines.queries import Q17_BRAND, q_small_qty_revenue

    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], dtype=np.int64),
            "p_name": ["x", "y", "z"],
            "p_brand": [Q17_BRAND, Q17_BRAND, "Brand#9"],
            "p_type": ["STANDARD"] * 3,
            "p_size": np.ones(3, dtype=np.int64),
            "p_retailprice": np.ones(3),
        }
    )
    # part 1: qtys (1, 9) -> totq 10, cnt 2: small iff 10*qty < 10 -> none
    #   (qty=1 sits EXACTLY on the boundary: 5*1*2 == 10)
    # part 2: qtys (1, 19) -> totq 20: small iff 10*qty < 20 -> qty=1 row
    # part 3: wrong brand, huge cents -> must never count
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(1, 6, dtype=np.int64),
            "l_partkey": np.array([1, 1, 2, 2, 3], dtype=np.int64),
            "l_suppkey": np.ones(5, dtype=np.int64),
            "l_linenumber": np.ones(5, dtype=np.int64),
            "l_quantity": [1.0, 9.0, 1.0, 19.0, 1.0],
            "l_extendedprice": [11.0, 12.0, 13.0, 14.0, 9999.0],
            "l_discount": np.zeros(5),
            "l_tax": np.zeros(5),
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": [_ts("1996-06-01")] * 5,
        }
    )
    _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li)

    got = q_small_qty_revenue(str(tmp_path))
    assert int(got["n_small"].iloc[0]) == 1
    assert int(got["total_cents"].iloc[0]) == 1300
    assert got["avg_yearly_cents"].iloc[0] == 1300 / 7.0
    twin = _twin(tmp_path, "small_qty_revenue", ["part", "lineitem"])
    assert int(twin["n_small"].iloc[0]) == 1
    assert int(twin["total_cents"].iloc[0]) == 1300


def test_waiting_suppliers_sole_late_logic(ray_session, tmp_path):
    """The winner is the SOLE late supplier of a FINISHED multi-
    supplier order: two late suppliers -> no winner; a single-supplier
    order -> no winner; a non-F order -> never enters; a supplier with
    BOTH a late and an on-time line still counts once."""
    from crawler_ray.pipelines.queries import Q21_LATE_DAYS, q_waiting_suppliers

    base = _ts("1996-01-01")
    late = base + pd.Timedelta(days=Q21_LATE_DAYS + 1)
    ontime = base + pd.Timedelta(days=1)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3, 4], dtype=np.int64),
            "o_custkey": np.ones(4, dtype=np.int64),
            "o_orderstatus": ["F", "F", "F", "O"],
            "o_totalprice": np.ones(4),
            "o_orderdate": [base] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    rows = [
        # O1: S1 late (twice: one late + one on-time line), S2 on-time
        (1, 1, late), (1, 1, ontime), (1, 2, ontime),
        # O2: S1 and S2 BOTH late -> nl=2, no winner
        (2, 1, late), (2, 2, late),
        # O3: S1 sole supplier and late -> ns=1, no winner
        (3, 1, late),
        # O4: status O -> excluded even though S3 is sole late
        (4, 3, late), (4, 2, ontime),
    ]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    li["l_orderkey"] = li["l_orderkey"].astype(np.int64)
    li["l_suppkey"] = li["l_suppkey"].astype(np.int64)
    for c, v in (
        ("l_partkey", 1), ("l_linenumber", 1), ("l_quantity", 1.0),
        ("l_extendedprice", 1.0), ("l_discount", 0.0), ("l_tax", 0.0),
    ):
        li[c] = v
    li["l_returnflag"] = "N"
    li["l_linestatus"] = "O"
    sup = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
            "s_name": ["alpha", "beta", "gamma"],
            "s_nationkey": np.zeros(3, dtype=np.int64),
            "s_acctbal": np.zeros(3),
        }
    )
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", sup)

    got = q_waiting_suppliers(str(tmp_path))
    assert list(map(tuple, got[["suppkey", "numwait"]].to_numpy())) == [(1, 1)]
    assert list(got["s_name"]) == ["alpha"]
    twin = _twin(
        tmp_path, "waiting_suppliers", ["orders", "lineitem", "supplier"]
    )
    assert list(map(tuple, twin[["suppkey", "numwait"]].to_numpy())) == [(1, 1)]


def test_nation_market_share_zero_year(ray_session, tmp_path):
    """A year whose market has NO target-nation revenue must still
    appear with share 0.0; out-of-region customers and non-type parts
    never enter the denominator."""
    from crawler_ray.pipelines.queries import (
        Q8_DATE_LO,
        Q8_NATION,
        Q8_REGION,
        Q8_TYPE,
        q_nation_market_share,
    )

    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([1, 2, Q8_NATION], dtype=np.int64),
            "n_name": ["n1", "n2", "n7"],
            "n_regionkey": np.array([1, Q8_REGION, Q8_REGION], dtype=np.int64),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["a", "b"],
            "c_nationkey": np.array([2, 1], dtype=np.int64),  # 2 in-region
            "c_acctbal": np.zeros(2),
            "c_mktsegment": ["BUILDING"] * 2,
        }
    )
    sup = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2], dtype=np.int64),
            "s_name": ["t", "o"],
            "s_nationkey": np.array([Q8_NATION, 1], dtype=np.int64),
            "s_acctbal": np.zeros(2),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2], dtype=np.int64),
            "p_name": ["x", "y"],
            "p_brand": ["Brand#1"] * 2,
            "p_type": [Q8_TYPE, "PROMO"],
            "p_size": np.ones(2, dtype=np.int64),
            "p_retailprice": np.ones(2),
        }
    )
    lo = _ts(Q8_DATE_LO)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], dtype=np.int64),
            # order 3 belongs to the out-of-region customer
            "o_custkey": np.array([1, 1, 2], dtype=np.int64),
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": np.ones(3),
            "o_orderdate": [lo, lo + pd.Timedelta(days=400), lo],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    rows = [
        # 1996: only the non-target supplier sells -> share 0.0
        (1, 1, 2, 100.0),
        # 1997: target supplier 60, non-target 40 -> share 0.6
        (2, 1, 1, 60.0), (2, 1, 2, 40.0),
        # out-of-region order and non-type part never count
        (3, 1, 1, 999.0), (1, 2, 1, 999.0),
    ]
    li = pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"]
    )
    for c in ("l_orderkey", "l_partkey", "l_suppkey"):
        li[c] = li[c].astype(np.int64)
    li["l_linenumber"] = 1
    li["l_quantity"] = 1.0
    li["l_discount"] = 0.0
    li["l_tax"] = 0.0
    li["l_returnflag"] = "N"
    li["l_linestatus"] = "O"
    li["l_shipdate"] = _ts("1996-06-01")
    for name, df in (
        ("nation", nation), ("customer", cust), ("supplier", sup),
        ("part", part), ("orders", orders), ("lineitem", li),
    ):
        _write(tmp_path, name, df)

    got = q_nation_market_share(str(tmp_path))
    assert list(got["o_year"]) == [1996, 1997]
    assert list(got["total_milli"]) == [100 * 100 * 100, 100 * 100 * 100]
    assert list(got["nation_milli"]) == [0, 60 * 100 * 100]
    assert list(got["mkt_share"]) == [0.0, 0.6]
    twin = _twin(
        tmp_path,
        "nation_market_share",
        ["nation", "customer", "supplier", "part", "orders", "lineitem"],
    ).sort_values("o_year")
    assert list(twin["mkt_share"]) == [0.0, 0.6]
