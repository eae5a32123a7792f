"""Edge-case ground truth for the round-5 warehouse/join-shape queries
(local_supplier_volume, large_volume_customers, market_basket_pairs,
user_top_event, posting_lists, parts_above_brand_avg).

Each test synthesizes a tiny table that isolates a semantic the sf
tables can't falsify (strict thresholds, tie-breaks, per-order
dedup, truncation boundaries, the basket-width raise) and checks the
engine against hand truth — and, where cheap, the DuckDB oracle twin
on the same files.
"""

import numpy as np
import pandas as pd
import pytest


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet")


def test_market_basket_dedup_and_tiebreak(ray_session, tmp_path):
    """A part listed on TWO line numbers of one order must count once;
    single-part orders emit no pairs; equal-count pairs order by
    (p1, p2) at the top-k cutoff."""
    from crawler_ray.pipelines.queries import q_market_basket_pairs

    rows = [
        # order 1: parts {10, 20} with part 10 duplicated across lines
        (1, 10), (1, 10), (1, 20),
        # order 2: same pair again -> (10,20) count 2
        (2, 10), (2, 20),
        # order 3: {10, 30} and order 4: {20, 30} -> counts 1 each
        (3, 10), (3, 30),
        (4, 20), (4, 30),
        # order 5: single part -> no pairs
        (5, 40),
    ]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    li["l_orderkey"] = li["l_orderkey"].astype(np.int64)
    li["l_partkey"] = li["l_partkey"].astype(np.int64)
    _write(tmp_path, "lineitem", li)

    got = q_market_basket_pairs(str(tmp_path)).reset_index(drop=True)
    assert list(map(tuple, got[["p1", "p2", "n"]].to_numpy())) == [
        (10, 20, 2),
        (10, 30, 1),
        (20, 30, 1),
    ]


def test_market_basket_width_raises(ray_session, tmp_path):
    """A basket wider than BASKET_MAX_PARTS raises (never a silent
    cap) — the O(k²) guard."""
    from crawler_ray.pipelines.queries import BASKET_MAX_PARTS, q_market_basket_pairs

    k = BASKET_MAX_PARTS + 1
    li = pd.DataFrame(
        {
            "l_orderkey": np.zeros(k, dtype=np.int64),
            "l_partkey": np.arange(k, dtype=np.int64),
        }
    )
    _write(tmp_path, "lineitem", li)
    with pytest.raises(Exception, match="BASKET_MAX_PARTS"):
        q_market_basket_pairs(str(tmp_path))


def test_user_top_event_tiebreak(ray_session, tmp_path):
    """Equal counts resolve to the LEXICOGRAPHICALLY FIRST event type
    (the ROW_NUMBER ... ORDER BY cnt DESC, type twin)."""
    from crawler_ray.pipelines.queries import q_user_top_event

    rows = [
        # user 1: 2x view, 2x click -> tie -> 'click' wins lexicographically
        (1, "view"), (1, "view"), (1, "click"), (1, "click"),
        # user 2: clear winner 'view'
        (2, "view"), (2, "view"), (2, "click"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "event_type"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    _write(tmp_path, "events", ev)

    got = (
        q_user_top_event(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, got[["user_id", "top_event", "n"]].to_numpy())) == [
        (1, "click", 2),
        (2, "view", 2),
    ]


def test_large_volume_threshold_strict(ray_session, tmp_path):
    """An order summing EXACTLY to the threshold is excluded (strict >),
    one unit above is included, and the customer join recovers names."""
    from crawler_ray.pipelines.queries import LARGE_VOLUME_QTY, q_large_volume_customers

    t = LARGE_VOLUME_QTY
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 2, 2], dtype=np.int64),
            "l_quantity": [float(t - 100), 100.0, float(t - 100), 101.0],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.array([7, 8], dtype=np.int64),
            "o_orderdate": pd.to_datetime(["2000-01-01", "2000-01-02"]).astype(
                "datetime64[us]"
            ),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([7, 8], dtype=np.int64),
            "c_name": ["Customer#7", "Customer#8"],
        }
    )
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "customer", cust)

    got = q_large_volume_customers(str(tmp_path)).reset_index(drop=True)
    assert len(got) == 1
    assert int(got["o_orderkey"].iloc[0]) == 2
    assert got["c_name"].iloc[0] == "Customer#8"
    assert int(got["total_qty"].iloc[0]) == t + 1


def test_posting_lists_df_and_truncation(ray_session, tmp_path):
    """A token repeated inside one doc counts df ONCE; a token in more
    than POSTINGS_K docs keeps exact df but truncates the posting list
    to the first K ascending doc_ids."""
    from crawler_ray.pipelines.queries import POSTINGS_K, q_posting_lists

    n = POSTINGS_K + 5
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # every doc holds 'common' (twice in doc 0); doc 0 also 'rare'
            "text": ["common common rare"] + ["common"] * (n - 1),
        }
    )
    _write(tmp_path, "documents", docs)

    got = (
        q_posting_lists(str(tmp_path))
        .to_pandas()
        .set_index("token")
        .sort_index()
    )
    assert int(got.loc["common", "df"]) == n
    assert got.loc["common", "postings"] == ",".join(
        str(i) for i in range(POSTINGS_K)
    )
    assert int(got.loc["rare", "df"]) == 1
    assert got.loc["rare", "postings"] == "0"


def test_parts_above_brand_avg_strict(ray_session, tmp_path):
    """A part priced exactly AT its brand average is excluded; the
    comparison happens per brand."""
    from crawler_ray.pipelines.queries import q_parts_above_brand_avg

    part = pd.DataFrame(
        {
            "p_partkey": np.arange(5, dtype=np.int64),
            "p_brand": ["A", "A", "A", "B", "B"],
            # brand A avg = 20.00 -> only the 30.00 part qualifies
            # brand B avg = 10.00 -> only the 15.00 part qualifies
            "p_retailprice": [10.0, 20.0, 30.0, 5.0, 15.0],
        }
    )
    _write(tmp_path, "part", part)

    got = (
        q_parts_above_brand_avg(str(tmp_path))
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    assert list(got["p_partkey"]) == [2, 4]
    assert list(got["retail_cents"]) == [3000, 1500]


def test_local_supplier_volume_nation_and_date_bounds(ray_session, tmp_path):
    """Q5 semantics the sf tables can't isolate: a lineitem whose
    supplier nation differs from the customer nation is EXCLUDED even
    when both nations are in the region; the date range is [lo, hi)
    (an order ON the upper bound is out); revenue is exact integer
    cents × (100 − discount%)."""
    from crawler_ray.pipelines.queries import (
        Q5_DATE_HI,
        Q5_DATE_LO,
        Q5_REGION,
        q_local_supplier_volume,
    )

    _write(
        tmp_path,
        "region",
        pd.DataFrame(
            {"r_regionkey": np.array([0, 1], dtype=np.int64),
             "r_name": [Q5_REGION, "OTHER"]}
        ),
    )
    _write(
        tmp_path,
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([0, 1, 2], dtype=np.int64),
                "n_name": ["N0", "N1", "NOUT"],
                "n_regionkey": np.array([0, 0, 1], dtype=np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2], dtype=np.int64),
                "c_nationkey": np.array([0, 1], dtype=np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": np.array([1, 2], dtype=np.int64),
                "s_nationkey": np.array([0, 1], dtype=np.int64),
            }
        ),
    )
    lo = pd.Timestamp(Q5_DATE_LO)
    hi = pd.Timestamp(Q5_DATE_HI)
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([10, 11, 12], dtype=np.int64),
                "o_custkey": np.array([1, 1, 1], dtype=np.int64),
                # in-range (== lo), in-range, OUT (== hi, exclusive)
                "o_orderdate": pd.Series([lo, lo, hi]).astype("datetime64[us]"),
            }
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.array([10, 11, 12], dtype=np.int64),
                # order 10: supplier in SAME nation as customer -> counted
                # order 11: supplier in nation 1 != customer nation 0 -> out
                # order 12: date out of range -> out
                "l_suppkey": np.array([1, 2, 1], dtype=np.int64),
                "l_extendedprice": [100.0, 100.0, 100.0],
                "l_discount": [0.05, 0.0, 0.0],
            }
        ),
    )

    got = q_local_supplier_volume(str(tmp_path)).reset_index(drop=True)
    assert len(got) == 1
    assert got["n_name"].iloc[0] == "N0"
    assert int(got["n_items"].iloc[0]) == 1
    # 100.00 -> 10000 cents x (100 - 5) = 950000 milli-cents
    assert int(got["revenue_milli"].iloc[0]) == 950_000


def test_daily_active_users_dedup(ray_session, tmp_path):
    """A user with several events in one day counts ONCE in n_users
    but every event counts in n_events; day boundaries split at
    midnight."""
    from crawler_ray.pipelines.queries import q_daily_active_users

    T = pd.Timestamp("2025-03-01")
    rows = [
        (1, T), (1, T + pd.Timedelta(hours=5)),       # same day, 2 events
        (2, T + pd.Timedelta(hours=23, minutes=59)),  # same day
        (1, T + pd.Timedelta(days=1)),                # next day
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", ev)

    got = (
        q_daily_active_users(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(got["n_users"]) == [2, 1]
    assert list(got["n_events"]) == [3, 1]


def test_new_vs_returning_first_touch(ray_session, tmp_path):
    """New only on the user's FIRST-ever day; multiple same-day events
    never double-count; a later day counts the same user as
    returning."""
    from crawler_ray.pipelines.queries import q_new_vs_returning

    T = pd.Timestamp("2025-03-01")
    d = pd.Timedelta(days=1)
    rows = [
        (1, T), (1, T),          # user 1 new on day 0 (twice -> once)
        (1, T + d),              # returning on day 1
        (2, T + d), (2, T + d),  # user 2 new on day 1
        (2, T + 2 * d),          # returning on day 2
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", ev)

    got = (
        q_new_vs_returning(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(got["n_new"]) == [1, 1, 0]
    assert list(got["n_returning"]) == [0, 1, 1]


def test_event_transitions_user_boundary_and_tiebreak(ray_session, tmp_path):
    """No transition crosses a user boundary; equal timestamps order by
    event_id (the SQL LAG tiebreak)."""
    from crawler_ray.pipelines.queries import q_event_transitions

    T = pd.Timestamp("2025-03-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> purchase (click/purchase same ts,
        # event_id orders them)
        (1, 10, T, "view"), (1, 11, T + s, "click"), (1, 12, T + s, "purchase"),
        # user 2: single event -> no transition; and user 2's event
        # must NOT chain onto user 1's last event
        (2, 13, T + 2 * s, "view"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["event_id"] = ev["event_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", ev)

    got = (
        q_event_transitions(str(tmp_path))
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.to_numpy())) == [
        ("click", "purchase", 1),
        ("view", "click", 1),
    ]


def test_distinct_parts_per_supplier_dedup(ray_session, tmp_path):
    """Repeated (supplier, part) lineitems count the part once."""
    from crawler_ray.pipelines.queries import q_distinct_parts_per_supplier

    li = pd.DataFrame(
        {
            "l_suppkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "l_partkey": np.array([10, 10, 20, 10], dtype=np.int64),
        }
    )
    _write(tmp_path, "lineitem", li)

    got = (
        q_distinct_parts_per_supplier(str(tmp_path))
        .to_pandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.to_numpy())) == [(1, 2), (2, 1)]


def test_orders_above_customer_avg_strict(ray_session, tmp_path):
    """An order exactly AT its customer's average is excluded — in
    particular a single-order customer never qualifies (its only
    order IS the average)."""
    from crawler_ray.pipelines.queries import q_orders_above_customer_avg

    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            # cust 1 avg = 20.00 -> only the 30.00 order qualifies;
            # cust 2 single order == its own avg -> excluded
            "o_totalprice": [10.0, 20.0, 30.0, 99.0],
        }
    )
    _write(tmp_path, "orders", orders)

    got = (
        q_orders_above_customer_avg(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert list(got["o_orderkey"]) == [2]
    assert list(got["totalprice_cents"]) == [3000]


def test_parts_in_all_regions_division(ray_session, tmp_path):
    """Relational division: a part must be ordered by customers of
    EVERY region; repeat orders from the same region count once."""
    from crawler_ray.pipelines.queries import q_parts_in_all_regions

    _write(
        tmp_path,
        "region",
        pd.DataFrame(
            {"r_regionkey": np.array([0, 1], dtype=np.int64),
             "r_name": ["R0", "R1"]}
        ),
    )
    _write(
        tmp_path,
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": np.array([0, 1], dtype=np.int64),
                "n_name": ["N0", "N1"],
                "n_regionkey": np.array([0, 1], dtype=np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": np.array([1, 2], dtype=np.int64),
                "c_nationkey": np.array([0, 1], dtype=np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([10, 11, 12], dtype=np.int64),
                "o_custkey": np.array([1, 2, 1], dtype=np.int64),
            }
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                # part 100: regions {0, 1} (via orders 10 and 11) -> in
                # part 200: region 0 twice (orders 10, 12) -> out
                "l_orderkey": np.array([10, 11, 10, 12], dtype=np.int64),
                "l_partkey": np.array([100, 100, 200, 200], dtype=np.int64),
            }
        ),
    )

    got = q_parts_in_all_regions(str(tmp_path)).to_pandas()
    assert list(got["p_partkey"]) == [100]


def test_user_longest_streak_islands(ray_session, tmp_path):
    """Gaps-and-islands semantics: same-day repeats extend nothing, a
    one-day gap breaks the streak, month boundaries don't."""
    from crawler_ray.pipelines.queries import q_user_longest_streak

    def day(s):
        return pd.Timestamp(s)

    rows = [
        # user 1: Jan 30,31, Feb 1 (streak 3 across month boundary),
        # then Feb 3-4 (streak 2); repeats on Jan 31 don't inflate
        (1, day("2025-01-30")), (1, day("2025-01-31")), (1, day("2025-01-31")),
        (1, day("2025-02-01")), (1, day("2025-02-03")), (1, day("2025-02-04")),
        # user 2: single day -> streak 1
        (2, day("2025-01-01")),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    _write(tmp_path, "events", ev)

    got = (
        q_user_longest_streak(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.to_numpy())) == [(1, 3), (2, 1)]


def test_monthly_revenue_growth_sentinel(ray_session, tmp_path):
    """First month reports the -1 sentinel; growth is the exact-cents
    ratio; empty months simply don't appear (LAG skips to the prior
    PRESENT month, matching the SQL twin)."""
    from crawler_ray.pipelines.queries import q_monthly_revenue_growth

    orders = pd.DataFrame(
        {
            "o_orderdate": pd.to_datetime(
                ["2025-01-05", "2025-01-20", "2025-02-10", "2025-04-01"]
            ).astype("datetime64[us]"),
            "o_totalprice": [100.0, 100.0, 300.0, 150.0],
        }
    )
    _write(tmp_path, "orders", orders)

    got = q_monthly_revenue_growth(str(tmp_path)).reset_index(drop=True)
    assert list(got["revenue_cents"]) == [20000, 30000, 15000]
    assert got["growth"].iloc[0] == -1.0
    assert abs(got["growth"].iloc[1] - 0.5) < 1e-12
    assert abs(got["growth"].iloc[2] - (-0.5)) < 1e-12


def test_events_heatmap_iso_dow(ray_session, tmp_path):
    """DOW is ISO (Monday=1, Sunday=7) and hours split at the hour
    boundary."""
    from crawler_ray.pipelines.queries import q_events_heatmap

    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2025-01-06 00:59:59",  # Monday hour 0
                    "2025-01-06 01:00:00",  # Monday hour 1
                    "2025-01-12 23:00:00",  # Sunday hour 23
                ]
            ).astype("datetime64[us]")
        }
    )
    _write(tmp_path, "events", ev)

    got = (
        q_events_heatmap(str(tmp_path))
        .to_pandas()
        .sort_values(["dow", "hour"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.to_numpy())) == [(1, 0, 1), (1, 1, 1), (7, 23, 1)]


def test_props_value_stats_fallback_and_nulls(ray_session, tmp_path):
    """JSON rows the fast regex can't parse (reordered keys, extra
    fields, whitespace) take the json.loads fallback; missing k and
    malformed JSON count in n but not n_k/sum_k — SQL null
    semantics."""
    from crawler_ray.pipelines.queries import q_props_value_stats

    ev = pd.DataFrame(
        {
            "event_type": ["a"] * 6,
            "props": [
                '{"k": 5}',             # fast path
                '{ "k" : 7 }',          # whitespace -> fallback
                '{"x": 1, "k": 3}',     # reordered/extra -> fallback
                '{"x": 1}',             # no k -> null
                "not json",             # malformed -> null
                None,                   # null props -> null
            ],
        }
    )
    _write(tmp_path, "events", ev)

    got = q_props_value_stats(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert int(got["n"].iloc[0]) == 6
    assert int(got["n_k"].iloc[0]) == 3
    assert int(got["sum_k"].iloc[0]) == 15


def test_dup_paragraph_ratio_semantics(ray_session, tmp_path):
    """Within-doc repeats do NOT make a paragraph 'duplicated' (the
    signal is cross-document); blank paragraphs are excluded; every
    occurrence counts in the denominator."""
    from crawler_ray.pipelines.queries import q_dup_paragraph_ratio

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                "shared\nunique-one\n\nshared",  # shared x2 + 1 unique + blank
                "shared\nunique-two",
                "solo\nsolo",  # repeated WITHIN one doc only -> not dup
            ],
        }
    )
    _write(tmp_path, "documents", docs)

    got = (
        q_dup_paragraph_ratio(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_para"]) == [3, 2, 2]
    assert list(got["n_dup"]) == [2, 1, 0]
    assert abs(got["dup_ratio"].iloc[0] - 2 / 3) < 1e-12
    assert got["dup_ratio"].iloc[2] == 0.0
