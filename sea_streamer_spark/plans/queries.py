"""Aggregate module: importing this populates the full query registry.

Registration order matters: the correctness driver walks ``queries()`` in
order under a fixed budget (round 1 covered exactly the first 50 entries).
To convert builder-claimed coverage into driver-proven coverage we emit the
never-driver-verified queries first — streaming envelope ops, LLM-pipeline
ops, the TPC-H shapes without a round-1 row, then the remaining relational
leftovers — and the 50 queries already green in CORRECTNESS_r01.json last
(they are the least informative to re-check if the budget runs out).
"""

from . import relational  # noqa: F401
from . import relational2  # noqa: F401
from . import relational3  # noqa: F401
from . import relational4  # noqa: F401
from . import relational5  # noqa: F401
from . import streaming_ops  # noqa: F401

try:  # LLM-pipeline ops land in a later milestone of each round
    from . import llm_ops  # noqa: F401
    from . import llm_ops2  # noqa: F401
except ImportError:
    pass

from .registry import QUERIES, oracle_sql, queries  # noqa: F401

#: Queries with a green driver row in CORRECTNESS_r01.json — re-verified
#: last. Everything NOT in this list has never been independently checked
#: by the driver and goes first.
_R01_DRIVER_VERIFIED: tuple[str, ...] = (
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q18_large_orders",
    "join_broadcast_part_brand", "join_left_outer_order_counts",
    "join_semi_customers_with_f_orders", "join_anti_customers_without_orders",
    "agg_distinct_suppliers_per_flag", "agg_rollup_flag_status",
    "agg_cube_priority_status", "window_rank_orders_per_customer",
    "window_running_sum_user_value", "window_lag_value_delta",
    "sort_limit_top_orders", "set_intersect_nations", "set_except_nations",
    "set_union_distinct_keys", "scalar_string_functions",
    "scalar_date_functions", "scalar_math_functions", "case_when_price_bands",
    "json_extract_event_props", "q4_order_priority", "q7_volume_shipping",
    "q14_promo_revenue", "q15_top_supplier", "q2_min_cost_supplier",
    "agg_variance_exact", "agg_min_max_by", "agg_array_collect_sorted",
    "pivot_status_by_priority", "window_rank_variants",
    "window_first_last_frames", "window_range_interval",
    "scalar_hash_functions", "scalar_string_functions2",
    "scalar_date_functions2", "scalar_conditional_functions",
    "scalar_bitwise_ops", "limit_offset_pagination",
    "q13_customer_distribution", "q19_disjunctive_predicate",
    "q22_waiting_customers", "q8_market_share", "q9_product_profit",
    "agg_grouping_sets", "agg_multi_distinct",
)

#: Highest-priority unverified shapes (VERDICT.md round-1 "do this" #1):
#: the six TPC-H queries with no driver row yet, pulled ahead of the other
#: relational leftovers so they fit even a 50-query driver budget together
#: with the streaming + LLM blocks.
_PRIORITY_TPCH: tuple[str, ...] = (
    "q12_shipmode_priority", "q17_small_quantity_revenue",
    "q20_potential_promotion_suppliers", "q21_waiting_multi_supplier",
    "q11_important_stock", "q16_supplier_part_counts",
)


def _rank(item: tuple[str, object]) -> tuple[int, int]:
    name = item[0]
    verified = set(_R01_DRIVER_VERIFIED)
    if name in verified:
        return (3, _R01_DRIVER_VERIFIED.index(name))
    if name in _PRIORITY_TPCH:
        # Ahead of even the streaming/LLM block: these six are individually
        # named in VERDICT.md's round-2 done-criteria and cost ~1 s total,
        # so they must survive any driver budget cut.
        return (-1, _PRIORITY_TPCH.index(name))
    # Unverified: streaming + LLM blocks registered after the relational
    # modules keep their relative order but move ahead of relational
    # leftovers via the tag check below.
    qd = QUERIES[name]
    if any(t in ("streaming", "llm") for t in qd.tags) or name in _STREAMING_LLM:
        return (0, 0)
    return (2, 0)


# Tag metadata is sparse; classify by defining module instead.
_STREAMING_LLM = {
    n for n, qd in QUERIES.items()
    if getattr(qd.fn, "__module__", "").rsplit(".", 1)[-1]
    in ("streaming_ops", "llm_ops")
}

_ordered = sorted(QUERIES.items(), key=_rank)
_snapshot = dict(_ordered)
QUERIES.clear()
QUERIES.update(_snapshot)
