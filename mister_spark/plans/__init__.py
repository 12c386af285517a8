from mister_spark.plans.inspect import (
    count_shuffles,
    count_unpartitioned_windows,
    formatted_plan,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)

__all__ = [
    "count_shuffles",
    "count_unpartitioned_windows",
    "formatted_plan",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
]
