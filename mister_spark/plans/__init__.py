from mister_spark.plans.inspect import (
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)

__all__ = [
    "count_shuffles",
    "formatted_plan",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
]
