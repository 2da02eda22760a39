from .checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    explain_summary,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "explain_summary",
    "physical_plan",
]
