"""Plan inspection helpers — assert the physical plan is the one you want
(pushdown reached the scan, small dims broadcast, codegen spans wide)."""

from blink_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)
