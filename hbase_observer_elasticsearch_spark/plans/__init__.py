from .inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_cartesian_or_bnl,
    pushed_filters,
    scan_read_columns,
    wholestage_codegen_ids,
)
