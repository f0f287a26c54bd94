from .explain import (  # noqa: F401
    count_exchanges,
    count_keyless_windows,
    count_keyless_windows_in,
    count_scans,
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    read_schema_columns,
)
