"""Leaf SQL-expression helpers shared across operator modules.

Import-order-safe: this module imports NOTHING from the operators
package, so any module (whatever its position in __init__'s import
list) can use these at decoration time without creating a cycle.
"""

from __future__ import annotations

_HEX = "0123456789abcdef"


def _hex_val_sql(h: str, n_digits: int = 4) -> str:
    """Expression string valid in BOTH Spark SQL and DuckDB (instr /
    substr share argument order across the two dialects). The
    accumulator starts as a BIGINT cast so chains past 7 hex digits
    don't overflow INT32 under Spark's ANSI mode."""
    expr = "CAST(0 AS BIGINT)"
    for i in range(n_digits):
        expr = f"(({expr}) * 16 + instr('{_HEX}', substr({h}, {i + 1}, 1)) - 1)"
    return expr
