"""Query registry: the single source of truth mapping operator names to
(PySpark implementation, DuckDB oracle SQL) pairs.

Driver contract (__spark_entry__.py): every operator claimed as done
needs a ``queries()`` entry, and — unless genuinely not SQL-expressible
— an ``oracle_sql()`` entry whose column names match the Spark output
exactly (the driver sorts columns by name and value-hashes).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable  # (SparkSession, sf_dir: str) -> DataFrame
    oracle: str | None  # DuckDB SQL over pre-registered views, or None (rows-only)
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def _fresh_entry(fn: Callable) -> Callable:
    """Wrap a registered query fn so every TOP-LEVEL invocation starts
    with the session's pins cleared (round 9: closes the cross-query
    CacheManager channel — see operators/_pin.py docstring). Capstones
    invoke component queries through REGISTRY mid-build; the depth
    counter keeps those nested entries from defeating the outer
    query's own midframes. The module-level function name still binds
    the raw fn, so direct Python calls bypass the wrapper entirely."""

    @functools.wraps(fn)
    def wrapped(spark, sf_dir, *args, **kwargs):
        from .operators import _pin

        if _pin._DEPTH == 0:
            _pin.clear_application_pins(spark)
        _pin._DEPTH += 1
        try:
            return fn(spark, sf_dir, *args, **kwargs)
        finally:
            _pin._DEPTH -= 1

    return wrapped


def query(name: str, oracle: str | None = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=_fresh_entry(fn),
            oracle=oracle,
            tags=tuple(tags),
            doc=fn.__doc__ or "",
        )
        return fn

    return deco
