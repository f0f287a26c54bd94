"""Query registry: the single source of truth mapping operator names to
(PySpark implementation, DuckDB oracle SQL) pairs.

Driver contract (__spark_entry__.py): every operator claimed as done
needs a ``queries()`` entry, and — unless genuinely not SQL-expressible
— an ``oracle_sql()`` entry whose column names match the Spark output
exactly (the driver sorts columns by name and value-hashes).
"""

from __future__ import annotations

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


def query(name: str, oracle: str | None = None, tags: tuple = ()):  # decorator
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco
