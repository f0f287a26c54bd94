"""Operator modules. Importing this package populates the registry.

Each module maps to a SURVEY.md §2 family:
    relational   — §2.2 filters/projections, §2.4 core aggregation,
                   §2.3 inner joins, §2.6 sort/limit/top-k (headline set)
"""

from . import relational  # noqa: F401
