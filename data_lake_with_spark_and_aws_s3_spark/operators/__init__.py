"""Operator modules. Importing this package populates the registry.

Each module maps to a SURVEY.md §2 family:
    relational   — §2.2 filters/projections, §2.4 core aggregation,
                   §2.3 inner joins, §2.6 sort/limit/top-k (headline set)
    joins        — §2.3 outer/semi/anti/cross/theta/range/as-of
    aggregates   — §2.4 rollup/cube/grouping sets/filtered/collect/stats
    windows      — §2.5 ranking/analytic/frames
    setops       — §2.7 union/intersect/except
    scalars      — §2.8 string/date/json/conditional/math
    dedup        — §2.4/§2.10 exact dedup + latest-per-key
"""

from . import (  # noqa: F401
    affinity,
    aggregates,
    analytics,
    cdc,
    classify,
    clustering,
    combined,
    communities,
    corpus,
    curation,
    dataloader,
    dedup,
    density,
    estimation,
    events,
    funnels,
    fuzzy,
    graph,
    insights,
    joins,
    layout,
    llm_pipeline,
    markov,
    ml_parity,
    modern,
    multimodal,
    neardup,
    olap_design,
    pagerank,
    pca,
    pivots,
    quality,
    ranking,
    relational,
    relational2,
    retrieval,
    sampling,
    scalars,
    scan_efficiency,
    scalars2,
    sinks,
    sketches,
    sorts,
    stats,
    testing,
    testing2,
    timeseries,
    tpch_more,
    tpch_rest,
    tpch_subqueries,
    setops,
    valuation,
    similarity,
    skew,
    text,
    trend,
    windows,
)

# events.py's streaming CMS twin shares the batch operator's oracle,
# which registers later in the alphabetical import — bind it now
events._bind_scms_oracle()

# imported LAST: composes queries registered above
from . import capstones  # noqa: F401, E402
