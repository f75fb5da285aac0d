"""Operator surface. The reference-parity MAPE API is re-exported at
the top level; the scale extensions (dedup, joins, graph, sampling,
layout) are re-exported here so a user can reach every documented
operator family through one import path. Heavier families with many
entry points (text, similarity, pq/ivf, streaming) stay one module
deep — import them explicitly."""

from mape_calculation_and_anonymization_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from mape_calculation_and_anonymization_spark.operators.graph import (
    connected_components,
    cooccurrence_edges,
    duplicate_clusters,
    pagerank,
)
from mape_calculation_and_anonymization_spark.operators.joins import (
    asof_join,
    auto_salted_join,
    choose_salt,
    key_skew_stats,
    salted_aggregate,
    salted_join,
)
from mape_calculation_and_anonymization_spark.operators.layout import (
    zorder_write,
    zorder_write_auto,
)
from mape_calculation_and_anonymization_spark.operators.mape import (
    COLUMN_MAPPINGS,
    MapeCalculation,
    daily_mape_aggregation,
    hourly_aggregation,
)
from mape_calculation_and_anonymization_spark.operators.sampling import (
    hash_sample_predicate,
    hash_split,
    stratified_sample,
)

__all__ = [
    "COLUMN_MAPPINGS",
    "MapeCalculation",
    "hourly_aggregation",
    "daily_mape_aggregation",
    "exact_dedup",
    "exact_dedup_groups",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "connected_components",
    "cooccurrence_edges",
    "duplicate_clusters",
    "pagerank",
    "asof_join",
    "auto_salted_join",
    "choose_salt",
    "key_skew_stats",
    "salted_aggregate",
    "salted_join",
    "zorder_write",
    "zorder_write_auto",
    "hash_sample_predicate",
    "hash_split",
    "stratified_sample",
]
