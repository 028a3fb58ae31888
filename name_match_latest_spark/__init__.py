"""name_match_latest_spark — a from-scratch PySpark-native record-linkage engine.

Reproduces the query semantics of the reference Rust application
(Kirachon/name_match_latest) re-architected for Spark DataFrames:
blocking-key candidate generation (equi-joins), a vectorized pairwise
scoring cascade (exact -> Levenshtein -> Jaro-Winkler -> Double
Metaphone with early-exit thresholds), household aggregation, the
L1-L11 cascade workflow, transitive clustering via connected
components, and per-partition lineage/checkpoint-resume — designed for
1000-executor clusters over web-scale tables.
"""

__version__ = "0.1.0"
