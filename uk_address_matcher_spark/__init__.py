"""uk_address_matcher_spark — a PySpark-native UK address matching engine.

A from-scratch reimplementation of the *computation* of
RobinL/uk_address_matcher (reference at /root/reference, a DuckDB+Splink
pipeline) on idiomatic Spark: DataFrame API, broadcast/salted hash joins,
window functions, higher-order array/map expressions, and vectorized
pandas UDFs. It is NOT a port — the execution strategy is designed for
Catalyst/Tungsten and multi-executor clusters at very large scale.

Pipeline: interleaved-document extraction -> cleaning/canonicalisation ->
multi-rule blocking -> Fellegi-Sunter pairwise scoring (TF-adjusted) ->
distinguishing-token rescoring -> best-match selection / transitive
clustering -> label evaluation (pairwise F1).
"""

__version__ = "0.1.0"

from uk_address_matcher_spark.session import get_spark  # noqa: F401
