"""social_warner_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference ETL (`martinfernandezsanchez/social-warner`, a pandas-based
ListenFirst→BigQuery Cloud Function; see /root/repo/SURVEY.md), and extends
them with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design principles (100 TB posture):
- DataFrame/SQL API everywhere; Catalyst owns the physical plan.
- No driver-side collect in the hot path (the only bounded exceptions are
  dynamic-pivot key discovery and top-k result retrieval).
- Broadcast small dimensions, partial aggregation, AQE on, Arrow on.
- Python only through vectorized pandas UDFs, never row-at-a-time.
"""

from social_warner_spark.session import get_spark
from social_warner_spark.catalog import load_table, register_views

__all__ = ["get_spark", "load_table", "register_views"]
__version__ = "0.1.0"
