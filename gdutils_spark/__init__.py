"""gdutils_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kerfoot/gdutils, rebuilt Spark-first.

The reference is an eager single-threaded pandas HTTP client; this engine
re-expresses its entire operator surface (SURVEY.md §2) as lazy Catalyst
plans over partitioned sources, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"

from gdutils_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
