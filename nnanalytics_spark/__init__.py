"""nnanalytics_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of paypal/NNAnalytics.

The reference engine (see /root/reference, SURVEY.md) answers one family of
questions — filter / aggregate / histogram / top-k over a single wide
metadata table — through a tiny logical query tuple:

    (set, [field:op:value ...], type, sum|find, having, top/bottom, sort,
     parentDirDepth, timeRange, transforms, limit)

This package re-expresses that tuple as a declarative PySpark plan
(``nnanalytics_spark.core.ir.Query`` → DataFrame) so Catalyst handles
pushdown, pruning, codegen and shuffle planning, and adds the
large-scale-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference lacks.
"""

from nnanalytics_spark.core.ir import Query
from nnanalytics_spark.session import get_spark

__all__ = ["Query", "get_spark"]
__version__ = "0.1.0"
