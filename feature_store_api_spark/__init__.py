"""feature_store_api_spark — a PySpark-native feature-store analytics engine.

Brand-new implementation of the query and data-processing capabilities
of logicalclocks/feature-store-api (reference read-only at
/root/reference), re-expressed Spark-first: logical Query IR compiled
locally to DataFrame operations, Catalyst-optimized, with a parquet
commit-log store for time travel and Structured Streaming for streams.
"""

from .embedding import EmbeddingFeature, EmbeddingIndex, SimilarityFunctionType
from .feature import Feature
from .feature_group import (
    ExternalFeatureGroup,
    FeatureGroup,
    FeatureGroupWriter,
    SpineGroup,
)
from .feature_store import FeatureStore, testdata_catalog
from .feature_view import FeatureView
from .functions.udf import TransformationStatistics, udf
from .operators.statistics import StatisticsConfig
from .provenance import Artifact, Links
from .session import get_spark

__all__ = [
    "Feature",
    "EmbeddingFeature",
    "EmbeddingIndex",
    "SimilarityFunctionType",
    "FeatureGroup",
    "FeatureGroupWriter",
    "ExternalFeatureGroup",
    "SpineGroup",
    "FeatureStore",
    "FeatureView",
    "TransformationStatistics",
    "StatisticsConfig",
    "Artifact",
    "Links",
    "udf",
    "testdata_catalog",
    "get_spark",
]

__version__ = "0.1.0"
