"""docinsight_ray — Ray-Data-native inverted-index + BM25 engine.

From-scratch rebuild of the data-processing capabilities of
VedantKothari01/DocInsight (surveyed in SURVEY.md) around a real
fulltext retrieval core on ray.data.Dataset pipelines.
"""

from .config import DEFAULT_CONFIG, SQL_PARITY_CONFIG, EngineConfig

__all__ = ["EngineConfig", "DEFAULT_CONFIG", "SQL_PARITY_CONFIG"]
