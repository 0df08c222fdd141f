"""Embedding-index metadata for similarity search.

Parity: ``/root/reference/python/hsfs/embedding.py:31-143,234-330``
(``SimilarityFunctionType``, ``EmbeddingFeature``, ``EmbeddingIndex``).
The reference attaches these to a feature group so ``find_neighbors``
knows which column to search and under which similarity function (its
backend is an OpenSearch kNN index); here the same metadata drives the
engine's own brute-force / LSH / IVF search operators.
"""

from __future__ import annotations

from typing import Dict, List, Optional


class SimilarityFunctionType:
    """Similarity function names (parity ``embedding.py:31-43``)."""

    L2 = "l2_norm"
    COSINE = "cosine"
    DOT_PRODUCT = "dot_product"

    # mapping onto the engine's distance_expr metric names
    _METRIC = {L2: "l2", COSINE: "cosine", DOT_PRODUCT: "dot"}

    def __init__(self) -> None:
        raise NotImplementedError("This class should not be instantiated.")


class EmbeddingFeature:
    """A vector column declaration (parity ``embedding.py:114-143``)."""

    def __init__(
        self,
        name: str,
        dimension: int,
        similarity_function_type: str = SimilarityFunctionType.L2,
        model=None,
    ) -> None:
        if similarity_function_type not in SimilarityFunctionType._METRIC:
            raise ValueError(
                f"Unknown similarity function {similarity_function_type!r}; "
                f"expected one of {sorted(SimilarityFunctionType._METRIC)}"
            )
        self.name = name
        self.dimension = int(dimension)
        self.similarity_function_type = similarity_function_type
        #: optional registry Model that PRODUCES this embedding column
        #: (reference embedding.py model/get_model provenance)
        self.model = model

    def get_model(self):
        """The registry model this embedding column came from, or None
        (parity ``embedding.py`` ``get_model``/``model``)."""
        return self.model

    @property
    def metric(self) -> str:
        return SimilarityFunctionType._METRIC[self.similarity_function_type]

    def to_dict(self) -> Dict:
        return {
            "name": self.name,
            "dimension": self.dimension,
            "similarity_function_type": self.similarity_function_type,
        }

    @classmethod
    def from_dict(cls, d: Dict) -> "EmbeddingFeature":
        return cls(
            d["name"], d["dimension"],
            d.get("similarity_function_type", SimilarityFunctionType.L2),
        )


class EmbeddingIndex:
    """The set of vector columns a feature group is searchable on
    (parity ``embedding.py:234-330``)."""

    def __init__(
        self,
        index_name: Optional[str] = None,
        features: Optional[List[EmbeddingFeature]] = None,
    ) -> None:
        self.index_name = index_name
        self._features: Dict[str, EmbeddingFeature] = {
            f.name: f for f in (features or [])
        }

    def add_embedding(
        self,
        name: str,
        dimension: int,
        similarity_function_type: str = SimilarityFunctionType.L2,
        model=None,
    ) -> None:
        """Parity ``embedding.py`` ``add_embedding``."""
        self._features[name] = EmbeddingFeature(
            name, dimension, similarity_function_type, model=model
        )

    def count(self, spark, feature_group) -> int:
        """Number of vectors in the index — the reference's
        ``embedding.py count`` (vector_db_client.count twin): rows of
        the bound feature group's current snapshot."""
        from .operators.similarity import index_count

        return index_count(feature_group.read(spark))

    def get_embedding(self, name: str) -> Optional[EmbeddingFeature]:
        return self._features.get(name)

    def get_embeddings(self) -> List[EmbeddingFeature]:
        return list(self._features.values())

    def to_dict(self) -> Dict:
        return {
            "index_name": self.index_name,
            "features": [f.to_dict() for f in self._features.values()],
        }

    @classmethod
    def from_dict(cls, d: Optional[Dict]) -> Optional["EmbeddingIndex"]:
        if d is None:
            return None
        return cls(
            d.get("index_name"),
            [EmbeddingFeature.from_dict(f) for f in d.get("features", [])],
        )
