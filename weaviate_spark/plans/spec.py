"""Query IR mirroring weaviate's dto.GetParams (entities/dto/dto.go:49-71).

A GetSpec is the declarative description of one Get-style query; the
compiler (plans/compile.py) lowers it to a DataFrame expression tree in the
reference's fixed stage order (usecases/traverser/explorer.go:135-353):

    filter -> search legs (bm25 / near / hybrid) -> fusion -> sort ->
    cursor/offset/limit -> group -> projection

Server caps come from usecases/config/environment.go:1896-1897 and
config_handler.go:885-888.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from weaviate_spark.filters import Clause

QUERY_MAXIMUM_RESULTS = 10_000      # QueryMaximumResults default
QUERY_HYBRID_MAXIMUM_RESULTS = 100  # QueryHybridMaximumResults default
DEFAULT_LIMIT = 100                 # GraphQL default limit


@dataclass
class SortKey:
    """entities/filters/sort.go:15-45: {path, order}."""

    path: Sequence[str]
    order: str = "asc"  # "asc" | "desc"


@dataclass
class NearVector:
    """entities/searchparams/retrieval.go:33-39."""

    vector: Sequence[float]
    distance: Optional[float] = None   # max distance cutoff
    certainty: Optional[float] = None  # cosine-only: dist = (1-certainty)*2
    target_vector: Optional[str] = None
    metric: str = "cosine"


@dataclass
class BM25:
    """entities/searchparams/retrieval.go KeywordRanking."""

    query: str
    properties: Sequence[str] = ()     # optional "prop^boost" entries
    search_operator: str = "Or"        # Or | And
    minimum_or_tokens_match: int = 0


@dataclass
class Hybrid:
    """usecases/traverser/hybrid/searcher.go:75-153."""

    query: str = ""
    vector: Optional[Sequence[float]] = None
    alpha: float = 0.75
    fusion: str = "relativeScore"      # "ranked" (RRF) | "relativeScore"
    properties: Sequence[str] = ()
    max_vector_distance: Optional[float] = None


@dataclass
class GetSpec:
    collection: str
    where: Optional[Clause] = None
    near_vector: Optional[NearVector] = None
    bm25: Optional[BM25] = None
    hybrid: Optional[Hybrid] = None
    sort: Sequence[SortKey] = field(default_factory=list)
    limit: Optional[int] = None
    offset: int = 0
    after: Optional[str] = None        # cursor: exclusive _id keyset
    select: Sequence[str] = ()         # projection; empty = all
    autocut: int = 0
    extra: dict[str, Any] = field(default_factory=dict)
