"""Query-plan registry. Importing this package registers every operator's
query + oracle pair; ``__spark_entry__.py`` exposes them to the driver."""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# Import operator modules for their registration side effects.
from ..operators import (  # noqa: F401,E402
    relational,
    relational2,
    relational3,
    recommend,
    retrieval,
    windows,
    asof,
    dedup,
    similarity,
    sketches,
    textstats,
    multimodal,
    mlprep,
)
from ..ps import queries as ps_queries  # noqa: F401,E402
from ..sources import formats as source_formats  # noqa: F401,E402
from ..streaming import queries as streaming_queries  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "register"]
