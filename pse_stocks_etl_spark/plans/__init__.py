"""Query plans: importing this package populates the registry."""

from . import core_queries  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401

try:  # LLM-data-pipeline extension queries (documents / embeddings tables)
    from . import llm_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # rows-only pipeline queries (multimodal / streaming / sync engine)
    from . import pipeline_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # extension queries (as-of join, approx/percentile aggs, windows)
    from . import ext_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass

try:  # corpus-prep queries (repetition, contamination, packing, TF-IDF)
    from . import corpus_queries  # noqa: F401
except ImportError:  # pragma: no cover - partial checkouts
    pass
