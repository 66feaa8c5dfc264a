"""Query catalog: importing this package populates the registry."""

from .catalog import REGISTRY, QuerySpec, oracle_sql, queries, query

# Import side effects: each module registers its queries.
from . import core  # noqa: E402,F401
from . import quality_q  # noqa: E402,F401
from . import reconcile_q  # noqa: E402,F401
from . import dwh_q  # noqa: E402,F401
from . import textops_q  # noqa: E402,F401
from . import dedup_q  # noqa: E402,F401
from . import similarity_q  # noqa: E402,F401
from . import events_q  # noqa: E402,F401
from . import entities_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import corpus_q  # noqa: E402,F401
from . import skew_q  # noqa: E402,F401
from . import tpch_q  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query", "queries", "oracle_sql"]
