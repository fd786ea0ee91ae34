"""Catalog aggregator: importing this module registers every query
family into ``CATALOG`` (see ``registry.py`` for parity conventions)."""

from .registry import CATALOG, QuerySpec, register  # noqa: F401

from . import q_core  # noqa: E402,F401
from . import q_agg  # noqa: E402,F401
from . import q_window  # noqa: E402,F401
from . import q_join  # noqa: E402,F401
from . import q_ml  # noqa: E402,F401
from . import q_ts  # noqa: E402,F401
from . import q_pipeline  # noqa: E402,F401
from . import q_ml2  # noqa: E402,F401
from . import q_anomaly  # noqa: E402,F401
from . import q_anomaly_full  # noqa: E402,F401
from . import q_misc  # noqa: E402,F401
from . import q_lsh  # noqa: E402,F401
from . import q_range  # noqa: E402,F401
from . import q_bands  # noqa: E402,F401
from . import q_enrichment  # noqa: E402,F401
from . import q_composites  # noqa: E402,F401
from . import q_fitness_risk  # noqa: E402,F401
