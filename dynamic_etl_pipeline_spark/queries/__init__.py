"""Driver-facing query catalog. Importing this package registers every
query module into ``QUERIES`` / ``ORACLES`` (see registry.py)."""

from .registry import BASELINES, ORACLES, QUERIES, query  # noqa: F401

# Importing registers the @query-decorated callables.
from . import relational  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import northstar  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import mutations  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import features  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
