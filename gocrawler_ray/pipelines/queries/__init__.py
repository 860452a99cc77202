"""The 350-query catalog, split by family (round-4 verdict #7).

Importing this package is equivalent to the old single-module
``pipelines/queries.py``: every query callable and helper is
re-exported here, so ``from ..pipelines import queries`` and the
``__ray_entry__`` registry are unchanged.
"""
from ._core import *  # noqa: F401,F403
from .crawl import *  # noqa: F401,F403
from .dedup import *  # noqa: F401,F403
from .similarity import *  # noqa: F401,F403
from .text import *  # noqa: F401,F403
from .sampling import *  # noqa: F401,F403
from .graph import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .temporal import *  # noqa: F401,F403
from .stats import *  # noqa: F401,F403
