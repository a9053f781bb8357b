"""Query registry: named engine queries with DuckDB oracle twins.

Importing this package populates ``REGISTRY`` from every plan module; the
driver contract (``__spark_entry__.py``) exposes it via ``queries()`` /
``oracle_sql()``.
"""

from .registry import REGISTRY, Query, register

from . import reference  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import llm  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]
