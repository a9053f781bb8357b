"""Query registry: named engine queries with DuckDB oracle twins.

Importing this package populates ``REGISTRY`` from every plan module; the
driver contract (``__spark_entry__.py``) exposes it via ``queries()`` /
``oracle_sql()``.
"""

from .registry import REGISTRY, Query, register

# Import order = REGISTRY order = the order the driver's correctness gate
# walks queries (it records the first ~50). Modules whose queries have never
# appeared in a recorded artifact go first: reference (flagship), then the
# LLM-pipeline family (dedup/similarity/text/multimodal — unrecorded in
# rounds 1-2 because they sorted last), then events, then TPC-H (fully green
# in CORRECTNESS_r01/r02, so its tail is the safe part to fall past the cap).
from . import reference  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import tpch  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]
