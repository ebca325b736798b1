"""The judge-checked query surface.

Every implemented operator from SURVEY.md §2 (and its §2.12 gap table) gets
a named query here, paired where possible with an equivalent DuckDB oracle
SQL. Importing this package populates the registry.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# import for registration side effects
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import setops_json  # noqa: E402,F401
from . import etl_semantics  # noqa: E402,F401
from . import llm_data  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
from . import scale_queries  # noqa: E402,F401
