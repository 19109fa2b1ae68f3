"""Query library exposed through __spark_entry__.py.

Importing the submodules populates the registry (one entry per operator
family from SURVEY.md section 2, plus the large-scale training-data
extensions).
"""

from .registry import ORACLE, QUERIES, load_table, register  # noqa: F401
from . import core  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
