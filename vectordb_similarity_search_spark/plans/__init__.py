"""Named query catalog backing ``__spark_entry__.py``.

Importing this package registers every query module's entries into
``catalog.REGISTRY``.
"""

from . import catalog
from .catalog import REGISTRY, QuerySpec

# Register all query modules (import side-effect fills REGISTRY).
from . import vector_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import event_queries  # noqa: E402,F401
from . import nonsql_queries  # noqa: E402,F401

__all__ = ["catalog", "REGISTRY", "QuerySpec"]
