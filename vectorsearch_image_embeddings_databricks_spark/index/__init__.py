from .catalog import IndexCatalog  # noqa: F401
from .graph_ann import KNNGraphIndex  # noqa: F401
from .vector_index import VectorIndex  # noqa: F401
