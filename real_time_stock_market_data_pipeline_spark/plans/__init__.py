from .queries import QUERIES, flagship  # noqa: F401
from .oracles import ORACLES  # noqa: F401
