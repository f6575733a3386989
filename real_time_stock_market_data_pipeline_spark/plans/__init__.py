from .queries import QUERIES, flagship  # noqa: F401
from .oracles import ORACLES  # noqa: F401
from .indicator_parity import INDICATOR_ORACLES

ORACLES.update(INDICATOR_ORACLES)
