from .queries import QUERIES, flagship  # noqa: F401
from .oracles import ORACLES  # noqa: F401
from .indicator_parity import INDICATOR_ORACLES
from .text_parity import TEXT_ORACLES
from .embedding_parity import EMBEDDING_ORACLES

ORACLES.update(INDICATOR_ORACLES)
ORACLES.update(TEXT_ORACLES)
ORACLES.update(EMBEDDING_ORACLES)
