from kgeng.queries.corpus import QUERIES  # noqa: F401
from kgeng.queries.oracles import ORACLES  # noqa: F401
