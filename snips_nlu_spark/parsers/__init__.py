from .lookup import LookupIntentParser  # noqa: F401
from .deterministic import DeterministicIntentParser  # noqa: F401
from .probabilistic import ProbabilisticIntentParser  # noqa: F401
