from .gazetteer import GazetteerParser  # noqa: F401
from .builtin import BuiltinEntityParser, BUILTIN_KINDS, is_builtin_entity  # noqa: F401
