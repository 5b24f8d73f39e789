from . import io  # noqa: F401
from .cache import enable_compilation_cache  # noqa: F401
