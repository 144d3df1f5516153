from . import rank, search, locate  # noqa: F401
