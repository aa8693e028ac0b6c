from . import sqlfns  # noqa: F401
