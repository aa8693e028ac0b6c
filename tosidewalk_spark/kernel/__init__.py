from . import cells, geom  # noqa: F401
