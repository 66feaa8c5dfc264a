from . import quality  # noqa: F401
