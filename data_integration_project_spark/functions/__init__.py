from . import cleaning, dates  # noqa: F401
