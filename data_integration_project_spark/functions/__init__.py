from . import cleaning, dates, text, vectors  # noqa: F401
