from . import dwh, quality, reconcile  # noqa: F401
