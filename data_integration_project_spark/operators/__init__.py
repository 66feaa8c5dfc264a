from . import dedup, dwh, multimodal, quality, reconcile, similarity  # noqa: F401
