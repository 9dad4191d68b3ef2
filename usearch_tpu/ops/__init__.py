from . import casts, distances, packbits, topk  # noqa: F401
