from . import svd3, elem  # noqa: F401
