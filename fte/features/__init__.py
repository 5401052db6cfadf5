from fte.features.library import build_default_registry

__all__ = ["build_default_registry"]
