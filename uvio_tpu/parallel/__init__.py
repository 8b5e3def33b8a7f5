from .ba import BAOptions, ba_solve

__all__ = ["BAOptions", "ba_solve"]
