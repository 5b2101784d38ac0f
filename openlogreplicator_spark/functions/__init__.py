from . import decode, dedup, similarity, text

__all__ = ["decode", "dedup", "similarity", "text"]
