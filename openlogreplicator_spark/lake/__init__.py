from .table import LakeTable

__all__ = ["LakeTable"]
