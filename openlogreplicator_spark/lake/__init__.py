from .catalog import Catalog
from .table import LakeTable

__all__ = ["Catalog", "LakeTable"]
