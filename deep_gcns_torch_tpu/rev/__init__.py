from .coupling import GroupAdditiveCoupling
from .invertible import make_reversible_scan

__all__ = ["GroupAdditiveCoupling", "make_reversible_scan"]
