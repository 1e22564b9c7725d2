"""CPU stand-in for the chamferdist wheel's CUDA extension (reference
utils/chamfer.py:12 `from chamferdist import _C`). Only the `_C` submodule is
consumed; see _C.py for the contract."""

from . import _C  # noqa: F401
