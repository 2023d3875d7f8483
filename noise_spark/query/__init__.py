from . import plan  # noqa: F401
from .engine import IndexReader  # noqa: F401
