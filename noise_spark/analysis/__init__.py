from .tokenizer import analyze, stems, whitespace_terms  # noqa: F401
from . import porter2  # noqa: F401
