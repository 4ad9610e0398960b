"""Operator suite: BM25 scoring paths + training-data pipeline operators."""

from .exhaustive import score_exhaustive  # noqa: F401
from . import (dedup, decontaminate, hybrid, multimodal,  # noqa: F401
               similarity, textstats)
