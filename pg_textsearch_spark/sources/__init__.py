from .corpus import synth_source_corpus
from .loader import load_source_table

__all__ = ["synth_source_corpus", "load_source_table"]
