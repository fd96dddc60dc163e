"""liblevenshtein_spark — a from-scratch PySpark-native record-linkage /
fuzzy-matching engine with the query semantics of
universal-automata/liblevenshtein (Levenshtein-automaton transducer:
dictionary + query term + max distance -> all terms within n edits, exact
distances, three algorithm variants), re-expressed as blocking-key hash
joins + vectorized banded edit-distance kernels + connected-components
clustering over conversation-transcript tables."""

from .config import ALGORITHMS, FINGERPRINT_SEP, LinkConfig

__version__ = "0.1.0"
__all__ = ["ALGORITHMS", "FINGERPRINT_SEP", "LinkConfig"]
