from .banded import banded_distance, batch_banded_distance
from .oracles import ALGORITHMS, distance, transduce_brute_force

__all__ = [
    "ALGORITHMS", "banded_distance", "batch_banded_distance",
    "distance", "transduce_brute_force",
]
