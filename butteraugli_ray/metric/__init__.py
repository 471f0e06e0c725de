from .api import ButteraugliParams, ButteraugliResult, butteraugli_srgb, score_pair
from .precompute import ReferencePrecompute

__all__ = [
    "ButteraugliParams",
    "ButteraugliResult",
    "butteraugli_srgb",
    "score_pair",
    "ReferencePrecompute",
]
