"""butteraugli_ray — a Ray-Data-native schema + constraint validation engine.

The perceptual predicate (a from-scratch numpy reimplementation of the
butteraugli metric, semantics per imazen/butteraugli v0.9.4) runs inside
Ray Data ``map_batches`` stages over Arrow tables of interleaved
text+media documents.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
