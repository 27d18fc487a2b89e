"""Adversarial transforms + compose solver (TPU-native augmentor layer)."""

from advchain_tpu.augmentor.base import AdvTransformBase
from advchain_tpu.augmentor.noise import AdvNoise
from advchain_tpu.augmentor.bias import AdvBias
from advchain_tpu.augmentor.affine import AdvAffine
from advchain_tpu.augmentor.morph import AdvMorph

__all__ = ["AdvTransformBase", "AdvNoise", "AdvBias", "AdvAffine", "AdvMorph"]

try:  # solver imports losses; keep transform-only imports working standalone
    from advchain_tpu.augmentor.compose import ComposeAdversarialTransformSolver
    __all__.append("ComposeAdversarialTransformSolver")
except ImportError:  # pragma: no cover
    pass
