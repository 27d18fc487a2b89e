"""advchain_tpu — TPU-native adversarial data augmentation for medical image
segmentation (JAX / XLA / Pallas), a from-scratch rebuild of the
capabilities of cherise215/advchain.

Layers (mirrors SURVEY.md section 1 of the reference analysis):
  ops/        numeric primitives (grid sample, B-spline, Gaussian, flows)
  kernels/    Pallas TPU kernels for the hot paths
  augmentor/  the four transforms + the compose solver
  losses/     consistency divergences (mse / kl / contour), CE
  models/     Flax UNet family + torch checkpoint converter
  parallel/   mesh/data-parallel training-step builders (pjit/shard_map)
  utils/      IO, random chains, vis, rand-augment
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports so `import advchain_tpu.ops` works before the
    # augmentor layer is imported (and to keep import time low)
    _augmentor_names = {
        "AdvNoise", "AdvBias", "AdvAffine", "AdvMorph",
        "ComposeAdversarialTransformSolver",
    }
    if name in _augmentor_names:
        import advchain_tpu.augmentor as _aug
        return getattr(_aug, name)
    raise AttributeError(f"module 'advchain_tpu' has no attribute {name!r}")
