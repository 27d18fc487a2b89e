"""I/O, random chains, visualization, rand-augment (aux layer L5)."""

from advchain_tpu.utils.io import (check_dir, load_image_label,
                                   rescale_intensity, read_nrrd, read_nifti,
                                   read_medical_image)
from advchain_tpu.utils.chain import random_chain
from advchain_tpu.utils.rand_augment import MyRandAugment, apply_op

__all__ = [
    "check_dir", "load_image_label", "rescale_intensity",
    "read_nrrd", "read_nifti", "read_medical_image",
    "random_chain", "MyRandAugment", "apply_op",
]
