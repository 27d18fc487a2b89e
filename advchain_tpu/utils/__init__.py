"""I/O, random chains, visualization, rand-augment (aux layer L5)."""

from advchain_tpu.utils.io import (check_dir, load_image_label,
                                   rescale_intensity, read_nrrd, read_nifti,
                                   read_medical_image)
from advchain_tpu.utils.chain import random_chain
from advchain_tpu.utils.rand_augment import MyRandAugment, apply_op
from advchain_tpu.utils.profiling import (trace, Timer, benchmark, checked,
                                          start_trace, stop_trace)
from advchain_tpu.utils.checkpoint import (save_checkpoint,
                                           restore_checkpoint,
                                           save_transform_state,
                                           restore_transform_state)

__all__ = [
    "check_dir", "load_image_label", "rescale_intensity",
    "read_nrrd", "read_nifti", "read_medical_image",
    "random_chain", "MyRandAugment", "apply_op",
    "trace", "Timer", "benchmark", "checked", "start_trace", "stop_trace",
    "save_checkpoint", "restore_checkpoint", "save_transform_state",
    "restore_transform_state",
]
