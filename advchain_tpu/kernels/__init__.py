"""Pallas TPU kernels for the hot ops (perf path; XLA compositions remain
the reference/fallback implementation)."""

from advchain_tpu.kernels.gather_matmul import (band_gather,
                                                band_scatter,
                                                corner_gather,
                                                corner_scatter,
                                                grid_sample_2d_pallas,
                                                grid_sample_2d_pallas_nearest,
                                                grid_sample_3d_pallas,
                                                grid_sample_3d_pallas_nearest,
                                                plane_gather,
                                                plane_scatter)

__all__ = ["band_gather", "band_scatter", "corner_gather", "corner_scatter",
           "grid_sample_2d_pallas", "grid_sample_2d_pallas_nearest",
           "grid_sample_3d_pallas", "grid_sample_3d_pallas_nearest",
           "plane_gather", "plane_scatter"]
