"""Cardiac 3D (beta) adversarial augmentation — port of the reference
notebook's 3D section (cells 25-28): whole-volume transforms with a pseudo
Conv3d segmentation model (the reference's own 3D demo uses a tiny
random-init net, not a trained one).

Usage: python examples/cardiac_3d.py [--out OUT.png]
"""

import argparse

import numpy as np

import jax.numpy as jnp

from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph, AdvNoise,
                                    ComposeAdversarialTransformSolver)
from advchain_tpu.models import PseudoConv3dModel, SegmentationModel
from advchain_tpu.utils import load_image_label

DATA = "/root/reference/example/data/cardiac/img.nrrd"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cardiac_3d_advchain.png")
    ap.add_argument("--crop", type=int, default=128)
    args = ap.parse_args()

    crop = (args.crop, args.crop)
    vol = load_image_label(DATA, slice_id=-1, crop_size=crop)  # (D, H, W)
    d = vol.shape[0]
    # NCDHW
    x = jnp.asarray(vol[None, None].astype(np.float32))
    size = (1, 1, d, crop[0], crop[1])

    downscale = 4
    chain = [
        AdvNoise(spatial_dims=3,
                 config_dict={"epsilon": 1, "xi": 1e-6, "data_size": size}),
        AdvBias(spatial_dims=3, config_dict={
            "epsilon": 0.3,
            "control_point_spacing": [d * downscale // 2, crop[0] // 2,
                                      crop[1] // 2],
            "downscale": downscale, "data_size": size,
            "interpolation_order": 3, "init_mode": "random",
            "space": "log"}),
        AdvMorph(spatial_dims=3, config_dict={
            "epsilon": 1.5, "data_size": size,
            "vector_size": [max(d // 8, 2), crop[0] // 16, crop[1] // 16]}),
        AdvAffine(spatial_dims=3, config_dict={
            "rot_x": 0.0, "rot_y": 0.0, "rot_z": 15 / 180,
            "scale_x": 0.1, "scale_y": 0.1, "scale_z": 0.0,
            "shift_x": 0.05, "shift_y": 0.05, "shift_z": 0.0,
            "data_size": size}),
    ]
    model = SegmentationModel.create(PseudoConv3dModel(num_classes=4), size)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse"],
        divergence_weights=[1.0], debug=True)

    solver.init_random_transformation()
    rand = solver.forward(x)
    loss = solver.adversarial_training(data=x, model=model, n_iter=1,
                                       lazy_load=True)
    print("3D adversarial consistency loss:", float(loss))
    adv = solver.adv_data

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    mid = d // 2
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (im, title) in zip(axes, [
            (vol[mid], "input (mid slice)"),
            (np.asarray(rand)[0, 0, mid], "random aug"),
            (np.asarray(adv)[0, 0, mid], "adversarial aug")]):
        ax.imshow(im, cmap="gray")
        ax.set_title(title)
        ax.set_axis_off()
    plt.tight_layout()
    fig.savefig(args.out, dpi=80)
    print("figure saved to", args.out)


if __name__ == "__main__":
    main()
