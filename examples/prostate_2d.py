"""Prostate 2D adversarial augmentation with anatomy(volume)-preserving
constrained search — port of the reference notebook
example/adv_chain_data_generation_prostate.ipynb.

The reference repo ships only the prostate segmentation (img.nrrd is a
missing large blob), so the image defaults to a synthetic prostate-like
phantom built from the real segmentation; pass --image to use a real one.

Demonstrates: custom padding mode ("lowest"), if_norm_image, the anatomy
mask constraint with graduated fallback, and the full training-iteration
recipe from notebook cell 18 (sup CE + weighted consistency loss).

Usage: python examples/prostate_2d.py [--out OUT.png]
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph, AdvNoise,
                                    ComposeAdversarialTransformSolver)
from advchain_tpu.losses import cross_entropy_2d
from advchain_tpu.models import get_unet_model
from advchain_tpu.utils import load_image_label, read_medical_image

SEG = "/root/reference/example/data/prostate/seg.nrrd"
CKPT = "/root/reference/example/saved_checkpoints/prostate_seg_unet_16.pth"


def synth_image_from_seg(seg, seed=0):
    """Prostate-like intensities from label geometry (img.nrrd not shipped)."""
    r = np.random.RandomState(seed)
    img = 0.2 + 0.25 * (seg > 0) + 0.3 * (seg > 1)
    img = img + 0.05 * r.rand(*seg.shape)
    return img.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/prostate_2d_advchain.png")
    ap.add_argument("--image", default=None,
                    help="path to a real prostate image NRRD")
    ap.add_argument("--slice-id", type=int, default=8)
    args = ap.parse_args()

    crop = (192, 192)
    if args.image:
        img, seg = load_image_label(args.image, SEG, slice_id=args.slice_id,
                                    crop_size=crop)
    else:
        seg_vol = read_medical_image(SEG)
        seg_full = seg_vol[args.slice_id]
        h0 = (seg_full.shape[0] - crop[0]) // 2
        w0 = (seg_full.shape[1] - crop[1]) // 2
        seg = seg_full[h0:h0 + crop[0], w0:w0 + crop[1]]
        img = synth_image_from_seg(seg)
    x = jnp.asarray(img[None, None].astype(np.float32))
    label = jnp.asarray(seg[None].astype(np.int32))
    anatomy_mask = jnp.asarray((seg > 0)[None, None].astype(np.float32))
    size = (1, 1, *crop)

    chain = [
        AdvNoise(config_dict={"epsilon": 1, "xi": 1e-6, "data_size": size}),
        AdvBias(config_dict={"epsilon": 0.3,
                             "control_point_spacing": [144, 144],
                             "downscale": 3, "data_size": size,
                             "interpolation_order": 3,
                             "init_mode": "random", "space": "log"}),
        AdvMorph(config_dict={"epsilon": 1.5, "data_size": size,
                              "vector_size": [12, 12]},
                 image_padding_mode="lowest"),
        AdvAffine(config_dict={"rot": 30 / 180, "scale_x": 0.2,
                               "scale_y": 0.2, "shift_x": 0.1,
                               "shift_y": 0.1, "data_size": size},
                  image_padding_mode="lowest"),
    ]
    model = get_unet_model(CKPT, num_classes=3, model_arch="UNet_16")
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5], if_norm_image=True, debug=True)

    # anatomy(volume)-preserving adversarial search (notebook + README
    # "anatomy preserving" workflow)
    reg_loss = solver.adversarial_training(
        data=x, model=model, n_iter=1,
        optimize_flags=[True] * len(chain),
        anatomy_mask_images=anatomy_mask,
        anatomy_reg_weight=50, volume_preserve_tolerance=5e-4)
    print("anatomy-constrained consistency loss:", float(reg_loss))

    # one full training iteration (notebook cell 18 recipe)
    init_output = solver.get_init_output(model, x)
    sup = cross_entropy_2d(init_output, label)
    total = sup + 1.0 * reg_loss
    print(f"supervised CE: {float(sup):.4f}  total: {float(total):.4f}")
    solver.reset_transformation()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 4, figsize=(14, 4))
    for ax, (im, title) in zip(axes, [
            (img, "input"),
            (seg, "label"),
            (np.asarray(solver.adv_data)[0, 0], "adversarial aug"),
            (np.asarray(solver.warped_back_adv_output).argmax(1)[0],
             "adv predict (warped back)")]):
        ax.imshow(im, cmap="gray")
        ax.set_title(title)
        ax.set_axis_off()
    plt.tight_layout()
    fig.savefig(args.out, dpi=80)
    print("figure saved to", args.out)


if __name__ == "__main__":
    main()
