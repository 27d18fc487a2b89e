"""Cardiac 2D adversarial data generation — runnable port of the reference
notebook example/adv_chain_data_generation_cardiac_2D_3D.ipynb (cells 7-22).

Loads the cardiac NRRD, the trained UNet_16 checkpoint, builds the
4-transform chain (noise -> bias -> morph -> affine), runs random and
adversarial augmentation, a random sub-chain, and saves a comparison figure.

Usage: python examples/cardiac_2d.py [--out OUT.png] [--n-iter 1]
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from advchain_tpu.augmentor import (AdvAffine, AdvBias, AdvMorph, AdvNoise,
                                    ComposeAdversarialTransformSolver)
from advchain_tpu.models import get_unet_model
from advchain_tpu.utils import load_image_label, random_chain

DATA = "/root/reference/example/data/cardiac/img.nrrd"
CKPT = "/root/reference/example/saved_checkpoints/cardiac_seg_unet_16.pth"


def build_chain(bs, im_ch, crop_size, seed=None):
    """The notebook's chain configs (cells 14/26)."""
    size = (bs, im_ch, crop_size[0], crop_size[1])
    bias = AdvBias(config_dict={
        "epsilon": 0.3, "control_point_spacing": [crop_size[0] // 4] * 2,
        "downscale": 2, "data_size": size, "interpolation_order": 3,
        "init_mode": "random", "space": "log"}, seed=seed)
    noise = AdvNoise(config_dict={"epsilon": 1, "xi": 1e-6,
                                  "data_size": size}, seed=seed)
    affine = AdvAffine(config_dict={
        "rot": 30 / 180, "scale_x": 0.2, "scale_y": 0.2,
        "shift_x": 0.1, "shift_y": 0.1, "data_size": size,
        "forward_interp": "bilinear", "backward_interp": "bilinear"},
        seed=seed)
    morph = AdvMorph(config_dict={
        "epsilon": 1.5, "data_size": size,
        "vector_size": [crop_size[0] // 16, crop_size[1] // 16],
        "forward_interp": "bilinear", "backward_interp": "bilinear"},
        seed=seed)
    return [noise, bias, morph, affine]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cardiac_2d_advchain.png")
    ap.add_argument("--n-iter", type=int, default=1)
    ap.add_argument("--slice-id", type=int, default=5)
    args = ap.parse_args()

    crop_size = (192, 192)
    img = load_image_label(DATA, slice_id=args.slice_id, crop_size=crop_size)
    image_tensor = jnp.asarray(img[None, None].astype(np.float32))

    model = get_unet_model(CKPT, num_classes=4, model_arch="UNet_16")
    chain = build_chain(1, 1, crop_size)
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5], debug=True)

    # --- random augmentation (notebook cell 18)
    solver.init_random_transformation()
    rand_image = solver.forward(image_tensor)
    rand_predict = solver.get_net_output(model, rand_image)
    rand_recovered_predict = solver.predict_backward(rand_predict)
    init_output = solver.get_init_output(model, image_tensor)

    # --- adversarial augmentation
    loss = solver.adversarial_training(
        data=image_tensor, model=model, n_iter=args.n_iter,
        lazy_load=True, optimize_flags=[True] * len(chain))
    print("adversarial consistency loss:", float(loss))
    adv_image = solver.adv_data
    adv_recovered_predict = solver.warped_back_adv_output

    # --- random sub-chain (notebook cell 22)
    one_chain = random_chain(chain[:],
                             max_length=len(chain))
    print("sampled chain:", [t.get_name() for t in one_chain])
    sub_solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=one_chain,
        divergence_types=["mse", "contour"], divergence_weights=[1.0, 0.5])
    sub_loss = sub_solver.adversarial_training(
        data=image_tensor, model=model,
        init_output=jax.lax.stop_gradient(init_output), n_iter=1,
        lazy_load=False, optimize_flags=[True] * len(one_chain),
        step_sizes=[1] * len(one_chain))
    print("sub-chain consistency loss:", float(sub_loss))
    sub_solver.reset_transformation()

    # --- figure
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(2, 4, figsize=(14, 7))
    panels = [
        (img, "input"),
        (np.asarray(rand_image)[0, 0], "random aug"),
        (np.asarray(adv_image)[0, 0], "adversarial aug"),
        (np.asarray(adv_image - image_tensor)[0, 0], "adv diff"),
        (np.argmax(np.asarray(init_output), 1)[0], "predict (clean)"),
        (np.argmax(np.asarray(rand_recovered_predict), 1)[0],
         "predict (rand, warped back)"),
        (np.argmax(np.asarray(adv_recovered_predict), 1)[0],
         "predict (adv, warped back)"),
        (np.asarray(solver.adv_predict).argmax(1)[0], "predict (adv frame)"),
    ]
    for ax, (data, title) in zip(axes.ravel(), panels):
        ax.imshow(data, cmap="gray")
        ax.set_title(title, size=10)
        ax.set_axis_off()
    plt.tight_layout()
    fig.savefig(args.out, dpi=80)
    print("figure saved to", args.out)


if __name__ == "__main__":
    main()
