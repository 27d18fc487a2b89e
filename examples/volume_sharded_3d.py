"""Spatially-sharded 3D adversarial training — the scale-out recipe for
volumes that exceed one chip's HBM.

The reference's only memory lever for 3D is coarsening (bias ``downscale``,
small ``vector_size``) plus ``torch.cuda.empty_cache()``
(reference advchain/augmentor/adv_compose_solver.py:255-404).  TPU-native,
the volume's depth axis is sharded over a second mesh axis: the fused
adversarial train step runs unchanged under GSPMD on a 2-D
``Mesh(('data', 'space'))`` — XLA partitions the convs with halo exchanges
and the warps with gathers over ICI.

On a single-chip / CPU host this runs on a virtual device mesh; launch with

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/volume_sharded_3d.py

On a real pod slice, drop the env overrides: the same code shards over the
physical chips.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from advchain_tpu.augmentor import (AdvAffine, AdvMorph, AdvNoise,
                                    ComposeAdversarialTransformSolver)
from advchain_tpu.models import PseudoConv3dModel, SegmentationModel
from advchain_tpu.parallel import (TrainState, make_adversarial_train_step,
                                   make_spatial_mesh, replicate_to_mesh,
                                   shard_batch_spatial)


def main():
    devices = jax.devices()
    n_space = 4 if len(devices) >= 8 else 1
    n_data = 2 if len(devices) >= 8 else 1
    mesh = make_spatial_mesh(n_data, n_space, devices=devices)
    print(f"mesh: {dict(mesh.shape)} over {devices[0].platform}")

    # one (D, H, W) volume per data shard; D sharded over 'space'
    batch, d, hw = 2 * n_data, 8 * n_space, 64
    size = (batch, 1, d, hw, hw)
    model = SegmentationModel.create(
        PseudoConv3dModel(num_classes=4), size, rng=jax.random.PRNGKey(0))

    chain = [
        AdvNoise(spatial_dims=3,
                 config_dict={"epsilon": 1, "xi": 1e-6, "data_size": size}),
        AdvMorph(spatial_dims=3, config_dict={
            "epsilon": 1.5, "data_size": size,
            "vector_size": [max(d // 8, 2), hw // 16, hw // 16]}),
        AdvAffine(spatial_dims=3, config_dict={
            "rot_x": 0.1, "rot_y": 0.1, "rot_z": 0.1,
            "scale_x": 0.1, "scale_y": 0.1, "scale_z": 0.1,
            "shift_x": 0.05, "shift_y": 0.05, "shift_z": 0.05,
            "data_size": size}),
    ]
    solver = ComposeAdversarialTransformSolver(
        chain_of_transforms=chain, divergence_types=["mse", "contour"],
        divergence_weights=[1.0, 0.5])

    optimizer = optax.adam(1e-3)
    step = make_adversarial_train_step(model, solver, optimizer, n_iter=1,
                                       mesh=mesh, donate_state=False)

    r = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(r.rand(*size).astype(np.float32)),
        "label": jnp.asarray(r.randint(0, 4, (batch, d, hw, hw))),
    }
    state = replicate_to_mesh(TrainState.create(model, optimizer), mesh)
    data = shard_batch_spatial(data, mesh)
    rng = replicate_to_mesh(jax.random.PRNGKey(0), mesh)

    for i in range(3):
        state, metrics = step(state, data, rng)
        print(f"step {i}: total={float(metrics['total_loss']):.4f} "
              f"sup={float(metrics['supervised_loss']):.4f} "
              f"cons={float(metrics['consistency_loss']):.4f}")
    print("volume-sharded adversarial training: OK")


if __name__ == "__main__":
    main()
