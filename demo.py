"""Feature-extraction demo — mirror of the reference demo.py:25-49.

The reference downloads a pretrained ResUNetBN2C checkpoint and
redkitchen-20.ply, extracts FCGF features and renders a t-SNE coloring in
an Open3D window. This environment has no network egress or display, so:
  * --input accepts a .ply or KITTI .bin (default: a generated synthetic
    scan) and --weights a checkpoint from this framework;
  * the t-SNE-colored cloud is written to --output (.ply).
"""
import argparse
import os

import numpy as np


def main(config):
    import jax
    import jax.numpy as jnp

    from gcl_tpu.models import load_model
    from gcl_tpu.train import load_checkpoint, restore_into
    from gcl_tpu.utils.misc import extract_features
    from gcl_tpu.utils.pointcloud import read_ply_xyz
    from gcl_tpu.utils.visualization import \
        get_colored_point_cloud_feature_ply

    if config.input and config.input.endswith(".ply"):
        xyz = read_ply_xyz(config.input)
    elif config.input and config.input.endswith(".bin"):
        from gcl_tpu.data.kitti_io import read_velodyne_bin
        xyz = read_velodyne_bin(config.input)
    else:
        print("no --input given; generating a synthetic LiDAR scan")
        from gcl_tpu.data.synthetic import _make_world, _scan_from_world
        rng = np.random.RandomState(0)
        world = _make_world(rng, extent=40.0)
        pose = np.eye(4)
        pose[2, 3] = 1.5
        xyz = _scan_from_world(world, pose, max_range=40.0)

    model_cls = load_model(config.model)
    model = model_cls(1, config.model_n_out, bn_momentum=0.05,
                      normalize_feature=True,
                      conv1_kernel_size=config.conv1_kernel_size, D=3)

    # init (random) params, then overwrite from checkpoint if provided
    from gcl_tpu.core.kernel_maps import build_graph
    specs = model_cls.conv_specs(config.conv1_kernel_size)
    strides = sorted({s for sp in specs
                      for s in (sp.in_stride, sp.out_stride)})
    cap = 64
    tc = np.zeros((cap, 4), np.int32)
    tc[:, 1] = np.arange(cap)
    g = build_graph(jnp.asarray(tc), jnp.asarray(np.ones(cap, bool)),
                    specs, {s: cap for s in strides})
    variables = model.init(jax.random.PRNGKey(0), g, jnp.ones((cap, 1)),
                           train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if config.weights and os.path.isfile(config.weights):
        state = load_checkpoint(config.weights)
        params = restore_into(params, state["state_dict"]["params"])
        batch_stats = restore_into(batch_stats,
                                   state["state_dict"]["batch_stats"])
        print(f"loaded weights from {config.weights}")

    vis_xyz, feature = extract_features(
        model, params, batch_stats, xyz, voxel_size=config.voxel_size)
    print(f"extracted {feature.shape[0]} voxel features "
          f"({feature.shape[1]}-D)")

    out = get_colored_point_cloud_feature_ply(
        vis_xyz, feature.astype(np.float64), config.output,
        config.voxel_size)
    print(f"wrote t-SNE-colored features to {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", default=None, type=str,
                        help=".ply or KITTI .bin cloud")
    parser.add_argument("--output", default="demo_features.ply", type=str)
    parser.add_argument("--weights", default=None, type=str)
    parser.add_argument("--model", default="ResUNetBN2C", type=str)
    parser.add_argument("--model_n_out", default=32, type=int)
    parser.add_argument("--voxel_size", default=0.3, type=float)
    parser.add_argument("--conv1_kernel_size", default=5, type=int)
    config = parser.parse_args()
    main(config)
