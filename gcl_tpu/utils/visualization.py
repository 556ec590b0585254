"""Feature visualization (reference util/visualization.py:9-49): embed
per-point features to 1-D with t-SNE, map through a spectral colormap.
Rendering writes a colored PLY instead of opening an Open3D window
(headless TPU hosts have no display).
"""
from __future__ import annotations

import numpy as np


def embed_tsne(data):
    """1-D t-SNE embedding scaled to [0, 1] (reference :9-21)."""
    from sklearn.manifold import TSNE

    tsne = TSNE(n_components=1, verbose=0, perplexity=40, max_iter=300,
                random_state=0)
    tsne_results = tsne.fit_transform(np.asarray(data))
    tsne_results = np.squeeze(tsne_results)
    tsne_min = np.min(tsne_results)
    tsne_max = np.max(tsne_results)
    return (tsne_results - tsne_min) / (tsne_max - tsne_min)


def spectral_colors(t):
    """Spectral colormap via matplotlib (reference mesh_sphere coloring)."""
    import matplotlib.cm as cm

    return cm.get_cmap("Spectral")(np.asarray(t))[:, :3]


def get_colored_point_cloud_feature_ply(xyz, feature, path,
                                        voxel_size=0.025):
    """t-SNE-color features and write a PLY (reference :30-49 writes
    spheres into an o3d scene; we emit the colored points)."""
    from .pointcloud import write_ply_xyz

    t = embed_tsne(feature)
    colors = spectral_colors(t)
    write_ply_xyz(path, np.asarray(xyz, np.float32), colors)
    return path
