from .types import (SparseBatch, LevelCoords, SparseGraph, FusedMap,
                    INVALID_BATCH, map_key)
from .coords import coord_keys, searchsorted2, lookup, kernel_offsets, sort_by_keys
from .voxelize import voxelize_points, representative_xyz
from .kernel_maps import (ConvSpec, build_graph, graph_builder,
                          default_level_caps)
from .sparse_ops import (sparse_conv, sparse_conv_fused, masked_mean_var,
                         masked_instance_mean_var, l2_normalize, apply_mask)
