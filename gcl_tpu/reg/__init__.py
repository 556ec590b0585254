from .icp import kabsch, registration_icp, voxel_downsample
from .matching import find_corr, find_nn, find_nn_cpu, mutual_feature_match
from .metrics import (ClassificationLoss, TransformationLoss, corr_dist,
                      hit_ratio, registration_success, rte_rre)
from .procrustes import rigid_transform_3d
from .ransac import ransac_pose
from .robust import est_quad_linear_robust
from .sc2pcr import Matcher
from .se3 import concatenate, decompose_trans, integrate_trans, transform
