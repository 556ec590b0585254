"""Data layer: host samplers + device pipeline + loader dispatch."""
from .colocation import ColocationKittiDataset, ColocationNuscenesDataset
from .device_pipeline import (VoxelizedClouds, batch_colocation_groups,
                              build_colocation_groups,
                              build_correspondences, grid_radius_knn,
                              radius_knn, transform_points,
                              voxelize_per_cloud)
from .legacy import (KITTINMPairDataset, KITTIPairDataset,
                     KITTIRandDistPairDataset, ThreeDMatchPairDataset,
                     ThreeDMatchTestDataset)
from .loader import DataLoader, collate_stack
from .pairs import PairComplementKittiDataset, PairComplementNuscenesDataset
from .transforms import Compose, Jitter, sample_random_trans

ALL_DATASETS = {
    d.__name__: d for d in (
        ColocationKittiDataset, ColocationNuscenesDataset,
        PairComplementKittiDataset, PairComplementNuscenesDataset,
        # legacy FCGF loaders, selectable by config.dataset like the
        # reference registry (lib/data_loaders.py:629-729)
        ThreeDMatchPairDataset, ThreeDMatchTestDataset, KITTIPairDataset,
        KITTINMPairDataset, KITTIRandDistPairDataset)
}


def make_data_loader(config, phase, batch_size, num_threads=0, shuffle=None):
    """Loader dispatch with the reference's selection rules
    (lib/colocation_data_loader.py:709-757): the colocation train dataset
    comes from config.train_dataset; val/test use the pair dataset from
    config.dataset; train phase shuffles and drops the last batch.
    """
    assert phase in ("train", "val", "test")
    if shuffle is None:
        shuffle = phase != "test"
    if phase == "train":
        name = getattr(config, "train_dataset", config.dataset)
        use_random_rotation = config.use_random_rotation
        use_random_scale = config.use_random_scale
    else:
        name = config.dataset
        use_random_rotation = False
        use_random_scale = False
    if name not in ALL_DATASETS:
        raise ValueError(f"unknown dataset {name}")
    dataset = ALL_DATASETS[name](
        phase,
        transform=None,
        random_rotation=use_random_rotation,
        random_scale=use_random_scale,
        manual_seed=phase != "train",
        config=config)
    # multi-host: every host feeds its slice of each global train batch
    shard_id, num_shards = 0, 1
    if phase == "train" and getattr(config, "distributed_init", False):
        import jax
        shard_id, num_shards = jax.process_index(), jax.process_count()
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle,
                      num_workers=num_threads,
                      drop_last=phase == "train",
                      shard_id=shard_id, num_shards=num_shards)
