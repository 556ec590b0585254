"""Training launcher — mirrors the reference train.py:1-88: build train
and validation loaders, select the trainer by name, resume-config merge,
run .train().
"""
import json
import logging
import os
import sys

import numpy as np

from gcl_tpu.config import Config, get_config
from gcl_tpu.data import make_data_loader
from gcl_tpu.train import get_trainer

ch = logging.StreamHandler(sys.stdout)
logging.getLogger().setLevel(logging.INFO)
logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d %H:%M:%S",
    handlers=[ch])

np.random.seed(0)


def main(config, resume=False):
    if getattr(config, "distributed_init", False):
        # Multi-host mesh: every host runs this launcher with the JAX
        # coordinator env vars set (JAX_COORDINATOR_ADDRESS etc.); after
        # initialize(), jax.devices() spans the pod and the data-parallel
        # mesh in trainer.py covers it. Each host feeds only its own
        # batch shard (make_data_loader shards sample indices by
        # jax.process_index() over DCN-free local files).
        import jax
        jax.distributed.initialize()
        logging.info(
            f"jax.distributed: process {jax.process_index()} / "
            f"{jax.process_count()}, {len(jax.local_devices())} local / "
            f"{len(jax.devices())} global devices")
    train_loader = make_data_loader(
        config, config.train_phase, config.batch_size,
        num_threads=config.train_num_thread)
    if config.test_valid:
        val_loader = make_data_loader(
            config, config.val_phase, config.val_batch_size,
            num_threads=config.val_num_thread)
    else:
        val_loader = None

    Trainer = get_trainer(config.trainer)
    trainer = Trainer(
        config=config,
        data_loader=train_loader,
        val_data_loader=val_loader,
    )
    trainer.train()


if __name__ == "__main__":
    logger = logging.getLogger()
    config = get_config()

    dconfig = dict(config)
    if config.resume_dir and not config.finetune_restart:
        # restore the run's whole config except resume paths
        # (reference train.py:74-80)
        resume_config = json.load(
            open(config.resume_dir + "/config.json", "r"))
        for k in dconfig:
            if k not in ("resume_dir",) and k in resume_config:
                dconfig[k] = resume_config[k]
        dconfig["resume"] = os.path.join(config.resume_dir,
                                         "checkpoint.pth")
    logging.info("===> Configurations")
    for k in dconfig:
        logging.info("    {}: {}".format(k, dconfig[k]))

    main(Config(dconfig))
