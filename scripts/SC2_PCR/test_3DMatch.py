"""Standalone SC2-PCR 3DMatch benchmark (reference test_3DMatch.py):
same flow as test_KITTI.py with the 3DMatch config + loader."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main(config_name="config_3DMatch.json"):
    from scripts.SC2_PCR import test_KITTI  # same driver, other config

    here = os.path.dirname(os.path.abspath(__file__))
    sys.argv += ["--config_path", os.path.join(here, "config_json",
                                               config_name)]
    test_KITTI.main()


if __name__ == "__main__":
    main()
