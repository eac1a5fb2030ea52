"""Featurization CLI (reference surface: preprocess.py:7-19)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ctts_tpu.config import get_configs_of
from ctts_tpu.preprocessing.preprocessor import Preprocessor

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_dir", type=str, default=None)
    args = parser.parse_args()
    preprocess_config, model_config, train_config = get_configs_of(
        args.dataset, args.config_dir)
    Preprocessor(preprocess_config, model_config,
                 train_config).build_from_path()
