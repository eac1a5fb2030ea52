"""Corpus normalization CLI (reference surface: prepare_align.py:7-25)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ctts_tpu.config import get_configs_of

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_dir", type=str, default=None)
    args = parser.parse_args()
    config, _, _ = get_configs_of(args.dataset, args.config_dir)
    if args.dataset == "LJSpeech":
        from ctts_tpu.preprocessing import ljspeech
        ljspeech.prepare_align(config)
    elif args.dataset == "VCTK":
        from ctts_tpu.preprocessing import vctk
        vctk.prepare_align(config)
    else:
        raise ValueError(f"unknown dataset {args.dataset}")
