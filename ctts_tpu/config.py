"""Config system.

The reference keeps three YAML files per dataset (preprocess/model/train,
loaded as raw dicts by ``get_configs_of`` — reference: utils/tools.py:19-27).
We keep the same *returned* structure (three raw dicts with identical keys,
so every module indexes them the same way) but store each dataset as ONE
merged YAML under ``configs/<dataset>.yaml`` with ``preprocess:``, ``model:``
and ``train:`` sections. The reference's three-file layout is also accepted
for drop-in compatibility with existing config dirs.

One value is computed and injected at startup exactly like the reference
(train.py:229-231): ``cwt_scales`` when ``pitch_type == "cwt"``.
"""

import os

import numpy as np
import yaml

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _default_config_dir():
    return os.path.join(_REPO_ROOT, "configs")


def get_configs_of(dataset, config_dir=None):
    """Load (preprocess_config, model_config, train_config) for a dataset.

    Accepts either ``<config_dir>/<dataset>.yaml`` (merged format) or
    ``<config_dir>/<dataset>/{preprocess,model,train}.yaml`` (reference
    three-file format).
    """
    config_dir = config_dir or _default_config_dir()
    merged_path = os.path.join(config_dir, dataset + ".yaml")
    trio_dir = os.path.join(config_dir, dataset)

    if os.path.isfile(merged_path):
        with open(merged_path) as f:
            merged = yaml.safe_load(f)
        preprocess = merged["preprocess"]
        model = merged["model"]
        train = merged["train"]
        preprocess.setdefault("dataset", merged.get("dataset", dataset))
    elif os.path.isdir(trio_dir):
        def _load(name):
            with open(os.path.join(trio_dir, name + ".yaml")) as f:
                return yaml.safe_load(f)
        preprocess, model, train = (_load("preprocess"), _load("model"),
                                    _load("train"))
    else:
        raise FileNotFoundError(
            f"no config for dataset {dataset!r} under {config_dir}")

    inject_derived(preprocess, model, train)
    return preprocess, model, train


def inject_derived(preprocess_config, model_config, train_config):
    """Compute startup-injected values (cwt scales; reference train.py:229)."""
    pitch = preprocess_config["preprocessing"]["pitch"]
    if pitch.get("pitch_type") == "cwt":
        from ctts_tpu.ops.cwt import get_lf0_cwt
        _, scales = get_lf0_cwt(np.ones(10))
        pitch["cwt_scales"] = scales
    return preprocess_config, model_config, train_config
