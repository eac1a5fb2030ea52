"""Test env: force CPU backend with 8 virtual devices so sharding/mesh tests
run anywhere (the TPU-native analogue of a fake multi-node backend).

The axon sitecustomize registers the TPU platform at interpreter start and
sets jax_platforms itself, so overriding the env var is not enough — we
update jax.config before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# tests exercise the DeepSpeaker pipeline without the external pretrained
# .h5 (random-net features are fine as consistent per-speaker signatures);
# production preprocessing fails loudly without this opt-in
os.environ.setdefault("CTTS_ALLOW_RANDOM_SPEAKER", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
