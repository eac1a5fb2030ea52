"""Back-compat shim: fixtures live in ctts_tpu.utils.testing."""
from ctts_tpu.utils.testing import tiny_configs, synth_batch  # noqa: F401
