"""Test configuration: force an 8-device virtual CPU mesh.

The container exposes one real TPU chip via the axon plugin; multi-chip
sharding (the v8/v9 analog) is validated the TPU-standard way — a virtual
CPU mesh (SURVEY.md §4 item 4). This must run before any JAX backend use.
Set NNS_TPU_TEST_REAL_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

if os.environ.get("NNS_TPU_TEST_REAL_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from nns_tpu.data import make_dataset


@pytest.fixture(scope="session")
def small_dataset():
    return make_dataset(k=3, m=64, n=1000, seed=1000)


@pytest.fixture(scope="session")
def grid_datasets():
    """Scaled-down reference grid: same (k, m) corners, smaller n for CI."""
    cases = []
    for k, m, n in [(3, 1, 1024), (16, 1, 1024), (3, 128, 1024),
                    (16, 128, 1024), (3, 256, 4096), (16, 64, 4096)]:
        q, r = make_dataset(k, m, n, seed=1000)
        cases.append((k, m, n, q, r))
    return cases


def assert_exact(idx, queries, refs):
    from nns_tpu.kernels.oracle import recall_at_1

    idx = np.asarray(idx)
    assert idx.shape == (queries.shape[0],)
    r = recall_at_1(idx, queries, refs)
    assert r == 1.0, f"recall@1 = {r}, expected 1.0"
