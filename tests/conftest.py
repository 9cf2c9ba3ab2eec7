import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """Ray initialised ONCE per pytest session (driver contract)."""
    import ray

    if not ray.is_initialized():
        from linkgraph.common import enable_shmmap
        enable_shmmap()   # workers inherit the fast-fault allocator shim
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()
