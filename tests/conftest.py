import os
import sys

# make the suite work under the bare `pytest` console script too (it puts
# tests/ on sys.path via conftest, but NOT the repo root where dug_ray lives)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    # Ray workers resolve dug_ray through the DRIVER's cwd — from any other
    # cwd every map_batches task dies in ModuleNotFoundError retry loops
    os.chdir(_REPO_ROOT)
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
