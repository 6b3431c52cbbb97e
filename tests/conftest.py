import os

# Tests run on the CPU backend with 8 virtual devices so sharding tests work
# anywhere. The environment may pin an experimental platform via
# JAX_PLATFORMS (and merges rather than honors overrides), so force it
# through the config API before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_EXAMPLES_ZIP = Path("/root/reference/Examples.zip")


@pytest.fixture(scope="session")
def examples_dir(tmp_path_factory) -> Path:
    """The reference Examples.zip inputs (read-only fixture data)."""
    if not _EXAMPLES_ZIP.exists():
        pytest.skip("reference Examples.zip not available")
    root = tmp_path_factory.mktemp("examples")
    with zipfile.ZipFile(_EXAMPLES_ZIP) as z:
        z.extractall(root)
    return root / "Examples"
