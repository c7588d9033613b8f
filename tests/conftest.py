"""Test config: force an 8-device virtual CPU mesh BEFORE jax initializes.

This is the TPU-world "fake backend" for collectives — multi-chip sharding is
validated on host CPU devices (the driver separately dry-runs the multi-chip
path via ``__graft_entry__.dryrun_multichip``).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402
import sys  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def assets_dir():
    return REPO / "assets"


@pytest.fixture(scope="session")
def default_tree(assets_dir):
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import ClassTree

    return ClassTree.from_json(
        str(assets_dir / "class_tree_tl.json"), str(assets_dir / "class_map.csv")
    )


@pytest.fixture(scope="session")
def extended_tree(assets_dir):
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import ClassTree

    return ClassTree.from_json(
        str(assets_dir / "class_tree_tl_extended.json"),
        str(assets_dir / "class_map_extended.csv"),
    )
