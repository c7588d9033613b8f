"""Test config: force an 8-device virtual CPU mesh BEFORE any backend use.

This is the TPU-world "fake backend" for collectives — multi-chip sharding is
validated on host CPU devices (the driver separately dry-runs the multi-chip
path via ``__graft_entry__.dryrun_multichip``).

NB: this environment boots an ``axon`` TPU plugin from sitecustomize and jax
0.9 removed ``--xla_force_host_platform_device_count``; the reliable override
is ``jax.config.update('jax_platforms'/'jax_num_cpu_devices')`` before the
first backend touch.
"""
import os
import pathlib
import sys

# RHSS_TPU_TESTS=1 leaves the live backend alone so the TPU-marked tests
# (tests/test_pallas_tpu_compiled.py) can reach the chip; everything else in
# the suite is written for the 8-device CPU mesh and should NOT run that way.
_ON_TPU = os.environ.get("RHSS_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

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
