"""Train/eval step tests: loss decreases on synthetic data, plateau scheduler
parity with torch, checkpoint round-trip, sharded multi-device execution."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
    UNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
    HierarchicalSegmenter,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
    create_train_state,
    set_learning_rate,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.plateau import (
    ReduceLROnPlateau,
)


def make_batch(tree, rng, B=4, S=16):
    """Synthetic batch straight from the target factory (exercises ternary)."""
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        synth_sample,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.target_factory import (
        node_masks,
        ternary_encode,
    )
    import cv2

    xs, ys = [], []
    for _ in range(B):
        img, mask = synth_sample(rng, 64)
        img = cv2.resize(img, (S, S), interpolation=cv2.INTER_LINEAR)
        mask = cv2.resize(mask, (S, S), interpolation=cv2.INTER_NEAREST)
        x = np.stack((img,) * 3, -1).astype(np.float32) / 255.0
        xs.append((x - 0.5) / 0.5)
        ys.append(ternary_encode(node_masks(mask, tree).astype(np.float32), tree))
    return np.stack(xs), np.stack(ys)


def test_train_step_loss_decreases(default_tree):
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    rng = np.random.default_rng(0)
    x, y = make_batch(default_tree, rng)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], lr=3e-3)
    step = make_train_step(model, tx, default_tree, True, donate=False)
    mask = jnp.ones((2,), jnp.float32)
    losses = []
    for i in range(12):
        state, aux = step(state, x, y, mask)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    assert aux["per_level"].shape == (2,)
    assert len(aux["confmats"]) == 2
    assert int(state.step) == 12


def test_level_pretrain_mask_freezes_level1(default_tree):
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    rng = np.random.default_rng(1)
    x, y = make_batch(default_tree, rng, B=2)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], lr=1e-3)
    step = make_train_step(model, tx, default_tree, True, lambda_cons=0.0,
                           donate=False)
    head1_before = np.asarray(state.params["head_l1"]["kernel"])
    state, aux = step(state, x, y, jnp.array([1.0, 0.0]))
    head1_after = np.asarray(state.params["head_l1"]["kernel"])
    # only AdamW weight decay moves level-1 head weights when masked
    np.testing.assert_allclose(
        head1_after, head1_before * (1 - 1e-3 * 0.01), rtol=1e-5
    )


def test_eval_step_and_flat_mode(default_tree):
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=False
    )
    rng = np.random.default_rng(2)
    x, _ = make_batch(default_tree, rng, B=2)
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        synth_sample,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.target_factory import (
        leaf_masks,
    )
    import cv2

    ys = []
    r2 = np.random.default_rng(3)
    for _ in range(2):
        _, mask = synth_sample(r2, 64)
        mask = cv2.resize(mask, (16, 16), interpolation=cv2.INTER_NEAREST)
        ys.append(leaf_masks(mask, default_tree).astype(np.float32))
    y = np.stack(ys)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], lr=1e-3)
    ev = make_eval_step(model, default_tree, False)
    res = ev(state.params, state.batch_stats, x, y)
    assert np.isfinite(float(res["loss"]))
    assert len(res["confmats"]) == 1
    assert res["confmats"][0].shape == (7, 7)


def test_plateau_matches_torch():
    import torch

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.024)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=3, min_lr=0.001
    )
    mine = ReduceLROnPlateau(0.024, "max", 0.5, 3, min_lr=0.001)
    rng = np.random.default_rng(4)
    metrics = [0.1, 0.2, 0.21, 0.21, 0.21, 0.21, 0.205, 0.2, 0.22, 0.22, 0.22,
               0.22, 0.22, 0.1, 0.1] + list(rng.uniform(0, 0.3, 20))
    for m in metrics:
        tsched.step(float(m))
        got = mine.step(float(m))
        want = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=f"metric {m}")


def test_set_learning_rate_roundtrip(default_tree):
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.zeros((1, 16, 16, 3), np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x, lr=0.024)
    assert state.lr() == pytest.approx(0.024)
    state = set_learning_rate(state, 0.012)
    assert state.lr() == pytest.approx(0.012)


def test_checkpoint_roundtrip(tmp_path, default_tree):
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        CheckpointManager,
        load_checkpoint,
    )

    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.zeros((1, 16, 16, 3), np.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), x, lr=0.02)
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.update(state, 1, 0.5, 0.6, 0.01)       # first is always best
    assert not mgr.update(state, 2, 0.4, 0.55, 0.01)  # worse -> last only
    assert mgr.update(state, 3, 0.3, 0.7, 0.01)       # better -> best
    mgr.wait()  # saves are async; drain before reading files
    restored, meta = load_checkpoint(mgr.best_path, state)
    np.testing.assert_allclose(float(meta["test_measure_mean"]), 0.7)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_sharded_train_step_8_devices(default_tree):
    """Full train step over a 4x2 (data x space) mesh on the CPU backend."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_space=2)
    model = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    rng = np.random.default_rng(5)
    x, y = make_batch(default_tree, rng, B=8, S=16)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), x[:1], lr=1e-3)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    bs = batch_sharding(mesh)
    xd = jax.device_put(x, bs)
    yd = jax.device_put(y, bs)
    step = make_train_step(model, tx, default_tree, True, donate=False)
    state2, aux = step(state, xd, yd, jnp.ones((2,), jnp.float32))
    assert np.isfinite(float(aux["loss"]))
    # parity with the unsharded step (same math, SyncBN included)
    state_r, _ = create_train_state(model, jax.random.PRNGKey(0), x[:1], lr=1e-3)
    state3, aux2 = step(state_r, x, y, jnp.ones((2,), jnp.float32))
    np.testing.assert_allclose(float(aux["loss"]), float(aux2["loss"]),
                               rtol=2e-4)


def test_adamw_matches_torch_trajectory():
    """optax.adamw (train/state.py make_optimizer) vs torch.optim.AdamW with
    the reference's settings (train.py:513-516, torch defaults): identical
    5-step parameter trajectory on identical gradients. Together with
    test_grad_parity.py this pins the full optimization step."""
    import torch

    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        make_optimizer,
    )

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((7, 5)).astype(np.float32)
    grads = [rng.standard_normal((7, 5)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=0.018)  # torch defaults: wd=0.01
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = make_optimizer(0.018)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6)
