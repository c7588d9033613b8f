"""PallasBatchNormAct module + HRNet integration parity (interpret mode on
CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from restrictive_hierarchical_semantic_segmentation_tpu.models.pallas_bn import (
    PallasBatchNormAct,
)


def test_module_matches_flax_bn_train_and_eval():
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 8, 8, 16)).astype(np.float32) * 2 + 1

    pm = PallasBatchNormAct(use_running_average=False, act="none")
    fm = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vp = pm.init(jax.random.PRNGKey(0), x)
    vf = fm.init(jax.random.PRNGKey(0), x)
    # same variable layout
    assert set(vp["params"]) == set(vf["params"]) == {"scale", "bias"}
    assert set(vp["batch_stats"]) == set(vf["batch_stats"]) == {"mean", "var"}

    yp, up = pm.apply(vp, x, mutable=["batch_stats"])
    yf, uf = fm.apply(vf, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yf), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(up["batch_stats"]["mean"]),
        np.asarray(uf["batch_stats"]["mean"]), rtol=1e-4, atol=1e-6)
    # running var: ours stores torch's UNBIASED batch variance; flax stores
    # the biased one (see models/norm.py) — reconstruct the expected update
    n = x.shape[0] * x.shape[1] * x.shape[2]
    ra = np.ones((16,), np.float32)
    flax_var = np.asarray(uf["batch_stats"]["var"])
    batch_var = (flax_var - 0.9 * ra) / 0.1
    want = 0.9 * ra + 0.1 * batch_var * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(up["batch_stats"]["var"]), want, rtol=1e-3, atol=1e-5)

    # eval mode with shared (nontrivial) stats
    stats = {"mean": jnp.asarray(x.reshape(-1, 16).mean(0)),
             "var": jnp.asarray(x.reshape(-1, 16).var(0))}
    vp2 = {"params": vp["params"], "batch_stats": stats}
    pe = PallasBatchNormAct(use_running_average=True, act="relu")
    fe = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    ype = pe.apply(vp2, x)
    yfe = jax.nn.relu(fe.apply(vp2, x))
    np.testing.assert_allclose(np.asarray(ype), np.asarray(yfe), rtol=1e-4,
                               atol=1e-5)


def test_hrnet_pallas_bn_forward_close_to_xla_bn(default_tree):
    from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
        HRNetConfig,
        HRNetStage,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )

    cfg = HRNetConfig(
        stage1=HRNetStage(1, 1, "BOTTLENECK", (1,), (4,)),
        stage2=HRNetStage(1, 2, "BASIC", (1, 1), (4, 8)),
        stage3=HRNetStage(1, 3, "BASIC", (1, 1, 1), (4, 8, 16)),
        stage4=HRNetStage(1, 4, "BASIC", (1, 1, 1, 1), (4, 8, 16, 32)),
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    m_x = HRNetBackbone(config=cfg, use_pallas_bn=False)
    m_p = HRNetBackbone(config=cfg, use_pallas_bn=True)
    v = m_x.init(jax.random.PRNGKey(0), x, train=False)
    # identical variable trees -> same init works for both
    y_x = m_x.apply(v, x, train=False)
    y_p = m_p.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-3,
                               atol=1e-4)
    # train mode: stats updates agree
    _, ux = m_x.apply(v, x, train=True, mutable=["batch_stats"])
    _, up = m_p.apply(v, x, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(ux["batch_stats"]),
                    jax.tree_util.tree_leaves(up["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-4)


def test_hrnet_pallas_bn_gradients_flow(default_tree):
    from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
        HRNetConfig,
        HRNetStage,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )

    cfg = HRNetConfig(
        stage1=HRNetStage(1, 1, "BOTTLENECK", (1,), (4,)),
        stage2=HRNetStage(1, 2, "BASIC", (1, 1), (4, 8)),
        stage3=HRNetStage(1, 3, "BASIC", (1, 1, 1), (4, 8, 16)),
        stage4=HRNetStage(1, 4, "BASIC", (1, 1, 1, 1), (4, 8, 16, 32)),
    )
    m = HRNetBackbone(config=cfg, use_pallas_bn=True)
    x = np.random.default_rng(2).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        y, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                       x, train=True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
