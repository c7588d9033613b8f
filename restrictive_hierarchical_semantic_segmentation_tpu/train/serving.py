"""Serving path: a compiled, weight-baked predictor for deployment.

The reference has no serving story beyond re-running predictEval. This
provides a production inference primitive:

* weights are **baked as compile-time constants** (closed over, not passed),
  so XLA constant-folds BatchNorm running statistics into the conv weights and
  dead-code-eliminates everything training-only;
* one jitted function per (batch, height, width) signature, cached;
* returns composed per-level probabilities plus argmaxed class maps with the
  reference's -1-free eval conventions.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..config.run import RunConfig
from ..hierarchy.tree import ClassTree
from ..models.hierarchical import build_model
from .state import create_train_state

__all__ = ["Predictor"]


class Predictor:
    """``quantize=True`` enables int8 post-training quantization of the conv
    stack (train/quantize.py): per-tensor activation scales calibrated from
    ``calib_batches`` (normalized images, same layout as ``__call__``),
    per-channel weight scales, int8 MXU convs with a float dequant epilogue.
    Per-level heads stay float (their logits feed the gated-softmax
    composition). Measured: tools/serving_bench.py."""

    def __init__(self, cfg: RunConfig, weights_path: str,
                 tree: Optional[ClassTree] = None,
                 quantize: bool = False,
                 calib_batches: Optional[List[np.ndarray]] = None):
        from ..utils.compile_cache import enable

        enable()
        self.cfg = cfg
        self.tree = tree or ClassTree.from_json(cfg.tree_root, cfg.class_map)

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        hrnet_cfg = None
        if cfg.hrnet_yaml:
            from ..config.hrnet import resolve_hrnet_config

            hrnet_cfg = resolve_hrnet_config(cfg.hrnet_yaml)
        self.model = build_model(
            self.tree, cfg.model_select, cfg.model_type, hrnet_cfg, dtype,
            cfg.concat_prev_probs,
        )
        sample = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
        state, _ = create_train_state(
            self.model, jax.random.PRNGKey(0), sample, lr=0.0
        )
        if weights_path.endswith((".pt", ".pth")):
            from .torch_import import load_donor_weights

            params, bstats = load_donor_weights(
                weights_path, state.params, state.batch_stats, cfg.model_select
            )
        else:
            from .checkpoint import load_checkpoint

            state, _ = load_checkpoint(weights_path, state)
            params, bstats = state.params, state.batch_stats
        variables = {"params": params, "batch_stats": bstats}
        model = self.model

        apply_fn = model.apply
        if quantize:
            from .quantize import calibrate, quantized_apply

            if not calib_batches:
                # no calibration data given: fall back to a uniform batch in
                # the training normalization range (-1, 1). Real inputs give
                # tighter activation scales — pass them when available.
                calib_batches = [np.random.default_rng(0).uniform(
                    -1.0, 1.0, sample.shape).astype(np.float32)]
            scales = calibrate(
                model.apply, variables,
                [np.asarray(b, np.float32) for b in calib_batches],
                train=False,
            )
            apply_fn = quantized_apply(model.apply, scales)
            self.act_scales = scales

        # Bake weights as constants -> XLA folds BN into convs and prunes
        # the training-only graph.
        @jax.jit
        def _fn(x):
            out = apply_fn(variables, x, train=False)
            scores = out.logits_per_level
            import jax.numpy as jnp

            class_maps = [jnp.argmax(z, -1).astype(jnp.int32) for z in scores]
            probs = out.probs_per_level
            return {
                "logits": list(scores),
                "probs": list(probs) if probs is not None else None,
                "class_maps": class_maps,
            }

        self._fn = _fn

    def warmup(self, batch: int = 1):
        s = self.cfg.img_size
        self(np.zeros((batch, s, s, 3), np.float32))

    def __call__(self, images: np.ndarray) -> Dict:
        """images: (B, H, W, 3) float32, normalized like training inputs."""
        out = self._fn(images)
        return jax.tree_util.tree_map(np.asarray, out)
