"""Serving path: a compiled, weight-baked predictor for deployment.

The reference has no serving story beyond re-running predictEval. This
provides a production inference primitive:

* weights are **baked as compile-time constants** (closed over, not passed),
  so XLA constant-folds BatchNorm running statistics into the conv weights and
  dead-code-eliminates everything training-only;
* one jitted function per (batch, height, width) signature, cached;
* returns composed per-level probabilities plus argmaxed class maps with the
  reference's -1-free eval conventions;
* **fold ensembling**: pass a list of checkpoints (one per cross-val fold)
  and the forward vmaps over the stacked fold weights in ONE program,
  averaging the composed per-level probabilities — the serving counterpart
  of fold-parallel training (the reference deploys single folds only).
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

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
    composition). Measured: tools/serving_bench.py.

    ``weights_path`` may be a sequence of checkpoint paths for a fold
    ensemble (see ``fold_checkpoints``); ensemble outputs are the fold-mean
    composed probabilities and their argmax class maps (``logits`` is None —
    averaging logits across independently-trained folds has no probabilistic
    meaning). Ensembling composes with everything except ``quantize``
    (per-fold activation scales would need per-fold closures).

    Without ``mesh``, the ensemble serves from the default device (all F
    folds' weights on one chip — fine on a v5e with <=5 W48 folds, but the
    other chips idle). Pass a ``Mesh`` with a ``fold`` axis to shard the
    stacked fold weights over chips: each fold's forward runs on its own
    device group (shard_map-manual fold axis, like fold-parallel training)
    and the fold-mean rides one ``pmean`` over ICI."""

    @staticmethod
    def fold_checkpoints(run_dir: str, which: str = "best") -> List[str]:
        """``<run_dir>/fold_N/{best|last}.ckpt`` in fold order (the layout
        both trainers write; reference train.py:666-709 equivalent)."""
        def fold_num(p):
            suffix = p.split("fold_")[-1].split(os.sep)[0]
            return int(suffix) if suffix.isdigit() else None

        paths = sorted(
            (p for p in glob.glob(
                os.path.join(run_dir, "fold_*", f"{which}.ckpt"))
             if fold_num(p) is not None),  # skip e.g. fold_avg/ dirs
            key=fold_num,
        )
        if not paths:
            raise FileNotFoundError(
                f"no fold_<N>/{which}.ckpt under {run_dir}")
        return paths

    def __init__(self, cfg: RunConfig,
                 weights_path: Union[str, Sequence[str]],
                 tree: Optional[ClassTree] = None,
                 quantize: bool = False,
                 calib_batches: Optional[List[np.ndarray]] = None,
                 outputs: Sequence[str] = ("logits", "probs", "class_maps"),
                 mesh=None,
                 class_map_dtype: str = "int32",
                 tta: bool = False):
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

        def _load(path):
            if path.endswith((".pt", ".pth")):
                from .torch_import import load_donor_weights

                params, bstats = load_donor_weights(
                    path, state.params, state.batch_stats, cfg.model_select
                )
            else:
                from .checkpoint import load_checkpoint

                st, _ = load_checkpoint(path, state)
                params, bstats = st.params, st.batch_stats
            return {"params": params, "batch_stats": bstats}

        paths = ([weights_path] if isinstance(weights_path, str)
                 else list(weights_path))
        if quantize and len(paths) > 1:
            raise ValueError("quantize=True does not compose with a fold "
                             "ensemble (per-fold activation scales); "
                             "quantize single-fold predictors instead")
        all_variables = [_load(p) for p in paths]
        variables = all_variables[0]
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
        if tta:
            # hflip test-time augmentation INSIDE the compiled forward (the
            # same wrapper the Evaluator uses) — composes with quantize,
            # ensembling, and export
            from .evaluate import tta_apply

            apply_fn = tta_apply(apply_fn)

        # Bake weights as constants -> XLA folds BN into convs and prunes
        # the training-only graph.
        import jax.numpy as jnp

        want = tuple(outputs)
        bad = set(want) - {"logits", "probs", "class_maps"}
        if bad:
            raise ValueError(f"unknown Predictor outputs: {sorted(bad)}")

        if class_map_dtype not in ("int32", "uint8"):
            raise ValueError("class_map_dtype must be 'int32' or 'uint8'")
        if class_map_dtype == "uint8" and any(
                len(l) > 256 for l in self.tree.levels):
            raise ValueError(
                "class_map_dtype='uint8' holds class ids 0..255; a level of "
                "this tree has more classes")
        cm_dtype = jnp.uint8 if class_map_dtype == "uint8" else jnp.int32

        def _prep(x):
            # raw uint8 inputs: normalize ON DEVICE ((x/255 - .5)/.5, the
            # training Normalize(.5,.5) chain) and broadcast grayscale to
            # 3 channels. Shrinks H2D 4x vs host-normalized fp32 (12x for
            # (B,H,W) grayscale) — the biggest batch-1 lever measured in
            # tools/serving_latency_b1.py (94.5 vs 127 ms end-to-end).
            # Delta vs the f32 path: the input is quantized to 8 bits
            # BEFORE normalization (<=1/255 per-pixel error).
            if x.dtype != jnp.uint8:
                return x
            if x.ndim == 3:
                x = x[..., None]
            x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            if x.shape[-1] == 1:
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            return x

        def _select(full):
            # unrequested outputs never leave the program — XLA dead-code
            # eliminates their compute, and __call__ fetches only what's
            # asked for (class maps are int32 (B,H,W): ~60x smaller than
            # the full float per-level maps — the transfer matters on slow
            # host links)
            return {k: full[k] for k in want}

        if len(paths) == 1:
            @jax.jit
            def _fn(x):
                out = apply_fn(variables, _prep(x), train=False)
                scores = out.logits_per_level
                class_maps = [jnp.argmax(z, -1).astype(cm_dtype)
                              for z in scores]
                probs = out.probs_per_level
                return _select({
                    "logits": list(scores),
                    "probs": list(probs) if probs is not None else None,
                    "class_maps": class_maps,
                })
        else:
            # ensemble weights ride as a RUNTIME argument, not baked
            # constants: F x the weight constants would bloat the program
            # (and exceed remote-compile payload limits); they live on
            # device once and are passed by reference per call
            stacked = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls), *all_variables
            )
            if mesh is None:
                # single-device ensemble: all F folds' weights and the
                # vmapped forward live on the default device — F x W48
                # weights may pressure one chip's HBM; pass a mesh with a
                # 'fold' axis to shard folds over chips instead
                self._stacked = jax.device_put(stacked)

                @jax.jit
                def _ens(stacked, x):
                    x = _prep(x)

                    def one(v):
                        out = apply_fn(v, x, train=False)
                        probs = out.probs_per_level
                        if probs is None:  # flat: ensemble in prob space
                            probs = [jax.nn.softmax(z, -1)
                                     for z in out.logits_per_level]
                        return tuple(probs)

                    fold_probs = jax.vmap(one)(stacked)  # (F, B, H, W, C)
                    probs = [p.mean(0) for p in fold_probs]
                    class_maps = [jnp.argmax(p, -1).astype(cm_dtype)
                                  for p in probs]
                    return _select({
                        "logits": None,
                        "probs": probs,
                        "class_maps": class_maps,
                    })
            else:
                # multi-chip ensemble: fold axis MANUAL under shard_map
                # (mirrors fold-parallel training — train/fold_parallel.py;
                # pure vmap+GSPMD leaks fold shardings into conv backward),
                # each fold's forward on its own device, fold-mean via pmean
                # over ICI. Input is replicated; weights shard P('fold').
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import FOLD_AXIS

                if FOLD_AXIS not in mesh.axis_names:
                    raise ValueError(
                        f"Predictor mesh needs a '{FOLD_AXIS}' axis; got "
                        f"{mesh.axis_names}")
                n_fold = mesh.shape[FOLD_AXIS]
                if len(paths) % n_fold != 0:
                    raise ValueError(
                        f"{len(paths)} fold checkpoints do not divide the "
                        f"mesh '{FOLD_AXIS}' axis of size {n_fold}")
                self._stacked = jax.device_put(
                    stacked, NamedSharding(mesh, P(FOLD_AXIS)))

                def _per_shard(stacked_shard, x):
                    # local shard: (F/n_fold, ...) weights; vmap the local
                    # folds, then average across the fold axis devices
                    def one(v):
                        out = apply_fn(v, x, train=False)
                        probs = out.probs_per_level
                        if probs is None:
                            probs = [jax.nn.softmax(z, -1)
                                     for z in out.logits_per_level]
                        return tuple(probs)

                    local = jax.vmap(one)(stacked_shard)
                    return tuple(
                        jax.lax.pmean(p.mean(0), FOLD_AXIS) for p in local
                    )

                sharded = jax.shard_map(
                    _per_shard, mesh=mesh,
                    in_specs=(P(FOLD_AXIS), P()), out_specs=P(),
                    axis_names=frozenset({FOLD_AXIS}),
                )

                @jax.jit
                def _ens(stacked, x):
                    probs = list(sharded(stacked, _prep(x)))
                    class_maps = [jnp.argmax(p, -1).astype(cm_dtype)
                                  for p in probs]
                    return _select({
                        "logits": None,
                        "probs": probs,
                        "class_maps": class_maps,
                    })

            def _fn(x):
                return _ens(self._stacked, x)

            # exposed for jax.export: the jitted (stacked_weights, x) entry
            # (train/export.py ships the weights beside the artifact).
            # Mesh-sharded ensembles export per the mesh note there.
            self._ens_jit = _ens
            self._ens_mesh = mesh

        self._fn = _fn

    def warmup(self, batch: int = 1, input_dtype: str = "float32"):
        s = self.cfg.img_size
        if input_dtype == "uint8":
            # the u8 fast path has two signatures (gray (B,H,W) and color
            # (B,H,W,3)); warm both — the graphs share everything past the
            # tiny normalize prefix so the second compile is cheap
            self(np.zeros((batch, s, s), np.uint8))
            self(np.zeros((batch, s, s, 3), np.uint8))
        else:
            self(np.zeros((batch, s, s, 3), np.float32))

    def __call__(self, images: np.ndarray) -> Dict:
        """images: (B, H, W, 3) float32 normalized like training inputs, OR
        raw uint8 (B, H, W, 3) / grayscale (B, H, W) — u8 inputs are
        normalized on device (smaller host->device transfer; input is
        quantized to 8 bits before normalization)."""
        out = self._fn(images)
        return jax.tree_util.tree_map(np.asarray, out)
