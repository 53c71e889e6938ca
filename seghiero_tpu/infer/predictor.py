"""Inference engine: checkpoint restore + batched per-level prediction.

Rebuilds infer.py of the reference (C17) with:
  * a jitted forward + per-level argmax (the "hierarchy decode" is an
    independent argmax per channel slice, infer.py:302-312);
  * batched multi-image prediction sharded over the data mesh axis
    (BASELINE config #5 — the reference is single-image only);
  * checkpoint sources: our Orbax checkpoints (best pointer fixes the
    reference's train/infer filename mismatch, train.py:430-433 vs
    infer.py:271-273) or a *reference torch .pth* converted on the fly
    (drop-in migration).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.data.pipeline import normalize_images
from seghiero_tpu.models.segmenter import build_model
from seghiero_tpu.ops.resize import resize_bilinear
from seghiero_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding


def preprocess_image(path: str, resize: Optional[Tuple[int, int]]):
    """PIL load + optional bilinear resize; returns (uint8 HWC, orig_hw,
    PIL). Mirrors infer.py:50-75 but keeps uint8 (normalize on device)."""
    img = Image.open(path).convert("RGB")
    orig_w, orig_h = img.size
    if resize is not None:
        h, w = resize
        img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8), (orig_h, orig_w), img


@dataclasses.dataclass
class Predictor:
    """``spatial_shards > 1`` shards the image HEIGHT across the mesh's
    ``model`` axis (spatial parallelism for very large images); XLA's
    partitioner inserts the conv halo exchanges — see
    parallel/spatial.py."""

    cfg: SegHieroConfig
    variables: Dict
    mesh: object = None
    spatial_shards: int = 1

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh({"data": 1, "model": self.spatial_shards})
        self.model = build_model(self.cfg)
        h = self.cfg.hierarchy
        slices = dict(zip(("fine", "coarse", "super"), h.level_slices))

        def _forward_cmajor(variables, images_u8):
            """normalize + model forward → logits in C-major [B, C, h, w].
            Shared by both decode paths so each jitted program traces the
            model exactly once (the pallas-gated path previously traced a
            second forward in its XLA fallback and relied on CSE)."""
            images = normalize_images(
                images_u8,
                self.cfg.transform.normalize_mean,
                self.cfg.transform.normalize_std,
            )
            out = self.model.apply(variables, images, train=False)
            # upsample + argmax in C-major layout: with the class axis in
            # the TPU lane dimension the full-res tensors are padded to
            # 128 lanes (~10× traffic for C≈15); see losses/fast.py.
            return jnp.transpose(out["logits"], (0, 3, 1, 2))

        def _decode(lo, out_hw):
            B, C = lo.shape[:2]
            logits = jax.image.resize(
                lo, (B, C, out_hw[0], out_hw[1]), "linear", antialias=False
            )  # infer.py:298-300
            preds = {
                lvl: jnp.argmax(logits[:, lo_:hi_], axis=1).astype(jnp.int32)
                for lvl, (lo_, hi_) in slices.items()
            }
            return preds, logits  # logits in C-major [B, C, H, W]

        def _predict(variables, images_u8, out_hw):
            return _decode(_forward_cmajor(variables, images_u8), out_hw)

        self._predict = jax.jit(_predict, static_argnums=(2,))

        def _predict_masks(variables, images_u8, out_hw):
            """Masks-only decode: when only the per-level argmax is
            consumed (predict/predict_array — the serving and batch
            paths), the full-res logits are never a jit output; with
            ``model.argmax_backend: pallas`` the fused 4×-upsample+
            argmax kernel skips materializing them entirely
            (ops/pallas/upsample_argmax.py)."""
            from seghiero_tpu.ops.pallas.upsample_argmax import (
                fused_argmax_available,
                fused_upsample_argmax,
            )

            lo = _forward_cmajor(variables, images_u8)
            if self.cfg.model.argmax_backend == "pallas":
                # the mesh decides where this computation runs
                # (training.device: cpu coexists with a TPU default
                # backend); a multi-device mesh falls back to XLA — the
                # Mosaic custom call has no SPMD partitioning rule for
                # batch-sharded inputs (same constraint as
                # rmi_gram_pallas_available)
                on_tpu = self.mesh.devices.flat[0].platform != "cpu"
                if (
                    self.spatial_shards == 1
                    and self.mesh.devices.size == 1
                    and fused_argmax_available(lo.shape, out_hw)
                ):
                    names = list(slices)
                    outs = fused_upsample_argmax(
                        lo, [slices[n] for n in names],
                        interpret=not on_tpu,
                    )
                    return dict(zip(names, outs))
            # XLA fallback reuses the already-traced forward; the unused
            # full-res logits are dead at the XLA level (not a jit output)
            preds, _ = _decode(lo, out_hw)
            return preds

        self._predict_masks = jax.jit(_predict_masks, static_argnums=(2,))

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls, cfg: SegHieroConfig, checkpoint: Optional[str] = None, mesh=None
    ) -> "Predictor":
        """checkpoint may be: None (best checkpoint under
        output.checkpoint_dir/project), an Orbax step dir, or a reference
        torch ``.pth`` file (converted via models/torch_convert)."""
        if checkpoint and checkpoint.endswith((".pth", ".pt")):
            from seghiero_tpu.models.torch_convert import (
                import_reference_checkpoint,
                load_torch_file,
            )

            ckpt = load_torch_file(checkpoint)
            variables = import_reference_checkpoint(
                ckpt, cfg.model.depth, cfg.model.proj_type
            )
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            return cls(cfg, variables, mesh)

        # Orbax path: restore best (or the given step dir) into a template
        from seghiero_tpu.train.checkpoint import CheckpointManager
        from seghiero_tpu.train.optim import make_optimizer, make_schedule
        from seghiero_tpu.train.trainer import TrainState

        model = build_model(cfg)
        hw = cfg.transform.resize or (64, 64)
        template_vars = model.init(
            jax.random.key(0), jnp.zeros((1, hw[0], hw[1], 3)), train=False
        )
        # schedule choice affects only opt-state STRUCTURE; total_steps=1
        # keeps the restore template consistent with training configs
        tx = make_optimizer(cfg.training, make_schedule(cfg.training, 1))
        template = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=template_vars["params"],
            batch_stats=template_vars["batch_stats"],
            opt_state=tx.init(template_vars["params"]),
            # EMA configs checkpoint the averaged weights alongside the
            # raw ones; the template structure must match to restore
            ema_params=(
                template_vars["params"]
                if cfg.training.ema_decay > 0
                else None
            ),
        )
        mngr = CheckpointManager(cfg.output.checkpoint_dir, cfg.output.project_name)
        if checkpoint and not os.path.isdir(os.path.join(checkpoint, "state")):
            # a manager ROOT (contains step_*/ and best.json) instead of
            # one step dir: restore its best checkpoint — common when a
            # user passes output.checkpoint_dir/<project> wholesale
            entries = (
                os.listdir(checkpoint) if os.path.isdir(checkpoint) else []
            )
            if "best.json" in entries or any(
                e.startswith("step_") for e in entries
            ):
                mngr = CheckpointManager(
                    os.path.dirname(checkpoint.rstrip("/")),
                    os.path.basename(checkpoint.rstrip("/")),
                )
                checkpoint = None
            elif cfg.output.project_name in entries:
                # the checkpoint_dir ROOT itself (one level above the
                # manager root — what `output.checkpoint_dir` names in
                # the config): descend into the project subdir
                # unconditionally. If the subdir holds no committed
                # checkpoint (e.g. a crashed run), restore_best returns
                # None and the explicit FileNotFoundError below fires —
                # not an opaque Orbax restore error on '<root>/state'.
                mngr = CheckpointManager(
                    checkpoint.rstrip("/"), cfg.output.project_name
                )
                checkpoint = None
        if checkpoint:
            state = mngr._ckptr.restore(os.path.join(checkpoint, "state"), template)
        else:
            restored = mngr.restore_best(template)
            if restored is None:
                raise FileNotFoundError(
                    f"No checkpoint found under {mngr.root}; pass --checkpoint"
                )
            state, _ = restored
        # deploy the EMA weights when the run tracked them
        params = state.ema_params if state.ema_params is not None else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}
        return cls(cfg, variables, mesh)

    # ------------------------------------------------------------------
    def predict_array(
        self,
        images_u8: np.ndarray,
        out_hw: Optional[Tuple[int, int]] = None,
        consistent: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Batched prediction. images_u8 [B, H, W, 3] → per-level int32
        masks [B, out_h, out_w] (out defaults to input size).

        ``consistent=False`` (default) decodes each level by independent
        argmax — exactly the reference (infer.py:302-312), which can emit
        hierarchy-inconsistent label pairs. ``consistent=True`` is an
        extension: coarse/super masks are derived from the fine argmax
        through the hierarchy LUTs, guaranteeing tree consistency."""
        out_hw = out_hw or images_u8.shape[1:3]
        if self.spatial_shards > 1:
            from seghiero_tpu.parallel.spatial import spatial_batch_sharding

            in_sharding = spatial_batch_sharding(self.mesh)
        else:
            in_sharding = batch_sharding(self.mesh)
        images = jax.device_put(images_u8, in_sharding)
        variables = jax.device_put(self.variables, replicated_sharding(self.mesh))
        preds = self._predict_masks(variables, images, tuple(out_hw))
        out = {k: np.asarray(v) for k, v in preds.items()}
        if consistent:
            h = self.cfg.hierarchy
            out["coarse"] = h.fine_to_coarse[out["fine"]].astype(np.int32)
            if h.has_super:
                out["super"] = h.fine_to_super[out["fine"]].astype(np.int32)
        return out

    def predict_sliding(
        self,
        images_u8: np.ndarray,
        window: Tuple[int, int],
        stride: Optional[Tuple[int, int]] = None,
        consistent: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Sliding-window inference for images larger than the training
        resolution (extension — the reference resizes instead,
        infer.py:281-300): overlapping windows are forwarded, their
        logits averaged in the overlaps, then per-level argmax.

        images_u8 [B, H, W, 3]; window/stride in pixels (stride defaults
        to half the window). Window positions are static per input shape
        (one jit specialization per geometry).

        The whole sweep — every window forward, the overlap-add into the
        [B, C, H, W] logit accumulator, and the per-level argmax — runs
        as ONE jitted device program: the image transfers to the device
        once and only the small int32 masks come back (a host-side
        accumulator would move the full-res f32 logits across the relay
        once per tile, ~2 GB at 1024²+, and crawl).
        """
        B, H, W = images_u8.shape[:3]
        wh, ww = window
        sh, sw = stride or (wh // 2, ww // 2)
        if wh > H or ww > W:
            raise ValueError(f"window {window} larger than image {(H, W)}")

        def starts(total, win, step):
            s = list(range(0, max(total - win, 0) + 1, step))
            if s[-1] != total - win:
                s.append(total - win)
            return s

        ys, xs = starts(H, wh, sh), starts(W, ww, sw)
        run = self._sliding_program(B, H, W, wh, ww, tuple(ys), tuple(xs))
        variables = jax.device_put(self.variables, replicated_sharding(self.mesh))
        images = jax.device_put(images_u8, batch_sharding(self.mesh))
        preds = jax.device_get(run(variables, images))
        h = self.cfg.hierarchy
        out = {k: np.asarray(v) for k, v in preds.items()}
        if consistent:
            out["coarse"] = h.fine_to_coarse[out["fine"]].astype(np.int32)
            if h.has_super:
                out["super"] = h.fine_to_super[out["fine"]].astype(np.int32)
        return out

    def _sliding_program(self, B, H, W, wh, ww, ys, xs):
        """Jitted sweep for one geometry (cached: repeated calls with the
        same shapes reuse the compiled program)."""
        key = (B, H, W, wh, ww, ys, xs)
        cache = getattr(self, "_sliding_cache", None)
        if cache is None:
            cache = self._sliding_cache = {}
        if key in cache:
            return cache[key]
        h = self.cfg.hierarchy
        slices = dict(zip(("fine", "coarse", "super"), h.level_slices))
        if not h.has_super:
            slices.pop("super", None)

        @jax.jit
        def run(variables, images_u8):
            total = jnp.zeros((B, h.total_classes, H, W), jnp.float32)
            counts = jnp.zeros((H, W), jnp.float32)
            for y0 in ys:
                for x0 in xs:
                    tile = jax.lax.dynamic_slice(
                        images_u8, (0, y0, x0, 0), (B, wh, ww, 3)
                    )
                    _, logits = self._predict(variables, tile, (wh, ww))
                    total = total.at[:, :, y0 : y0 + wh, x0 : x0 + ww].add(logits)
                    counts = counts.at[y0 : y0 + wh, x0 : x0 + ww].add(1.0)
            logits = total / counts
            return {
                lvl: jnp.argmax(logits[:, lo:hi], axis=1).astype(jnp.int32)
                for lvl, (lo, hi) in slices.items()
            }

        cache[key] = run
        return run

    def predict_tta(
        self,
        images_u8: np.ndarray,
        scales: Tuple[float, ...] = (0.75, 1.0, 1.25),
        flip: bool = True,
        out_hw: Optional[Tuple[int, int]] = None,
        consistent: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Multi-scale + horizontal-flip test-time augmentation
        (extension — the reference has single-view inference only,
        infer.py:291-312; this is the standard DeepLab eval protocol):
        every scaled (and mirrored) view is forwarded, the per-level
        SOFTMAX probabilities are averaged at the output resolution,
        then argmaxed. The whole ensemble runs as one jitted device
        program per (shape, scales, flip) geometry — each view adds a
        conv-graph specialization on first use."""
        B, H, W = images_u8.shape[:3]
        out_hw = tuple(out_hw or (H, W))
        run = self._tta_program(B, H, W, tuple(scales), bool(flip), out_hw)
        variables = jax.device_put(self.variables, replicated_sharding(self.mesh))
        images = jax.device_put(images_u8, batch_sharding(self.mesh))
        out = {k: np.asarray(v) for k, v in jax.device_get(run(variables, images)).items()}
        if consistent:
            h = self.cfg.hierarchy
            out["coarse"] = h.fine_to_coarse[out["fine"]].astype(np.int32)
            if h.has_super:
                out["super"] = h.fine_to_super[out["fine"]].astype(np.int32)
        return out

    def _tta_program(self, B, H, W, scales, flip, out_hw):
        key = ("tta", B, H, W, scales, flip, out_hw)
        cache = getattr(self, "_sliding_cache", None)
        if cache is None:
            cache = self._sliding_cache = {}
        if key in cache:
            return cache[key]
        h = self.cfg.hierarchy
        slices = dict(zip(("fine", "coarse", "super"), h.level_slices))
        if not h.has_super:
            slices.pop("super", None)
        mean, std = self.cfg.transform.normalize_mean, self.cfg.transform.normalize_std

        @jax.jit
        def run(variables, images_u8):
            base = normalize_images(images_u8, mean, std)
            acc = jnp.zeros(
                (B, h.total_classes, out_hw[0], out_hw[1]), jnp.float32
            )
            for s in scales:
                hs, ws = max(int(round(H * s)), 32), max(int(round(W * s)), 32)
                view = (
                    base
                    if (hs, ws) == (H, W)
                    else jax.image.resize(
                        base, (B, hs, ws, 3), "linear", antialias=False
                    )
                )
                for mirrored in (False, True) if flip else (False,):
                    x = view[:, :, ::-1] if mirrored else view
                    out = self.model.apply(variables, x, train=False)
                    lo = jnp.transpose(out["logits"], (0, 3, 1, 2))
                    logits = jax.image.resize(
                        lo,
                        (B, h.total_classes, out_hw[0], out_hw[1]),
                        "linear",
                        antialias=False,
                    )
                    if mirrored:
                        logits = logits[:, :, :, ::-1]
                    acc = acc + jnp.concatenate(
                        [
                            jax.nn.softmax(logits[:, lo_:hi_], axis=1)
                            for lo_, hi_ in slices.values()
                        ],
                        axis=1,
                    )
            return {
                lvl: jnp.argmax(acc[:, lo_:hi_], axis=1).astype(jnp.int32)
                for lvl, (lo_, hi_) in slices.items()
            }

        cache[key] = run
        return run

    def predict_image(
        self, path: str, consistent: bool = False
    ) -> Tuple[Dict[str, np.ndarray], Image.Image]:
        """Single-image path: resize per config, predict, upsample masks
        to the ORIGINAL image size (infer.py:291-312)."""
        arr, orig_hw, pil = preprocess_image(path, self.cfg.transform.resize)
        preds = self.predict_array(arr[None], out_hw=orig_hw, consistent=consistent)
        return {k: v[0] for k, v in preds.items()}, pil

    # ------------------------------------------------------------------
    def export_masks(
        self, preds: Dict[str, np.ndarray], output_dir: str, base_name: str
    ) -> List[str]:
        """Write grayscale + colorized-with-indices PNGs per level
        (infer.py:314-353). Returns written paths."""
        from seghiero_tpu.infer.viz import (
            create_colormap,
            draw_class_indices,
            mask_to_color_image,
            save_mask,
        )

        h = self.cfg.hierarchy
        n_per_level = {"fine": h.n_fine, "coarse": h.n_coarse, "super": h.n_super}
        os.makedirs(output_dir, exist_ok=True)
        written = []
        for lvl, mask in preds.items():
            p = os.path.join(output_dir, f"{base_name}_{lvl}.png")
            save_mask(mask, p)
            written.append(p)
            color = mask_to_color_image(mask, create_colormap(n_per_level[lvl]))
            color = draw_class_indices(mask, color)
            pc = os.path.join(output_dir, f"{base_name}_{lvl}_color.png")
            color.save(pc)
            written.append(pc)
        return written
