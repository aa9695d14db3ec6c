"""Runner — rebuild target C3 (L4 of SURVEY.md §1): builds everything from
an ExperimentConfig and owns the epoch/step loops, periodic eval, ckpt
save/resume, and logging; train/eval/test share the construction path
(README.md:11 decoupled logic, README.md:12 one-command CLI).

Multi-chip: the same jitted step runs on a data mesh when >1 device is
visible (SURVEY.md §2c) — batch sharded, state replicated, no code fork
(the reference needs torchrun + DDP wrappers for this, README.md:29).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.configs.base import ExperimentConfig
from heltondetection_tpu.data.augment import EvalPipeline, TrainPipeline
from heltondetection_tpu.data.loader import EvalLoader, TrainLoader
from heltondetection_tpu.engine.evaluator import Evaluator
from heltondetection_tpu.parallel.mesh import (create_mesh, replicate,
                                               shard_batch)
from heltondetection_tpu.utils import ckpt as ckpt_io
from heltondetection_tpu.utils.cocoeval import DetEval, format_summary
from heltondetection_tpu.utils.log import TBWriter, get_logger


class _NullTB:
    """TensorBoard sink for non-zero ranks (the reference logs rank-0-only
    under DDP, SURVEY.md §3.1)."""

    def scalars(self, *a, **k):
        pass

    def close(self):
        pass


def build_dataset(dc, split: str = "train"):
    from heltondetection_tpu.data.readers import (CachedDataset, COCODataset,
                                                  DOTADataset, VisDroneDataset,
                                                  VOCDataset, YOLODataset)
    ann = dc.train_ann if split == "train" else dc.val_ann
    imgs = dc.train_imgs if split == "train" else dc.val_imgs
    if dc.format == "coco":
        ds = COCODataset(ann, imgs)
    elif dc.format == "yolo":
        ds = YOLODataset(imgs, ann, dc.class_names)
    elif dc.format == "dota":
        ds = DOTADataset(imgs, ann, dc.class_names)
    elif dc.format == "voc":
        ds = VOCDataset(ann, imgs, dc.class_names)
    elif dc.format == "visdrone":
        ds = VisDroneDataset(imgs, ann, dc.class_names)
    else:
        raise ValueError(f"unknown dataset format {dc.format}")
    if getattr(dc, "cache_images", False):
        ds = CachedDataset(ds)
    return ds


def build_model(mc, num_classes: int):
    dtype = jnp.bfloat16 if mc.dtype == "bfloat16" else jnp.float32
    if mc.family == "yolov5":
        from heltondetection_tpu.models.cspdarknet import VARIANTS
        from heltondetection_tpu.models.yolov5 import YOLOv5
        d, w = VARIANTS[mc.variant]
        return YOLOv5(num_classes=num_classes, depth_multiple=d,
                      width_multiple=w, dtype=dtype,
                      dropblock_p=mc.dropblock_p,
                      backbone=mc.backbone or "cspdarknet",
                      remat=getattr(mc, "remat", False))
    if mc.family == "faster_rcnn":
        from heltondetection_tpu.models.faster_rcnn import (FasterRCNN,
                                                            RCNNConfig)
        # proposal/sampling budgets: None keeps the torchvision defaults
        budgets = {k: v for k in ("rpn_pre_nms_topk", "rpn_post_nms_topk",
                                  "rpn_batch", "box_batch")
                   if (v := getattr(mc, k, None)) is not None}
        rcfg = RCNNConfig(num_classes=num_classes, img_size=mc.img_size,
                          neck=mc.neck, head=mc.head,
                          roi_method=mc.roi_method,
                          dropblock_p=mc.dropblock_p,
                          roi_levels=mc.roi_levels,
                          backbone=mc.backbone or "resnet50",
                          backbone_norm_eval=mc.backbone_norm_eval,
                          backbone_frozen_stages=mc.backbone_frozen_stages,
                          remat=getattr(mc, "remat", False), **budgets)
        return FasterRCNN(rcfg, dtype=dtype)
    raise ValueError(f"unknown model family {mc.family}")


def _frozen_prefixes(mc) -> tuple:
    """Optimizer freeze set: whole backbone (frozeBackbone ablation,
    README.md:132) or the faster_rcnn frozen stages (stem+layer1 default,
    torchvision trainable_backbone_layers=3)."""
    if mc.freeze_backbone:
        return ("backbone",)
    if mc.family == "faster_rcnn" and mc.backbone_frozen_stages > 0:
        from heltondetection_tpu.models.backbones import \
            frozen_stage_prefixes
        return frozen_stage_prefixes(mc.backbone or "resnet50",
                                     mc.backbone_frozen_stages)
    return ()


def _cfg_anchors(cfg: ExperimentConfig):
    """cfg.model.anchors → canonical nested tuples (or None for the v6.1
    default set) — every YOLO decode/loss/serve build site goes through
    this so a config's custom anchors (tools/autoanchor.py output) apply
    uniformly."""
    if getattr(cfg.model, "anchors", None) is None:
        return None
    from heltondetection_tpu.ops.anchors import normalize_anchors
    return normalize_anchors(cfg.model.anchors)


def _forward_for_eval(cfg: ExperimentConfig, model, variables, quant=None):
    """raw uint8 images → (boxes, obj, cls) unified eval contract (the
    /255 normalization is fused on device, BASELINE.json N7).

    The decode width comes from the MODEL (the head's actual class count),
    never cfg.model.num_classes — run_train derives num_classes from the
    annotations when they disagree with the config, and mixing the two
    sources here decodes a trained head at the wrong channel count.

    ``quant``: an ops/quant.py W8A8 tree; merged into the apply variables
    so the backbone/neck convs run the MXU's int8 path."""
    if quant is not None:
        variables = {**variables, "quant": quant}
    if cfg.model.family == "yolov5":
        from heltondetection_tpu.models.yolov5 import decode_full
        anchors = _cfg_anchors(cfg)

        def fwd(images):
            images = images.astype(jnp.float32) / 255.0
            outs = model.apply(variables, images, train=False)
            if anchors is not None:
                return decode_full(outs, model.num_classes, anchors=anchors)
            return decode_full(outs, model.num_classes)
        return fwd

    from heltondetection_tpu.models.faster_rcnn import faster_rcnn_infer

    def fwd(images):
        images = images.astype(jnp.float32) / 255.0
        ob, os_, oc, ov = faster_rcnn_infer(model, variables, images,
                                            model.cfg)
        # adapt fixed dets to the (boxes, obj, cls) contract: one-hot cls
        nc = model.cfg.num_classes
        cls = jax.nn.one_hot(jnp.maximum(oc, 0), nc) * ov[..., None]
        return ob, os_, cls
    return fwd


def _config_num_classes(cfg: ExperimentConfig) -> int:
    """The class count a train run of this config uses (run_train:
    ``ds.num_classes or cfg.model.num_classes``), derivable without a
    dataset object: explicit ``data.class_names`` win, else the val (or
    train) annotations are parsed for their category count, else
    ``cfg.model.num_classes``. Keeps test/export-time model construction
    consistent with the checkpoint that training actually wrote."""
    if cfg.data.class_names:
        return len(cfg.data.class_names)
    if cfg.data.val_ann or cfg.data.train_ann:
        split = "val" if cfg.data.val_ann else "train"
        try:
            nc = build_dataset(cfg.data, split).num_classes
            if nc:
                return nc
        except (OSError, ValueError) as e:   # dataset not mounted here —
            # legitimate for pure-inference hosts; the config value rules
            get_logger().info(
                "could not derive num_classes from %s annotations (%s); "
                "using cfg.model.num_classes=%d", split, e,
                cfg.model.num_classes)
    return cfg.model.num_classes


class _DatasetShard:
    """Index-strided view of a dataset for process-sharded eval: exposes
    exactly the (len, load) surface EvalPipeline consumes."""

    def __init__(self, ds, indices):
        self._ds = ds
        self._idx = list(indices)
        self.num_classes = getattr(ds, "num_classes", None)

    def __len__(self):
        return len(self._idx)

    def load(self, i):
        return self._ds.load(self._idx[i])


def _eval_multihost(cfg, ds, ev, det, nc: int, logger):
    """Process-sharded eval: local run over this rank's stride, det merge
    at rank 0 via the shared work_dir, stats broadcast via file. Returns
    the merged stats on every rank; ``det`` (the GT-registered DetEval)
    holds the merged detections on rank 0 only."""
    import json as _json

    from jax.experimental import multihost_utils

    from heltondetection_tpu.data.augment import EvalPipeline
    from heltondetection_tpu.data.loader import EvalLoader
    from heltondetection_tpu.utils.cocoeval import DetEval

    pid, nproc = jax.process_index(), jax.process_count()
    out_dir = os.path.join(cfg.work_dir, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    shard = _DatasetShard(ds, range(pid, len(ds), nproc))
    local = DetEval(nc)                 # dets only; GT lives in ``det``
    t0 = time.perf_counter()
    with EvalLoader(EvalPipeline(shard, cfg.model.img_size),
                    cfg.eval.batch_size,
                    num_workers=cfg.train.num_workers) as loader:
        local_stats = ev.run(loader, det_eval=local, verbose=False)
    entries = []
    for (img_id, cat), lst in local._dts.items():
        for box, score in lst:
            entries.append([img_id, int(cat), float(score),
                            [float(v) for v in box]])
    path = os.path.join(out_dir, f"eval_dets_rank{pid}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"n_images": int(local_stats["num_images"]),
                    "dets": entries}, f)
    os.replace(tmp, path)               # atomic: rank 0 never reads a half
    multihost_utils.sync_global_devices("helton_eval_dets_written")
    stats_path = os.path.join(out_dir, "eval_stats.json")
    if pid == 0:
        n_images = 0
        for r in range(nproc):
            with open(os.path.join(out_dir,
                                   f"eval_dets_rank{r}.json")) as f:
                payload = _json.load(f)
            n_images += payload["n_images"]
            for img_id, cat, score, box in payload["dets"]:
                det._dts.setdefault((img_id, cat), []).append(
                    (np.asarray(box, np.float32), score))
        stats = det.summarize()
        stats["num_images"] = n_images
        stats["images_per_sec"] = n_images / max(
            time.perf_counter() - t0, 1e-9)
        with open(stats_path + ".tmp", "w") as f:
            _json.dump(stats, f)
        os.replace(stats_path + ".tmp", stats_path)
        logger.info("multi-host eval: %d processes, %d images merged",
                    nproc, n_images)
    multihost_utils.sync_global_devices("helton_eval_stats_written")
    if pid != 0:
        with open(stats_path) as f:
            stats = _json.load(f)
    return stats


def run_eval(cfg: ExperimentConfig, variables=None, model=None,
             verbose: bool = True, dump_json: Optional[str] = None,
             _reuse: Optional[Dict] = None) -> Dict[str, float]:
    """--mode eval: val set → mAP (+ FLOPs/Params, README.md:24).

    ``dump_json``: also write the accumulated detections as a standard
    COCO results JSON (pycocotools loadRes / mmdet --format-only
    submission format), with labels mapped back to original category ids.

    ``_reuse``: a dict owned by the caller (run_train's in-loop eval) that
    persists the expensive constructions across calls — the parsed val
    dataset, the GT-registered DetEval (detections reset per call), and
    the JITTED (variables, images) step so XLA's compile cache hits every
    epoch instead of re-tracing a fresh closure (tens of seconds per eval
    otherwise). One-shot eval (``--mode eval``) passes None and behaves
    exactly as before.
    """
    logger = get_logger()
    if _reuse is not None and "ds" in _reuse:
        ds = _reuse["ds"]
    else:
        ds = build_dataset(cfg.data, "val")
        if _reuse is not None:
            _reuse["ds"] = ds
    nc = ds.num_classes or cfg.model.num_classes
    if model is None:
        model = build_model(cfg.model, nc)
        variables = _load_eval_variables(cfg, model)
    multi_label = cfg.eval.multi_label and cfg.model.family == "yolov5"
    # multi-chip eval: shard each val batch over the data mesh (all local
    # chips participate — beats the reference's rank-0-only DDP eval).
    # Single-process only: under multi-host, eval runs on rank 0 alone and
    # a global mesh would hang waiting for the other ranks' dispatches.
    mesh = None
    n_dev = len(jax.devices())
    if (jax.process_count() == 1 and n_dev > 1
            and cfg.eval.batch_size % n_dev == 0):
        mesh = create_mesh()
        logger.info("eval sharded over %d devices", n_dev)
    fused = cfg.model.family == "yolov5" and getattr(cfg.eval, "fused", True)
    if _reuse is not None:
        # persistent jitted (variables, images) step: partial-bind this
        # eval's variables; jax.jit caches on the underlying fn identity.
        # eval.int8 is deliberately ignored here: in-loop eval scores the
        # float weights (recalibrating PTQ per epoch would cost more than
        # the eval itself)
        if getattr(cfg.eval, "int8", False) and "int8_note" not in _reuse:
            _reuse["int8_note"] = True
            logger.info("eval.int8 ignored for in-training eval (float)")
        import functools
        jfn = _reuse.get("jfn")
        if jfn is None:
            if fused:
                import dataclasses as _dc
                from heltondetection_tpu.engine.evaluator import \
                    _packed_apply_fn
                model_p = _dc.replace(model, packed_head=True)
                jfn = jax.jit(_packed_apply_fn(
                    model_p, nc, conf_thres=cfg.eval.conf_thres,
                    iou_thres=cfg.eval.iou_thres, pre_nms_topk=1024,
                    max_det=cfg.eval.max_det,
                    approx=getattr(cfg.eval, "approx", False),
                    multi_label=multi_label, normalize=True,
                    anchors=_cfg_anchors(cfg)))
            else:
                from heltondetection_tpu.engine.evaluator import \
                    make_postprocess
                post = make_postprocess(nc, conf_thres=cfg.eval.conf_thres,
                                        iou_thres=cfg.eval.iou_thres,
                                        max_det=cfg.eval.max_det,
                                        multi_label=multi_label)

                def _raw(v, images):
                    boxes, obj, cls = _forward_for_eval(cfg, model, v)(images)
                    return post(boxes, obj, cls)

                jfn = jax.jit(_raw)
            _reuse["jfn"] = jfn
        if fused:
            from heltondetection_tpu.models.yolov5 import pack_head_variables
            bound = pack_head_variables(variables, nc)
        else:
            bound = variables
        # stage the weight tree on device ONCE per eval: the tree arrives
        # as host numpy (run_train device_gets it), and numpy jit args are
        # re-uploaded on EVERY call — per-batch H2D of the full weights
        if mesh is not None:
            rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            bound = jax.device_put(bound, rep)
        else:
            bound = jax.device_put(bound)
        step = functools.partial(jfn, bound)
        ev = Evaluator(None, nc, step_fn=step, mesh=mesh, jit_step=False)
    elif fused:
        # fused packed-head serve path (ops/postprocess.py): ~1.5× the
        # decode_full route's throughput, same pycocotools verdicts.
        # eval.int8 scores the SAME quantized program serving would run,
        # so the mAP cost of PTQ is measurable in-framework before deploy.
        from heltondetection_tpu.engine.evaluator import \
            make_packed_serve_step
        quant = _int8_quant_tree(cfg, model, variables) \
            if getattr(cfg.eval, "int8", False) else None
        step = make_packed_serve_step(model, variables, nc,
                                      conf_thres=cfg.eval.conf_thres,
                                      iou_thres=cfg.eval.iou_thres,
                                      max_det=cfg.eval.max_det,
                                      approx=getattr(cfg.eval, "approx",
                                                     False),
                                      multi_label=multi_label,
                                      anchors=_cfg_anchors(cfg), quant=quant)
        ev = Evaluator(None, nc, step_fn=step, mesh=mesh)
    else:
        quant = _int8_quant_tree(cfg, model, variables) \
            if getattr(cfg.eval, "int8", False) else None
        fwd = _forward_for_eval(cfg, model, variables, quant=quant)
        ev = Evaluator(fwd, nc, conf_thres=cfg.eval.conf_thres,
                       iou_thres=cfg.eval.iou_thres,
                       max_det=cfg.eval.max_det, multi_label=multi_label,
                       mesh=mesh)
    if _reuse is not None and "det" in _reuse:
        det = _reuse["det"]
        det.reset_dets()
    else:
        det = DetEval(nc)
        ds.gt_for_eval(det)
        if _reuse is not None:
            _reuse["det"] = det
    eval_pipe = None
    if cfg.train.native_loader:
        from heltondetection_tpu.data.native_loader import (
            NativeEvalPipeline, native_loader_available)
        if native_loader_available():
            eval_pipe = NativeEvalPipeline(
                ds, cfg.model.img_size,
                decode_in_pool=cfg.train.decode_in_pool)
    if _reuse is None and jax.process_count() > 1:
        # Multi-host eval (VERDICT r4 item 7): each process scores its
        # [pid::P] stride of the val set on its LOCAL devices, dets merge
        # at rank 0 through the shared work_dir (the mmdet lineage's
        # tmpdir collect — README.md:158-164; the shared filesystem is
        # already a requirement for multi-host checkpoint resume), and
        # the summary broadcasts back via the stats file. The reference's
        # DDP eval is rank-0-only (SURVEY.md §3.1) — this is a P-way
        # speedup over that. In-loop eval (_reuse) stays rank-0-only.
        stats = _eval_multihost(cfg, ds, ev, det, nc, logger)
        if jax.process_index() != 0:
            verbose = False          # artifacts/classwise need rank-0 dets
    else:
        if eval_pipe is None:
            eval_pipe = EvalPipeline(ds, cfg.model.img_size)
        with EvalLoader(eval_pipe, cfg.eval.batch_size,
                        num_workers=cfg.train.num_workers) as loader:
            stats = ev.run(loader, det_eval=det, verbose=False)
    if dump_json and jax.process_index() == 0:
        import json
        results = det.to_coco_json(getattr(ds, "label_to_cat", None))
        with open(dump_json, "w") as f:
            json.dump(results, f)
        logger.info("wrote %d detections (COCO results format) to %s",
                    len(results), dump_json)
    if verbose:
        logger.info("eval results for %s:\n%s", cfg.name,
                    format_summary(stats))
        from heltondetection_tpu.utils.cocoeval import (format_classwise,
                                                        save_confusion_png,
                                                        save_pr_curves_png,
                                                        save_prf_curves_png)
        names = getattr(ds, "class_names", None) or cfg.data.class_names
        logger.info("per-class AP (mmdet classwise lineage):\n%s",
                    format_classwise(det.per_class_ap(), names))
        try:
            art_dir = os.path.join(cfg.work_dir, cfg.name)
            os.makedirs(art_dir, exist_ok=True)
            cm_path = os.path.join(art_dir, "confusion_matrix.png")
            save_confusion_png(det.confusion_matrix(), names, cm_path)
            pr_path = os.path.join(art_dir, "pr_curve.png")
            save_pr_curves_png(det, names, pr_path)
            prf_path = os.path.join(art_dir, "prf_curve.png")
            best_conf, best_f1 = save_prf_curves_png(det, names, prf_path)
            logger.info("eval artifacts: confusion matrix (conf 0.25, IoU "
                        "0.45) → %s; PR curves @0.5 → %s; P/R/F1 vs conf "
                        "→ %s", cm_path, pr_path, prf_path)
            logger.info("mean-F1 peak %.3f at conf %.3f — the suggested "
                        "test.conf_thres for this model", best_f1,
                        best_conf)
        except Exception as e:   # matplotlib is optional at runtime
            logger.info("eval artifact rendering unavailable: %s", e)
        try:
            from heltondetection_tpu.utils.flops import model_complexity
            comp = model_complexity(model, variables, cfg.model.img_size)
            logger.info("FLOPs: %.2f G/img  Params: %.2f M",
                        comp["gflops_per_image"], comp["mparams"])
        except Exception as e:  # cost analysis can be backend-dependent
            logger.info("FLOPs unavailable: %s", e)
    return stats


def _load_eval_variables(cfg: ExperimentConfig, model=None):
    """Restore EMA params (fall back to raw params) from the work dir.
    ``cfg.eval.ckpt = "best"`` loads the best-val-AP snapshot (ckpt_best/,
    the lineage's best.pt) instead of the newest rotating checkpoint.

    Opt-state-free: restores only the inference fields of the saved
    TrainState (ckpt.restore_eval_variables), so eval works on checkpoints
    trained under ANY freeze/grad_clip/ema settings — no optimizer donor
    tree to reconstruct. ``model`` is unused (kept for call-site symmetry
    with build_model)."""
    del model
    ckpt_dir = cfg.ckpt_dir
    if getattr(cfg.eval, "ckpt", "last") == "best":
        if ckpt_io.latest_step(cfg.best_ckpt_dir) is not None:
            ckpt_dir = cfg.best_ckpt_dir
        else:
            get_logger().warning("eval.ckpt='best' but %s has no snapshot "
                                 "(no in-loop eval improved yet?); falling "
                                 "back to %s", cfg.best_ckpt_dir, cfg.ckpt_dir)
    v = ckpt_io.restore_eval_variables(ckpt_dir)
    params = v["ema_params"] if v["ema_params"] is not None else v["params"]
    return {"params": params, "batch_stats": v["batch_stats"]}


def run_train(cfg: ExperimentConfig, resume: bool = True
              ) -> Dict[str, float]:
    """--mode train: full training with warmup+cosine AdamW, EMA, periodic
    eval + checkpointing; data-parallel over all visible devices."""
    from heltondetection_tpu.train.schedule import make_optimizer
    from heltondetection_tpu.train.trainer import (TrainState,
                                                   create_train_state,
                                                   make_rcnn_train_step,
                                                   make_train_step)
    from heltondetection_tpu.train.yolo_loss import YoloLossConfig

    # multi-host bootstrap FIRST (the reference's torchrun process-group
    # init, SURVEY.md §3.1): a no-op on a single host; on a pod/cluster it
    # makes jax.devices() span every host so create_mesh() below is global
    from heltondetection_tpu.parallel.mesh import init_distributed
    accum = max(int(getattr(cfg.train, "grad_accum", 1)), 1)
    if cfg.train.batch_size % accum:
        raise ValueError(f"batch_size ({cfg.train.batch_size}) must be "
                         f"divisible by grad_accum ({accum})")
    init_distributed()
    pid, nproc = jax.process_index(), jax.process_count()
    # file handler rank-0-only (like TB below): N ranks appending to one
    # shared train.log interleave corrupted lines; stream logging stays on
    # every rank
    logger = get_logger(log_file=os.path.join(cfg.log_dir, "train.log")
                        if pid == 0 else None)
    tb = TBWriter(cfg.log_dir) if pid == 0 else _NullTB()
    ds = build_dataset(cfg.data, "train")
    nc = ds.num_classes or cfg.model.num_classes
    cfg.model.num_classes = nc
    model = build_model(cfg.model, nc)

    if cfg.train.autoanchor and cfg.model.family == "yolov5":
        # v6.1-lineage anchor check (data/autoanchor.py): measure best-
        # possible-recall of the configured anchors against the labels; re-
        # fit when BPR < 0.98. Deterministic under seed, so every process
        # computes identical anchors — no broadcast needed multi-host.
        from heltondetection_tpu.data.autoanchor import check_anchors
        new, st = check_anchors(ds, img_size=cfg.model.img_size,
                                anchors=_cfg_anchors(cfg),
                                seed=cfg.train.seed)
        if new is not None:
            logger.info(
                "autoanchor: BPR %.4f < 0.98 — re-fit anchors (BPR %.4f, "
                "fitness %.4f→%.4f over %d boxes): %s", st["prev_bpr"],
                st["bpr"], st["prev_fitness"], st["fitness"], st["n_boxes"],
                new)
            cfg.model.anchors = new     # every decode/loss/serve build
            # site reads through _cfg_anchors(cfg)
        else:
            logger.info("autoanchor: anchors fit the data (BPR %.4f over "
                        "%d boxes), keeping them", st["bpr"], st["n_boxes"])

    device_aug = cfg.train.device_aug and cfg.model.family == "yolov5"
    if device_aug:
        pipe = None
        if cfg.train.native_loader:
            from heltondetection_tpu.data.native_loader import (
                NativeDeviceAugPipeline, native_loader_available)
            if native_loader_available():
                pipe = NativeDeviceAugPipeline(
                    ds, cfg.model.img_size, max_boxes=cfg.data.max_boxes,
                    seed=cfg.train.seed, mosaic_p=cfg.train.mosaic_p,
                    decode_in_pool=cfg.train.decode_in_pool)
        if pipe is None:
            from heltondetection_tpu.data.augment import DeviceAugPipeline
            pipe = DeviceAugPipeline(ds, cfg.model.img_size,
                                     max_boxes=cfg.data.max_boxes,
                                     seed=cfg.train.seed,
                                     mosaic_p=cfg.train.mosaic_p)
        loader = TrainLoader(pipe, cfg.train.batch_size,
                             seed=cfg.train.seed,
                             num_workers=cfg.train.num_workers,
                             keys=("images4", "boxes4", "cls4", "mask4",
                                   "mosaic4"),
                             shard=(pid, nproc))
    else:
        pipe = None
        if cfg.train.native_loader:
            # C++ batch pipeline (bit-identical pixels; falls back silently
            # when the toolchain/OpenCV dev files are missing)
            from heltondetection_tpu.data.native_loader import (
                NativeTrainPipeline, native_loader_available)
            if native_loader_available():
                pipe = NativeTrainPipeline(
                    ds, cfg.model.img_size, mosaic_p=cfg.train.mosaic_p,
                    hsv=cfg.train.hsv, flip_p=cfg.train.flip_p,
                    mixup_p=cfg.train.mixup_p,
                    max_boxes=cfg.data.max_boxes, seed=cfg.train.seed,
                    decode_in_pool=cfg.train.decode_in_pool)
        if pipe is None:
            pipe = TrainPipeline(ds, cfg.model.img_size,
                                 mosaic_p=cfg.train.mosaic_p,
                                 hsv=cfg.train.hsv, flip_p=cfg.train.flip_p,
                                 mixup_p=cfg.train.mixup_p,
                                 max_boxes=cfg.data.max_boxes,
                                 seed=cfg.train.seed)
        loader = TrainLoader(pipe, cfg.train.batch_size, seed=cfg.train.seed,
                             num_workers=cfg.train.num_workers,
                             shard=(pid, nproc))
    steps_per_epoch = loader.steps_per_epoch()
    if steps_per_epoch < 1:
        # a zero-step epoch would silently "train" nothing while still
        # checkpointing and evaluating the init
        raise ValueError(
            f"dataset yields 0 steps/epoch: {len(ds)} images < global "
            f"batch_size {cfg.train.batch_size} — shrink train.batch_size "
            "or add data")
    total_steps = steps_per_epoch * cfg.train.epochs
    tx = make_optimizer(cfg.train.lr, total_steps=total_steps,
                        warmup_steps=int(cfg.train.warmup_epochs *
                                         steps_per_epoch),
                        weight_decay=cfg.train.weight_decay,
                        final_lr_frac=cfg.train.final_lr_frac,
                        grad_clip=cfg.train.grad_clip,
                        frozen_prefixes=_frozen_prefixes(cfg.model))

    is_rcnn = cfg.model.family == "faster_rcnn"
    if is_rcnn and cfg.train.multi_scale:
        raise ValueError(
            "train.multi_scale is a yolov5 feature (the two-stage proposal/"
            "sampling budgets are tuned per resolution — train separate "
            "faster_rcnn configs per size instead)")
    if is_rcnn:
        from heltondetection_tpu.models.faster_rcnn import init_faster_rcnn
        v = init_faster_rcnn(model, jax.random.PRNGKey(cfg.train.seed),
                             cfg.model.img_size)
        state = TrainState(v["params"], v["batch_stats"],
                           tx.init(v["params"]), jnp.zeros((), jnp.int32),
                           v["params"] if cfg.train.ema else None)
        step_fn = jax.jit(make_rcnn_train_step(model, tx, model.cfg,
                                               use_ema=cfg.train.ema,
                                               accum_steps=accum))
    else:
        state = create_train_state(model,
                                   jax.random.PRNGKey(cfg.train.seed),
                                   cfg.model.img_size, tx,
                                   use_ema=cfg.train.ema)
        loss_cfg = YoloLossConfig(num_classes=nc,
                                  img_size=cfg.model.img_size,
                                  focal=cfg.train.focal,
                                  label_smoothing=cfg.train.label_smoothing,
                                  anchors=_cfg_anchors(cfg))
        # packed train head: identical params + math (pinned by
        # tests/test_yolo_loss.py parity test), loss-friendly layout;
        # `model` itself stays standard for the periodic-eval path
        import dataclasses
        train_model = dataclasses.replace(model, packed_train=True)
        base_step = make_train_step(train_model, tx, loss_cfg,
                                    use_ema=cfg.train.ema,
                                    accum_steps=accum)
        if device_aug:
            from heltondetection_tpu.data.device_aug import \
                device_augment_batch
            aug_key = jax.random.PRNGKey(cfg.train.seed + 7)

            def _augmented(state, batch):
                r = jax.random.fold_in(aug_key, state.step)
                aug = device_augment_batch(batch, r,
                                           flip_p=cfg.train.flip_p,
                                           hsv=cfg.train.hsv,
                                           mixup_p=cfg.train.mixup_p)
                return state, aug
        else:
            def _augmented(state, batch):
                return state, batch

        if cfg.train.multi_scale:
            # multi-scale training, TPU-idiomatic (configs/base.py knob):
            # a seeded, resume-stable per-step schedule over a few
            # /32-bucket sizes; `size` is STATIC, so each bucket is one
            # cached XLA program and the resize fuses into that step —
            # bucketed static shapes instead of dynamic ones. Every rank
            # derives the same size from (seed, global step), so
            # multi-host programs stay in lockstep.
            from heltondetection_tpu.train.trainer import (multiscale_sizes,
                                                           resize_batch_to)
            if cfg.train.spatial_shards > 1:
                raise ValueError("multi_scale does not compose with "
                                 "spatial_shards (per-bucket H splits)")
            ms_sizes = multiscale_sizes(cfg.model.img_size,
                                        cfg.train.multi_scale)
            logger.info("multi-scale training over buckets %s", ms_sizes)

            def _sized(state, batch, size):
                state, batch = _augmented(state, batch)
                return base_step(state, resize_batch_to(batch, size))

            ms_jfn = jax.jit(_sized, static_argnums=2)
            ms_counter = {"n": None}

            def step_fn(state, batch):
                if ms_counter["n"] is None:   # one sync, resume-aware
                    ms_counter["n"] = int(jax.device_get(state.step))
                i = int(np.random.default_rng(
                    (cfg.train.seed << 20) ^ ms_counter["n"]
                ).integers(len(ms_sizes)))
                ms_counter["n"] += 1
                return ms_jfn(state, batch, ms_sizes[i])
        elif device_aug:
            def step_fn(state, batch):
                state, aug = _augmented(state, batch)
                return base_step(state, aug)

            step_fn = jax.jit(step_fn)
        else:
            step_fn = jax.jit(base_step)

    if cfg.train.backbone_pretrain:
        # ImageNet-pretrained backbone ingestion (README.md:65,132): a
        # torchvision ResNet state_dict .pth converted + grafted in place
        from heltondetection_tpu.utils.torch_convert import graft_backbone
        params, batch_stats = graft_backbone(
            state.params, state.batch_stats, cfg.train.backbone_pretrain)
        state = state._replace(
            params=params, batch_stats=batch_stats,
            ema_params=params if state.ema_params is not None else None)
        logger.info("loaded pretrained backbone from %s",
                    cfg.train.backbone_pretrain)

    if cfg.train.pretrain_ckpt:  # transfer init (README.md:79)
        params = ckpt_io.load_params_for_transfer(cfg.train.pretrain_ckpt,
                                                  state.params)
        # seed EMA only when EMA is on: with ema=False the step never
        # updates ema_params, and eval/export prefer them when present —
        # an unconditional seed would score the untrained transfer init
        state = state._replace(
            params=params,
            ema_params=params if state.ema_params is not None else None)
        logger.info("loaded transfer weights from %s",
                    cfg.train.pretrain_ckpt)

    start_epoch = 0
    if resume and ckpt_io.latest_step(cfg.ckpt_dir) is not None:
        try:
            state = ckpt_io.restore_state(cfg.ckpt_dir, state)
            start_epoch = int(state.step) // steps_per_epoch
            logger.info("resumed from step %d (epoch %d)", int(state.step),
                        start_epoch)
        except (ValueError, KeyError) as e:
            # incompatible checkpoint in the work dir (different model /
            # num_classes) — start fresh rather than crash mid-resume
            logger.warning("ignoring incompatible checkpoint in %s: %s",
                           cfg.ckpt_dir, e)

    if (cfg.model.family == "faster_rcnn" and start_epoch == 0
            and (cfg.model.backbone_norm_eval
                 or cfg.model.backbone_frozen_stages > 0)
            and not cfg.train.backbone_pretrain
            and not cfg.train.pretrain_ckpt):
        # the FrozenBN + frozen-stages defaults implement the lineage's
        # PRETRAINED-fine-tune semantics (torchvision/mmdet); without any
        # pretrained init they would freeze a RANDOM stem/layer1 and pin
        # BNs to init running stats (mean 0, var 1) — silently much worse
        # (checked after resume: a restored run is not from scratch)
        logger.warning(
            "faster_rcnn is training FROM SCRATCH but backbone_norm_eval=%s/"
            "backbone_frozen_stages=%d assume a pretrained backbone: set "
            "train.backbone_pretrain (torchvision ResNet .pth via "
            "utils/torch_convert) or, for from-scratch runs, set "
            "model.backbone_norm_eval=False and backbone_frozen_stages=0",
            cfg.model.backbone_norm_eval, cfg.model.backbone_frozen_stages)

    if nproc > 1:
        # cross-rank resume agreement: every process restored independently
        # above — a per-host ckpt_dir, or one rank hitting the incompatible-
        # checkpoint fallback while another restores, would dispatch global
        # train programs from DIFFERENT epochs (a collective hang) or
        # replicate() divergent params as if identical (silent divergence).
        # Fail loudly instead.
        from jax.experimental import multihost_utils
        fp = np.asarray(
            [float(start_epoch), float(state.step),
             float(sum(np.abs(np.asarray(l, np.float64)).sum()
                       for l in jax.tree_util.tree_leaves(state.params)))],
            np.float64)
        all_fp = multihost_utils.process_allgather(fp)
        if not np.array_equal(all_fp, np.broadcast_to(all_fp[0], all_fp.shape)):
            raise ValueError(
                "multi-host resume disagreement: per-rank (start_epoch, "
                f"step, param-checksum) = {all_fp.tolist()} — ranks must "
                "restore the SAME checkpoint (shared ckpt_dir)")

    n_dev = len(jax.devices())
    mesh = None
    sp = cfg.train.spatial_shards
    if sp > 1:
        # 2-D data×spatial mesh: image H sharded over `spatial` (GSPMD
        # halo-exchanges conv boundaries over ICI) — resolutions past one
        # chip's HBM train without model changes (SURVEY.md §5 analog)
        from heltondetection_tpu.parallel.spatial import create_spatial_mesh
        # both families: GSPMD halo-exchanges the convs; the RCNN RoI row
        # gathers read the H-sharded pyramid through XLA-inserted
        # collectives (equivalence pinned in tests/test_parallel_spatial)
        if device_aug:
            raise ValueError("spatial_shards composes with the host loader "
                             "path, not device_aug (tile layouts differ)")
        if n_dev % sp or cfg.train.batch_size % (n_dev // sp):
            raise ValueError(
                f"spatial_shards={sp} needs devices ({n_dev}) divisible by "
                f"it and batch_size ({cfg.train.batch_size}) divisible by "
                f"the data axis ({n_dev // sp})")
        # coarsest pyramid stride: 32 for the YOLO P3-P5 head, 64 for the
        # FasterRCNN P2-P6 pyramid (P6 rows must also split evenly)
        max_stride = 64 if cfg.model.family == "faster_rcnn" else 32
        if cfg.model.img_size % (sp * max_stride):
            raise ValueError(
                f"img_size {cfg.model.img_size} must divide by "
                f"spatial_shards*{max_stride} = {sp * max_stride} so every "
                "pyramid level splits evenly")
        mesh = create_spatial_mesh(n_dev // sp, sp)
        state = replicate(state, mesh)
        logger.info("data-parallel x spatial over %dx%d devices "
                    "(%d processes)", n_dev // sp, sp, nproc)
    elif n_dev > 1 and cfg.train.batch_size % n_dev == 0:
        mesh = create_mesh()
        state = replicate(state, mesh)
        logger.info("data-parallel over %d devices (%d processes)",
                    n_dev, nproc)
    elif nproc > 1:
        # multi-process REQUIRES the global mesh: each process only holds
        # a batch slice, there is no unsharded fallback
        raise ValueError(
            f"multi-host run ({nproc} processes) needs batch_size "
            f"({cfg.train.batch_size}) divisible by device count ({n_dev})")
    elif n_dev > 1:
        # single-process fallback to ONE device: legitimate for tiny debug
        # batches, but never silent — 7 of 8 chips idling looks identical
        # to a healthy run otherwise
        logger.warning(
            "batch_size %d not divisible by the %d visible devices — "
            "training on ONE device only; make batch_size a multiple of "
            "%d for data parallelism", cfg.train.batch_size, n_dev, n_dev)
    if mesh is not None and accum > 1 \
            and (cfg.train.batch_size // accum) % mesh.shape["data"]:
        # each scanned micro-batch must itself shard over the data axis
        raise ValueError(
            f"grad_accum={accum} micro-batches of "
            f"{cfg.train.batch_size // accum} don't divide the data axis "
            f"({mesh.shape['data']} devices)")

    logger.info("training %s: %d epochs x %d steps", cfg.name,
                cfg.train.epochs, steps_per_epoch)
    # SURVEY.md §5 tracing: jax.profiler capture behind an env flag
    trace_dir = os.environ.get("HELTON_PROFILE_DIR")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    # SURVEY.md §5 sanitizers: the reference has no TSAN/ASAN surface; the
    # JAX-level equivalent risk check is NaN trapping on every jitted op
    if os.environ.get("HELTON_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    # async ckpt writer (rank 0 only — the saver rank): epoch saves stage
    # the host state and write on orbax's background thread while the next
    # epochs train; close() below blocks until the last write committed
    writer = best_writer = None
    if jax.process_index() == 0:
        writer = ckpt_io.CheckpointWriter(cfg.ckpt_dir)
        # best-val-AP snapshot (the lineage's best.pt): one slot, written
        # whenever the in-loop eval improves; eval/test/export load it
        # with cfg.eval.ckpt = "best"
        best_writer = ckpt_io.CheckpointWriter(cfg.best_ckpt_dir,
                                               max_to_keep=1)
    try:
        best = _train_epochs(cfg, loader, step_fn, state, is_rcnn, mesh,
                             rng, tb, logger, start_epoch, steps_per_epoch,
                             model, writer, best_writer)
    finally:
        loader.close()
        for w in (writer, best_writer):
            if w is not None:
                w.close()
        if trace_dir:
            jax.profiler.stop_trace()
        tb.close()
    return best


def _train_epochs(cfg, loader, step_fn, state, is_rcnn, mesh, rng, tb,
                  logger, start_epoch, steps_per_epoch, model, writer=None,
                  best_writer=None):
    # seed with a previous run's best (best.json) so a restarted run's
    # first eval cannot overwrite a better snapshot in the one-slot
    # ckpt_best/ — read UNCONDITIONALLY: a crash before the first rotating
    # ckpt (or an incompatible-checkpoint fresh start) restarts at
    # start_epoch 0 yet ckpt_best/ may already hold a better model
    best: Dict[str, float] = _read_best_json(cfg)
    patience = getattr(cfg.train, "patience", None)
    # early-stop window anchor: a resumed run's inherited best counts from
    # the restart, giving the continuation a full fresh window
    best_epoch = start_epoch - 1
    # in-loop eval reuse: parsed val set, GT-registered DetEval, and the
    # jitted eval step persist across epochs (run_eval's _reuse contract)
    eval_reuse: Dict = {}
    for epoch in range(start_epoch, cfg.train.epochs):
        t0 = time.time()
        agg: Dict[str, float] = {}
        n_steps = 0
        for batch in loader.epoch(epoch):
            # images stay uint8 until inside the jitted step (the train
            # steps normalize fused; device_aug normalizes in its own path)
            if is_rcnn:
                # box convert on HOST numpy: a jnp convert here would put
                # the boxes on the default device only to pull them back in
                # shard_batch (multi-process) or re-place them (mesh)
                bb = np.asarray(batch.pop("gt_boxes"), np.float32)
                half = bb[..., 2:] * 0.5
                batch["gt_boxes_xyxy"] = np.concatenate(
                    [bb[..., :2] - half, bb[..., :2] + half], axis=-1)
            if mesh is not None:
                # numpy straight into the sharded placement: ONE host→device
                # transfer (a jnp.asarray first would stage through the
                # default device, tripling multi-process transfer traffic)
                batch = shard_batch(batch, mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if is_rcnn:
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, batch, sub)
            else:
                state, metrics = step_fn(state, batch)
            n_steps += 1
            # accumulate DEVICE scalars: a float(v) here would sync every
            # step, serializing host prep/transfer behind device compute
            # (the evaluator pipelines the same way); one fetch per epoch
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        agg = {k: float(v) / max(n_steps, 1) for k, v in agg.items()}
        tb.scalars(epoch, agg, prefix="train/")
        logger.info("epoch %d/%d  %.1fs  %s", epoch + 1, cfg.train.epochs,
                    time.time() - t0,
                    "  ".join(f"{k}={v:.4f}" for k, v in agg.items()))

        last = epoch == cfg.train.epochs - 1
        stop = False
        # rank-0-only ckpt + eval (the reference's DDP pattern): the state
        # is replicated, so process 0's local copy is the full state; eval
        # runs on process-local devices only, so other ranks skipping it
        # cannot deadlock any collective
        if jax.process_index() == 0:
            host_state = None   # one device_get per epoch, shared by saves
            if ((epoch + 1) % cfg.train.ckpt_interval == 0 or last) \
                    and writer is not None:
                # device_get snapshots the state to fresh host buffers, so
                # the async write never races the next epoch's updates
                host_state = jax.device_get(state)
                writer.save(host_state, int(state.step))
            if (epoch + 1) % cfg.train.eval_interval == 0 or last:
                params = state.ema_params if state.ema_params is not None \
                    else state.params
                variables = {"params": jax.device_get(params),
                             "batch_stats": jax.device_get(state.batch_stats)}
                if cfg.data.val_ann:
                    stats = run_eval(cfg, variables=variables, model=model,
                                     verbose=False, _reuse=eval_reuse)
                    tb.scalars(epoch, {"AP": stats["AP"],
                                       "AP50": stats["AP50"]}, prefix="val/")
                    logger.info("epoch %d val: AP=%.4f AP50=%.4f", epoch + 1,
                                stats["AP"], stats["AP50"])
                    if stats.get("AP", 0) > best.get("AP", -1):
                        best = stats
                        best_epoch = epoch
                        if best_writer is not None:
                            if host_state is None:
                                host_state = jax.device_get(state)
                            best_writer.save(host_state, int(state.step))
                            _write_best_json(cfg, stats, int(state.step))
                            logger.info("epoch %d: new best AP=%.4f → %s",
                                        epoch + 1, stats["AP"],
                                        cfg.best_ckpt_dir)
                    elif patience is not None \
                            and epoch - best_epoch >= patience:
                        # early stopping (ultralytics lineage): no val-AP
                        # improvement for `patience` epochs
                        logger.info(
                            "early stop at epoch %d: no val AP improvement "
                            "since epoch %d (patience %d); best AP=%.4f",
                            epoch + 1, best_epoch + 1, patience,
                            best.get("AP", 0.0))
                        stop = True
                        if host_state is None and writer is not None:
                            # final weights would otherwise only exist if
                            # ckpt_interval happened to line up
                            writer.save(jax.device_get(state),
                                        int(state.step))
        if patience is not None and jax.process_count() > 1:
            # ALL ranks must agree to break (eval ran on rank 0 only); a
            # collective each eval-capable epoch is noise next to the eval
            from jax.experimental import multihost_utils
            stop = bool(multihost_utils.broadcast_one_to_all(
                np.asarray(stop)))
        if stop:
            break
    return best


def _best_json_path(cfg) -> str:
    return os.path.join(cfg.work_dir, cfg.name, "best.json")


def _write_best_json(cfg, stats: Dict[str, float], step: int) -> None:
    import json
    with open(_best_json_path(cfg), "w") as f:
        json.dump({"AP": stats["AP"], "AP50": stats["AP50"], "step": step},
                  f)


def _read_best_json(cfg) -> Dict[str, float]:
    """Best-so-far val stats from a previous run (resume must not let a
    worse post-restart eval overwrite the genuinely best snapshot)."""
    import json
    try:
        with open(_best_json_path(cfg)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def load_detector(config, ckpt: Optional[str] = None, **detector_kwargs):
    """One-liner programmatic API: load a trained run as a ready
    :class:`~heltondetection_tpu.engine.infer.Detector` (also exported as
    ``heltondetection_tpu.load_detector``). The CLI's ``--mode test`` path
    uses the same construction; this is the notebook/script entry the
    reference's pedagogical audience reaches for.

    ``config``: an :class:`ExperimentConfig` or a path to a config file.
    ``ckpt``: ``None`` (respect ``cfg.eval.ckpt``), ``"last"``, ``"best"``,
    or an explicit checkpoint directory. ``detector_kwargs`` override the
    config's test-time knobs (``conf_thres``, ``iou_thres``, ``tta``,
    ``tta_scales``, ``max_det``).

    >>> det = heltondetection_tpu.load_detector("configs/myexp.py")
    >>> boxes, scores, classes = det.detect_image(img_rgb)
    """
    import dataclasses as _dc

    if isinstance(config, str):
        from heltondetection_tpu.configs.base import load_config
        cfg = load_config(config)
    else:
        cfg = config
    nc = _config_num_classes(cfg)
    model = build_model(cfg.model, nc)
    if ckpt in (None, "last", "best"):
        if ckpt is not None:
            cfg = _dc.replace(cfg, eval=_dc.replace(cfg.eval, ckpt=ckpt))
        variables = _load_eval_variables(cfg, model)
    else:   # explicit checkpoint directory
        v = ckpt_io.restore_eval_variables(ckpt)
        params = v["ema_params"] if v["ema_params"] is not None \
            else v["params"]
        variables = {"params": params, "batch_stats": v["batch_stats"]}
    return _make_detector(cfg, model, variables, nc, **detector_kwargs)


def _make_detector(cfg, model, variables, nc: int, **overrides):
    """Shared Detector construction for load_detector / run_test: the
    config's test-time knobs (overridable), riding the fused packed-head
    serve step for yolov5 — ~1.5× the decode_full route's throughput, and
    it compiles in seconds where that route takes minutes at real sizes
    (the production serving path, BatchingDetector, uses the same
    program)."""
    from heltondetection_tpu.engine.infer import Detector
    kw = dict(conf_thres=cfg.test.conf_thres, iou_thres=cfg.test.iou_thres,
              tta=cfg.test.tta, tta_scales=cfg.test.tta_scales)
    kw.update(overrides)
    int8 = kw.pop("int8", getattr(cfg.test, "int8", False))
    if cfg.model.family == "yolov5" and getattr(cfg.eval, "fused", True) \
            and "detect_fn" not in kw:
        from heltondetection_tpu.engine.evaluator import \
            make_packed_serve_step
        quant = _int8_quant_tree(cfg, model, variables) if int8 else None
        kw["detect_fn"] = make_packed_serve_step(
            model, variables, nc, conf_thres=kw["conf_thres"],
            iou_thres=kw["iou_thres"], max_det=kw.get("max_det", 300),
            multi_label=False, anchors=_cfg_anchors(cfg), quant=quant)
        fwd = None
    else:
        quant = None
        if int8 and "detect_fn" in kw:
            get_logger().warning(
                "test.int8 requested but a caller-supplied detect_fn "
                "overrides the built serve step — the custom fn runs as "
                "given (float unless it quantizes itself)")
        elif int8:
            quant = _int8_quant_tree(cfg, model, variables)
        fwd = _forward_for_eval(cfg, model, variables, quant=quant)
    return Detector(fwd, nc, cfg.model.img_size, **kw)


def _quant_cache_paths(tree):
    """Flatten a quant tree to {slash-path: np.ndarray} for npz I/O."""
    flat = {}

    def _walk(t, path):
        for k, v in t.items():
            if isinstance(v, dict):
                _walk(v, path + (k,))
            else:
                flat["/".join(path + (k,))] = np.asarray(v)
    _walk(tree, ())
    return flat


def _params_fingerprint(variables) -> np.ndarray:
    """Cheap deterministic checkpoint identity for the quant cache: leaf
    count + float64 sum of per-leaf |x| sums over params AND batch_stats
    (the fold consumes both)."""
    leaves = jax.tree_util.tree_leaves(
        {"p": variables.get("params", {}),
         "b": variables.get("batch_stats", {})})
    s = np.float64(0.0)
    for leaf in leaves:
        s += np.float64(np.sum(np.abs(np.asarray(leaf, np.float64))))
    return np.asarray([len(leaves), s], np.float64)


def _int8_quant_tree(cfg, model, variables):
    """Calibrate + build the W8A8 "quant" collection (ops/quant.py) on the
    first ``cfg.test.int8_calib`` calibration images, letterboxed exactly
    as serving letterboxes them. Beyond-reference: the reference's fastest
    deploy path is half-precision ONNX (README.md:23); v5e's int8 MXU path
    doubles the conv peak.

    Calibration images come from ``cfg.test.int8_calib_dir`` (a directory
    of images — lets pure-inference hosts run ``--mode test`` int8 without
    the val split on disk) or else the val set. The resulting tree is
    CACHED at ``{work_dir}/{name}/int8_quant.npz`` keyed by a checkpoint
    fingerprint + calibration id, so repeated ``load_detector`` calls
    skip the calibrate+fold pass (deterministic for a given ckpt+calib
    set)."""
    from heltondetection_tpu.data.augment import letterbox_np
    from heltondetection_tpu.ops.quant import (quantize_rcnn, quantize_yolo,
                                               quantize_yolo_flow)
    from heltondetection_tpu.ops.quant import YOLO_INT8_SKIP_PRESETS
    logger = get_logger()
    mode = getattr(cfg.test, "int8_mode", "layer")
    if mode not in ("layer", "flow"):
        raise ValueError(
            f"test.int8_mode={mode!r} — expected 'layer' or 'flow'")
    act_clip = getattr(cfg.test, "int8_act_clip", "p999")
    if act_clip not in ("p999", "amax"):
        raise ValueError(
            f"test.int8_act_clip={act_clip!r} — expected 'p999' or 'amax'")
    skip = getattr(cfg.test, "int8_skip", None)
    tail = getattr(cfg.test, "int8_float_tail", "balanced")
    if skip is not None:
        skip = tuple(skip)
        tail = f"skip{len(skip)}"
    elif cfg.model.family == "yolov5":
        if tail not in YOLO_INT8_SKIP_PRESETS:
            raise ValueError(
                f"test.int8_float_tail={tail!r} — expected one of "
                f"{sorted(YOLO_INT8_SKIP_PRESETS)}")
        skip = YOLO_INT8_SKIP_PRESETS[tail]
    else:
        # the float-tail sensitivity sweep covers the YOLO family only;
        # two-stage models keep their measured default (stem float)
        skip = ("backbone/stem_conv",)
        tail = "rcnn-default"
    if mode == "flow" and cfg.model.family != "yolov5":
        logger.warning("test.int8_mode='flow' is yolov5-only — using the "
                       "per-layer W8A8 mode for %s", cfg.model.family)
        mode = "layer"
    n_want = int(getattr(cfg.test, "int8_calib", 32))
    calib_dir = getattr(cfg.test, "int8_calib_dir", None)
    no_boxes = np.zeros((0, 4), np.float32)
    if calib_dir:
        from heltondetection_tpu.data.readers import (YOLODataset,
                                                      imread_rgb)
        files = sorted(
            os.path.join(calib_dir, f) for f in os.listdir(calib_dir)
            if os.path.splitext(f)[1].lower() in YOLODataset.IMG_EXTS
        )[:n_want]
        if not files:
            raise ValueError(
                f"test.int8_calib_dir={calib_dir!r} holds no images")
        # Key the cache on file identities (name+mtime+size), not just the
        # count: replacing calibration images in-place must invalidate the
        # cached activation scales.
        import hashlib
        h = hashlib.sha256()
        for f in files:
            st = os.stat(f)
            h.update(f"{os.path.basename(f)}:{st.st_mtime_ns}:"
                     f"{st.st_size};".encode())
        calib_id = (f"{mode}:{tail}:{act_clip}:sz{cfg.model.img_size}:"
                    f"dir:{calib_dir}:{len(files)}:{h.hexdigest()[:16]}")
        load = lambda i: imread_rgb(files[i])
        n = len(files)
    else:
        ds = build_dataset(cfg.data, "val")
        n = min(n_want, len(ds))
        if n == 0:
            raise ValueError(
                "test.int8 needs a non-empty val set (or "
                "test.int8_calib_dir) to calibrate")
        calib_id = (f"{mode}:{tail}:{act_clip}:sz{cfg.model.img_size}:"
                    f"val:{n}")
        load = lambda i: ds.load(i)["image"]

    cache_path = os.path.join(cfg.work_dir, cfg.name, "int8_quant.npz")
    fp = _params_fingerprint(variables)
    if os.path.exists(cache_path):
        try:
            z = np.load(cache_path, allow_pickle=False)
            if (str(z["__calib_id__"]) == calib_id
                    and np.allclose(z["__fingerprint__"], fp)):
                tree: Dict = {}
                for key in z.files:
                    if key.startswith("__"):
                        continue
                    node = tree
                    *parts, leaf = key.split("/")
                    for p in parts:
                        node = node.setdefault(p, {})
                    node[leaf] = jnp.asarray(z[key])
                logger.info("int8 PTQ: loaded cached quant tree %s",
                            cache_path)
                return tree
            logger.info("int8 PTQ: cache at %s is stale (checkpoint or "
                        "calibration set changed) — recalibrating",
                        cache_path)
        except (OSError, ValueError, KeyError) as e:
            logger.warning("int8 PTQ: unreadable cache %s (%s) — "
                           "recalibrating", cache_path, e)

    imgs = [letterbox_np(load(i), no_boxes, cfg.model.img_size)[0]
            for i in range(n)]
    logger.info("int8 PTQ: calibrating on %d images (%s)", n, calib_id)
    if cfg.model.family != "yolov5":
        quantize = quantize_rcnn
    elif mode == "flow":
        quantize = quantize_yolo_flow
    else:
        quantize = quantize_yolo
    tree = quantize(model, variables, np.stack(imgs).astype(np.uint8),
                    skip=skip, act_clip=act_clip)
    try:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        np.savez(cache_path, __fingerprint__=fp,
                 __calib_id__=np.asarray(calib_id),
                 **_quant_cache_paths(tree))
        logger.info("int8 PTQ: cached quant tree at %s", cache_path)
    except OSError as e:   # read-only work_dir: serve from memory only
        logger.warning("int8 PTQ: could not cache quant tree (%s)", e)
    return tree


def run_test(cfg: ExperimentConfig, source: str,
             out_path: Optional[str] = None) -> Dict:
    """--mode test: image or video inference with rendering (+TTA); with
    ``test.save_heatmaps`` also writes the per-FPN-level heatmap and
    objectness-map panels (the reference's demo/1.jpg, demo/2.jpg style)."""
    ds_names = cfg.data.class_names
    nc = _config_num_classes(cfg)
    model = build_model(cfg.model, nc)
    variables = _load_eval_variables(cfg, model)
    det = _make_detector(cfg, model, variables, nc)
    if os.path.isdir(source):   # batch over a directory of images
        from heltondetection_tpu.data.readers import YOLODataset
        files = sorted(f for f in os.listdir(source)
                       if os.path.splitext(f)[1].lower()
                       in YOLODataset.IMG_EXTS)
        out_dir = out_path or os.path.join(cfg.work_dir, cfg.name, "test_out")
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            src_f, out_f = os.path.join(source, f), os.path.join(out_dir, f)
            det.infer_image_file(src_f, out_f, ds_names)
            if cfg.test.save_heatmaps:
                _save_heatmap_panels(cfg, model, variables, src_f, out_f)
        return {"images": len(files), "out_dir": out_dir}
    ext = os.path.splitext(source)[1].lower()
    if ext in (".mp4", ".avi", ".mov", ".mkv"):
        n = det.infer_video_file(source, out_path or "out.mp4", ds_names)
        return {"frames": n}
    result = det.infer_image_file(source, out_path, ds_names)
    if cfg.test.save_heatmaps and out_path:
        result["heatmaps"] = _save_heatmap_panels(cfg, model, variables,
                                                  source, out_path)
    return result


def _save_heatmap_panels(cfg, model, variables, source: str,
                         out_path: str) -> str:
    """Render the demo-style per-level panels next to ``out_path``:
    activation heatmaps + objectness/score maps (YOLO raw-head maps;
    FasterRCNN FPN activations + RPN objectness). Returns the heatmap
    path."""
    import cv2
    from heltondetection_tpu.data.augment import letterbox_np
    from heltondetection_tpu.data.readers import imread_rgb
    from heltondetection_tpu.utils.vis import (feature_heatmaps,
                                               objectness_maps,
                                               rcnn_class_score_maps,
                                               rpn_objectness_maps)
    img = imread_rgb(source)
    lb, _, _ = letterbox_np(img, np.zeros((0, 4), np.float32),
                            cfg.model.img_size)
    x = jnp.asarray(lb, jnp.float32)[None] / 255.0
    stem = os.path.splitext(out_path)[0]
    if cfg.model.family == "yolov5":
        raws = model.apply(variables, x, train=False)
        raws0 = [np.asarray(r[0]) for r in raws]
        hm = feature_heatmaps(lb, raws0)
        om = objectness_maps(lb, raws0, cfg.model.num_classes)
    else:   # faster_rcnn: FPN activations + RPN objectness + box-head
        # class scores over proposals (demo [D] per-level class maps)
        from heltondetection_tpu.models.faster_rcnn import (
            STRIDES, FasterRCNN, generate_proposals, pyramid_anchors)
        pyr, obj, deltas = model.apply(variables, x, train=False)
        pyr0 = [np.asarray(p[0]) for p in pyr]
        hm = feature_heatmaps(lb, pyr0)
        om = rpn_objectness_maps(lb, [p.shape[:2] for p in pyr0],
                                 np.asarray(obj[0]))
        anchors, counts = pyramid_anchors(cfg.model.img_size)
        props, _, pvalid = generate_proposals(obj[0], deltas[0], anchors,
                                              counts, cfg.model.img_size,
                                              model.cfg)
        scores, _ = model.apply(variables, [p[0] for p in pyr], props,
                                method=FasterRCNN.run_box_head)
        probs = np.asarray(jax.nn.softmax(scores, -1)[:, 1:])
        cm = rcnn_class_score_maps(lb, [p.shape[:2] for p in pyr0], STRIDES,
                                   np.asarray(props), probs,
                                   np.asarray(pvalid),
                                   num_pooled=model.cfg.roi_levels)
        cv2.imwrite(stem + "_clsmaps.png",
                    cv2.cvtColor(cm, cv2.COLOR_RGB2BGR))
    cv2.imwrite(stem + "_heatmaps.png", cv2.cvtColor(hm, cv2.COLOR_RGB2BGR))
    cv2.imwrite(stem + "_objmaps.png", cv2.cvtColor(om, cv2.COLOR_RGB2BGR))
    return stem + "_heatmaps.png"
