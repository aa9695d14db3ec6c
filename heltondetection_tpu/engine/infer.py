"""Inference engine — rebuild targets C21 (image/video) + C19 (TTA+WBF).

SURVEY.md §3.3 call stack: image → letterbox → fwd → decode → NMS → draw
(+ optional per-level heatmaps); video = frame loop over the same path
(cv2 VideoCapture/VideoWriter host-side, detection fully on device);
TTA = horizontal-flip + multi-scale views fused with WBF on device
(README.md:15,19).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.data.augment import letterbox_np
from heltondetection_tpu.engine.evaluator import make_postprocess
from heltondetection_tpu.ops.wbf import weighted_boxes_fusion

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class Detector:
    """High-level single/batch-image detector wrapping a jitted
    forward+decode+NMS. ``forward_fn(images (B,S,S,3) float, RAW 0-255) →
    (boxes, obj, cls)`` — the same contract as the evaluator: forward_fn
    owns the /255 normalization so it fuses on device.

    ``detect_fn`` (optional) REPLACES the forward+postprocess composition
    with a prebuilt ``step(images raw 0-255) → (boxes, scores, classes,
    valid)`` in letterbox coordinates — e.g. the fused packed-head serve
    step (evaluator.make_packed_serve_step), which is ~1.5× the generic
    route's throughput AND compiles in seconds where the decode_full route
    takes minutes at real sizes (load_detector wires this for YOLOv5; the
    TTA views dispatch through the same step)."""

    def __init__(self, forward_fn: Optional[Callable], num_classes: int,
                 img_size: int,
                 *, conf_thres: float = 0.25, iou_thres: float = 0.45,
                 max_det: int = 300, tta: bool = False,
                 tta_scales: Sequence[float] = (1.0, 0.83),
                 wbf_iou: float = 0.55, detect_fn: Optional[Callable] = None):
        self.num_classes = num_classes
        self.img_size = img_size
        self.tta = tta
        self.tta_scales = tta_scales
        if detect_fn is not None:
            self._detect = jax.jit(detect_fn)
        else:
            if forward_fn is None:
                raise ValueError("need forward_fn or detect_fn")
            post = make_postprocess(num_classes, conf_thres=conf_thres,
                                    iou_thres=iou_thres, max_det=max_det,
                                    multi_label=False)

            @jax.jit
            def _detect(images):
                boxes, obj, cls = forward_fn(images)
                return post(boxes, obj, cls)

            self._detect = _detect
        n_views = (1 + len(tta_scales)) if tta else 1  # flip + scales
        self._n_views = n_views

        def _fuse_one(boxes, scores, classes, valid):
            return weighted_boxes_fusion(boxes, scores, classes, valid,
                                         n_views=n_views,
                                         iou_thres=wbf_iou, max_out=max_det)

        # WBF is per-image; vmap over the batch so TTA fusion stays ONE
        # device dispatch for a whole video chunk (VERDICT r2 weak-7: TTA
        # was single-image only, so TTA'd video fell back to
        # frame-at-a-time under the ~18 ms/dispatch tunnel latency)
        self._fuse = jax.jit(jax.vmap(_fuse_one))

    # -- core ---------------------------------------------------------------

    def detect_image(self, img_rgb: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One RGB image (any size) → (boxes_xyxy in source coords, scores,
        classes) as numpy, TTA-fused when enabled."""
        return self.detect_batch([img_rgb])[0]

    def detect_batch(self, frames: Sequence[np.ndarray]
                     ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Batched detection over same-or-mixed-size RGB frames: letterbox
        on host, ONE device dispatch per view for the whole batch (the
        per-dispatch tunnel/PCIe latency dominates frame-at-a-time video
        inference). With TTA the identity/hflip/scale views each dispatch
        batched and WBF fuses the whole batch in one vmapped call."""
        s = self.img_size
        lbs, metas = [], []
        for f in frames:
            lb, _, meta = letterbox_np(f, np.zeros((0, 4), np.float32), s)
            lbs.append(lb)
            metas.append(meta)
        x = jnp.asarray(np.stack(lbs), jnp.float32)
        nb = len(frames)

        if not self.tta:
            ob, os_, oc, ov = jax.device_get(self._detect(x))
            return [self._to_source(ob[i], os_[i], oc[i], ov[i], metas[i],
                                    frames[i].shape[:2])
                    for i in range(nb)]

        views_b, views_s, views_c, views_v = [], [], [], []
        # view 1: identity; view 2: hflip; views 3+: scales
        ob, os_, oc, ov = self._detect(x)
        views_b.append(ob); views_s.append(os_)
        views_c.append(oc); views_v.append(ov)
        ob, os_, oc, ov = self._detect(x[:, :, ::-1, :])
        fb = jnp.stack([s - ob[..., 2], ob[..., 1],
                        s - ob[..., 0], ob[..., 3]], -1)
        views_b.append(fb); views_s.append(os_)
        views_c.append(oc); views_v.append(ov)
        # per-image remap factors: view-k letterbox coords → view-1 coords
        scale1 = np.asarray([m["scale"] for m in metas],
                            np.float32)[:, None, None]
        pad1 = np.asarray([[m["pad_x"], m["pad_y"]] * 2 for m in metas],
                          np.float32)[:, None, :]
        for sc in self.tta_scales[1:]:
            ns = int(round(s * sc / 32)) * 32
            lbs2, metas2 = [], []
            for f in frames:
                lb2, _, m2 = letterbox_np(f, np.zeros((0, 4), np.float32),
                                          ns)
                lbs2.append(lb2)
                metas2.append(m2)
            x2 = jnp.asarray(np.stack(lbs2), jnp.float32)
            # jit retraces per input shape; each TTA scale compiles once
            ob, os_, oc, ov = self._detect(x2)
            b2 = np.asarray(ob)
            scale2 = np.asarray([m["scale"] for m in metas2],
                                np.float32)[:, None, None]
            pad2 = np.asarray([[m["pad_x"], m["pad_y"]] * 2 for m in metas2],
                              np.float32)[:, None, :]
            b2 = (b2 - pad2) / scale2 * scale1 + pad1
            views_b.append(jnp.asarray(b2, jnp.float32))
            views_s.append(os_); views_c.append(oc)
            views_v.append(ov)
        fb, fs, fc, fv = jax.device_get(self._fuse(
            jnp.concatenate(views_b, 1), jnp.concatenate(views_s, 1),
            jnp.concatenate(views_c, 1), jnp.concatenate(views_v, 1)))
        return [self._to_source(fb[i], fs[i], fc[i], fv[i], metas[i],
                                frames[i].shape[:2])
                for i in range(nb)]

    def _to_source(self, boxes, scores, classes, valid, meta, hw):
        v = np.asarray(valid).astype(bool)
        b = np.asarray(boxes)[v]
        b = (b - [meta["pad_x"], meta["pad_y"]] * 2) / meta["scale"]
        h, w = hw
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        return b, np.asarray(scores)[v], np.asarray(classes)[v]

    # -- frontends ----------------------------------------------------------

    def infer_image_file(self, path: str, out_path: Optional[str] = None,
                         class_names: Optional[Sequence[str]] = None,
                         ) -> Dict:
        from heltondetection_tpu.data.readers import imread_rgb
        from heltondetection_tpu.utils.vis import draw_boxes
        img = imread_rgb(path)
        boxes, scores, classes = self.detect_image(img)
        if out_path:
            rendered = draw_boxes(img, boxes, scores, classes, class_names)
            cv2.imwrite(out_path, cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
        return {"boxes": boxes, "scores": scores, "classes": classes}

    def infer_video_file(self, path: str, out_path: str,
                         class_names: Optional[Sequence[str]] = None,
                         max_frames: Optional[int] = None,
                         batch_frames: int = 8) -> int:
        """Video inference (SURVEY.md §3.3 video hot loop), processing
        ``batch_frames`` frames per device dispatch (the short tail chunk
        is padded to the same shape so only one program is compiled); TTA
        rides the same batched path (per-view batched dispatch + vmapped
        WBF). Returns frames processed."""
        from heltondetection_tpu.utils.vis import draw_boxes
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise FileNotFoundError(path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(out_path,
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        bs = max(1, batch_frames)
        n = 0
        eof = False
        while not eof:
            chunk: List[np.ndarray] = []
            while len(chunk) < bs:
                if max_frames and n + len(chunk) >= max_frames:
                    eof = True
                    break
                ok, frame = cap.read()
                if not ok:
                    eof = True
                    break
                chunk.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if not chunk:
                break
            if bs == 1:
                dets = [self.detect_image(chunk[0])]
            else:
                real = len(chunk)
                padded = chunk + [chunk[-1]] * (bs - real)  # static shape
                dets = self.detect_batch(padded)[:real]
            for rgb, (boxes, scores, classes) in zip(chunk, dets):
                rendered = draw_boxes(rgb, boxes, scores, classes,
                                      class_names)
                writer.write(cv2.cvtColor(rendered, cv2.COLOR_RGB2BGR))
                n += 1
        cap.release()
        writer.release()
        return n
