"""PyTorch ⇄ JAX weight conversion — the cross-implementation oracle path.

SURVEY.md §4: the reference's strongest integration test is scoring OFFICIAL
Ultralytics YOLOv5 weights through its own eval stack
(utils/otherUtils/eval_yolov5_by_pycocotools.py, README.md:25; result rows
README.md:133,135). This module maps an Ultralytics-v6.1 ``state_dict``
(model.0..model.24 layout) onto our flax pytree so the same oracle runs
here: ported weights + our decode/NMS/eval must reproduce the published
mAP. (No network access in this image, so the weights file itself must be
provided by the user; the converter + layout contract are fully tested
against a synthetically-constructed state_dict of identical structure.)

Layout contract (Ultralytics yolov5[s,l].pt → model.float().state_dict()):
  model.0          stem Conv           → backbone/stem
  model.1..9       backbone convs/C3/SPPF
  model.10..23     head (PAFPN convs/C3)
  model.24.m.{0,1,2} Detect 1x1 convs  → detect{0,1,2}
Torch conv weight OIHW → flax HWIO transpose; BN: weight→scale, bias→bias,
running_mean/var→batch_stats.
"""

from __future__ import annotations

import pickle
from typing import Dict, Mapping, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))   # OIHW → HWIO


def _convbn(sd: Mapping, tprefix: str) -> Tuple[Dict, Dict]:
    """Ultralytics Conv module (conv+bn) → our ConvBnAct params/stats."""
    params = {
        "conv": {"kernel": _conv(sd[f"{tprefix}.conv.weight"])},
        "bn": {"scale": np.asarray(sd[f"{tprefix}.bn.weight"]),
               "bias": np.asarray(sd[f"{tprefix}.bn.bias"])},
    }
    stats = {
        "bn": {"mean": np.asarray(sd[f"{tprefix}.bn.running_mean"]),
               "var": np.asarray(sd[f"{tprefix}.bn.running_var"])},
    }
    return params, stats


def _c3(sd: Mapping, tprefix: str, n: int) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    for name in ("cv1", "cv2", "cv3"):
        p[name], s[name] = _convbn(sd, f"{tprefix}.{name}")
    for i in range(n):
        bp: Dict = {}
        bs: Dict = {}
        bp["cv1"], bs["cv1"] = _convbn(sd, f"{tprefix}.m.{i}.cv1")
        bp["cv2"], bs["cv2"] = _convbn(sd, f"{tprefix}.m.{i}.cv2")
        p[f"m{i}"], s[f"m{i}"] = bp, bs
    return p, s


def _sppf(sd: Mapping, tprefix: str) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    p["cv1"], s["cv1"] = _convbn(sd, f"{tprefix}.cv1")
    p["cv2"], s["cv2"] = _convbn(sd, f"{tprefix}.cv2")
    return p, s


# (flax name, torch model index, kind, base C3 depth) — ONE table drives
# both conversion directions so the layouts can never drift apart
_YOLO_BB_MAP = [
    ("stem", 0, "conv", None),
    ("down1", 1, "conv", None),
    ("c3_1", 2, "c3", 3),
    ("down2", 3, "conv", None),
    ("c3_2", 4, "c3", 6),
    ("down3", 5, "conv", None),
    ("c3_3", 6, "c3", 9),
    ("down4", 7, "conv", None),
    ("c3_4", 8, "c3", 3),
    ("sppf", 9, "sppf", None),
]
_YOLO_NECK_MAP = [
    ("lat5", 10, "conv", None),
    ("td4", 13, "c3", 3),
    ("lat4", 14, "conv", None),
    ("td3", 17, "c3", 3),
    ("bu3", 18, "conv", None),
    ("bu4", 20, "c3", 3),
    ("bu5", 21, "conv", None),
    ("bu6", 23, "c3", 3),
]


def convert_yolov5(state_dict: Mapping, depth_multiple: float = 0.33
                   ) -> Tuple[Dict, Dict]:
    """Ultralytics v6.1 state_dict → (params, batch_stats) for our YOLOv5.

    depth_multiple sets C3 repeat counts (0.33 for n/s, 0.67 m, 1.0 l...).
    """
    def d(n):
        return max(round(n * depth_multiple), 1)

    sd = state_dict
    P: Dict = {"backbone": {}, "neck": {}}
    S: Dict = {"backbone": {}, "neck": {}}

    for sub, table in (("backbone", _YOLO_BB_MAP), ("neck", _YOLO_NECK_MAP)):
        for name, idx, kind, n in table:
            t = f"model.{idx}"
            if kind == "conv":
                P[sub][name], S[sub][name] = _convbn(sd, t)
            elif kind == "c3":
                P[sub][name], S[sub][name] = _c3(sd, t, d(n))
            else:
                P[sub][name], S[sub][name] = _sppf(sd, t)

    for i in range(3):
        P[f"detect{i}"] = {
            "kernel": _conv(sd[f"model.24.m.{i}.weight"]),
            "bias": np.asarray(sd[f"model.24.m.{i}.bias"]),
        }
    return P, S


def _inv_conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (3, 2, 0, 1))   # HWIO → OIHW


def _export_convbn(out: Dict, tprefix: str, p: Mapping, s: Mapping) -> None:
    out[f"{tprefix}.conv.weight"] = _inv_conv(p["conv"]["kernel"])
    out[f"{tprefix}.bn.weight"] = np.asarray(p["bn"]["scale"])
    out[f"{tprefix}.bn.bias"] = np.asarray(p["bn"]["bias"])
    out[f"{tprefix}.bn.running_mean"] = np.asarray(s["bn"]["mean"])
    out[f"{tprefix}.bn.running_var"] = np.asarray(s["bn"]["var"])
    out[f"{tprefix}.bn.num_batches_tracked"] = np.zeros((), np.int64)


def _export_c3(out: Dict, tprefix: str, p: Mapping, s: Mapping) -> None:
    for name in ("cv1", "cv2", "cv3"):
        _export_convbn(out, f"{tprefix}.{name}", p[name], s[name])
    i = 0
    while f"m{i}" in p:
        for name in ("cv1", "cv2"):
            _export_convbn(out, f"{tprefix}.m.{i}.{name}",
                           p[f"m{i}"][name], s[f"m{i}"][name])
        i += 1


def export_yolov5_state_dict(params: Mapping, batch_stats: Mapping
                             ) -> Dict[str, np.ndarray]:
    """Our YOLOv5 pytrees → an Ultralytics-v6.1-layout ``state_dict``
    (numpy leaves) — the INVERSE of :func:`convert_yolov5`, sharing its
    layout tables. Lets a model trained here load into any
    v6.1-compatible torch stack (comparison, deployment on GPU serving
    stacks, the reference's own eval scripts);
    ``convert_yolov5(export_yolov5_state_dict(P, S))`` round-trips
    bit-exactly (pinned in tests/test_torch_convert.py)."""
    out: Dict[str, np.ndarray] = {}
    for sub, table in (("backbone", _YOLO_BB_MAP), ("neck", _YOLO_NECK_MAP)):
        tree_p, tree_s = params[sub], batch_stats[sub]
        for name, idx, kind, _ in table:
            t = f"model.{idx}"
            if kind == "conv":
                _export_convbn(out, t, tree_p[name], tree_s[name])
            elif kind == "c3":
                _export_c3(out, t, tree_p[name], tree_s[name])
            else:                          # sppf
                for cv in ("cv1", "cv2"):
                    _export_convbn(out, f"{t}.{cv}", tree_p[name][cv],
                                   tree_s[name][cv])
    for i in range(3):
        out[f"model.24.m.{i}.weight"] = _inv_conv(
            params[f"detect{i}"]["kernel"])
        out[f"model.24.m.{i}.bias"] = np.asarray(
            params[f"detect{i}"]["bias"])
    return out


def export_resnet_state_dict(params: Mapping, batch_stats: Mapping
                             ) -> Dict[str, np.ndarray]:
    """Our ``models.resnet.ResNet`` pytrees → a torchvision-v1-layout
    ``state_dict`` (numpy leaves; no ``fc.*``) — the INVERSE of
    :func:`convert_resnet`. ``convert_resnet`` of the result round-trips
    bit-exactly."""
    out: Dict[str, np.ndarray] = {}

    def bn(prefix: str, p: Mapping, s: Mapping) -> None:
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}.running_var"] = np.asarray(s["var"])
        out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)

    out["conv1.weight"] = _inv_conv(params["stem_conv"]["kernel"])
    bn("bn1", params["stem_bn"], batch_stats["stem_bn"])
    for block in sorted(k for k in params if k.startswith("layer")):
        layer, i = block.split("_")        # layer1_0 → layer1.0
        t = f"{layer}.{i}"
        for mod, sub_p in params[block].items():
            if mod == "ds_conv":
                out[f"{t}.downsample.0.weight"] = _inv_conv(sub_p["kernel"])
            elif mod == "ds_bn":
                bn(f"{t}.downsample.1", sub_p, batch_stats[block][mod])
            elif mod.startswith("conv"):
                out[f"{t}.{mod}.weight"] = _inv_conv(sub_p["kernel"])
            elif mod.startswith("bn"):
                bn(f"{t}.{mod}", sub_p, batch_stats[block][mod])
            else:
                raise KeyError(f"unrecognized ResNet param module {mod} "
                               f"in {block}")
    return out


def save_torch_state_dict(path: str, state_dict: Mapping) -> None:
    """Write a numpy-leaf state_dict as a torch .pth (tensor leaves) —
    loadable by ``torch.load(path, weights_only=True)``. Requires torch."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()}, path)


def convert_resnet(state_dict: Mapping) -> Tuple[Dict, Dict]:
    """torchvision-v1 ResNet state_dict → (params, batch_stats) for our
    ``models.resnet.ResNet`` (any depth; stage/block structure is inferred
    from the keys). This is the ImageNet-pretrained ingestion path for the
    FasterRCNN family: the reference's FasterRCNN results all start from
    ImageNet-pretrained ResNet50 (reference README.md:65), and the
    frozen-backbone ablation (README.md:132) presumes it.

    Mapping: ``conv1``→stem_conv, ``bn1``→stem_bn,
    ``layer{L}.{i}.{conv,bn}{k}``→``layer{L}_{i}/{conv,bn}{k}``,
    ``downsample.0/1``→``ds_conv``/``ds_bn``; ``fc.*`` dropped. Torch BN
    weight/bias→scale/bias params, running stats→batch_stats.
    """
    P: Dict = {}
    S: Dict = {}
    put = _put

    for key, val in state_dict.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(val)
        if key == "conv1.weight":
            put(P, "stem_conv/kernel", _conv(arr))
            continue
        if key.startswith("bn1."):
            field = key.split(".", 1)[1]
            _put_bn(P, S, "stem_bn", field, arr)
            continue
        parts = key.split(".")             # layer1 . 0 . conv1 . weight ...
        block = f"{parts[0]}_{parts[1]}"
        if parts[2] == "downsample":
            name = "ds_conv" if parts[3] == "0" else "ds_bn"
            if name == "ds_conv":
                put(P, f"{block}/ds_conv/kernel", _conv(arr))
            else:
                _put_bn(P, S, f"{block}/ds_bn", parts[4], arr)
        elif parts[2].startswith("conv"):
            put(P, f"{block}/{parts[2]}/kernel", _conv(arr))
        elif parts[2].startswith("bn"):
            _put_bn(P, S, f"{block}/{parts[2]}", parts[3], arr)
        else:
            raise KeyError(f"unrecognized torchvision ResNet key: {key}")
    return P, S


def _put(tree, dotted, leaf):
    """Insert ``leaf`` at slash-separated path ``dotted``, creating nested
    dicts along the way."""
    parts = dotted.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = leaf


def _put_bn(P: Dict, S: Dict, prefix: str, field: str, arr) -> None:
    put = _put
    if field == "weight":
        put(P, f"{prefix}/scale", arr)
    elif field == "bias":
        put(P, f"{prefix}/bias", arr)
    elif field == "running_mean":
        put(S, f"{prefix}/mean", arr)
    elif field == "running_var":
        put(S, f"{prefix}/var", arr)
    else:
        raise KeyError(f"unrecognized BN field {field} under {prefix}")


def load_torchvision_resnet(path: str, allow_pickle: bool = False):
    """Load a torchvision ResNet .pth state_dict file → (params,
    batch_stats) pytrees for ``models.resnet.ResNet`` (jnp leaves).
    Requires torch (CPU) to unpickle.

    Plain state_dicts load with ``weights_only=True`` (no arbitrary-code
    unpickling). A full-model pickle needs ``allow_pickle=True`` — an
    explicit opt-in because unpickling executes code from the file."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError as e:
        # the only failure weights_only=False can fix: a full-model pickle
        # rejected by the safe loader. Everything else (missing file,
        # corrupt zip, old torch without the kwarg) propagates untouched.
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain tensor state_dict; if you trust "
                "this file (full-model pickles execute arbitrary code on "
                "load), pass allow_pickle=True") from e
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v.float().numpy()
          if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, stats = convert_resnet(sd)
    return _to_jnp(params), _to_jnp(stats)


def graft_backbone(params, batch_stats, path: str):
    """Replace the ``backbone`` subtree of an initialized detector pytree
    with converted torchvision-ResNet weights from ``path``; returns new
    (params, batch_stats). Leaf-shape mismatches raise with the offending
    paths so a wrong-variant file fails loudly, not as silent NaNs."""
    import jax

    bp, bs = load_torchvision_resnet(path)
    for name, have, want in (("params", bp, params["backbone"]),
                             ("batch_stats", bs, batch_stats["backbone"])):
        have_s = {"/".join(str(getattr(p, "key", p)) for p in pth):
                  tuple(leaf.shape) for pth, leaf in
                  jax.tree_util.tree_flatten_with_path(have)[0]}
        want_s = {"/".join(str(getattr(p, "key", p)) for p in pth):
                  tuple(leaf.shape) for pth, leaf in
                  jax.tree_util.tree_flatten_with_path(want)[0]}
        if have_s != want_s:
            diff = {k: (have_s.get(k), want_s.get(k))
                    for k in set(have_s) | set(want_s)
                    if have_s.get(k) != want_s.get(k)}
            raise ValueError(
                f"backbone_pretrain {name} mismatch vs model (converted, "
                f"expected): {diff}")
    new_params = dict(params)
    new_params["backbone"] = bp
    new_stats = dict(batch_stats)
    new_stats["backbone"] = bs
    return new_params, new_stats


def load_ultralytics_checkpoint(path: str, num_classes: int = 80,
                                variant: str = "s",
                                allow_pickle: bool = True):
    """Load a .pt checkpoint file → (model, variables) ready for eval.
    Requires torch (CPU) to unpickle.

    Plain tensor state_dicts load via the safe ``weights_only=True`` path;
    official Ultralytics releases are FULL-MODEL pickles, which execute
    code on load — that fallback stays enabled by default (it is this
    function's main job) but ``allow_pickle=False`` restricts to the safe
    loader for untrusted files."""
    import torch
    from heltondetection_tpu.models.cspdarknet import VARIANTS
    from heltondetection_tpu.models.yolov5 import build_yolov5
    import jax.numpy as jnp

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError as e:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain tensor state_dict and "
                "allow_pickle=False (full-model pickles execute arbitrary "
                "code on load)") from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model_t = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt \
        else ckpt
    sd = model_t.float().state_dict() if hasattr(model_t, "state_dict") \
        else model_t
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    d, _ = VARIANTS[variant]
    params, stats = convert_yolov5(sd, depth_multiple=d)
    model = build_yolov5(variant, num_classes)
    variables = {"params": _to_jnp(params), "batch_stats": _to_jnp(stats)}
    return model, variables


def _to_jnp(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, tree)
