"""Weight-converter tests. The real Ultralytics .pt can't be downloaded in
this sandbox (zero egress), so the oracle is split:
  1. a synthetic state_dict with the exact Ultralytics v6.1 key layout must
     convert into a pytree IDENTICAL in structure+shapes to model.init;
  2. torch-vs-flax numeric equivalence of the Conv+BN(+SiLU) block pins the
     OIHW→HWIO transpose and BN eps/stats semantics (torch cpu available).
With both, loading a real yolov5s.pt reduces to file plumbing
(load_ultralytics_checkpoint), mirroring the reference's own oracle
(README.md:25,133)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from heltondetection_tpu.models.common import ConvBnAct
from heltondetection_tpu.models.yolov5 import build_yolov5
from heltondetection_tpu.utils.torch_convert import convert_yolov5, _to_jnp


def _make_ultralytics_sd(variant="s", nc=80, seed=0):
    """Synthesize a state_dict with Ultralytics yolov5{variant} keys/shapes."""
    from heltondetection_tpu.models.cspdarknet import VARIANTS
    d_m, w_m = VARIANTS[variant]
    gen = torch.Generator().manual_seed(seed)

    def cw(c):
        import math
        return max(8, int(math.ceil(c * w_m / 8) * 8))

    def d(n):
        return max(round(n * d_m), 1)

    sd = {}

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k,
                                                  generator=gen) * 0.05
        for suffix, val in (("weight", torch.rand(cout, generator=gen) + .5),
                            ("bias", torch.randn(cout, generator=gen) * .1),
                            ("running_mean",
                             torch.randn(cout, generator=gen) * .1),
                            ("running_var",
                             torch.rand(cout, generator=gen) + .5)):
            sd[f"{prefix}.bn.{suffix}"] = val

    def c3(prefix, cin, cout, n, e=0.5):
        ch = int(cout * e)
        conv(f"{prefix}.cv1", cin, ch, 1)
        conv(f"{prefix}.cv2", cin, ch, 1)
        conv(f"{prefix}.cv3", 2 * ch, cout, 1)
        for i in range(n):
            conv(f"{prefix}.m.{i}.cv1", ch, ch, 1)
            conv(f"{prefix}.m.{i}.cv2", ch, ch, 3)

    conv("model.0", 3, cw(64), 6)
    conv("model.1", cw(64), cw(128), 3)
    c3("model.2", cw(128), cw(128), d(3))
    conv("model.3", cw(128), cw(256), 3)
    c3("model.4", cw(256), cw(256), d(6))
    conv("model.5", cw(256), cw(512), 3)
    c3("model.6", cw(512), cw(512), d(9))
    conv("model.7", cw(512), cw(1024), 3)
    c3("model.8", cw(1024), cw(1024), d(3))
    conv("model.9.cv1", cw(1024), cw(1024) // 2, 1)       # SPPF
    conv("model.9.cv2", cw(1024) * 2, cw(1024), 1)
    # head
    conv("model.10", cw(1024), cw(512), 1)
    c3("model.13", cw(1024), cw(512), d(3))
    conv("model.14", cw(512), cw(256), 1)
    c3("model.17", cw(512), cw(256), d(3))
    conv("model.18", cw(256), cw(256), 3)
    c3("model.20", cw(512), cw(512), d(3))
    conv("model.21", cw(512), cw(512), 3)
    c3("model.23", cw(1024), cw(1024), d(3))
    no = 3 * (5 + nc)
    for i, c in enumerate((cw(256), cw(512), cw(1024))):
        sd[f"model.24.m.{i}.weight"] = torch.randn(no, c, 1, 1,
                                                   generator=gen) * 0.05
        sd[f"model.24.m.{i}.bias"] = torch.randn(no, generator=gen) * 0.1
    return sd


def _tree_shapes(tree, prefix=""):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(np.shape(leaf))
    return out


def test_converted_tree_matches_init_exactly():
    model = build_yolov5("s", 80)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    sd = _make_ultralytics_sd("s")
    params, stats = convert_yolov5(sd, depth_multiple=0.33)
    assert _tree_shapes(params) == _tree_shapes(variables["params"])
    assert _tree_shapes(stats) == _tree_shapes(variables["batch_stats"])


def test_converted_weights_run_forward():
    model = build_yolov5("s", 80)
    sd = _make_ultralytics_sd("s")
    params, stats = convert_yolov5(sd, depth_multiple=0.33)
    variables = {"params": _to_jnp(params), "batch_stats": _to_jnp(stats)}
    outs = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert outs[0].shape == (1, 8, 8, 255)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_convbn_matches_torch_numerically():
    """Conv(pad=k//2, no bias) + BN(eps 1e-3) + SiLU vs torch equivalent."""
    torch.manual_seed(0)
    cin, cout, k, s = 8, 16, 3, 2
    conv_t = torch.nn.Conv2d(cin, cout, k, stride=s, padding=k // 2,
                             bias=False)
    bn_t = torch.nn.BatchNorm2d(cout, eps=1e-3)
    bn_t.eval()
    with torch.no_grad():
        bn_t.running_mean.normal_(0, 0.3)
        bn_t.running_var.uniform_(0.5, 1.5)
        bn_t.weight.uniform_(0.5, 1.5)
        bn_t.bias.normal_(0, 0.3)
    x = torch.randn(2, cin, 16, 16)
    with torch.no_grad():
        ref = torch.nn.functional.silu(bn_t(conv_t(x))).numpy()

    m = ConvBnAct(cout, k, s)
    params = {
        "conv": {"kernel": jnp.asarray(
            conv_t.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "bn": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
               "bias": jnp.asarray(bn_t.bias.detach().numpy())},
    }
    stats = {"bn": {"mean": jnp.asarray(bn_t.running_mean.numpy()),
                    "var": jnp.asarray(bn_t.running_var.numpy())}}
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = m.apply({"params": params, "batch_stats": stats}, x_j, train=False)
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-5)


def test_stem_6x6_pad2_matches_torch():
    """The v6.1 stem uses pad=2 (not k//2=3); pin against torch."""
    torch.manual_seed(1)
    conv_t = torch.nn.Conv2d(3, 16, 6, stride=2, padding=2, bias=False)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = conv_t(x).numpy()
    from flax import linen as nn
    m = nn.Conv(16, (6, 6), strides=(2, 2), padding=((2, 2), (2, 2)),
                use_bias=False)
    params = {"kernel": jnp.asarray(
        conv_t.weight.detach().numpy().transpose(2, 3, 1, 0))}
    out = m.apply({"params": params},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


# ---------------------------------------------------------------------------
# reverse direction: JAX → torch state_dict (export_*_state_dict)
# ---------------------------------------------------------------------------

def test_export_yolov5_round_trips_bit_exact():
    """export_yolov5_state_dict is the exact inverse of convert_yolov5:
    every original key comes back bit-identical, and the only keys the
    export ADDS are the num_batches_tracked completions torch wants."""
    from heltondetection_tpu.utils.torch_convert import \
        export_yolov5_state_dict
    sd = _make_ultralytics_sd("s", nc=80, seed=11)
    P, S = convert_yolov5(sd, depth_multiple=0.33)
    out = export_yolov5_state_dict(P, S)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)
    extra = set(out) - set(sd)
    assert all(k.endswith("num_batches_tracked") for k in extra), extra


def test_export_fresh_flax_yolov5_runs_in_torch():
    """A from-scratch flax model exports into a state_dict the independent
    torch implementation loads STRICTLY and reproduces forward — the
    trained-here → deploy-on-torch migration path."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from torch_refs import TorchYOLOv5, load_ultralytics_state_dict
    from heltondetection_tpu.utils.torch_convert import \
        export_yolov5_state_dict

    nc = 7
    model = build_yolov5("n", nc)
    variables = model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_yolov5_state_dict(
              variables["params"], variables["batch_stats"]).items()}
    net = TorchYOLOv5(nc=nc, depth_multiple=0.33, width_multiple=0.25)
    load_ultralytics_state_dict(net, sd)
    net.eval()

    x = np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model.apply(variables, jnp.asarray(x), train=False)
    for lvl, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(np.asarray(o),
                                   r.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"level {lvl}")


def test_export_resnet_round_trips_bit_exact():
    from torch_refs import make_resnet_sd
    from heltondetection_tpu.utils.torch_convert import (
        convert_resnet, export_resnet_state_dict)
    sd = {k: v.numpy() for k, v in
          make_resnet_sd((2, 2, 2, 2), "basic", seed=3).items()}
    P, S = convert_resnet(sd)
    out = export_resnet_state_dict(P, S)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v, err_msg=k)
    extra = set(out) - set(sd)
    assert all(k.endswith("num_batches_tracked") for k in extra), extra


def test_export_fresh_flax_resnet_tree_complete(tmp_path):
    """Export of a from-scratch flax ResNet covers the whole param tree
    (convert∘export == identity on flax trees), and save_torch_state_dict
    writes a weights_only-loadable .pth of it."""
    from heltondetection_tpu.models.resnet import ResNet
    from heltondetection_tpu.utils.torch_convert import (
        convert_resnet, export_resnet_state_dict, save_torch_state_dict)

    model = ResNet(stage_sizes=(2, 2, 2, 2), block="basic")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    sd = export_resnet_state_dict(v["params"], v["batch_stats"])
    P, S = convert_resnet(sd)
    for tree, back in ((v["params"], P), (v["batch_stats"], S)):
        flat_a = jax.tree_util.tree_leaves_with_path(tree)
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (pa, la), (pb, lb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), lb, err_msg=str(pa))

    path = str(tmp_path / "resnet18.pth")
    save_torch_state_dict(path, sd)
    loaded = torch.load(path, weights_only=True)
    assert set(loaded) == set(sd)
