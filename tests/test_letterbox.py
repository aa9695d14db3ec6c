import numpy as np
import jax.numpy as jnp

from heltondetection_tpu.ops import letterbox as L


def test_params_square_vs_wide():
    p = L.letterbox_params(480, 640, 640, 640)
    assert abs(float(p.scale) - 1.0) < 1e-6
    assert int(p.new_w) == 640 and int(p.new_h) == 480
    assert abs(float(p.pad_y) - 80.0) < 1e-6 and abs(float(p.pad_x)) < 1e-6


def test_box_roundtrip():
    rng = np.random.default_rng(0)
    for (h, w) in [(480, 640), (1080, 1920), (333, 500)]:
        p = L.letterbox_params(h, w, 640, 640)
        xy = rng.uniform(0, [w * 0.7, h * 0.7], (16, 2))
        boxes = np.concatenate(
            [xy, xy + rng.uniform(1, [w * 0.3, h * 0.3], (16, 2))], 1
        ).astype(np.float32)
        fwd = L.apply_to_boxes(jnp.asarray(boxes), p)
        back = L.invert_boxes(fwd, p, src_h=h, src_w=w)
        np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-3)
        # forward boxes live inside the destination canvas
        f = np.asarray(fwd)
        assert (f >= -1e-3).all() and (f <= 640 + 1e-3).all()


def test_letterbox_image_jax():
    img = np.random.default_rng(1).uniform(0, 255, (480, 640, 3)).astype(np.float32)
    out, p = L.letterbox_image_jax(jnp.asarray(img), 640, 640)
    assert out.shape == (640, 640, 3)
    out = np.asarray(out)
    # top/bottom pad bands are the fill value
    assert np.allclose(out[:80], 114.0) and np.allclose(out[-80:], 114.0)
    # center strip matches a resize of the source (no resize needed here: 1:1)
    np.testing.assert_allclose(out[80:560], img, atol=1e-2)
