"""Spatial partitioning (parallel/spatial.py): sharding the image H axis
over the mesh must reproduce the unsharded forward — GSPMD inserts the conv
halo exchanges (SURVEY.md §5's large-resolution scaling path)."""

import jax
import jax.numpy as jnp
import numpy as np

from heltondetection_tpu.models.yolov5 import YOLOv5
from heltondetection_tpu.parallel.spatial import (create_spatial_mesh,
                                                  image_sharding,
                                                  replicate_vars,
                                                  shard_images_spatial,
                                                  spatial_forward)


def _model_and_input(seed=0, hw=256, bsz=2):
    model = YOLOv5(num_classes=4, depth_multiple=0.33, width_multiple=0.25)
    x = jnp.asarray(np.random.default_rng(seed).uniform(0, 1,
                                                        (bsz, hw, hw, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    return model, v, x


def test_spatial_sharded_forward_matches_unsharded():
    model, v, x = _model_and_input()
    mesh = create_spatial_mesh(1, 8)
    fwd, imgs = spatial_forward(model, replicate_vars(v, mesh), mesh)
    outs_sp = fwd(shard_images_spatial(x, mesh))
    outs_1 = jax.jit(lambda xx: model.apply(v, xx, train=False))(x)
    for a, b in zip(jax.tree_util.tree_leaves(outs_sp),
                    jax.tree_util.tree_leaves(outs_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_data_by_spatial_mesh():
    """2-D (data × spatial) mesh: batch AND height sharded together."""
    model, v, x = _model_and_input(bsz=4)
    mesh = create_spatial_mesh(4, 2)
    fwd, imgs = spatial_forward(model, replicate_vars(v, mesh), mesh)
    outs_sp = fwd(jax.device_put(x, imgs))
    outs_1 = jax.jit(lambda xx: model.apply(v, xx, train=False))(x)
    for a, b in zip(jax.tree_util.tree_leaves(outs_sp),
                    jax.tree_util.tree_leaves(outs_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
