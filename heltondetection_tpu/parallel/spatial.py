"""Spatial partitioning of the conv grid — scaling the RESOLUTION axis.

SURVEY.md §5: the reference scales spatially (832², 1024², 1280²
benchmarks), never sequentially; when a resolution exceeds per-chip HBM the
idiomatic TPU answer is to shard the image H axis over the mesh and let
GSPMD insert the conv halo exchanges. This module packages that: activations
carry a ``P(None, 'spatial', None, None)`` sharding through the whole
backbone/neck/head stack (params replicated), XLA partitions every conv and
exchanges the kernel-halo rows between neighbors over ICI automatically —
no model changes, no manual collectives. Verified equivalent to the
unsharded forward to float rounding (tests/test_parallel_spatial.py).

Composes with data parallelism: ``create_spatial_mesh(dp, sp)`` builds a
(data × spatial) mesh; batches shard on both axes. The detection-head
outputs inherit a spatial sharding; the fixed-shape postprocess gathers
per-image candidates, which GSPMD lowers to an all-gather of the (small)
candidate rows only — full feature maps never materialize on one chip.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_spatial_mesh(n_data: int, n_spatial: int,
                        axis_names: Tuple[str, str] = ("data", "spatial")
                        ) -> Mesh:
    """(data × spatial) mesh over the first n_data*n_spatial devices."""
    devs = np.asarray(jax.devices()[:n_data * n_spatial])
    return Mesh(devs.reshape(n_data, n_spatial), axis_names)


def image_sharding(mesh: Mesh, *, data_axis: Optional[str] = "data",
                   spatial_axis: str = "spatial") -> NamedSharding:
    """NHWC images: batch over ``data`` (when the mesh has it), H over
    ``spatial``. H must divide by n_spatial × the deepest stride (32) so
    every pyramid level still splits evenly."""
    axes = dict(mesh.shape)
    d = data_axis if (data_axis and data_axis in axes) else None
    return NamedSharding(mesh, P(d, spatial_axis, None, None))


def shard_images_spatial(images: Any, mesh: Mesh, **kw) -> Any:
    return jax.device_put(images, image_sharding(mesh, **kw))


def spatial_forward(model, variables, mesh: Mesh, *, train: bool = False,
                    **kw):
    """Jit the model forward with spatially-sharded activations. Returns a
    ``(fwd, images_sharding)`` tuple: call ``fwd(images)`` with images
    placed via the returned sharding (or any layout — jit reshards)."""
    imgs = image_sharding(mesh, **kw)
    return jax.jit(lambda x: model.apply(variables, x, train=train),
                   in_shardings=(imgs,),
                   out_shardings=None), imgs


def replicate_vars(variables: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                  variables)
