"""Pretraining target creation: classical edge costs + validity masks.

Equivalent of the reference's EdgeDataset target path (EdgeDataset.h:21-56):
dispatch on the configured classical extractor, then pack [H, W, 4] targets
with channels (cost_right, cost_down, mask_right, mask_down). Unlike the
reference (per-image OpenCV on dataloader CPU workers — its hottest input
stage, SURVEY.md section 3.2), targets here are computed batched on device
and can be folded into the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp

from image_compression_tpu.config import EdgeTarget
from image_compression_tpu.ops.canny import canny_edge_costs
from image_compression_tpu.ops.edges import edge_validity_masks
from image_compression_tpu.ops.graph_based import graph_based_edge_costs
from image_compression_tpu.ops.slic import slic_edge_costs
from image_compression_tpu.ops.watershed import watershed_edge_costs

_EXTRACTORS = {
    EdgeTarget.SLIC: slic_edge_costs,
    EdgeTarget.CANNY: canny_edge_costs,
    EdgeTarget.GRAPH: graph_based_edge_costs,
    EdgeTarget.WATERSHED: watershed_edge_costs,
}


def compute_edge_costs(images: jnp.ndarray,
                       target: EdgeTarget = EdgeTarget.GRAPH) -> jnp.ndarray:
    """[..., H, W, C] float [0,1] -> edge-cost planes [..., H, W, 2]
    (EdgeDataset.h:21-34; GRAPH is the configured default,
    configuration.h:20)."""
    return _EXTRACTORS[target](images)


def create_target_with_mask(images: jnp.ndarray,
                            target: EdgeTarget = EdgeTarget.GRAPH) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H, W, 4]: (cost_right, cost_down, mask_right,
    mask_down), masks zero on the padding column/row (EdgeDataset.h:36-56)."""
    costs = compute_edge_costs(images, target)
    height, width = costs.shape[-3], costs.shape[-2]
    masks = edge_validity_masks(height, width)
    masks = jnp.broadcast_to(masks, costs.shape)
    return jnp.concatenate([costs * masks, masks], axis=-1)
