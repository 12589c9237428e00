"""Serialized serving artifacts via ``jax.export`` (StableHLO).

TPU-native deployment packaging: the server's jitted patch->coords
program (uint8 finalize, backbone, deconv head, soft-argmax, optional
fused flip-test — exactly ``PoseServer._forward``) is lowered to
StableHLO with the WEIGHTS BAKED IN as constants and serialized to one
self-contained ``bytes`` blob. A serving process deserializes and calls
it with nothing but jax installed — no model definition, no flax, no
checkpoint directory. This is the XLA-idiomatic analogue of a
TorchScript/ONNX export; the reference has no equivalent (it deploys
from the full source tree + a state_dict).

Portability notes:

- The artifact is fixed-shape: ``(batch, in_h, in_w, 3) uint8`` patches
  plus ``(batch, 3) float32`` per-channel color scales (pass ones for
  eval). Export one artifact per serving batch size.
- ``platforms=("tpu", "cpu")`` lowers one artifact for both targets.
  Cross-platform lowering requires the plain-XLA soft-argmax composition
  rather than the Mosaic kernel (a TPU-compiled Pallas custom call is
  neither lowerable off-TPU nor accepted by export's safety checks), so
  ``export_server`` traces under ``IHPR_PALLAS=off`` by default. On-TPU
  serving throughput of the two compositions differs by ~2x on the
  TRAINING step's fused path but far less at serving batch sizes, where
  the tunnel/host legs dominate; keep the live ``PoseServer`` for
  maximum-throughput serving and use artifacts where deployment
  isolation matters.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_server(
    server,
    batch=None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> bytes:
    """Serialize ``server``'s inference program (weights baked in).

    ``batch``: an int for a fixed-shape artifact, ``None`` for
    ``server.max_batch``, or the string ``"poly"`` for a
    batch-POLYMORPHIC artifact (``jax.export`` symbolic dimension): one
    blob serves any batch size, including through the fused flip-test
    branch (its concat doubles a symbolic dim, which shape polymorphism
    handles). ``platforms`` is the set of deploy targets the artifact
    must run on.
    """
    if batch == "poly":
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch or server.max_batch
    h, w = server.cfg.data.input_shape

    def fn(patch_u8, color_scale):
        return server._forward(
            server.params, server.batch_stats, patch_u8, color_scale
        )

    prev = os.environ.get("IHPR_PALLAS")
    os.environ["IHPR_PALLAS"] = "off"  # portable composition (see module doc)
    try:
        exp = jax_export.export(jax.jit(fn), platforms=list(platforms))(
            jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b, 3), jnp.float32),
        )
    finally:
        if prev is None:
            os.environ.pop("IHPR_PALLAS", None)
        else:
            os.environ["IHPR_PALLAS"] = prev
    return bytes(exp.serialize())


def load_exported(data: bytes):
    """bytes -> jitted callable ``(patch_u8, color_scale) -> (B, J, 3)``
    voxel coords, runnable on any platform the artifact was exported
    for."""
    exp = jax_export.deserialize(bytearray(data))
    return jax.jit(exp.call)
