"""Golden-file parity: frozen torch/cv2 outputs vs the JAX/native paths.

Fixtures are generated once by make_golden.py and committed; these tests are
the bit-level contract SURVEY.md §4 calls for (fp32 tolerance — different
hardware cannot be literally bit-identical, but every deviation here is
bounded and explained).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="golden fixtures not generated"
)


def test_warp_golden():
    from ihpr_tpu.data import native
    from ihpr_tpu.data.warp import gen_trans_np

    z = np.load(os.path.join(GOLDEN_DIR, "warp.npz"))
    img = z["img"]
    for i in range(int(z["n_cases"])):
        cx, cy = float(z[f"case{i}_cx"]), float(z[f"case{i}_cy"])
        bw, bh = float(z[f"case{i}_bw"]), float(z[f"case{i}_bh"])
        scale, rot = float(z[f"case{i}_scale"]), float(z[f"case{i}_rot"])
        flip = int(z[f"case{i}_flip"])
        ref = z[f"case{i}_patch"].astype(np.float32)

        c_x = img.shape[1] - 1.0 - cx if flip else cx
        inv = gen_trans_np(c_x, cy, bw, bh, 64, 64, scale, rot, inv=True)
        ours = native.warp_batch([img], inv[None], np.asarray([flip]), 64, 64)[0].astype(np.float32)
        diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert np.percentile(diff, 99) <= 2.0, (i, diff.max())


def test_integral_golden_fwd_and_grad():
    import jax

    from ihpr_tpu.ops import soft_argmax_3d, soft_argmax_3d_fused

    z = np.load(os.path.join(GOLDEN_DIR, "integral.npz"))
    logits = jnp.asarray(z["logits"])
    for fn in (soft_argmax_3d, soft_argmax_3d_fused):
        coords = np.asarray(fn(logits))
        np.testing.assert_allclose(coords, z["coords"], atol=2e-4)

    w = jnp.asarray(z["cotangent"])
    for fn in (soft_argmax_3d, soft_argmax_3d_fused):
        g = np.asarray(jax.grad(lambda v: jnp.sum(fn(v) * w))(logits))
        np.testing.assert_allclose(g, z["grad"], atol=1e-5)


# Model-through-converter parity is covered dynamically by
# tests/test_convert.py (frozen torch weights would cost ~60 MB in git).
