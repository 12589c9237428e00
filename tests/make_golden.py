"""Generate frozen golden fixtures with the torch/cv2 reference path.

Run once (python tests/make_golden.py); outputs tests/golden/*.npz which
test_golden.py checks the JAX/native paths against. Regenerating requires
torch + cv2 (both present in CI); the committed files are the contract
(SURVEY.md §4 golden-file parity tests).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def gen_warp_golden():
    import cv2

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (240, 200, 3)).astype(np.uint8)
    cases = []
    for (cx, cy, bw, bh, scale, rot, flip) in [
        (100.0, 120.0, 140.0, 140.0, 1.0, 0.0, 0),
        (100.0, 120.0, 140.0, 140.0, 1.15, 22.0, 0),
        (90.0, 110.0, 120.0, 160.0, 0.85, -35.0, 1),
    ]:
        src = img[:, ::-1] if flip else img
        c_x = img.shape[1] - 1.0 - cx if flip else cx

        def rot2d(pt, rad):
            sn, cs = np.sin(rad), np.cos(rad)
            return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])

        sw, sh = bw * scale, bh * scale
        rad = np.pi * rot / 180
        sc = np.array([c_x, cy], np.float32)
        sd = rot2d(np.array([0, sh * 0.5]), rad)
        sr = rot2d(np.array([sw * 0.5, 0]), rad)
        dc = np.array([32.0, 32.0], np.float32)
        dd = np.array([0.0, 32.0], np.float32)
        dr = np.array([32.0, 0.0], np.float32)
        s3 = np.stack([sc, sc + sd, sc + sr]).astype(np.float32)
        d3 = np.stack([dc, dc + dd, dc + dr]).astype(np.float32)
        mat = cv2.getAffineTransform(s3, d3)
        patch = cv2.warpAffine(np.ascontiguousarray(src), mat, (64, 64), flags=cv2.INTER_LINEAR)
        cases.append(
            dict(cx=cx, cy=cy, bw=bw, bh=bh, scale=scale, rot=rot, flip=flip, patch=patch)
        )
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "warp.npz"),
        img=img,
        **{f"case{i}_{k}": v for i, c in enumerate(cases) for k, v in c.items()},
        n_cases=np.int32(len(cases)),
    )


def gen_integral_golden():
    import torch

    import torch_reference as tref

    rng = np.random.RandomState(43)
    logits = (rng.randn(2, 5, 8, 16, 12) * 4).astype(np.float32)
    coords = tref.soft_argmax_3d(
        torch.from_numpy(logits.reshape(2, 5 * 8, 16, 12)), 5, 8
    ).numpy()
    # gradient golden
    t = torch.from_numpy(logits.reshape(2, 5 * 8, 16, 12)).requires_grad_(True)
    c = tref.soft_argmax_3d(t, 5, 8)
    w = torch.from_numpy(rng.randn(2, 5, 3).astype(np.float32))
    (c * w).sum().backward()
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "integral.npz"),
        logits=logits,
        coords=coords,
        cotangent=w.numpy(),
        grad=t.grad.numpy().reshape(2, 5, 8, 16, 12),
    )


def gen_model_golden():  # pragma: no cover
    """Disabled: a frozen ResNet-18 state dict is ~60 MB — too heavy to
    commit. Model-conversion parity is covered dynamically (and equivalently)
    by tests/test_convert.py with runtime-generated torch weights."""
    return
    # original generator kept below for reference

def _gen_model_golden_disabled():
    import torch

    import torch_reference as tref

    torch.manual_seed(7)
    model = tref.PoseNet(18, joint_num=4, depth_dim=8).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
        model.head.final.weight.mul_(30.0)
    x = np.random.RandomState(44).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        hm = model(torch.from_numpy(x))
        coords = tref.soft_argmax_3d(hm, 4, 8).numpy()
    torch.save(model.state_dict(), os.path.join(GOLDEN_DIR, "posenet_r18.pt"))
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "model.npz"),
        x=x,
        heatmap=hm.numpy(),
        coords=coords,
    )


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    gen_warp_golden()
    gen_integral_golden()
    print("golden fixtures written to", GOLDEN_DIR)
