"""Test harness: run everything on 8 virtual CPU devices so sharding/pjit
paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment registers a TPU PJRT plugin from sitecustomize and
imports jax at interpreter startup, so setting JAX_PLATFORMS in os.environ
here is too late — we update the live jax config instead (backends
initialize lazily, on first ``jax.devices()``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the Pallas kernels live (interpret mode) in tests even though the
# backend is CPU — off-TPU the production default routes to the plain-JAX
# composition for speed (ops/integral_pallas.py:_use_pallas).
os.environ.setdefault("IHPR_PALLAS", "interpret")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Shared on-disk annotation-tree fixtures (upstream-release schemas), used by
# test_dataset_loaders.py and test_validate_data.py.

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _write(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


@pytest.fixture()
def h36m_root(tmp_path):
    root = str(tmp_path / "Human36M")
    rng = np.random.RandomState(0)
    for subj in (9, 11):  # protocol-2 test subjects
        images, annotations = [], []
        joints_3d = {}
        cam = {
            "1": dict(
                R=np.eye(3).tolist(),
                t=[0.0, 0.0, 0.0],
                f=[1145.0, 1143.0],
                c=[512.0, 515.0],
            )
        }
        for i in range(4):
            img_id = subj * 100 + i
            images.append(
                dict(
                    id=img_id,
                    file_name=f"s{subj}_{i}.jpg",
                    width=1000,
                    height=1002,
                    cam_idx=1,
                    frame_idx=i,
                    action_idx=2 + (i % 3),
                    subaction_idx=1,
                )
            )
            annotations.append(
                dict(id=img_id, image_id=img_id, bbox=[300.0, 300.0, 350.0, 420.0])
            )
            # 17 world-space joints ~4m from the camera
            jw = rng.uniform(-400, 400, (17, 3)) + np.array([0, 0, 4000.0])
            joints_3d.setdefault(str(2 + (i % 3)), {}).setdefault("1", {})[str(i)] = (
                jw.tolist()
            )
        _write(f"{root}/annotations/Human36M_subject{subj}_data.json",
               dict(images=images, annotations=annotations))
        _write(f"{root}/annotations/Human36M_subject{subj}_camera.json", cam)
        _write(f"{root}/annotations/Human36M_subject{subj}_joint_3d.json", joints_3d)
    return root


@pytest.fixture()
def mpii_root(tmp_path):
    root = str(tmp_path / "MPII")
    rng = np.random.RandomState(1)
    images, annotations = [], []
    for i in range(5):
        images.append(dict(id=i, file_name=f"{i:09d}.jpg", width=800, height=600))
        kpts = np.zeros((16, 3))
        kpts[:, 0] = rng.uniform(100, 700, 16)
        kpts[:, 1] = rng.uniform(100, 500, 16)
        kpts[:, 2] = 1
        if i == 4:
            kpts[:, 2] = 0  # fully invisible -> dropped
        annotations.append(
            dict(id=i, image_id=i, bbox=[100.0, 100.0, 300.0, 400.0],
                 keypoints=kpts.ravel().tolist())
        )
    _write(f"{root}/annotations/train.json", dict(images=images, annotations=annotations))
    return root



@pytest.fixture()
def coco_root(tmp_path):
    root = str(tmp_path / "MSCOCO")
    rng = np.random.RandomState(2)
    images, annotations = [], []
    for i in range(4):
        images.append(dict(id=i, file_name=f"{i:012d}.jpg", width=640, height=480))
        kpts = np.zeros((17, 3))
        kpts[:, 0] = rng.uniform(50, 600, 17)
        kpts[:, 1] = rng.uniform(50, 430, 17)
        kpts[:, 2] = 2
        annotations.append(
            dict(id=i, image_id=i, bbox=[50.0, 50.0, 200.0, 300.0],
                 keypoints=kpts.ravel().tolist(), num_keypoints=17,
                 iscrowd=1 if i == 3 else 0, area=60000.0)
        )
    _write(
        f"{root}/annotations/person_keypoints_train2017.json",
        dict(images=images, annotations=annotations),
    )
    return root


