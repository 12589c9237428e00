"""tools/validate_data.py against the shared fixture trees (conftest.py):
valid trees pass, broken trees produce targeted error messages — the
preflight a real --data_root user runs before training."""

import json
import os

import numpy as np


def _import_validator():
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "validate_data.py")
    spec = importlib.util.spec_from_file_location("validate_data", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_h36m_valid_tree_passes(h36m_root):
    v = _import_validator()
    rep = v.validate_h36m(h36m_root, "test", protocol=2, check_images=0)
    assert not rep.errors, rep.errors
    # loader defaults apply (test split subsamples every 64th frame ->
    # one frame per fixture subject)
    assert rep.stats["samples"] == 2
    # fixtures have no image files on disk: sampling them must FAIL loudly
    rep2 = v.validate_h36m(h36m_root, "test", protocol=2, check_images=4)
    assert any("image files missing" in e for e in rep2.errors), rep2.errors


def test_h36m_broken_trees_diagnosed(h36m_root):
    v = _import_validator()
    # remove a camera file -> named in the error
    cam = f"{h36m_root}/annotations/Human36M_subject9_camera.json"
    os.rename(cam, cam + ".bak")
    rep = v.validate_h36m(h36m_root, "test", protocol=2, check_images=0)
    assert any("Human36M_subject9_camera.json" in e for e in rep.errors), rep.errors
    os.rename(cam + ".bak", cam)

    # malformed camera intrinsics -> shape error naming the key
    with open(cam) as f:
        cams = json.load(f)
    cams["1"]["f"] = [1.0]  # should be length-2
    with open(cam, "w") as f:
        json.dump(cams, f)
    rep = v.validate_h36m(h36m_root, "test", protocol=2, check_images=0)
    assert any("'f' shape" in e for e in rep.errors), rep.errors


def test_h36m_action_name_fallback_warns(h36m_root):
    v = _import_validator()
    rep = v.validate_h36m(h36m_root, "test", protocol=2, check_images=0)
    # fixture images carry only action_idx
    assert any("action_name" in w for w in rep.warnings), rep.warnings


def test_mpii_validator(mpii_root):
    v = _import_validator()
    rep = v.validate_mpii(mpii_root, "train", check_images=0)
    assert not rep.errors, rep.errors
    assert rep.stats["samples"] == 4
    # common COCO-format release lacks head boxes -> PCKh normalizer warning
    assert any("head_box" in w for w in rep.warnings), rep.warnings

    # truncate the keypoints of the first annotation -> length error
    path = f"{mpii_root}/annotations/train.json"
    with open(path) as f:
        data = json.load(f)
    data["annotations"][0]["keypoints"] = data["annotations"][0]["keypoints"][:30]
    with open(path, "w") as f:
        json.dump(data, f)
    rep = v.validate_mpii(mpii_root, "train", check_images=0)
    assert any("keypoints length" in e for e in rep.errors), rep.errors


def test_mscoco_validator(coco_root):
    v = _import_validator()
    rep = v.validate_mscoco(coco_root, "train2017", check_images=0)
    assert not rep.errors, rep.errors
    assert rep.stats["samples"] == 3
    assert rep.stats["crowd_filtered"] == 1


def test_h36m_ragged_camera_reported_not_crash(h36m_root):
    v = _import_validator()
    cam_path = f"{h36m_root}/annotations/Human36M_subject9_camera.json"
    with open(cam_path) as f:
        cams = json.load(f)
    cams["1"]["R"] = [[1, 0, 0], [0, 1], [0, 0, 1]]  # ragged
    with open(cam_path, "w") as f:
        json.dump(cams, f)
    rep = v.validate_h36m(h36m_root, "test", protocol=2, check_images=0)
    assert any("rectangular" in e and "'R'" in e for e in rep.errors), rep.errors


def test_h36m_missing_id_reported_not_crash(h36m_root):
    v = _import_validator()
    path = f"{h36m_root}/annotations/Human36M_subject9_data.json"
    with open(path) as f:
        data = json.load(f)
    del data["images"][0]["id"]
    del data["images"][0]["action_idx"]  # force the flat-lookup fallback too
    with open(path, "w") as f:
        json.dump(data, f)
    rep = v.validate_h36m(h36m_root, "test", protocol=2, check_images=0)
    assert any("missing 'id'" in e for e in rep.errors), rep.errors


def test_check_images_probes_spread_not_prefix(h36m_root, tmp_path):
    """A tree whose LAST subject's images are missing must fail preflight
    even when the probe count is smaller than the first subject's frames."""
    v = _import_validator()
    from ihpr_tpu.data.datasets import load_h36m

    samples = load_h36m(h36m_root, "test", protocol=2, sampling=1)
    # materialize image files for subject 9 only
    for s in samples:
        if "s9_" in os.path.basename(s["img_path"]):
            os.makedirs(os.path.dirname(s["img_path"]), exist_ok=True)
            open(s["img_path"], "wb").write(b"x")
    rep = v.Report()
    v._check_images(samples, 2, rep)  # 2 probes: spread hits S11 too
    assert any("missing" in e for e in rep.errors), rep.errors
