"""tools/dress_rehearsal.py: the materialized tree must parse through the
REAL loaders (upstream schema on disk, JPEG frames present) and pass the
preflight validator — the CLI dress-rehearsal's build+validate leg, kept
green on CPU (the --run leg drives train.py/test.py on the chip)."""

import numpy as np

from tools.dress_rehearsal import build_tree
from tools.validate_data import validate_h36m, validate_mpii


def test_tree_builds_loads_and_validates(tmp_path):
    root = str(tmp_path / "tree")
    build_tree(root, frames_train=10, frames_test=64, img_size=160)

    for split, expect in (("train", 10), ("test", 2)):
        rep = validate_h36m(root, split, protocol=2, check_images=4)
        assert not rep.errors, rep.errors
        assert rep.stats["samples"] == expect
    rep = validate_mpii(root, "train", check_images=4)
    assert not rep.errors, rep.errors

    # The annotations must reconstruct geometrically consistent samples:
    # blob pixels were rendered from the loader's own world->cam->pixel
    # replay, so every loaded joint_img must sit inside the frame and the
    # bbox must cover the joints.
    from ihpr_tpu.data.datasets import load_h36m

    samples = load_h36m(root, "train", protocol=2)
    for s in samples[:5]:
        ji = s["joint_img"]
        h, w = s["img_shape"]
        assert (ji[:, 0] >= 0).all() and (ji[:, 0] < w).all()
        assert (ji[:, 1] >= 0).all() and (ji[:, 1] < h).all()
        x, y, bw, bh = s["bbox"]
        assert x <= ji[:, 0].min() + 1 and x + bw >= ji[:, 0].max() - 1
        # depth is pelvis-relative; the coded +-350 span doubles to at most
        # +-700, inside the +-1000 mm training volume
        assert np.abs(ji[:, 2]).max() < 750.0
        assert s["action"] in ("Directions", "Discussion", "Eating", "Greeting",
                               "Phoning", "Photo", "Posing", "Purchases",
                               "Sitting", "SittingDown", "Smoking", "Waiting",
                               "WalkDog", "Walking", "WalkTogether")
