"""Output-tree helpers.

Reference: ``common/utils/dir_utils.py`` (make_folder, add_pypath). The
sys.path injection (add_pypath) is obsolete by design — datasets are proper
modules — but the output-tree convention (model_dump/log/result/vis under
output_dir) is kept for familiarity.
"""

from __future__ import annotations

import os


def make_folder(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def make_output_tree(output_dir: str) -> dict:
    """Create the reference's output layout; returns the subdir map."""
    return {
        name: make_folder(os.path.join(output_dir, name))
        for name in ("model_dump", "log", "result", "vis")
    }
