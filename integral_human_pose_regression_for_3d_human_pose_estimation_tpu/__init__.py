"""Long-form alias of the ``ihpr_tpu`` package (the canonical import name).

``import integral_human_pose_regression_for_3d_human_pose_estimation_tpu``
resolves to the same module objects as ``import ihpr_tpu`` — including all
subpackages (models/, ops/, data/, parallel/, engine/, utils/).
"""

import importlib
import sys

_pkg = importlib.import_module("ihpr_tpu")
sys.modules[__name__] = _pkg
