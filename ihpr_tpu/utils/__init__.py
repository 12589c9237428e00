"""Misc utilities: visualization, profiling helpers.

Reference: ``common/utils/vis.py``, ``common/utils/dir_utils.py``.
"""
