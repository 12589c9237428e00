"""Engine: Trainer/Tester orchestration, checkpointing, logging, timing.

Reference: ``common/base.py`` (Trainer/Tester), ``common/logger.py``,
``common/timer.py``.
"""

from ihpr_tpu.engine.logger import colorlogger
from ihpr_tpu.engine.timer import Timer
from ihpr_tpu.engine.checkpoint import CheckpointManager
from ihpr_tpu.engine.trainer import Trainer
from ihpr_tpu.engine.tester import Tester

__all__ = ["colorlogger", "Timer", "CheckpointManager", "Trainer", "Tester"]
