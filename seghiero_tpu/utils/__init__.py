from seghiero_tpu.utils.tables import ascii_table
from seghiero_tpu.utils.logging_util import MetricsLogger
from seghiero_tpu.utils.profiling import StepTimer, maybe_profile

__all__ = ["ascii_table", "MetricsLogger", "StepTimer", "maybe_profile"]
