"""Aux subsystems: profiling, logging, IO (reference layers 9-11)."""

from .profile import Timer, bench, trace
from .logger import get_logger, log, warn, error, enable_file_logging
