from .logging import log, seed_everything
from .profiling import StepTimer, Throughput
