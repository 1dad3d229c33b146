from .config import apply_overrides, build_config, load_config
from .logger import FileLogger, MetricsWriter
from .profiling import StepTimer, trace
from .seeding import set_seed
