from fastegnn_tpu.utils.seed import fix_seed
from fastegnn_tpu.utils.profiling import profile_trace, StepTimer

__all__ = ["fix_seed", "profile_trace", "StepTimer"]
