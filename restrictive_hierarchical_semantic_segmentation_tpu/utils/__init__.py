from .profiling import StepTimer, annotate, trace  # noqa: F401
from .compile_cache import enable as enable_compile_cache  # noqa: F401
