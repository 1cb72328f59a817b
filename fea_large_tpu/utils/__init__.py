from fea_large_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer,
    trace_region,
    compiled_cost,
)
