from doa_tpu.utils.profiling import Timer, trace_to, throughput_report
from doa_tpu.utils.metrics import PipelineMetrics

__all__ = ["Timer", "trace_to", "throughput_report", "PipelineMetrics"]
