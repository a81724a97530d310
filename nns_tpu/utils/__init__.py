from nns_tpu.utils.timing import Timer, now_ns, time_callable, warmup  # noqa: F401
from nns_tpu.utils.report import RunRecord, ReportWriter, format_table  # noqa: F401
