from .cost import CostMetrics, CostTracker
from .metrics import BenchmarkMetrics, roofline_report
from .runner import run_server_benchmark
