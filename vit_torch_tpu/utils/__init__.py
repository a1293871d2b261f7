from .args import ARGS
from .stats import Stats, StatMetrics, Metrics, TimerLog, CounterLog
