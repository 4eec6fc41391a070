from .filters import time_range, compile_predicate, apply_json_filter  # noqa: F401
from .signals import with_stride_signals  # noqa: F401
from .indicators import with_rolling_mean, with_crossover_signals  # noqa: F401
from .backtest import evenly_spaced_backtest, ma_crossover_backtest  # noqa: F401
