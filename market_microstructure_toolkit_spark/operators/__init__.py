"""DataFrame -> DataFrame operators (metrics bundles, window/series ops,
depth analytics, impact simulation, data-pipeline ops)."""

from market_microstructure_toolkit_spark.operators.row_metrics import (  # noqa: F401
    compute_row_metrics,
    compute_event_time_metrics,
)
from market_microstructure_toolkit_spark.operators.window_metrics import (  # noqa: F401
    add_cumulative,
    add_depth_ofi,
    add_log_return,
    add_ofi_l1,
    add_rolling_corr,
    add_rolling_rv,
    book_window,
    tail_n,
)
from market_microstructure_toolkit_spark.operators.cdc import (  # noqa: F401
    apply_cdc,
)
from market_microstructure_toolkit_spark.operators.rangejoin import (  # noqa: F401
    interval_join,
    interval_overlap_join,
    scd2_join,
)
