from splatloc_tpu.utils.logging import Log
from splatloc_tpu.utils.profiling import (Timer, trace, MetricsLogger,
                                          throughput_mpix_s)
