"""Base utilities (the reference's `gb` layer, src/gb)."""

from gatling_tpu.utils.log import get_logger, init_logging, ErrorCountingHandler  # noqa: F401
from gatling_tpu.utils.handles import HandleStore, LinearDataStore  # noqa: F401
