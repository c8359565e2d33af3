from crypto_rec_tpu.utils.timing import PhaseTimer  # noqa: F401
from crypto_rec_tpu.utils.logging import get_logger  # noqa: F401
