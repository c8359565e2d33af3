from crypto_rec_tpu.models.lsh.hyperplane import CosineLsh  # noqa: F401
from crypto_rec_tpu.models.lsh.pstable import PStableLsh  # noqa: F401
from crypto_rec_tpu.models.lsh.index import LshIndex, build_index, candidate_mask  # noqa: F401
from crypto_rec_tpu.models.lsh.hypercube import Hypercube  # noqa: F401
