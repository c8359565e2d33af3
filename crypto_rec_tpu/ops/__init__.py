from crypto_rec_tpu.ops.distances import (  # noqa: F401
    cosine_similarity_matrix,
    cosine_distance_matrix,
    sq_euclidean_distance_matrix,
    euclidean_distance_matrix,
    pairwise_distances,
)
from crypto_rec_tpu.ops.topk import topk_desc, masked_topk_desc, topn_indices  # noqa: F401
from crypto_rec_tpu.ops.oracle import exact_nearest, recall_at_k  # noqa: F401
from crypto_rec_tpu.ops.hamming import hamming_probe_order  # noqa: F401
