from crypto_rec_tpu.models.cluster.init import random_init, kmeans_pp_init  # noqa: F401
from crypto_rec_tpu.models.cluster.assign import (  # noqa: F401
    lloyd_assign,
    lloyd_for_remaining,
    range_assign,
)
from crypto_rec_tpu.models.cluster.update import kmeans_update, pam_update  # noqa: F401
from crypto_rec_tpu.models.cluster.silhouette import silhouette  # noqa: F401
from crypto_rec_tpu.models.cluster.kmeans import kmeans, KMeansResult  # noqa: F401
