from crypto_rec_tpu.io.readers import (  # noqa: F401
    read_str_vectors,
    read_lexicon,
    read_dense_vectors,
)
from crypto_rec_tpu.io.ingest import CoinTable, TweetBatch, score_tweets  # noqa: F401
from crypto_rec_tpu.io.users import UserMatrix, build_user_matrix, build_cluster_user_matrix  # noqa: F401
