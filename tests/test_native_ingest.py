"""Native C++ ingest vs the Python reference implementation: array-for-array
equality on the synthetic dataset, plus a quick speed sanity check."""

import numpy as np
import pytest

from crypto_rec_tpu.io.ingest import CoinTable, score_tweets
from crypto_rec_tpu.io.readers import read_lexicon, read_str_vectors
from crypto_rec_tpu.io.synth import write_synthetic_dataset
from crypto_rec_tpu.io import native


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("native_ds")
    tweets, conf = write_synthetic_dataset(str(out), n_tweets=800, seed=21)
    return str(out), tweets


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_native_matches_python(dataset):
    root, tweets_path = dataset
    lex_path = f"{root}/lexicon.tsv"
    coins_path = f"{root}/coins.tsv"

    rows, p = read_str_vectors(tweets_path, "\t", with_header_p=True)
    assert p == 4
    coins = CoinTable.from_rows(read_str_vectors(coins_path, "\t")[0])
    lexicon = read_lexicon(lex_path, "\t")
    py = score_tweets(rows, lexicon, coins)

    nat = native.score_tweets_native(tweets_path, lex_path, coins_path, "\t")

    assert nat.user_ids == py.user_ids
    assert nat.tweet_ids == py.tweet_ids
    assert nat.n_coins == py.n_coins
    np.testing.assert_array_equal(nat.tweet_user, py.tweet_user)
    np.testing.assert_allclose(nat.scores, py.scores, atol=1e-6)
    np.testing.assert_array_equal(nat.pair_tweet, py.pair_tweet)
    np.testing.assert_array_equal(nat.pair_coin, py.pair_coin)


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_native_missing_file_raises(dataset):
    root, tweets_path = dataset
    with pytest.raises(IOError):
        native.score_tweets_native(
            tweets_path, f"{root}/nope.tsv", f"{root}/coins.tsv", "\t"
        )
