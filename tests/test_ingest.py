"""Ingest golden tests: sentiment scoring, coin detection, user matrices.

Hand-computed expectations follow /root/reference/lib/data_structures/
tweet.cpp:11-42 and lib/crypto_rec.hpp:78-210 semantics.
"""

import math

import numpy as np

from crypto_rec_tpu.io.ingest import CoinTable, score_tweets, sentiment_score
from crypto_rec_tpu.io.users import build_user_matrix, build_cluster_user_matrix

LEX = {"good": 2.0, "bad": -1.5, "great": 3.0}
COINS = CoinTable.from_rows(
    [
        ["BTC", "bitcoin", "btc", "xbt", "Bitcoin"],
        ["ETH", "ethereum", "eth", "ether", "Ethereum"],
        ["XRP", "ripple", "xrp", "Ripple", "RippleCoin"],
    ]
)


def test_sentiment_formula():
    # score = total / sqrt(total^2 + 15), alpha = 15 (tweet.cpp:40-41)
    assert math.isclose(sentiment_score(2.0), 2.0 / math.sqrt(4.0 + 15.0))
    assert sentiment_score(0.0) == 0.0
    assert sentiment_score(-3.0) < 0


def test_score_tweets_coins_and_scores():
    rows = [
        ["u1", "t1", "good", "good", "bitcoin"],          # total=4 -> btc
        ["u1", "t2", "bad", "ethereum", "btc"],           # total=-1.5 -> eth, btc
        ["u2", "t3", "great", "ripple"],                  # total=3 -> xrp
        ["u2", "t4", "nothing", "here"],                  # no coins, score 0
    ]
    b = score_tweets(rows, LEX, COINS)
    assert b.n_tweets == 4 and b.n_users == 2
    assert np.allclose(b.scores[0], 4.0 / math.sqrt(16 + 15))
    assert np.allclose(b.scores[3], 0.0)
    pairs = set(zip(b.pair_tweet.tolist(), b.pair_coin.tolist()))
    assert pairs == {(0, 0), (1, 0), (1, 1), (2, 2)}


def test_lexicon_word_never_coin_checked():
    # A lexicon word equal to a coin variation scores but does not tag the
    # coin (tweet.cpp:18-37: else-branch only).
    lex = {"bitcoin": 1.0}
    b = score_tweets([["u", "t", "bitcoin"]], lex, COINS)
    assert b.pair_tweet.size == 0
    assert b.scores[0] > 0


def test_duplicate_tweet_ids_dropped():
    rows = [["u1", "t1", "good", "btc"], ["u2", "t1", "great", "eth"]]
    b = score_tweets(rows, LEX, COINS)
    assert b.n_tweets == 1
    assert b.user_ids == ["u1"]


def test_build_user_matrix_semantics():
    s1 = sentiment_score(4.0)     # positive
    s2 = sentiment_score(-1.5)    # negative: marks known, adds nothing
    rows = [
        ["u1", "t1", "good", "good", "bitcoin"],
        ["u1", "t2", "bad", "ethereum"],
        ["u2", "t3", "bad", "ripple"],           # only negative -> useless
        ["u3", "t4", "hello"],                   # no coins -> useless
    ]
    um = build_user_matrix(score_tweets(rows, LEX, COINS))
    # u2 (all-zero accumulation) and u3 dropped (crypto_rec.hpp:121-127)
    assert um.ids == ["u1"]
    # u1: btc known = s1, eth known = 0 (negative), xrp unknown -> mean
    mean = (s1 + 0.0) / 2
    assert np.allclose(um.ratings[0], [s1, 0.0, mean], atol=1e-6)
    assert um.known[0].tolist() == [True, True, False]
    assert np.allclose(um.mean[0], mean)


def test_build_cluster_user_matrix():
    rows = [
        ["u1", "t1", "good", "bitcoin"],
        ["u2", "t2", "great", "bitcoin", "ethereum"],
        ["u3", "t3", "bad", "ripple"],
    ]
    b = score_tweets(rows, LEX, COINS)
    # t1, t2 -> cluster 1; t3 -> cluster 0
    clusters = np.array([1, 1, 0], dtype=np.int32)
    um = build_cluster_user_matrix(b, clusters, n_clusters=3)
    # cluster 0: only negative on xrp -> useless. cluster 2: empty -> useless.
    assert um.ids == ["1"]
    s1, s2 = b.scores[0], b.scores[1]
    mean = (s1 + s2 + s2) / 2  # btc = s1 + s2, eth = s2, known count 2
    assert np.allclose(um.ratings[0], [s1 + s2, s2, mean], atol=1e-6)
